"""ExPost-as-prior: the post-hoc diagonal-GMM prior fit (round 5).

Covers the EM fit itself (component recovery on a known mixture) and the
infer-side plumbing (_fitted_prior shapes/caching).  The motivation — a
training-time mixture prior collapses cross-generation (round 4: L3 T->I
Strict 98.7 -> 0.4) while a post-hoc fit leaves the trained posterior
untouched — is documented in eval/infer.joint_generate.
"""
import numpy as np

from multimodal_vae_comparison_tpu.eval.infer import (MultimodalVAEInfer,
                                                      _fit_diag_gmm)


def test_fit_diag_gmm_recovers_components():
    rng = np.random.default_rng(0)
    true_loc = np.array([[-4.0, 0.0], [4.0, 0.0], [0.0, 5.0]])
    true_scale = np.array([[0.3, 0.5], [0.5, 0.3], [0.4, 0.4]])
    n_per = 600
    x = np.concatenate([
        true_loc[c] + true_scale[c] * rng.standard_normal((n_per, 2))
        for c in range(3)])
    loc, scale, logw = _fit_diag_gmm(x, C=3, iters=100, seed=1)
    assert loc.shape == (3, 2) and scale.shape == (3, 2)
    assert logw.shape == (3,)
    # match fitted components to true ones greedily by distance
    used = set()
    for c in range(3):
        d = np.linalg.norm(loc - true_loc[c], axis=1)
        j = int(np.argmin(d))
        assert d[j] < 0.15, f"component {c} off by {d[j]:.3f}"
        assert j not in used, "two true components mapped to one fit"
        used.add(j)
    # weights ~uniform (equal-mass mixture)
    w = np.exp(logw)
    assert np.allclose(w, 1 / 3, atol=0.05)


def test_fit_diag_gmm_caps_components_and_floors_variance():
    x = np.zeros((5, 3))                      # degenerate: all identical
    loc, scale, logw = _fit_diag_gmm(x, C=16, iters=5, seed=0)
    assert len(loc) == 5                      # C capped at N
    assert np.all(scale >= 1e-2 - 1e-9)       # sqrt(min_var) floor
    assert np.all(np.isfinite(logw))


class _Stub:
    """Borrow the unbound methods the same way eval's _Adapter does."""

    _fitted_prior = MultimodalVAEInfer._fitted_prior

    def _expost_prior(self):
        rng = np.random.default_rng(2)
        mus = np.concatenate([rng.normal(-3, 0.2, (64, 4)),
                              rng.normal(3, 0.2, (64, 4))]).astype(np.float32)
        scales = np.full((128, 4), 0.1, np.float32)
        return mus, scales


def test_fitted_prior_shapes_and_cache():
    stub = _Stub()
    loc, scale, logw = stub._fitted_prior(components=4, iters=30)
    assert loc.shape == (4, 4) and scale.shape == (4, 4)
    assert logw.shape == (4,)
    assert np.isclose(np.exp(logw).sum(), 1.0, atol=1e-5)
    # the two aggregate-posterior lobes must both be covered
    assert loc.min() < -2.0 and loc.max() > 2.0
    again = stub._fitted_prior(components=4)
    assert again is stub._fitted_cache  # cached, not re-fit
