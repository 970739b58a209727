"""End-to-end model tests: forward shapes, objectives, and gradient flow for
MOE / POE / MoPOE / DMVAE / UnimodalVAE (reference analog:
multimodal_compare/tests/test_torchmmvae.py, extended with golden checks the
reference lacks)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_vae_comparison_tpu.models import get_mixing
from multimodal_vae_comparison_tpu.models.base import ModalitySpec
from multimodal_vae_comparison_tpu.models.mmvae import (
    DMVAE, MOE, POE, MoPOE, UnimodalVAE)

B, L = 4, 6
N_LATENTS = 5


def specs(private=None):
    return (
        ModalitySpec(name="mod_1", encoder="FNN", decoder="FNN",
                     feature_dims=(10,), mod_type="data", recon_loss="mse",
                     llik_scaling=1.0, private_latents=private),
        ModalitySpec(name="mod_2", encoder="TxtTransformer",
                     decoder="TxtTransformer", feature_dims=(L, 27),
                     mod_type="text", recon_loss="category_ce",
                     llik_scaling=1.0, private_latents=private,
                     has_masks=True),
    )


def batch(key=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    txt = jax.nn.one_hot(jax.random.randint(k2, (B, L), 0, 27), 27)
    return {
        "mod_1": {"data": jax.random.normal(k1, (B, 10)), "masks": None},
        "mod_2": {"data": txt,
                  "masks": jnp.array([[True] * 4 + [False] * 2] * B)},
    }


def make(cls, obj="elbo", K=1, private=None, n_specs=2):
    sp = specs(private)[:n_specs]
    model = cls(specs=sp, n_latents=N_LATENTS, obj=obj, K=K, beta=1.0)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    params = model.init(rngs, batch(), method=model.objective)
    return model, params


def run_objective(model, params, key=2):
    loss, metrics = model.apply(params, batch(),
                                rngs={"sample": jax.random.PRNGKey(key)},
                                method=model.objective)
    return loss, metrics


@pytest.mark.parametrize("cls,kwargs", [
    (MOE, {}),
    (MOE, {"obj": "iwae", "K": 3}),
    (MOE, {"obj": "dreg", "K": 3}),
    (POE, {}),
    (MoPOE, {}),
    (DMVAE, {"private": 3}),
])
def test_objective_finite_and_differentiable(cls, kwargs):
    model, params = make(cls, **kwargs)
    loss, metrics = run_objective(model, params)
    assert np.isfinite(float(loss)), f"{cls.__name__} loss not finite"
    assert "kld" in metrics

    def loss_fn(p):
        return model.apply(p, batch(), rngs={"sample": jax.random.PRNGKey(3)},
                           method=model.objective)[0]

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    total = sum(float(jnp.abs(g).sum()) for g in leaves)
    assert total > 0, f"{cls.__name__}: no gradient signal"


def test_unimodal_vae():
    model, params = make(UnimodalVAE, n_specs=1)
    loss, metrics = run_objective(model, params)
    assert np.isfinite(float(loss))
    assert "reconstruction_loss_mod_1" in metrics


def test_moe_forward_cross_matrix():
    model, params = make(MOE)
    out = model.apply(params, batch(), rngs={"sample": jax.random.PRNGKey(4)},
                      method=lambda m, b: m.forward(b, ("mod_1", "mod_2")))
    assert set(out.mods) == {"mod_1", "mod_2"}
    assert "mod_2" in out.mods["mod_1"].cross_decoder_dist
    assert "mod_1" in out.mods["mod_2"].cross_decoder_dist
    assert out.mods["mod_1"].decoder_dist.mean.shape == (1, B, 10)
    assert out.mods["mod_2"].decoder_dist.mean.shape == (1, B, L, 27)


def test_moe_missing_modality_imputed():
    model, params = make(MOE)
    out = model.apply(params, batch(), rngs={"sample": jax.random.PRNGKey(5)},
                      method=lambda m, b: m.forward(b, ("mod_1",)))
    # mod_2 is reconstructed from mod_1's samples
    assert out.mods["mod_2"].decoder_dist.mean.shape == (1, B, L, 27)
    assert out.mods["mod_2"].encoder_dist is None


def test_poe_joint_posterior_shared_across_mods():
    model, params = make(POE)
    out = model.apply(params, batch(), rngs={"sample": jax.random.PRNGKey(6)},
                      method=lambda m, b: m.forward(b, ("mod_1", "mod_2")))
    j1 = out.mods["mod_1"].joint_dist
    j2 = out.mods["mod_2"].joint_dist
    np.testing.assert_array_equal(np.asarray(j1.loc), np.asarray(j2.loc))
    assert j1.loc.shape == (B, N_LATENTS)


def test_poe_single_modality_tighter_than_prior():
    """With one expert + prior, PoE variance must be below both."""
    model, params = make(POE)
    out = model.apply(params, batch(), rngs={"sample": jax.random.PRNGKey(7)},
                      method=lambda m, b: m.forward(b, ("mod_1",)))
    joint = out.mods["mod_1"].joint_dist
    enc = out.mods["mod_1"].encoder_dist
    assert np.all(np.asarray(joint.scale) <= np.asarray(enc.scale) + 1e-6)
    assert np.all(np.asarray(joint.scale) <= 1.0)


def test_mopoe_subset_count():
    model, params = make(MoPOE)
    # 2 modalities -> 3 subsets
    assert len(model.subsets()) == 3


def test_dmvae_private_latent_split():
    model, params = make(DMVAE, private=3)
    out = model.apply(params, batch(), rngs={"sample": jax.random.PRNGKey(8)},
                      method=lambda m, b: m.forward(b, ("mod_1", "mod_2")))
    mo = out.mods["mod_1"]
    assert mo.encoder_dist.loc.shape == (B, N_LATENTS)
    assert mo.enc_dist_private.loc.shape == (B, 3)
    assert mo.joint_decoder_dist is not None
    assert "mod_2" in mo.cross_decoder_dist


def test_dmvae_requires_private():
    model = DMVAE(specs=specs(None), n_latents=N_LATENTS)
    with pytest.raises(AssertionError, match="private_latents"):
        model.init({"params": jax.random.PRNGKey(0),
                    "sample": jax.random.PRNGKey(1)},
                   batch(), method=model.objective)


def test_registry():
    assert get_mixing("moe") is MOE
    assert get_mixing("poe") is POE
    assert get_mixing("mopoe") is MoPOE
    assert get_mixing("dmvae") is DMVAE
    with pytest.raises(KeyError):
        get_mixing("nope")


def test_objective_jits_and_is_deterministic():
    model, params = make(POE)

    @jax.jit
    def step(p, b, key):
        return model.apply(p, b, rngs={"sample": key},
                           method=model.objective)[0]

    l1 = step(params, batch(), jax.random.PRNGKey(9))
    l2 = step(params, batch(), jax.random.PRNGKey(9))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_llik_scaling_affects_loss():
    sp = list(specs())
    sp[0] = ModalitySpec(name="mod_1", encoder="FNN", decoder="FNN",
                         feature_dims=(10,), mod_type="data",
                         recon_loss="mse", llik_scaling=100.0)
    model = POE(specs=tuple(sp), n_latents=N_LATENTS)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    params = model.init(rngs, batch(), method=model.objective)
    loss_scaled, _ = run_objective(model, params)
    model2, params2 = make(POE)
    loss_plain, _ = run_objective(model2, params2)
    assert abs(float(loss_scaled)) > abs(float(loss_plain))


def test_action_token_modality_trains():
    """VILANRO discretized-action-token modality end-to-end: Transformer
    enc/dec over a (T, A, K) token grid with category_ce + padding masks;
    a few optimizer steps must reduce the loss."""
    import optax

    T, A, K = 6, 2, 5
    sp = (
        ModalitySpec(name="mod_1", encoder="FNN", decoder="FNN",
                     feature_dims=(10,), mod_type="data", recon_loss="mse"),
        ModalitySpec(name="mod_2", encoder="Transformer",
                     decoder="Transformer", feature_dims=(T, A, K),
                     mod_type="action_tokens", recon_loss="category_ce",
                     has_masks=True),
    )
    model = POE(specs=sp, n_latents=N_LATENTS, obj="elbo", K=1, beta=1.0)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(
        np.eye(K, dtype=np.float32)[rng.integers(0, K, (B, T, A))])
    bt = {"mod_1": {"data": jax.random.normal(jax.random.PRNGKey(0), (B, 10)),
                    "masks": None},
          "mod_2": {"data": tokens,
                    "masks": jnp.array([[True] * 4 + [False] * 2] * B)}}
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    params = model.init(rngs, bt, method=model.objective)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            loss, _ = model.apply(p, bt, rngs={"sample": key},
                                  method=model.objective)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(8):
        params, opt_state, loss = step(params, opt_state,
                                       jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    # decoder emits a token grid, and argmax decoding has valid bin indices
    out = model.apply(params, bt, rngs={"sample": jax.random.PRNGKey(9)},
                      method=model.forward, present=("mod_1", "mod_2"))
    dec = np.asarray(out.mods["mod_2"].decoder_dist.mean)
    assert dec.shape[-2:] == (A, K)
    assert dec.argmax(-1).max() < K


def test_decode_mod_pads_private_latents():
    """Regression: prior/joint sampling and serving decode hand decode_mod
    shared-only latents; factorized (DMVAE-style) decoders expect
    n_latents + private_latents inputs and must not shape-error."""
    from multimodal_vae_comparison_tpu.models.mmvae import DMVAE

    sp = tuple(
        ModalitySpec(name=f"mod_{i+1}", encoder="FNN", decoder="FNN",
                     feature_dims=(8,), mod_type="x", recon_loss="mse",
                     private_latents=3) for i in range(2))
    model = DMVAE(specs=sp, n_latents=N_LATENTS, obj="elbo", K=1, beta=1.0)
    bt = {f"mod_{i+1}": {"data": jnp.ones((4, 8)) * 0.4, "masks": None}
          for i in range(2)}
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    params = model.init(rngs, bt, method=model.objective)
    z_shared = jnp.zeros((1, 4, N_LATENTS))     # (K, B, shared only)
    dist = model.apply(params, "mod_1", z_shared,
                       method=lambda m, nm, zz: m.decode_mod(nm, zz))
    assert dist.mean.shape == (1, 4, 8)
