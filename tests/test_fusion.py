"""Golden-value tests for the posterior fusion math (SURVEY.md §7 stage 1)."""
import jax.numpy as jnp
import numpy as np

from multimodal_vae_comparison_tpu.ops.fusion import (
    mixture_component_selection, poe_precision_fusion, product_of_experts,
    subset_lattice)


def test_poe_two_experts_hand_computed():
    # two 1-D experts: N(1, 1) and N(3, 1); with prior N(0,1):
    # precisions 1,1,1 -> mu = (1+3+0)/3, var = 1/3
    mus = jnp.array([[[1.0]], [[3.0]]])
    scales = jnp.array([[[1.0]], [[1.0]]])
    mu, scale = product_of_experts(mus, scales, include_prior=True)
    np.testing.assert_allclose(np.asarray(mu), 4.0 / 3.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(scale), np.sqrt(1.0 / 3.0), rtol=1e-5)


def test_poe_no_prior():
    mus = jnp.array([[[2.0]], [[4.0]]])
    scales = jnp.array([[[1.0]], [[1.0]]])
    mu, scale = product_of_experts(mus, scales, include_prior=False)
    np.testing.assert_allclose(np.asarray(mu), 3.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(scale), np.sqrt(0.5), rtol=1e-5)


def test_poe_precision_weighting():
    # expert 1 has much smaller variance -> dominates the product mean
    mus = jnp.array([[[1.0]], [[10.0]]])
    scales = jnp.array([[[0.1]], [[10.0]]])
    mu, _ = poe_precision_fusion(mus, scales, prior_precision=0.0)
    assert abs(float(mu[0, 0]) - 1.0) < 0.01


def test_poe_matches_reference_formula():
    """Cross-check against the reference formula operating on logvars
    (mmvae_base.py:203-222), converted to our (mu, scale) convention."""
    rng = np.random.default_rng(3)
    mus = rng.normal(size=(3, 4, 5)).astype(np.float32)
    scales = rng.uniform(0.3, 2.0, size=(3, 4, 5)).astype(np.float32)
    var = scales ** 2
    T = 1.0 / (var + 1e-8)
    # with prior expert N(0, 1): precision += 1
    denom = T.sum(0) + 1.0
    want_mu = (mus * T).sum(0) / denom
    want_var = 1.0 / denom
    mu, scale = product_of_experts(jnp.array(mus), jnp.array(scales))
    np.testing.assert_allclose(np.asarray(mu), want_mu, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(scale) ** 2, want_var, rtol=1e-4)


def test_mixture_component_selection_uniform():
    # 2 components, batch 4 -> first 2 rows from comp 0, last 2 from comp 1
    mus = jnp.stack([jnp.full((4, 2), 0.0), jnp.full((4, 2), 1.0)])
    scales = jnp.ones((2, 4, 2))
    mu_sel, scale_sel = mixture_component_selection(mus, scales)
    np.testing.assert_array_equal(np.asarray(mu_sel[:2]), 0.0)
    np.testing.assert_array_equal(np.asarray(mu_sel[2:]), 1.0)
    assert mu_sel.shape == (4, 2)


def test_mixture_component_selection_remainder():
    # 3 components over batch 4: floor splits 1,1 then remainder to the last
    mus = jnp.stack([jnp.full((4, 1), float(i)) for i in range(3)])
    scales = jnp.ones((3, 4, 1))
    mu_sel, _ = mixture_component_selection(mus, scales)
    assert mu_sel.shape == (4, 1)
    np.testing.assert_array_equal(np.asarray(mu_sel[:, 0]), [0.0, 1.0, 2.0, 2.0])


def test_subset_lattice():
    assert subset_lattice(2) == [(0,), (1,), (0, 1)]
    assert len(subset_lattice(3)) == 7
    assert subset_lattice(2, forbidden=[(0, 1)]) == [(0,), (1,)]
