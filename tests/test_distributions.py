"""Golden-value tests for distributions against scipy closed forms."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from multimodal_vae_comparison_tpu.models.distributions import (
    Laplace, Normal, OneHotCategorical, kl_divergence, log_mean_exp)


def test_normal_log_prob_matches_scipy():
    rng = np.random.default_rng(0)
    loc = rng.normal(size=(4, 3)).astype(np.float32)
    scale = rng.uniform(0.5, 2.0, size=(4, 3)).astype(np.float32)
    x = rng.normal(size=(4, 3)).astype(np.float32)
    got = Normal(jnp.array(loc), jnp.array(scale)).log_prob(jnp.array(x))
    want = scipy.stats.norm.logpdf(x, loc, scale)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_laplace_log_prob_matches_scipy():
    rng = np.random.default_rng(1)
    loc = rng.normal(size=(5,)).astype(np.float32)
    scale = rng.uniform(0.5, 2.0, size=(5,)).astype(np.float32)
    x = rng.normal(size=(5,)).astype(np.float32)
    got = Laplace(jnp.array(loc), jnp.array(scale)).log_prob(jnp.array(x))
    want = scipy.stats.laplace.logpdf(x, loc, scale)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_normal_kl_closed_form_vs_mc():
    d1 = Normal(jnp.array([0.3, -0.2]), jnp.array([1.2, 0.7]))
    d2 = Normal(jnp.zeros(2), jnp.ones(2))
    closed = d1.kl(d2)
    key = jax.random.PRNGKey(0)
    samples = d1.rsample(key, (200000,))
    mc = jnp.mean(d1.log_prob(samples) - d2.log_prob(samples), axis=0)
    np.testing.assert_allclose(np.asarray(closed), np.asarray(mc), atol=2e-2)


def test_laplace_kl_closed_form_vs_mc():
    d1 = Laplace(jnp.array([0.5]), jnp.array([1.5]))
    d2 = Laplace(jnp.array([0.0]), jnp.array([1.0]))
    closed = d1.kl(d2)
    samples = d1.rsample(jax.random.PRNGKey(1), (400000,))
    mc = jnp.mean(d1.log_prob(samples) - d2.log_prob(samples), axis=0)
    np.testing.assert_allclose(np.asarray(closed), np.asarray(mc), atol=2e-2)


def test_normal_rsample_moments():
    d = Normal(jnp.full((3,), 2.0), jnp.full((3,), 0.5))
    s = d.rsample(jax.random.PRNGKey(2), (100000,))
    np.testing.assert_allclose(np.asarray(s.mean(0)), 2.0, atol=2e-2)
    np.testing.assert_allclose(np.asarray(s.std(0)), 0.5, atol=2e-2)


def test_onehot_categorical_log_prob():
    logits = jnp.array([[0.0, 1.0, -1.0]])
    x = jnp.array([[0.0, 1.0, 0.0]])
    got = OneHotCategorical(logits).log_prob(x)
    want = jax.nn.log_softmax(logits, -1)[0, 1]
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want), rtol=1e-6)


def test_kl_divergence_dispatch():
    d1 = Normal(jnp.zeros(2), jnp.ones(2))
    d2 = Normal(jnp.ones(2), jnp.ones(2))
    np.testing.assert_allclose(np.asarray(kl_divergence(d1, d2)), 0.5, rtol=1e-6)
    # mixed families need a key
    l2 = Laplace(jnp.zeros(2), jnp.ones(2))
    with pytest.raises(ValueError):
        kl_divergence(d1, l2)
    mc = kl_divergence(d1, l2, key=jax.random.PRNGKey(0), n_mc=50000)
    assert np.all(np.asarray(mc) > 0)


def test_log_mean_exp():
    x = jnp.array([[0.0, 1.0], [2.0, 3.0]])
    got = log_mean_exp(x, axis=0)
    want = np.log(np.mean(np.exp(np.asarray(x)), axis=0))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
