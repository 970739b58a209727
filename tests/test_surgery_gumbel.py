"""Latent-growth parameter surgery + gumbel-softmax objective path."""
import jax
import jax.numpy as jnp
import numpy as np

from multimodal_vae_comparison_tpu.models.base import ModalitySpec
from multimodal_vae_comparison_tpu.models.mmvae import UnimodalVAE
from multimodal_vae_comparison_tpu.training.surgery import grow_latents


def test_grow_latents_preserves_old_function():
    spec = (ModalitySpec(name="mod_1", encoder="FNN", decoder="FNN",
                         feature_dims=(10,), recon_loss="mse"),)
    model = UnimodalVAE(specs=spec, n_latents=4)
    batch = {"mod_1": {"data": jnp.ones((3, 10)), "masks": None}}
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    params = model.init(rngs, batch, method=model.objective)
    loss_old, _ = model.apply(params, batch,
                              rngs={"sample": jax.random.PRNGKey(2)},
                              method=model.objective)

    new_model, new_params = grow_latents(params, model, 6)
    assert new_model.n_latents == 6
    loss_new, _ = new_model.apply(new_params, batch,
                                  rngs={"sample": jax.random.PRNGKey(2)},
                                  method=new_model.objective)
    assert np.isfinite(float(loss_new))
    # new dims are near-zero-influence: losses stay in the same ballpark
    assert abs(float(loss_new) - float(loss_old)) / abs(float(loss_old)) < 0.5

    # growth must also be trainable
    g = jax.grad(lambda p: new_model.apply(
        p, batch, rngs={"sample": jax.random.PRNGKey(3)},
        method=new_model.objective)[0])(new_params)
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree_util.tree_leaves(g))


def test_grow_latents_rejects_shrink():
    spec = (ModalitySpec(name="mod_1", encoder="FNN", decoder="FNN",
                         feature_dims=(10,)),)
    model = UnimodalVAE(specs=spec, n_latents=4)
    try:
        grow_latents({}, model, 2)
        raise RuntimeError("should have raised")
    except AssertionError:
        pass


def test_gumbel_objective_trains():
    # 12 latents over 4-category groups; data is one-hot-ish (B, 6, 4)
    spec = (ModalitySpec(name="mod_1", encoder="FNN", decoder="FNN",
                         feature_dims=(6, 4), recon_loss="bce",
                         prior="gumbel"),)
    model = UnimodalVAE(specs=spec, n_latents=12, obj="elbo_gumbel")
    data = jax.nn.one_hot(jax.random.randint(jax.random.PRNGKey(0),
                                             (5, 6), 0, 4), 4)
    batch = {"mod_1": {"data": data, "masks": None}}
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    params = model.init(rngs, batch, method=model.objective)
    loss, metrics = model.apply(params, batch,
                                rngs={"sample": jax.random.PRNGKey(2)},
                                method=model.objective)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: model.apply(
        p, batch, rngs={"sample": jax.random.PRNGKey(3)},
        method=model.objective)[0])(params)
    total = sum(float(jnp.abs(x).sum())
                for x in jax.tree_util.tree_leaves(g))
    assert total > 0


def test_grow_latents_hidden_dim_equal_to_latents():
    """Regression: a hidden Dense whose width equals n_latents must NOT get
    its input axis padded — only the first (z-consuming) kernel per decoder
    changes shape."""
    spec = (ModalitySpec(name="mod_1", encoder="FNN", decoder="FNN",
                         feature_dims=(10,), recon_loss="mse"),)
    model = UnimodalVAE(specs=spec, n_latents=128)  # == Dec_FNN hidden_dim
    batch = {"mod_1": {"data": jnp.ones((2, 10)), "masks": None}}
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    params = model.init(rngs, batch, method=model.objective)
    new_model, new_params = grow_latents(params, model, 130)
    loss, _ = new_model.apply(new_params, batch,
                              rngs={"sample": jax.random.PRNGKey(2)},
                              method=new_model.objective)
    assert np.isfinite(float(loss))


def test_grow_latents_keeps_remat():
    spec = (ModalitySpec(name="mod_1", encoder="FNN", decoder="FNN",
                         feature_dims=(10,), recon_loss="mse"),)
    model = UnimodalVAE(specs=spec, n_latents=4, remat=True)
    batch = {"mod_1": {"data": jnp.ones((2, 10)), "masks": None}}
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    params = model.init(rngs, batch, method=model.objective)
    new_model, _ = grow_latents(params, model, 6)
    assert new_model.remat is True
