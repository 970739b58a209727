"""Multi-device sharding tests on the virtual 8-CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_vae_comparison_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicated, shard_batch, shard_params)
from multimodal_vae_comparison_tpu.parallel.tensor_sharding import (
    apply_param_sharding, infer_param_sharding)


def test_make_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8,)
    mesh2 = make_mesh(8, axes=("data", "model"), shape=(4, 2))
    assert mesh2.devices.shape == (4, 2)
    assert mesh2.axis_names == ("data", "model")


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh(8)
    batch = {"mod_1": {"data": np.ones((16, 4), np.float32), "masks": None}}
    sharded = shard_batch(batch, mesh)
    x = sharded["mod_1"]["data"]
    assert len(x.sharding.device_set) == 8
    assert sharded["mod_1"]["masks"] is None


def test_sharded_train_step_matches_single_device():
    """The data-parallel gradient (psum from shardings) must equal the
    single-device gradient on the same global batch."""
    import optax
    from multimodal_vae_comparison_tpu.models import get_mixing
    from multimodal_vae_comparison_tpu.models.base import ModalitySpec
    from multimodal_vae_comparison_tpu.training.trainer import (
        TrainState, make_train_step)

    specs = (ModalitySpec(name="mod_1", encoder="FNN", decoder="FNN",
                          feature_dims=(10,), recon_loss="mse"),
             ModalitySpec(name="mod_2", encoder="FNN", decoder="FNN",
                          feature_dims=(6,), recon_loss="mse"))
    model = get_mixing("poe")(specs=specs, n_latents=4)
    batch = {"mod_1": {"data": jnp.arange(160, dtype=jnp.float32).reshape(16, 10) / 160,
                       "masks": None},
             "mod_2": {"data": jnp.ones((16, 6)), "masks": None}}
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "sample": rng}, batch,
                        method=model.objective)
    tx = optax.sgd(0.1)

    def run(mesh):
        # copy before placing: the train step donates (deletes) its input
        # buffers, and single-device device_put aliases instead of copying
        p = shard_params(jax.tree_util.tree_map(jnp.array, params), mesh)
        b = shard_batch(batch, mesh)
        state = TrainState(params=p, opt_state=tx.init(p),
                           step=jnp.zeros((), jnp.int32))
        step = make_train_step(model, tx)
        state, metrics = step(state, b, rng)
        return jax.device_get(state.params), float(metrics["loss"])

    p8, loss8 = run(make_mesh(8))
    p1, loss1 = run(make_mesh(1))
    np.testing.assert_allclose(loss8, loss1, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p8),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_tensor_sharding_specs():
    mesh = make_mesh(8, axes=("data", "model"), shape=(4, 2))
    params = {"big": np.zeros((64, 64), np.float32),
              "small": np.zeros((4,), np.float32),
              "odd": np.zeros((64, 63), np.float32)}
    shardings = infer_param_sharding(params, mesh, min_size=1024)
    sharded = apply_param_sharding(params, shardings)
    from jax.sharding import PartitionSpec as P
    assert shardings["big"].spec == P(None, "model")
    assert shardings["small"].spec == P()
    assert shardings["odd"].spec == P()  # 63 not divisible by 2
    assert sharded["big"].sharding.spec == P(None, "model")


def test_graft_entry_single_and_multichip():
    import __graft_entry__ as ge
    fn, (params, batch) = ge.entry()
    loss = jax.jit(fn)(params, batch)
    assert np.isfinite(float(loss))
    ge.dryrun_multichip(8)
    ge.dryrun_multichip(2)
