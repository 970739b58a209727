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


def test_megatron_sharding_alternation():
    from multimodal_vae_comparison_tpu.parallel.tensor_sharding import (
        megatron_param_sharding)
    from jax.sharding import PartitionSpec as P
    mesh = make_mesh(8, axes=("data", "model"), shape=(4, 2))
    params = {"mlp": {"Dense_0": {"kernel": np.zeros((64, 128), np.float32),
                                  "bias": np.zeros((128,), np.float32)},
                      "Dense_1": {"kernel": np.zeros((128, 64), np.float32)}},
              "conv": {"kernel": np.zeros((3, 3, 32, 64), np.float32)},
              "tiny": {"kernel": np.zeros((4, 4), np.float32)}}
    sh = megatron_param_sharding(params, mesh, min_size=1024)
    assert sh["mlp"]["Dense_0"]["kernel"].spec == P(None, "model")  # column
    assert sh["mlp"]["Dense_1"]["kernel"].spec == P("model", None)  # row
    assert sh["mlp"]["Dense_0"]["bias"].spec == P()
    assert sh["conv"]["kernel"].spec == P(None, None, None, "model")
    assert sh["tiny"]["kernel"].spec == P()


def test_megatron_sharded_forward_matches_replicated():
    """A transformer trunk with megatron-sharded params must produce the
    same outputs as replicated execution (GSPMD inserts the collectives)."""
    from multimodal_vae_comparison_tpu.models.nets import ViT
    from multimodal_vae_comparison_tpu.parallel.tensor_sharding import (
        apply_param_sharding, megatron_param_sharding)
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(8, axes=("data", "model"), shape=(4, 2))
    model = ViT(patch=16, width=64, depth=2, heads=4, num_outputs=32)
    x = jax.random.uniform(jax.random.PRNGKey(0), (8, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(1), x)

    ref = jax.jit(model.apply)(params, x)

    sh = megatron_param_sharding(params, mesh, min_size=1024)
    n_sharded = sum(int(s.spec != P()) for s in jax.tree_util.tree_leaves(sh))
    assert n_sharded >= 4, "expected several sharded kernels in the trunk"
    p_sh = apply_param_sharding(jax.device_get(params), sh)
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data")))
    out = jax.jit(model.apply)(p_sh, x_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_per_device_program_shrinks_with_mesh():
    """Fixed global batch, growing data mesh: the per-device XLA program's
    FLOPs must shrink ~1/N (throughput-shape evidence, VERDICT r2 item 7).

    GSPMD partitions the module, so compiled cost_analysis reports the
    per-device work; at N=8 it must be well under half the N=1 program.
    """
    import optax
    from multimodal_vae_comparison_tpu.models import get_mixing
    from multimodal_vae_comparison_tpu.models.base import ModalitySpec
    from multimodal_vae_comparison_tpu.training.trainer import (
        TrainState, make_train_step)

    specs = (ModalitySpec(name="mod_1", encoder="FNN", decoder="FNN",
                          feature_dims=(32,), recon_loss="mse"),
             ModalitySpec(name="mod_2", encoder="FNN", decoder="FNN",
                          feature_dims=(8,), recon_loss="mse"))
    model = get_mixing("poe")(specs=specs, n_latents=4)
    batch = {"mod_1": {"data": np.ones((64, 32), np.float32), "masks": None},
             "mod_2": {"data": np.ones((64, 8), np.float32), "masks": None}}
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "sample": rng}, batch,
                        method=model.objective)
    tx = optax.sgd(0.1)

    def per_device_flops(n):
        mesh = make_mesh(n)
        p = shard_params(jax.tree_util.tree_map(jnp.array, params), mesh)
        b = shard_batch(batch, mesh)
        state = TrainState(params=p, opt_state=tx.init(p),
                           step=jnp.zeros((), jnp.int32))
        step = make_train_step(model, tx)
        ca = step.lower(state, b, rng).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])

    f1 = per_device_flops(1)
    f8 = per_device_flops(8)
    assert f8 < f1 / 2, (f1, f8)


def test_grad_accum_sharded_program_shrinks_and_matches():
    """grad_accum under a data mesh: the microbatch chunking must stay
    sharded (the round-4 decode-fold bug was exactly a GSPMD-hostile
    reshape silently replicating work per device), so the per-device
    program FLOPs must still shrink ~1/N and the update must match the
    single-device grad_accum step."""
    import optax
    from multimodal_vae_comparison_tpu.models import get_mixing
    from multimodal_vae_comparison_tpu.models.base import ModalitySpec
    from multimodal_vae_comparison_tpu.training.trainer import (
        TrainState, make_train_step)

    specs = (ModalitySpec(name="mod_1", encoder="FNN", decoder="FNN",
                          feature_dims=(32,), recon_loss="mse"),
             ModalitySpec(name="mod_2", encoder="FNN", decoder="FNN",
                          feature_dims=(8,), recon_loss="mse"))
    model = get_mixing("poe")(specs=specs, n_latents=4)
    rng_d = np.random.default_rng(0)
    batch = {"mod_1": {"data": rng_d.random((64, 32)).astype(np.float32),
                       "masks": None},
             "mod_2": {"data": rng_d.random((64, 8)).astype(np.float32),
                       "masks": None}}
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "sample": rng}, batch,
                        method=model.objective)
    tx = optax.sgd(0.1)

    def run(n):
        mesh = make_mesh(n)
        p = shard_params(jax.tree_util.tree_map(jnp.array, params), mesh)
        b = shard_batch(batch, mesh)
        state = TrainState(params=p, opt_state=tx.init(p),
                           step=jnp.zeros((), jnp.int32))
        step = make_train_step(model, tx, grad_accum=4)
        lowered = step.lower(state, b, rng).compile()
        ca = lowered.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        state, metrics = step(state, b, rng)
        return (float(ca["flops"]), jax.device_get(state.params),
                float(metrics["loss"]))

    f1, p1, loss1 = run(1)
    f8, p8, loss8 = run(8)
    assert f8 < f1 / 2, (f1, f8)
    np.testing.assert_allclose(loss8, loss1, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p8),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
