"""bench.py model-zoo family workloads trace correctly (VERDICT r3 item 6).

The real measurements run on the TPU at round end; here we pin that every
family builder assembles and its full train step TRACES (jax.eval_shape —
no FLOPs spent), so the bench cannot die on a shape bug at driver time.
"""
import jax
import jax.numpy as jnp
import pytest

import bench


@pytest.mark.parametrize("name", [
    "moe_dreg_k10_cdsprites_bs24",
    "mopoe_polymnist_5mod_bs128",
    "videogpt_sprites_moe_dreg_k5_bs16",
])
def test_family_traces(name):
    import optax
    from multimodal_vae_comparison_tpu.training.trainer import (
        TrainState, make_train_step)

    builder = bench._family_workloads()[name]
    model, batch = builder(bs=2)
    rng = jax.random.PRNGKey(0)
    params = jax.eval_shape(
        lambda b: model.init({"params": rng, "sample": rng}, b,
                             method=model.objective), batch)
    tx = optax.amsgrad(1e-4)
    opt_state = jax.eval_shape(tx.init, params)
    state = TrainState(params=params, opt_state=opt_state,
                       step=jax.ShapeDtypeStruct((), jnp.int32))
    raw_step = make_train_step(model, tx, jit=False)
    out_state, metrics = jax.eval_shape(raw_step, state, batch, rng)
    assert metrics["loss"].shape == ()
