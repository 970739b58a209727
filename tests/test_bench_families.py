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
    "videogpt_sparseattn_T2048_moe_dreg_k5_bs8",
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


def test_family_oom_fallback_halves_batch(monkeypatch):
    """bench_family must retry at half batch on RESOURCE_EXHAUSTED instead
    of shipping a crash row (BENCH_r04's videogpt family)."""
    calls = []

    def builder(bs=16):
        calls.append(bs)
        if bs > 4:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")
        return bench._family_workloads()["moe_dreg_k10_cdsprites_bs24"](bs=bs)

    monkeypatch.setenv("BENCH_FAMILY_SCAN_STEPS", "2")
    row = bench.bench_family("fake", builder, rtt_s=0.0,
                             peaks={"calibrated_peak_flops": None})
    assert calls == [16, 8, 4]
    assert row["batch"] == 4
    assert row["batch_fallback_from"] == 16
