#!/usr/bin/env python
"""Same-session A/B of the flattened optimizer at the flagship bs24 point.

The round-5 bench left flagship bs24 MXU-cal at 14.1% against the >=15%
floor, attributing the residual to fixed per-step work — the amsgrad
update (the reference's own optimizer setting) plus elementwise
sampling/KL at a 0.43 ms step (docs/performance.md).  optim.make_optimizer
now wraps the elementwise optimizers in ``optax.flatten`` so the whole
update is one streaming fusion over a single contiguous buffer instead of
~69 per-leaf fusions (bitwise-identical update, tests/test_flat_opt.py).

This probe measures BOTH variants in one process on the same chip —
between-run deltas on the shared remote device are ~10% noise
(docs/performance.md), so only a same-session A/B is trustworthy.  Uses
bench.py's own scan-timed fetch-synced methodology and MXU FLOP counts.

    python benchmarks/flat_opt_ab.py          # writes flat_opt_ab.json
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: timing helpers)


def measure(flat: bool, batch_size: int, peaks: dict, rtt_s: float) -> dict:
    import jax
    import jax.numpy as jnp

    os.environ["MVC_FLAT_OPT"] = "1" if flat else "0"
    try:
        state, batch, rng, raw_step = bench._build(batch_size)
    finally:
        del os.environ["MVC_FLAT_OPT"]

    mxu = None
    try:
        from multimodal_vae_comparison_tpu.ops.flops import mxu_flops
        step = jax.jit(raw_step, donate_argnums=(0,))
        mxu = mxu_flops(step, state, batch, rng)["mxu_flops"]
    except Exception:
        pass

    n = bench.SCAN_STEPS

    def scan_steps_fn(state, batch, rng):
        def body(s, _):
            s, m = raw_step(s, batch, rng)
            return s, m["loss"]
        state, losses = jax.lax.scan(body, state, None, length=n)
        return state, jnp.sum(losses.astype(jnp.float32))

    scan_steps = jax.jit(scan_steps_fn, donate_argnums=(0,))
    state, total = scan_steps(state, batch, rng)   # compile + warmup
    float(total)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, total = scan_steps(state, batch, rng)
        float(total)
        times.append(max(time.perf_counter() - t0 - rtt_s, 1e-9))
    step_s = min(times) / n
    calibrated = peaks.get("calibrated_peak_flops")
    return {
        "variant": "flat" if flat else "per-leaf",
        "batch": batch_size,
        "samples_per_s_per_chip": round(batch_size / step_s, 2),
        "step_ms_scan": round(step_s * 1e3, 4),
        "mxu_flops_per_step": mxu,
        "mfu_mxu_calibrated": (round(mxu / step_s / calibrated, 4)
                               if (mxu and calibrated) else None),
        "repeats_step_ms": [round(t / n * 1e3, 4) for t in times],
    }


def main():
    import jax
    if not bench._wait_for_backend(float(os.environ.get("BENCH_WAIT_S", 1500))):
        print(json.dumps({"error": "accelerator backend unavailable"}))
        return
    from multimodal_vae_comparison_tpu.main import enable_compilation_cache
    enable_compilation_cache()
    rtt_s = bench.null_round_trip_s()
    calib = bench.calibrate_peak(rtt_s)
    peaks = {"calibrated_peak_flops": calib["calibrated_peak_flops"]}
    bs = int(os.environ.get("AB_BATCH", 24))
    rows = [measure(False, bs, peaks, rtt_s), measure(True, bs, peaks, rtt_s)]
    out = {
        "probe": "flat_opt_ab",
        "device_kind": getattr(jax.devices()[0], "device_kind", "unknown"),
        "null_round_trip_ms": round(rtt_s * 1e3, 2),
        "calibrated_peak_tflops": round(
            calib["calibrated_peak_flops"] / 1e12, 1),
        "rows": rows,
        "speedup_flat_over_perleaf": round(
            rows[0]["step_ms_scan"] / rows[1]["step_ms_scan"], 4),
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(__file__),
                           "flat_opt_ab.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
