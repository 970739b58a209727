#!/usr/bin/env python
"""XLA cost analysis for the perf_diag component programs (VERDICT r3 item 2).

For each (component, batch) program measured by perf_diag.py, compile the
IDENTICAL scan program (persistent-cache hit) and read the compiler's cost
analysis: total FLOPs, bytes accessed, transcendentals.  Combined with the
measured step times this classifies each regime:

    achieved_tflops = flops / time          vs calibrated MXU peak (~190e12)
    achieved_gbps   = bytes  / time         vs HBM peak (v5e: 819e9)

If achieved_gbps saturates past bs=256 while achieved_tflops stays low, the
regression is HBM-bandwidth-bound and the fix is fewer bytes (dtype, fusion,
remat); if neither saturates, it's scheduling/padding.

    python benchmarks/perf_cost.py            # TPU, all components/batches
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCAN = int(os.environ.get("DIAG_SCAN_STEPS", 100))        # perf_diag programs
SCAN_FULL = int(os.environ.get("BENCH_SCAN_STEPS", 300))  # bench.py programs
BATCHES = [int(b) for b in
           os.environ.get("DIAG_BATCHES", "24,256,1024,4096").split(",")]
SEQ = 45
LATENTS = 16
HBM_PEAK = 819e9          # v5e HBM bandwidth, bytes/s
MXU_PEAK = 190e12         # calibrated bf16 matmul peak (bench.py round 3)


def _cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return {"flops": float(ca.get("flops", -1)),
            "bytes": float(ca.get("bytes accessed", -1)),
            "transcendentals": float(ca.get("transcendentals", -1))}


def main():
    import jax
    import jax.numpy as jnp

    from multimodal_vae_comparison_tpu.main import enable_compilation_cache
    enable_compilation_cache()
    import bench as B

    # measured step times (ms): perf_diag rows for the component programs,
    # the bench curve (same 300-step scan program) for the full step
    measured = {}
    diag_path = os.environ.get("DIAG_JSON", "/tmp/perf_diag.json")
    if os.path.exists(diag_path):
        for r in json.load(open(diag_path))["rows"]:
            if "step_ms" in r:
                measured[(r["component"], r["batch"])] = r["step_ms"]
    bench_path = os.environ.get("BENCH_JSON", "")
    if bench_path and os.path.exists(bench_path):
        bj = json.load(open(bench_path))
        for r in (bj.get("curve") or bj.get("value_detail", {}).get("curve")
                  or []):
            if "step_ms_scan" in r:
                measured[("full", r["batch"])] = r["step_ms_scan"]

    rows = []
    for bs in BATCHES:
        state, batch, rng, raw_step = B._build(bs)

        import __graft_entry__ as ge
        model = ge._flagship(n_latents=LATENTS, seq_len=SEQ)
        model = type(model)(specs=model.specs, n_latents=model.n_latents,
                            obj=model.obj, beta=model.beta, K=model.K,
                            dtype=B._compute_dtype(), remat=model.remat)
        params = state.params

        def emit(name, compiled, scan_len=SCAN):
            c = _cost(compiled)
            ms = measured.get((name, bs))
            row = {"component": name, "batch": bs,
                   "flops_per_step": c["flops"] / scan_len,
                   "bytes_per_step": c["bytes"] / scan_len,
                   "transc_per_step": c["transcendentals"] / scan_len}
            if ms:
                s = ms / 1e3
                row["step_ms"] = ms
                row["achieved_tflops"] = round(row["flops_per_step"] / s / 1e12, 2)
                row["achieved_gbps"] = round(row["bytes_per_step"] / s / 1e9, 1)
                row["pct_hbm_peak"] = round(100 * row["bytes_per_step"] / s
                                            / HBM_PEAK, 1)
                row["pct_mxu_peak"] = round(100 * row["flops_per_step"] / s
                                            / MXU_PEAK, 1)
            rows.append(row)
            print(json.dumps(row), flush=True)

        # --- full train step (bench.py's headline scan program, same
        # length => persistent-cache hit from the bench run) ---
        def scan_fn(state, batch, rng):
            def body(s, _):
                s, m = raw_step(s, batch, rng)
                return s, m["loss"]
            st, losses = jax.lax.scan(body, state, None, length=SCAN_FULL)
            return st, jnp.sum(losses.astype(jnp.float32))
        emit("full", jax.jit(scan_fn, donate_argnums=(0,))
             .lower(state, batch, rng).compile(), scan_len=SCAN_FULL)

        # --- fwd objective (perf_diag's fwd program) ---
        def fwd_body(c):
            key = jax.random.fold_in(rng, c.astype(jnp.int32) & 0xffff)
            loss, _ = model.apply(params, batch, method=model.objective,
                                  rngs={"sample": key})
            return c + loss.astype(jnp.float32) * 1e-20

        def fwd_scan(c0):
            def body(c, _):
                return fwd_body(c), ()
            c, _ = jax.lax.scan(body, c0, None, length=SCAN)
            return c
        emit("fwd", jax.jit(fwd_scan).lower(jnp.zeros(())).compile())

    out = os.environ.get("COST_OUT", "/tmp/perf_cost.json")
    with open(out, "w") as f:
        json.dump({"scan": SCAN, "rows": rows}, f, indent=1)
    print(json.dumps({"written": out, "n_rows": len(rows)}), flush=True)


if __name__ == "__main__":
    main()
