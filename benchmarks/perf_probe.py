#!/usr/bin/env python
"""Single-chip perf dissection of the flagship train step (VERDICT r3 item 2).

Two measured defects to explain: 7.3% MXU at bs=24 and samples/s FALLING
from bs=256 to bs=4096 (95,890 -> 76,971, BENCH_r03).  This probe times the
step's components separately — encoder fwd, decoder fwd, recon log-prob,
full fwd, full fwd+bwd+optimizer — at several batch sizes, with the same
fetch-synced lax.scan methodology as bench.py (block_until_ready does not
reliably sync on this remote platform), and emits one JSON blob for
docs/performance.md.

    python benchmarks/perf_probe.py            # real TPU
    BENCH_BATCHES=24,256 python benchmarks/perf_probe.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCHES = [int(b) for b in
           os.environ.get("BENCH_BATCHES", "24,256,1024,4096").split(",")]
SCAN = int(os.environ.get("BENCH_SCAN_STEPS", 100))


def main():
    import jax
    import jax.numpy as jnp

    import bench
    import __graft_entry__ as ge
    from bench import null_round_trip_s

    rtt = null_round_trip_s()
    rows = []
    for bs in BATCHES:
        state, batch, rng, raw_step = bench._build(bs)
        model_dtype = bench._compute_dtype()
        model = ge._flagship(n_latents=bench.LATENTS, seq_len=bench.SEQ)
        model = type(model)(specs=model.specs, n_latents=model.n_latents,
                            obj=model.obj, beta=model.beta, K=model.K,
                            dtype=model_dtype)
        params = state.params

        def timed(fn, *args):
            """Seconds per iteration of fn inside one SCAN-length scan."""
            def scan_fn(*a):
                def body(c, _):
                    out = fn(*a)
                    # fold everything into one scalar the fetch must wait on
                    s = sum(jnp.sum(x.astype(jnp.float32))
                            for x in jax.tree_util.tree_leaves(out)
                            if hasattr(x, "astype"))
                    return c + s * 1e-30, ()
                c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=SCAN)
                return c
            f = jax.jit(scan_fn)
            float(f(*args))          # compile + warmup
            t0 = time.perf_counter()
            float(f(*args))
            return max(time.perf_counter() - t0 - rtt, 1e-9) / SCAN

        # components (single full-present forward pieces)
        def enc_fwd(params, batch):
            return model.apply(params, batch, model.mod_names,
                               method=lambda m, b, p: m.encode(b, p))

        z = jnp.zeros((1, bs, bench.LATENTS), model_dtype)

        def dec_img(params, z):
            return model.apply(params, "mod_1", z,
                               method=lambda m, n, zz: m.decode_mod(n, zz).mean)

        def dec_txt(params, z, batch):
            return model.apply(
                params, "mod_2", z, batch["mod_2"]["masks"],
                method=lambda m, n, zz, mk: m.decode_mod(n, zz, mk).mean)

        def recon_only(params, batch, z):
            def f(m, b, zz):
                out = []
                for spec in m.specs:
                    dist = m.decode_mod(spec.name, zz,
                                        b[spec.name].get("masks"))
                    out.append(m.recon_lpx(spec, dist, b))
                return sum(jnp.sum(o) for o in out)
            return model.apply(params, batch, z, method=f)

        def fwd_loss(params, batch):
            loss, _ = model.apply(params, batch,
                                  rngs={"sample": jax.random.PRNGKey(1)},
                                  method=model.objective)
            return loss

        def full_step(state, batch, rng):
            s, m = raw_step(state, batch, rng)
            return m["loss"]

        row = {"batch": bs}
        try:
            row["enc_fwd_ms"] = timed(enc_fwd, params, batch) * 1e3
            row["dec_img_fwd_ms"] = timed(dec_img, params, z) * 1e3
            row["dec_txt_fwd_ms"] = timed(dec_txt, params, z, batch) * 1e3
            row["decode_recon_ms"] = timed(recon_only, params, batch, z) * 1e3
            row["objective_fwd_ms"] = timed(fwd_loss, params, batch) * 1e3
            row["train_step_ms"] = timed(full_step, state, batch, rng) * 1e3
            row["samples_per_s"] = round(bs / (row["train_step_ms"] / 1e3), 1)
        except Exception as e:
            row["error"] = f"{type(e).__name__}: {e}"
        rows.append(row)
        print(json.dumps(row), flush=True)
    out = {"scan_steps": SCAN, "null_rtt_ms": rtt * 1e3, "rows": rows,
           "note": ("objective_fwd covers all 3 PoE subsets (3x decode); "
                    "components are single-subset pieces, so 3*components "
                    "~ objective is expected")}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "perf_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
