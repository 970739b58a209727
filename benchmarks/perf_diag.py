#!/usr/bin/env python
"""Single-chip perf diagnosis: where does the train-step time go, and why
does throughput regress past bs=256? (VERDICT r3 item 2.)

Methodology matches bench.py (the round-3 rewrite): every timing is a
single `lax.scan` dispatch over N sequential iterations returning a scalar
that depends on all the work, timed to the host-side `float()` fetch (the
only real sync on this remote-tunnel platform), minus a measured null
round trip.  Every scan body consumes the carry (a scalar folded into its
inputs at ~1e-20 relative magnitude), so XLA can neither hoist the
loop-invariant body out of the scan nor run iterations in parallel.

Component programs per batch size:
  full        — the real train step (fwd + bwd + amsgrad update), carried
                state (identical to bench.py's headline scan)
  fwd         — objective only, no gradients
  decode_bwd  — decoders only: grad of summed recon log-prob wrt decoder
                params from a FIXED z (encoder + fusion excluded)
  encode_bwd  — encoders only: grad of a scalar of the posterior params
  opt         — optimizer update only from fixed grads

Prints one JSON line per (component, batch) as it is measured (so a
timeout still leaves data), then writes the collected rows to DIAG_OUT.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCAN = int(os.environ.get("DIAG_SCAN_STEPS", 100))
BATCHES = [int(b) for b in
           os.environ.get("DIAG_BATCHES", "24,256,1024,4096").split(",")]
COMPONENTS = os.environ.get(
    "DIAG_COMPONENTS", "full,fwd,decode_bwd,encode_bwd,opt").split(",")
SEQ = 45
LATENTS = 16


def scan_time(make_body, init_carry, rtt_s):
    """Seconds per iteration of a `lax.scan` whose body is make_body —
    body(carry) -> new scalar carry that depends on all the work."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(c0):
        def body(c, _):
            return make_body(c), ()
        c, _ = jax.lax.scan(body, c0, None, length=SCAN)
        return c

    float(run(init_carry))                # compile + warmup (fetch-synced)
    t0 = time.perf_counter()
    float(run(init_carry))
    return max(time.perf_counter() - t0 - rtt_s, 1e-9) / SCAN


def main():
    import jax
    import jax.numpy as jnp
    import optax

    sys.path.insert(0, "/root/repo")
    from multimodal_vae_comparison_tpu.main import enable_compilation_cache
    enable_compilation_cache()
    import bench as B

    rtt_s = B.null_round_trip_s()
    print(json.dumps({"null_rtt_ms": round(rtt_s * 1e3, 2),
                      "device": str(jax.devices()[0].device_kind)}),
          flush=True)

    rows = []
    for bs in BATCHES:
        state, batch, rng, raw_step = B._build(bs)

        import __graft_entry__ as ge
        model = ge._flagship(n_latents=LATENTS, seq_len=SEQ)
        model = type(model)(specs=model.specs, n_latents=model.n_latents,
                            obj=model.obj, beta=model.beta, K=model.K,
                            dtype=B._compute_dtype(), remat=model.remat)
        params = state.params
        cdtype = B._compute_dtype()

        def measure(name, fn):
            try:
                s = fn()
                row = {"component": name, "batch": bs,
                       "step_ms": round(s * 1e3, 3),
                       "samples_per_s": round(bs / s, 1)}
            except Exception as e:
                row = {"component": name, "batch": bs,
                       "error": f"{type(e).__name__}: {str(e)[:200]}"}
            rows.append(row)
            print(json.dumps(row), flush=True)

        if "full" in COMPONENTS:
            # identical to bench.py's headline scan: state is the carry
            def full_time():
                def scan_fn(state, batch, rng):
                    def body(s, _):
                        s, m = raw_step(s, batch, rng)
                        return s, m["loss"]
                    st, losses = jax.lax.scan(body, state, None, length=SCAN)
                    return st, jnp.sum(losses.astype(jnp.float32))
                jitted = jax.jit(scan_fn, donate_argnums=(0,))
                st, total = jitted(state, batch, rng)
                float(total)
                t0 = time.perf_counter()
                st, total = jitted(st, batch, rng)
                float(total)
                return max(time.perf_counter() - t0 - rtt_s, 1e-9) / SCAN
            measure("full", full_time)
            # state was donated twice; rebuild for later components
            state, batch, rng, raw_step = B._build(bs)
            params = state.params

        if "fwd" in COMPONENTS:
            def fwd_body(c):
                # carry folds into the rng stream: sequential dependence
                key = jax.random.fold_in(rng, c.astype(jnp.int32) & 0xffff)
                loss, _ = model.apply(params, batch, method=model.objective,
                                      rngs={"sample": key})
                return c + loss.astype(jnp.float32) * 1e-20
            measure("fwd", lambda: scan_time(fwd_body, jnp.zeros(()), rtt_s))

        z0 = jax.random.normal(rng, (1, bs, LATENTS), cdtype)

        if "decode_bwd" in COMPONENTS:
            def dec_loss(params, z):
                tot = jnp.zeros(())
                for spec in model.specs:
                    dist = model.apply(params, spec.name, z,
                                       method=model.decode_mod)
                    tot = tot + jnp.sum(model.apply(
                        params, spec, dist, batch, method=model.recon_lpx))
                return tot.astype(jnp.float32)
            dec_grad = jax.grad(dec_loss)

            def dec_body(c):
                z = z0 + (c * 1e-20).astype(cdtype)
                grads = dec_grad(params, z)
                return c + sum(jnp.sum(x).astype(jnp.float32)
                               for x in jax.tree_util.tree_leaves(grads)) * 1e-20
            measure("decode_bwd",
                    lambda: scan_time(dec_body, jnp.zeros(()), rtt_s))

        if "encode_bwd" in COMPONENTS:
            def enc_loss(params, batch_):
                qz = model.apply(params, batch_, model.mod_names,
                                 method=model.encode)
                return sum(jnp.sum(v["shared"][0]).astype(jnp.float32)
                           + jnp.sum(v["shared"][1]).astype(jnp.float32)
                           for v in qz.values())
            enc_grad = jax.grad(enc_loss)

            def enc_body(c):
                b2 = jax.tree_util.tree_map(
                    lambda x: x + (c * 1e-20).astype(x.dtype)
                    if x is not None else None, batch)
                grads = enc_grad(params, b2)
                return c + sum(jnp.sum(x).astype(jnp.float32)
                               for x in jax.tree_util.tree_leaves(grads)) * 1e-20
            measure("encode_bwd",
                    lambda: scan_time(enc_body, jnp.zeros(()), rtt_s))

        if "opt" in COMPONENTS:
            from multimodal_vae_comparison_tpu.training.optim import (
                make_optimizer)
            tx = make_optimizer("adam", 1e-4)  # trainer path (MVC_FLAT_OPT=1 opts into flat)
            opt_state0 = tx.init(params)
            grads0 = jax.tree_util.tree_map(jnp.ones_like, params)

            def opt_body(c):
                g2 = jax.tree_util.tree_map(lambda g: g + c * 1e-20, grads0)
                updates, _ = tx.update(g2, opt_state0, params)
                return c + sum(jnp.sum(u).astype(jnp.float32)
                               for u in jax.tree_util.tree_leaves(updates)) * 1e-20
            measure("opt", lambda: scan_time(opt_body, jnp.zeros(()), rtt_s))

    out = os.environ.get("DIAG_OUT", "/tmp/perf_diag.json")
    with open(out, "w") as f:
        json.dump({"scan": SCAN, "rows": rows}, f, indent=1)
    print(json.dumps({"written": out, "n_rows": len(rows)}), flush=True)


if __name__ == "__main__":
    main()
