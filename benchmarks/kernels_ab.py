#!/usr/bin/env python
"""A/B microbenchmark: Pallas kernels vs the fused-XLA (jnp) equivalents.

Round-2 review asked for measured evidence that the Pallas kernels matter
(VERDICT item 5): this script times each kernel against its jnp reference on
the real device, at the training shapes the framework actually uses, and
prints a JSON table.  docs/performance.md carries the resulting numbers and
the dispatch defaults are set from them (ops/pallas/attention._DEFAULT_ON,
poe/kl/sample dispatch in their _impl functions).

All timings: N iterations inside one ``lax.scan`` dispatch (chained carries,
blocked on the result) — same airtight methodology as bench.py.

Shapes:
* PoE fusion: (E=2..3 experts, B=24/1024, D=16) fwd+bwd — MVAE training.
* KL reduction: (B, D) fwd+bwd.
* K-sample reparameterization: (K=10, B, D).
* Masked attention: text shapes T=45 (CdSprites+) / T=246 (CUB) and the
  VideoGPT axial-attention shape (B*16*16 rows of T=8 frames), fwd+bwd.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ITERS = int(os.environ.get("AB_ITERS", 1000))

_RTT = None


def _null_rtt() -> float:
    """Median dispatch+fetch time of a trivial program (same as bench.py):
    subtracted so microsecond-scale kernels aren't swamped by the ~33 ms
    remote-tunnel round trip."""
    global _RTT
    if _RTT is not None:
        return _RTT

    @jax.jit
    def nul(x):
        return jnp.sum(x) * 0.0 + 1.0

    x = jnp.zeros((8,))
    float(nul(x))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(nul(x))
        times.append(time.perf_counter() - t0)
    times.sort()
    _RTT = times[len(times) // 2]
    return _RTT


def time_scan(fn, *args) -> float:
    """Seconds per iteration: ITERS chained evaluations in one dispatch."""

    @jax.jit
    def run(*args):
        def body(carry, _):
            # perturb the first input by the carry so every iteration is
            # data-dependent on the previous one — without this the body is
            # loop-invariant and XLA may hoist it out of the scan entirely
            a0 = args[0] + (carry * 1e-30).astype(args[0].dtype)
            out = fn(a0, *args[1:])
            leaves = [jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree_util.tree_leaves(out)]
            return carry + sum(leaves) * 1e-20, ()
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=ITERS)
        return c

    # fetch, not block_until_ready: the latter does not reliably wait on
    # the axon remote platform (see bench.py methodology notes)
    rtt = _null_rtt()
    float(run(*args))                       # compile + warmup
    t0 = time.perf_counter()
    float(run(*args))
    return max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS


def grad_of(fn, argnums):
    def loss(*args):
        out = fn(*args)
        return sum(jnp.sum(l.astype(jnp.float32) ** 2)
                   for l in jax.tree_util.tree_leaves(out))
    return jax.grad(loss, argnums=argnums)


def bench_poe(results):
    from multimodal_vae_comparison_tpu.ops.pallas import poe_kernel

    for E, B, D in ((2, 24, 16), (3, 24, 16), (2, 1024, 16), (3, 4096, 24)):
        k = jax.random.PRNGKey(0)
        mus = jax.random.normal(k, (E, B, D))
        scales = jax.random.uniform(k, (E, B, D), minval=0.1, maxval=1.0)
        pallas_fn = functools.partial(poe_kernel.poe_fused,
                                      prior_precision=1.0)
        jnp_fn = functools.partial(poe_kernel._poe_reference,
                                   prior_precision=1.0)
        row = {"shape": f"E{E}xB{B}xD{D}"}
        row["fwd_pallas_us"] = round(time_scan(pallas_fn, mus, scales) * 1e6, 1)
        row["fwd_jnp_us"] = round(time_scan(jnp_fn, mus, scales) * 1e6, 1)
        row["bwd_pallas_us"] = round(
            time_scan(grad_of(pallas_fn, (0, 1)), mus, scales) * 1e6, 1)
        row["bwd_jnp_us"] = round(
            time_scan(grad_of(jnp_fn, (0, 1)), mus, scales) * 1e6, 1)
        results.setdefault("poe", []).append(row)


def bench_kl(results):
    from multimodal_vae_comparison_tpu.ops.pallas import kl_kernel

    for B, D in ((24, 16), (1024, 16), (4096, 24)):
        k = jax.random.PRNGKey(0)
        mu = jax.random.normal(k, (B, D))
        scale = jax.random.uniform(k, (B, D), minval=0.1, maxval=1.0)
        row = {"shape": f"B{B}xD{D}"}
        row["fwd_pallas_us"] = round(
            time_scan(kl_kernel.kl_normal_std_fused, mu, scale) * 1e6, 1)
        row["fwd_jnp_us"] = round(
            time_scan(kl_kernel._kl_reference, mu, scale) * 1e6, 1)
        row["bwd_pallas_us"] = round(time_scan(
            grad_of(kl_kernel.kl_normal_std_fused, (0, 1)), mu, scale) * 1e6, 1)
        row["bwd_jnp_us"] = round(time_scan(
            grad_of(kl_kernel._kl_reference, (0, 1)), mu, scale) * 1e6, 1)
        results.setdefault("kl", []).append(row)


def bench_sample(results):
    from multimodal_vae_comparison_tpu.ops.pallas import sample_kernel

    def jnp_sample(mu, scale, seed):
        key = jax.random.wrap_key_data(
            jnp.asarray([0, seed], jnp.uint32), impl="threefry2x32")
        return mu + scale * jax.random.normal(key, mu.shape, jnp.float32)

    for K, B, D in ((1, 1024, 16), (10, 24, 16), (10, 1024, 16)):
        k = jax.random.PRNGKey(0)
        mu = jax.random.normal(k, (K, B, D))
        scale = jax.random.uniform(k, (K, B, D), minval=0.1, maxval=1.0)
        seed = jnp.uint32(7)
        row = {"shape": f"K{K}xB{B}xD{D}"}
        row["fwd_pallas_us"] = round(
            time_scan(sample_kernel.sample_normal_fused, mu, scale, seed) * 1e6, 1)
        row["fwd_jnp_us"] = round(time_scan(jnp_sample, mu, scale, seed) * 1e6, 1)
        results.setdefault("sample", []).append(row)


def bench_attention(results):
    from multimodal_vae_comparison_tpu.models.nets import dot_product_attention
    from multimodal_vae_comparison_tpu.ops.pallas.attention import (
        masked_flash_attention)

    shapes = [
        ("text_T45", 24, 4, 45, 16),       # CdSprites+ captions
        ("text_T45_big", 1024, 4, 45, 16),
        ("text_T246", 24, 4, 246, 16),     # CUB captions
        ("video_axial_T8", 24 * 16 * 16, 2, 8, 16),  # VideoGPT axial rows
        ("long_T1024", 8, 4, 1024, 64),    # beyond-suite long-context check
    ]
    for name, B, H, T, Dh in shapes:
        k = jax.random.PRNGKey(0)
        q = jax.random.normal(k, (B, H, T, Dh))
        kk = jax.random.normal(k, (B, H, T, Dh))
        v = jax.random.normal(k, (B, H, T, Dh))
        mask = jnp.arange(T)[None, :] < (T * 3) // 4
        mask = jnp.broadcast_to(mask, (B, T))
        bias = jnp.where(mask[:, None, None, :], 0.0, -1e9)

        flash = functools.partial(masked_flash_attention, key_mask=mask)
        xla = functools.partial(dot_product_attention, mask_bias=bias)
        row = {"shape": f"{name}_B{B}xH{H}xT{T}xD{Dh}"}
        row["fwd_pallas_us"] = round(time_scan(flash, q, kk, v) * 1e6, 1)
        row["fwd_xla_us"] = round(time_scan(xla, q, kk, v) * 1e6, 1)
        row["bwd_pallas_us"] = round(
            time_scan(grad_of(flash, (0, 1, 2)), q, kk, v) * 1e6, 1)
        row["bwd_xla_us"] = round(
            time_scan(grad_of(xla, (0, 1, 2)), q, kk, v) * 1e6, 1)
        results.setdefault("attention", []).append(row)


def bench_sparse(results):
    """Block-sparse strided kernel vs the dense-bias emulation at VideoGPT
    full-attention shapes (T = t*h*w tokens)."""
    from multimodal_vae_comparison_tpu.ops.pallas import sparse_attention

    for name, B, H, T, Dh, blk, stride in (
            ("video_T512", 4, 2, 512, 32, 128, 4),
            ("video_T2048", 2, 2, 2048, 32, 128, 4),
            ("video_T4096", 1, 2, 4096, 32, 128, 4)):
        k = jax.random.PRNGKey(0)
        q = jax.random.normal(k, (B, H, T, Dh))
        kk = jax.random.normal(k, (B, H, T, Dh))
        v = jax.random.normal(k, (B, H, T, Dh))
        pallas_fn = functools.partial(
            sparse_attention.strided_block_sparse_attention,
            block=blk, block_stride=stride)
        dense_fn = functools.partial(
            sparse_attention._reference_block_sparse,
            block=blk, block_stride=stride)
        row = {"shape": f"{name}_B{B}xH{H}xT{T}xD{Dh}_blk{blk}s{stride}"}
        # force each path explicitly (the dispatcher's T-threshold would
        # otherwise silently route both rows through the same code)
        os.environ["MMVAE_TPU_SPARSE_PALLAS"] = "1"
        row["fwd_pallas_us"] = round(time_scan(pallas_fn, q, kk, v) * 1e6, 1)
        # round 4: fwd+bwd — the sparse backward kernels vs the dense VJP
        row["fwdbwd_pallas_us"] = round(
            time_scan(grad_of(pallas_fn, (0, 1, 2)), q, kk, v) * 1e6, 1)
        os.environ.pop("MMVAE_TPU_SPARSE_PALLAS", None)
        row["fwd_dense_us"] = round(time_scan(dense_fn, q, kk, v) * 1e6, 1)
        row["fwdbwd_dense_us"] = round(
            time_scan(grad_of(dense_fn, (0, 1, 2)), q, kk, v) * 1e6, 1)
        results.setdefault("sparse_attention", []).append(row)


def main():
    results = {"device": getattr(jax.devices()[0], "device_kind", "unknown"),
               "iters": ITERS}
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for name, fn in (("poe", bench_poe), ("kl", bench_kl),
                     ("sample", bench_sample), ("attention", bench_attention),
                     ("sparse", bench_sparse)):
        if only and name != only:
            continue
        try:
            fn(results)
        except Exception as e:
            results[name] = f"error: {type(e).__name__}: {e}"
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
