"""Pallas TPU kernel: strided BLOCK-SPARSE causal self-attention.

The reference's VideoGPT nets can escape to DeepSpeed's block-sparse CUDA
kernels for a strided sparsity pattern (nn_modules.py:624-882,
StridedSparsityConfig): sparsity is declared at *block* granularity — each
query block attends its own (causally masked) diagonal block plus every
``block_stride``-th earlier block in full.  Round 2 emulated the pattern
with a dense additive bias (_reference_block_sparse below), which keeps O(T^2)
compute; this kernel actually skips the masked-out blocks: the grid
enumerates only the nonzero (query-block, key-block) pairs via a
scalar-prefetched block index map, so compute and HBM traffic scale with
the number of live blocks (~T*(1 + T/(block*block_stride))*block instead
of T^2).

Flash-attention accumulation: online softmax with running max/denominator
kept in VMEM scratch that persists across the innermost (key-block) grid
dimension; the output tile is written once on the last key block.

Round 4 adds the sparse BACKWARD (VERDICT r3 item 7): the forward kernel
also emits the per-row log-sum-exp, and two backward kernels reuse the
index-map machinery — dq iterates each query block's live key blocks (the
forward's kv_map), dk/dv iterate each key block's live *query* blocks (the
transposed map), with flash-style p = exp(s - lse) recomputation so no
O(T^2) tensor is ever materialized.  When the forward took the dense-bias
path (small T — the measured A/B crossover), the backward recomputes
through the dense jnp reference as before.
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False
NEG_INF = -1e30


def _live_blocks(n_blocks: int, block_stride: int):
    """Per query block i: its causal diagonal block plus every
    block_stride-th earlier block (DeepSpeed StridedSparsityConfig
    semantics at block granularity)."""
    rows = []
    for i in range(n_blocks):
        ks = [j for j in range(i) if (i - j) % block_stride == 0]
        ks.append(i)                       # diagonal last: monotone order
        rows.append(ks)
    return rows


def block_sparse_layout(seq_len: int, block: int, block_stride: int):
    """(kv_map, n_valid) int32 arrays describing the sparse block layout.

    kv_map[i, j] = key-block index of the j-th live block for query block i
    (padded with 0 beyond n_valid[i]); n_valid[i] = number of live blocks.
    """
    assert seq_len % block == 0, (seq_len, block)
    rows = _live_blocks(seq_len // block, block_stride)
    max_nk = max(len(r) for r in rows)
    kv_map = np.zeros((len(rows), max_nk), np.int32)
    n_valid = np.zeros((len(rows),), np.int32)
    for i, r in enumerate(rows):
        kv_map[i, : len(r)] = r
        n_valid[i] = len(r)
    return jnp.asarray(kv_map), jnp.asarray(n_valid)


def block_sparse_layout_T(seq_len: int, block: int, block_stride: int):
    """Transposed layout: per KEY block, the query blocks that attend it.

    qv_map[j, i] = query-block index of the i-th live query block for key
    block j (padded with 0); n_valid[j] = live count.  For the strided
    pattern this is {j} plus every later block at distance % stride == 0.
    """
    assert seq_len % block == 0, (seq_len, block)
    rows = _live_blocks(seq_len // block, block_stride)
    cols = [[] for _ in rows]
    for i, r in enumerate(rows):
        for j in r:
            cols[j].append(i)
    max_nq = max(len(c) for c in cols)
    qv_map = np.zeros((len(cols), max_nq), np.int32)
    n_valid = np.zeros((len(cols),), np.int32)
    for j, c in enumerate(cols):
        qv_map[j, : len(c)] = sorted(c)
        n_valid[j] = len(c)
    return jnp.asarray(qv_map), jnp.asarray(n_valid)


def _sparse_kernel(n_valid_ref, kv_map_ref, q_ref, k_ref, v_ref, o_ref,
                   lse_ref, m_scr, l_scr, acc_scr, *, block: int):
    i = pl.program_id(1)
    j = pl.program_id(2)
    dh = q_ref.shape[-1]
    sm_scale = 1.0 / math.sqrt(dh)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(j < n_valid_ref[i])
    def _compute():
        kb_idx = kv_map_ref[i, j]
        q = q_ref[0].astype(jnp.float32) * sm_scale
        kb = k_ref[0].astype(jnp.float32)
        vb = v_ref[0].astype(jnp.float32)
        s = jnp.dot(q, kb.T, preferred_element_type=jnp.float32)
        # the diagonal block is causally masked inside; strided past blocks
        # are fully visible (k block entirely precedes the q block)
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
        diag_mask = jnp.where(k_pos <= q_pos, 0.0, NEG_INF)
        s = s + jnp.where(kb_idx == i, diag_mask, 0.0)
        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        m_scr[...] = m_new
        l_scr[...] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[...] = acc_scr[...] * alpha + jnp.dot(
            p, vb, preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[0] = (acc_scr[...]
                    / jnp.maximum(l_scr[...], 1e-30)).astype(o_ref.dtype)
        lse_ref[0] = (m_scr[...]
                      + jnp.log(jnp.maximum(l_scr[...], 1e-30))
                      ).astype(lse_ref.dtype)


def _sparse_pallas(q, k, v, kv_map, n_valid, block: int):
    bh, t, dh = q.shape
    nq = t // block
    max_nk = kv_map.shape[1]
    kernel = functools.partial(_sparse_kernel, block=block)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bh, nq, max_nk),
        in_specs=[
            pl.BlockSpec((1, block, dh), lambda b, i, j, nv, kv: (b, i, 0)),
            pl.BlockSpec((1, block, dh),
                         lambda b, i, j, nv, kv: (b, kv[i, j], 0)),
            pl.BlockSpec((1, block, dh),
                         lambda b, i, j, nv, kv: (b, kv[i, j], 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block, dh), lambda b, i, j, nv, kv: (b, i, 0)),
            pl.BlockSpec((1, block, 1), lambda b, i, j, nv, kv: (b, i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block, 1), jnp.float32),
            pltpu.VMEM((block, 1), jnp.float32),
            pltpu.VMEM((block, dh), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((bh, t, dh), jnp.float32),
                   jax.ShapeDtypeStruct((bh, t, 1), jnp.float32)],
        interpret=_INTERPRET,
    )(n_valid, kv_map, q, k, v)


def _dq_kernel(n_valid_ref, kv_map_ref, q_ref, k_ref, v_ref, do_ref,
               lse_ref, delta_ref, dq_ref, acc_scr, *, block: int):
    i = pl.program_id(1)
    j = pl.program_id(2)
    dh = q_ref.shape[-1]
    sm_scale = 1.0 / math.sqrt(dh)

    @pl.when(j == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(j < n_valid_ref[i])
    def _compute():
        kb_idx = kv_map_ref[i, j]
        q = q_ref[0].astype(jnp.float32) * sm_scale
        kb = k_ref[0].astype(jnp.float32)
        vb = v_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)
        s = jnp.dot(q, kb.T, preferred_element_type=jnp.float32)
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
        diag_mask = jnp.where(k_pos <= q_pos, 0.0, NEG_INF)
        s = s + jnp.where(kb_idx == i, diag_mask, 0.0)
        p = jnp.exp(s - lse_ref[0])                      # (block, block)
        dp = jnp.dot(do, vb.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0])
        acc_scr[...] = acc_scr[...] + jnp.dot(
            ds, kb, preferred_element_type=jnp.float32) * sm_scale

    @pl.when(j == pl.num_programs(2) - 1)
    def _finalize():
        dq_ref[0] = acc_scr[...].astype(dq_ref.dtype)


def _dkv_kernel(n_valid_ref, qv_map_ref, q_ref, k_ref, v_ref, do_ref,
                lse_ref, delta_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                *, block: int):
    jj = pl.program_id(1)
    ii = pl.program_id(2)
    dh = q_ref.shape[-1]
    sm_scale = 1.0 / math.sqrt(dh)

    @pl.when(ii == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    @pl.when(ii < n_valid_ref[jj])
    def _compute():
        qb_idx = qv_map_ref[jj, ii]
        q = q_ref[0].astype(jnp.float32) * sm_scale
        kb = k_ref[0].astype(jnp.float32)
        vb = v_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)
        s = jnp.dot(q, kb.T, preferred_element_type=jnp.float32)
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
        diag_mask = jnp.where(k_pos <= q_pos, 0.0, NEG_INF)
        s = s + jnp.where(qb_idx == jj, diag_mask, 0.0)
        p = jnp.exp(s - lse_ref[0])
        dv_scr[...] = dv_scr[...] + jnp.dot(
            p.T, do, preferred_element_type=jnp.float32)
        dp = jnp.dot(do, vb.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0])
        dk_scr[...] = dk_scr[...] + jnp.dot(
            ds.T, q, preferred_element_type=jnp.float32)

    @pl.when(ii == pl.num_programs(2) - 1)
    def _finalize():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _sparse_backward_pallas(q, k, v, do, lse, delta, block, block_stride):
    """(dq, dk, dv) through the two sparse backward kernels.

    All inputs flattened to (B*H, T, Dh); lse/delta are (B*H, T, 1).
    Note dk accumulates ds^T @ (q*scale) — the q rows are pre-scaled like
    the forward, which IS d/dk of s = (q*scale) @ k^T.
    """
    bh, t, dh = q.shape
    kv_map, n_valid = block_sparse_layout(t, block, block_stride)
    qv_map, nq_valid = block_sparse_layout_T(t, block, block_stride)
    nq = t // block
    qkv_spec = pl.BlockSpec((1, block, dh), lambda b, i, j, nv, kv: (b, i, 0))
    kv_gather = pl.BlockSpec((1, block, dh),
                             lambda b, i, j, nv, kv: (b, kv[i, j], 0))
    row_spec = pl.BlockSpec((1, block, 1), lambda b, i, j, nv, kv: (b, i, 0))
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, block=block),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bh, nq, kv_map.shape[1]),
            in_specs=[qkv_spec, kv_gather, kv_gather, qkv_spec,
                      row_spec, row_spec],
            out_specs=qkv_spec,
            scratch_shapes=[pltpu.VMEM((block, dh), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((bh, t, dh), jnp.float32),
        interpret=_INTERPRET,
    )(n_valid, kv_map, q, k, v, do, lse, delta)

    # dk/dv: grid walks key blocks; q/do/lse/delta gathered via the
    # transposed map
    q_gather = pl.BlockSpec((1, block, dh),
                            lambda b, j, i, nv, qv: (b, qv[j, i], 0))
    row_gather = pl.BlockSpec((1, block, 1),
                              lambda b, j, i, nv, qv: (b, qv[j, i], 0))
    key_spec = pl.BlockSpec((1, block, dh), lambda b, j, i, nv, qv: (b, j, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, block=block),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bh, nq, qv_map.shape[1]),
            in_specs=[q_gather, key_spec, key_spec, q_gather,
                      row_gather, row_gather],
            out_specs=[key_spec, key_spec],
            scratch_shapes=[pltpu.VMEM((block, dh), jnp.float32),
                            pltpu.VMEM((block, dh), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((bh, t, dh), jnp.float32),
                   jax.ShapeDtypeStruct((bh, t, dh), jnp.float32)],
        interpret=_INTERPRET,
    )(nq_valid, qv_map, q, k, v, do, lse, delta)
    return dq, dk, dv


def _reference_block_sparse(q, k, v, block: int, block_stride: int):
    """Dense jnp emulation of the identical block-granularity pattern (the
    correctness oracle and the VJP recompute path)."""
    t = q.shape[2]
    qb = jnp.arange(t)[:, None] // block
    kb = jnp.arange(t)[None, :] // block
    diag = qb == kb
    strided = jnp.logical_and(kb < qb, (qb - kb) % block_stride == 0)
    causal = jnp.arange(t)[None, :] <= jnp.arange(t)[:, None]
    visible = jnp.logical_or(jnp.logical_and(diag, causal), strided)
    bias = jnp.where(visible, 0.0, NEG_INF)
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale + bias
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v,
                      preferred_element_type=jnp.float32)


def strided_block_sparse_attention(q, k, v, block: int = 128,
                                   block_stride: int = 4):
    """Causal strided block-sparse self-attention (VideoGPT escape).

    :param q, k, v: (B, H, T, Dh) with T % block == 0
    :param block: sparsity block size (also the Pallas tile)
    :param block_stride: attend every block_stride-th past block
    :return: (B, H, T, Dh) float32
    """
    assert q.shape == k.shape == v.shape, (q.shape, k.shape, v.shape)
    assert q.shape[2] % block == 0, (q.shape, block)
    return _sparse_vjp(q, k, v, block, block_stride)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _sparse_vjp(q, k, v, block, block_stride):
    return _sparse_forward(q, k, v, block, block_stride)


def _dispatch_pallas(t: int, train: bool, force, interpret: bool) -> bool:
    """Pure dispatch rule (unit-tested): Pallas at T>=2048 on the AD path,
    T>=4096 forward-only; MMVAE_TPU_SPARSE_PALLAS=1/0 overrides both."""
    threshold = 2048 if train else 4096
    return (force == "1" or interpret
            or (force != "0" and t >= threshold))


def _sparse_forward_with_lse(q, k, v, block, block_stride, train=False):
    """(out, lse) — lse is None when the dense-bias path ran (small T),
    which also routes the backward through the dense recompute."""
    from multimodal_vae_comparison_tpu.ops.pallas import telemetry

    b, h, t, dh = q.shape
    on_tpu = _INTERPRET or jax.default_backend() in ("tpu", "axon")
    if not on_tpu:
        telemetry.record("sparse_attention", "jnp", note="not on TPU")
        return _reference_block_sparse(q, k, v, block, block_stride), None
    # Round-4 fwd+bwd A/B (benchmarks/kernels_ab.py sparse, TPU v5e,
    # /tmp/kernels_ab_sparse_r4.json -> docs/performance.md): with the Pallas
    # backward landed, the kernel wins the TRAINING path from T=2048
    # (234 us vs 350 us fwd+bwd; 4.5x at T=4096: 419 us vs 1894 us) and
    # still loses at T=512 (66 us vs 8 us) where XLA's fused dense attention
    # fits comfortably.  Forward-ONLY (inference/serving — custom_vjp calls
    # the primal, train=False) the round-3 A/B showed dense still wins at
    # T=2048 (65 us vs 98 us), so the no-grad path keeps the 4096 threshold
    # while the AD path (train=True, via _sparse_fwd) switches at 2048.
    # Override with MMVAE_TPU_SPARSE_PALLAS=1/0 (applies to both paths).
    use_pallas = _dispatch_pallas(
        t, train, os.environ.get("MMVAE_TPU_SPARSE_PALLAS"), _INTERPRET)
    if not use_pallas:
        telemetry.record("sparse_attention", "jnp",
                         note=f"A/B default: dense bias wins at T={t}")
        return _reference_block_sparse(q, k, v, block, block_stride), None
    kv_map, n_valid = block_sparse_layout(t, block, block_stride)
    try:
        out, lse = _sparse_pallas(q.reshape(b * h, t, dh),
                                  k.reshape(b * h, t, dh),
                                  v.reshape(b * h, t, dh),
                                  kv_map, n_valid, block)
        telemetry.record("sparse_attention", "pallas")
        return out.reshape(b, h, t, dh), lse
    except Exception as e:  # loud fallback — never silent
        telemetry.record("sparse_attention", "jnp-error-fallback",
                         note=f"{type(e).__name__}: {e}")
        return _reference_block_sparse(q, k, v, block, block_stride), None


def _sparse_forward(q, k, v, block, block_stride):
    return _sparse_forward_with_lse(q, k, v, block, block_stride,
                                    train=False)[0]


def _sparse_fwd(q, k, v, block, block_stride):
    out, lse = _sparse_forward_with_lse(q, k, v, block, block_stride,
                                        train=True)
    return out, (q, k, v, out, lse)


def _sparse_bwd(block, block_stride, res, g):
    q, k, v, out, lse = res
    if lse is None:
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _reference_block_sparse(q_, k_, v_, block,
                                                       block_stride), q, k, v)
        return vjp(g)
    from multimodal_vae_comparison_tpu.ops.pallas import telemetry
    b, h, t, dh = q.shape
    do = g.reshape(b * h, t, dh).astype(jnp.float32)
    o_flat = out.reshape(b * h, t, dh).astype(jnp.float32)
    delta = jnp.sum(do * o_flat, axis=-1, keepdims=True)   # (BH, T, 1)
    try:
        dq, dk, dv = _sparse_backward_pallas(
            q.reshape(b * h, t, dh), k.reshape(b * h, t, dh),
            v.reshape(b * h, t, dh), do, lse, delta, block, block_stride)
        telemetry.record("sparse_attention_bwd", "pallas")
        shape = (b, h, t, dh)
        return (dq.reshape(shape).astype(q.dtype),
                dk.reshape(shape).astype(k.dtype),
                dv.reshape(shape).astype(v.dtype))
    except Exception as e:  # loud fallback — never silent
        telemetry.record("sparse_attention_bwd", "jnp-error-fallback",
                         note=f"{type(e).__name__}: {e}")
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _reference_block_sparse(q_, k_, v_, block,
                                                       block_stride), q, k, v)
        return vjp(g)


_sparse_vjp.defvjp(_sparse_fwd, _sparse_bwd)
