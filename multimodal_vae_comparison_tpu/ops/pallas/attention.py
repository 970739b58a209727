"""Pallas TPU kernel: masked flash attention (online-softmax blocks).

Replaces the reference's two attention escapes — torch SDPA inside
nn.Transformer layers and the DeepSpeed sparse-attention CUDA kernels
(nn_modules.py:646-649) — with one Pallas kernel: blockwise KV streaming with
running max/denominator (flash attention) and additive key-padding bias.
At this suite's sequence lengths (<=246) XLA's fused attention is already
near-optimal, so the kernel is opt-in (MMVAE_TPU_FLASH_ATTN=1) and mandatory
only for long-sequence extensions; correctness is tested in interpret mode
against the jnp reference.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False
NEG_INF = -1e30

# Default dispatch policy, set from the measured A/B microbenchmark
# (benchmarks/kernels_ab.py, table in docs/performance.md): at this suite's
# sequence lengths (<=246) XLA's fused attention wins or ties, so the Pallas
# kernel is off by default and MMVAE_TPU_FLASH_ATTN=1/0 overrides either way.
_DEFAULT_ON = False


def use_flash_attention() -> bool:
    """Central dispatch policy for the Pallas flash-attention forward."""
    import os

    env = os.environ.get("MMVAE_TPU_FLASH_ATTN")
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if env is not None:
        # the compiled kernel only exists on TPU backends; honoring a stale
        # env override on CPU would abort training instead of falling back
        return env == "1" and (on_tpu or _INTERPRET)
    return _DEFAULT_ON and on_tpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, kv_block: int):
    # refs carry a leading block dim of 1 (one (batch*head) per program)
    _, tq, dh = q_ref.shape
    tk = k_ref.shape[1]
    sm_scale = 1.0 / math.sqrt(dh)
    q = q_ref[0].astype(jnp.float32) * sm_scale

    m = jnp.full((tq, 1), NEG_INF, dtype=jnp.float32)
    l = jnp.zeros((tq, 1), dtype=jnp.float32)
    acc = jnp.zeros((tq, dh), dtype=jnp.float32)
    n_blocks = pl.cdiv(tk, kv_block)
    for blk in range(n_blocks):                       # static unroll
        lo = blk * kv_block
        size = min(kv_block, tk - lo)
        kb = k_ref[0, lo:lo + size, :].astype(jnp.float32)
        vb = v_ref[0, lo:lo + size, :].astype(jnp.float32)
        s = jnp.dot(q, kb.T, preferred_element_type=jnp.float32)
        s = s + bias_ref[0, 0, lo:lo + size][None, :]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, vb, preferred_element_type=jnp.float32)
        m = m_new
    o_ref[0] = acc / jnp.maximum(l, 1e-30)


def _flash_pallas(q, k, v, bias, kv_block: int):
    bh, tq, dh = q.shape
    tk = k.shape[1]
    space = pl.ANY if _INTERPRET else pltpu.VMEM
    kernel = functools.partial(_attn_kernel, kv_block=kv_block)
    return pl.pallas_call(
        kernel,
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, tq, dh), lambda i: (i, 0, 0),
                         memory_space=space),
            pl.BlockSpec((1, tk, dh), lambda i: (i, 0, 0),
                         memory_space=space),
            pl.BlockSpec((1, tk, dh), lambda i: (i, 0, 0),
                         memory_space=space),
            pl.BlockSpec((1, 1, tk), lambda i: (i, 0, 0),
                         memory_space=space),
        ],
        out_specs=pl.BlockSpec((1, tq, dh), lambda i: (i, 0, 0),
                               memory_space=space),
        out_shape=jax.ShapeDtypeStruct((bh, tq, dh), jnp.float32),
        interpret=_INTERPRET,
    )(q, k, v, bias)


def _reference_attention(q, k, v, key_mask):
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if key_mask is not None:
        logits = logits + jnp.where(key_mask[:, None, None, :], 0.0, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v,
                      preferred_element_type=jnp.float32)


def masked_flash_attention(q, k, v, key_mask=None, kv_block: int = 128):
    """Fused masked attention (Pallas forward, recompute VJP).

    :param q: (B, H, Tq, Dh)
    :param k, v: (B, H, Tk, Dh)
    :param key_mask: optional (B, Tk) boolean, True = attend
    :return: (B, H, Tq, Dh) float32
    """
    return _flash_vjp(q, k, v, key_mask, kv_block)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_vjp(q, k, v, key_mask, kv_block):
    return _flash_forward(q, k, v, key_mask, kv_block)


def _flash_forward(q, k, v, key_mask, kv_block):
    b, h, tq, dh = q.shape
    tk = k.shape[2]
    if key_mask is None:
        bias = jnp.zeros((b, tk), jnp.float32)
    else:
        bias = jnp.where(key_mask, 0.0, NEG_INF).astype(jnp.float32)
    bias = jnp.repeat(bias[:, None, :], h, axis=1).reshape(b * h, 1, tk)
    out = _flash_pallas(q.reshape(b * h, tq, dh),
                        k.reshape(b * h, tk, dh),
                        v.reshape(b * h, tk, dh),
                        bias, min(kv_block, tk))
    return out.reshape(b, h, tq, dh)


def _flash_fwd(q, k, v, key_mask, kv_block):
    return _flash_forward(q, k, v, key_mask, kv_block), (q, k, v, key_mask)


def _flash_bwd(kv_block, res, g):
    """Backward recomputes the attention with the jnp reference (XLA fuses
    it); at these sequence lengths the memory trade is free."""
    q, k, v, key_mask = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _reference_attention(q_, k_, v_,
                                                             key_mask),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_vjp.defvjp(_flash_fwd, _flash_bwd)
