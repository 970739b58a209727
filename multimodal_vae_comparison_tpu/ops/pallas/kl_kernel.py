"""Pallas TPU kernel: fused KL(N(mu, scale) || N(0, 1)) latent reduction.

Every objective evaluates this once per posterior per step (M+1 times for
MoPoE's group divergence).  The chain square/log/add + reduce-over-latents is
bandwidth-bound; the kernel reads (B, D) once from HBM and emits (B,).

Backward is the trivial closed form via custom_vjp.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False


def _kl_kernel(mu_ref, scale_ref, out_ref):
    mu = mu_ref[:].astype(jnp.float32)
    scale = scale_ref[:].astype(jnp.float32)
    var = scale * scale
    kl = 0.5 * (var + mu * mu - 1.0 - jnp.log(var))
    out_ref[:] = jnp.sum(kl, axis=-1, keepdims=True)


def _kl_pallas(mu, scale):
    out_shape = jax.ShapeDtypeStruct(mu.shape[:-1] + (1,), jnp.float32)
    space = pl.ANY if _INTERPRET else pltpu.VMEM
    out = pl.pallas_call(
        _kl_kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=space),
                  pl.BlockSpec(memory_space=space)],
        out_specs=pl.BlockSpec(memory_space=space),
        interpret=_INTERPRET,
    )(mu, scale)
    return out[..., 0]


def _kl_reference(mu, scale):
    var = jnp.square(scale)
    return jnp.sum(0.5 * (var + jnp.square(mu) - 1.0 - jnp.log(var)), axis=-1)


@jax.custom_vjp
def kl_normal_std_fused(mu, scale):
    """sum_D KL(N(mu, scale) || N(0, 1)) with a Pallas forward on TPU."""
    return _kl_impl(mu, scale)


def _kl_impl(mu, scale):
    from multimodal_vae_comparison_tpu.ops.pallas import telemetry
    on_tpu = _INTERPRET or jax.default_backend() in ("tpu", "axon")
    if on_tpu:
        try:
            out = _kl_pallas(mu, scale)
            telemetry.record("kl", "pallas")
            return out
        except Exception as e:  # loud fallback — never silent
            telemetry.record("kl", "jnp-error-fallback",
                             note=f"{type(e).__name__}: {e}")
    else:
        telemetry.record("kl", "jnp", note="not on TPU")
    return _kl_reference(mu, scale)


def _kl_fwd(mu, scale):
    return _kl_impl(mu, scale), (mu, scale)


def _kl_bwd(res, g):
    mu, scale = res
    g = g[..., None]
    d_mu = g * mu
    d_scale = g * (scale - 1.0 / scale)
    return d_mu, d_scale


kl_normal_std_fused.defvjp(_kl_fwd, _kl_bwd)
