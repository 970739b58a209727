"""Pallas TPU kernel: fused reparameterized Gaussian sampling.

The K-sample reparameterization (z = mu + scale * eps) is the third hot-path
kernel family flagged in SURVEY.md §7: the stock path materializes an eps
tensor from jax.random and reads mu/scale separately.  This kernel generates
the noise *inside* the kernel with the TPU's native PRNG
(pltpu.prng_random_bits) and applies the affine in one VMEM pass — eps never
touches HBM.

Box-Muller converts uniform bits to normals.  Backward is the closed form
(dz/dmu = 1, dz/dscale = eps) via custom_vjp.

Opt-in (MMVAE_TPU_PALLAS_SAMPLE=1): the XLA path is already fused well at
these sizes, and changing the sampler changes the RNG stream of in-flight
experiments.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False
TWO_PI = 2.0 * math.pi


def _boxmuller_from_bits(bits_a, bits_b):
    """uint32 random bits -> standard normals (Box-Muller).

    Shared by the kernel body and its CPU contract test.  Inputs MUST be
    uint32: with signed int32 the >> is an arithmetic shift, u1 goes
    negative for ~half the lanes, and log(u1) = NaN poisons every sample.
    """
    # uint32 -> (0, 1]: keep 24 mantissa-ish bits for a clean float.
    # Mosaic has no uint32->float32 cast (measured: the r3 kernel A/B run
    # failed compiling exactly that), so go through int32 — after the >>8
    # shift the value is < 2^24 and the bitcast is sign-bit-clean.
    a24 = jax.lax.bitcast_convert_type(bits_a >> 8, jnp.int32)
    b24 = jax.lax.bitcast_convert_type(bits_b >> 8, jnp.int32)
    u1 = a24.astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-7
    u2 = b24.astype(jnp.float32) * (1.0 / (1 << 24))
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(TWO_PI * u2)


def _sample_kernel(seed_ref, mu_ref, scale_ref, z_ref, eps_ref):
    pltpu.prng_seed(seed_ref[0])
    shape = mu_ref.shape
    # two independent draws for Box-Muller; prng_random_bits returns SIGNED
    # int32 on this stack, so bitcast to uint32 before the shift
    bits_a = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    bits_b = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    eps = _boxmuller_from_bits(bits_a, bits_b)
    eps_ref[:] = eps
    z_ref[:] = mu_ref[:] + scale_ref[:] * eps


def _sample_pallas(mu, scale, seed: jnp.ndarray):
    space = pl.ANY if _INTERPRET else pltpu.VMEM
    out = jax.ShapeDtypeStruct(mu.shape, jnp.float32)
    return pl.pallas_call(
        _sample_kernel,
        out_shape=(out, out),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=space),
                  pl.BlockSpec(memory_space=space)],
        out_specs=(pl.BlockSpec(memory_space=space),
                   pl.BlockSpec(memory_space=space)),
        interpret=_INTERPRET,
    )(seed.reshape(1), mu, scale)


@jax.custom_vjp
def sample_normal_fused(mu, scale, seed):
    """z ~ N(mu, scale) with in-kernel PRNG; returns z only."""
    z, _ = _sample_impl(mu, scale, seed)
    return z


def _sample_impl(mu, scale, seed):
    from multimodal_vae_comparison_tpu.ops.pallas import telemetry
    on_tpu = _INTERPRET or jax.default_backend() in ("tpu", "axon")
    if on_tpu:
        try:
            out = _sample_pallas(mu, scale, seed)
            telemetry.record("sample", "pallas")
            return out
        except Exception as e:  # loud fallback — never silent
            telemetry.record("sample", "jnp-error-fallback",
                             note=f"{type(e).__name__}: {e}")
    else:
        telemetry.record("sample", "jnp", note="not on TPU")
    key = jax.random.wrap_key_data(
        jnp.asarray([0, seed], jnp.uint32), impl="threefry2x32")
    eps = jax.random.normal(key, mu.shape, jnp.float32)
    return mu + scale * eps, eps


def _sample_fwd(mu, scale, seed):
    z, eps = _sample_impl(mu, scale, seed)
    return z, eps


def _sample_bwd(eps, g):
    return g, g * eps, None


sample_normal_fused.defvjp(_sample_fwd, _sample_bwd)
