"""Objectives: reconstruction-loss table and ELBO / IWAE / DReG estimators.

Pure-function re-design of the reference objective system
(multimodal_compare/models/objectives.py): ``ReconLoss`` static methods become
jit-safe functions ``recon_log_prob(ltype, dist, target, mask)`` returning
per-batch-element log-likelihoods (higher is better), and the multimodal
estimators become functions over arrays instead of mutable objective objects.

Replaced reference quirks (documented):

* the reference bounces every recon-loss tensor cpu<->cuda
  (objectives.py:405-500) — here everything stays on device and fuses;
* DReG's gradient re-weighting uses ``zss.register_hook``
  (objectives.py:381-384); the JAX equivalent is :func:`scale_grad`, a
  ``jax.custom_vjp`` identity whose backward multiplies the incoming gradient
  by the stop-gradient importance weights;
* ``optimal_sigma`` keeps gradients through the mean (principled sigma-VAE,
  https://github.com/orybkin/sigma-vae) instead of detaching the quadratic
  term entirely.
* ``category_ce`` applies cross-entropy over the *alphabet* axis (the last
  one); torch's ``CrossEntropyLoss`` in the reference silently treats the
  sequence axis as the class axis (objectives.py:499-500).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from multimodal_vae_comparison_tpu.constants import ETA, LOG2PI
from multimodal_vae_comparison_tpu.models.distributions import log_mean_exp


def _flatten_features(x: jnp.ndarray, batch_ndims: int) -> jnp.ndarray:
    return x.reshape(x.shape[:batch_ndims] + (-1,))


def _apply_mask(loss_elem: jnp.ndarray, mask: Optional[jnp.ndarray],
                batch_ndims: int) -> jnp.ndarray:
    """Zero padded positions. mask has shape (B, T); loss (..., B, T, feat...)."""
    if mask is None:
        return loss_elem
    m = mask.astype(loss_elem.dtype)
    # broadcast mask over leading K axes and trailing feature axes
    while m.ndim < loss_elem.ndim:
        if m.ndim < batch_ndims + 1:
            m = m[None, ...]
        else:
            m = m[..., None]
    return loss_elem * m


# ---------------------------------------------------------------------------
# Reconstruction losses (as log-likelihood contributions; higher = better)
# ---------------------------------------------------------------------------

def bce(dist, target, mask=None, batch_ndims=1):
    """Bernoulli log-likelihood of targets under dist.mean (reference 'bce').

    When the decoder provides eta-clipped logits (``dist.loc_logits``,
    VaeDecoder.squash_dist) the stable softplus form runs instead:
    ``t*log(sigmoid(x)) + (1-t)*log(sigmoid(-x))`` — mathematically identical
    to the probability form over ``clip(sigmoid(x), eta, 1-eta)``, but it
    stays finite in bf16 (where 1-eta rounds to 1.0 and ``log1p(-p)`` would
    be -inf) and keeps the whole elementwise chain in the compute dtype —
    the round-4 fix for the HBM-bound bs>=256 train step
    (docs/performance.md)."""
    x = getattr(dist, "loc_logits", None)
    if x is not None:
        t = target.astype(x.dtype)
        ll = -(t * jax.nn.softplus(-x) + (1.0 - t) * jax.nn.softplus(x))
    else:
        p = jnp.clip(dist.mean, ETA, 1.0 - ETA)
        t = target.astype(p.dtype)
        ll = t * jnp.log(p) + (1.0 - t) * jnp.log1p(-p)
    ll = _apply_mask(ll, mask, batch_ndims)
    return _flatten_features(ll, batch_ndims).sum(-1, dtype=jnp.float32)


def lprob(dist, target, mask=None, batch_ndims=1):
    """Exact log-probability under the likelihood distribution."""
    ll = dist.log_prob(target)
    ll = jnp.nan_to_num(ll, nan=0.0)
    ll = _apply_mask(ll, mask, batch_ndims)
    return _flatten_features(ll, batch_ndims).sum(-1, dtype=jnp.float32)


def l1(dist, target, mask=None, batch_ndims=1):
    ll = -jnp.abs(dist.mean - target.astype(dist.mean.dtype))
    ll = _apply_mask(ll, mask, batch_ndims)
    return _flatten_features(ll, batch_ndims).sum(-1, dtype=jnp.float32)


def mse(dist, target, mask=None, batch_ndims=1):
    ll = -jnp.square(dist.mean - target.astype(dist.mean.dtype))
    ll = _apply_mask(ll, mask, batch_ndims)
    return _flatten_features(ll, batch_ndims).sum(-1, dtype=jnp.float32)


def category_ce(dist, target, mask=None, batch_ndims=1):
    """Categorical cross-entropy over the trailing (alphabet/class) axis.

    ``dist.mean`` is treated as unnormalized scores (the decoders emit
    sigmoid/linear outputs); a log-softmax over the last axis makes this a
    proper categorical log-likelihood.
    """
    logp = jax.nn.log_softmax(dist.mean, axis=-1)
    ll = jnp.sum(target.astype(logp.dtype) * logp, axis=-1,
                 dtype=jnp.float32)
    ll = _apply_mask(ll, mask, batch_ndims)
    return _flatten_features(ll, batch_ndims).sum(-1, dtype=jnp.float32)


def softclip(x, low):
    """Smoothly clamp x from below at ``low`` (reference utils.py:66-69)."""
    return low + jax.nn.softplus(x - low)


def optimal_sigma(dist, target, mask=None, batch_ndims=1):
    """Gaussian NLL with per-batch optimal (analytic) sigma — sigma-VAE."""
    err2 = jnp.square(target - dist.mean)
    err2 = _apply_mask(err2, mask, batch_ndims)
    if mask is None:
        mean_err2 = jnp.mean(err2)
    else:
        # mean over *valid* positions only — the raw mean counts mask-zeroed
        # padding in the denominator and biases sigma low.
        valid = _apply_mask(jnp.ones_like(err2), mask, batch_ndims)
        mean_err2 = jnp.sum(err2) / jnp.maximum(jnp.sum(valid), 1.0)
    log_sigma = 0.5 * jnp.log(mean_err2 + 1e-12)
    log_sigma = softclip(log_sigma, -6.0)
    ll = -(0.5 * err2 / jnp.exp(2.0 * log_sigma) + log_sigma + 0.5 * LOG2PI)
    ll = _apply_mask(ll, mask, batch_ndims)
    return _flatten_features(ll, batch_ndims).sum(-1, dtype=jnp.float32)


def feature_loss(dist, target, mask=None, batch_ndims=1):
    """VGG perceptual loss (reference objectives.py:461-483); the import is
    deferred only to keep this module free of a flax dependency."""
    from multimodal_vae_comparison_tpu.models import perceptual
    return perceptual.feature_loss(dist, target, mask, batch_ndims)


RECON_LOSSES = {
    "bce": bce,
    "lprob": lprob,
    "l1": l1,
    "mse": mse,
    "category_ce": category_ce,
    "optimal_sigma": optimal_sigma,
    "feature_loss": feature_loss,
}


def recon_log_prob(ltype: str, dist, target, mask=None, batch_ndims=1):
    """Dispatch table entry point, mirrors ReconLoss (objectives.py:389-509)."""
    if ltype not in RECON_LOSSES:
        raise KeyError(f"recon loss '{ltype}' not implemented; "
                       f"available: {sorted(RECON_LOSSES)}")
    return RECON_LOSSES[ltype](dist, target, mask, batch_ndims)


# ---------------------------------------------------------------------------
# DReG gradient re-weighting
# ---------------------------------------------------------------------------

@jax.custom_vjp
def scale_grad(x, w):
    """Identity on ``x`` whose cotangent is multiplied elementwise by ``w``.

    JAX-native equivalent of the reference's
    ``zss.register_hook(lambda grad: grad_wt.unsqueeze(-1) * grad)``
    (objectives.py:381-384).
    """
    return x


def _scale_grad_fwd(x, w):
    return x, w


def _scale_grad_bwd(w, g):
    return (g * w, None)


scale_grad.defvjp(_scale_grad_fwd, _scale_grad_bwd)


# ---------------------------------------------------------------------------
# Estimators
# ---------------------------------------------------------------------------

def elbo(lpx_z: jnp.ndarray, kld: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """Negative ELBO, summed over the batch (reference objectives.py:54-67)."""
    return -(jnp.sum(lpx_z) - beta * jnp.sum(kld))


def iwae(lw: jnp.ndarray) -> jnp.ndarray:
    """Negative IWAE bound from importance log-weights lw of shape (K, B)."""
    return -jnp.sum(log_mean_exp(lw, axis=0))


def dreg(lw: jnp.ndarray) -> jnp.ndarray:
    """DReG loss given log-weights whose z-dependence went through scale_grad.

    lw: (K, B).  The gradient weights are softmax over K with stop-gradient,
    matching the looser multimodal DReG bound (objectives.py:375-387).
    """
    grad_wt = jax.lax.stop_gradient(jax.nn.softmax(lw, axis=0))
    return -jnp.sum(jnp.mean(grad_wt * lw, axis=0))


def dreg_grad_weights(lw: jnp.ndarray) -> jnp.ndarray:
    """The stop-gradient importance weights used to re-scale dz cotangents."""
    return jax.lax.stop_gradient(jax.nn.softmax(lw, axis=0))
