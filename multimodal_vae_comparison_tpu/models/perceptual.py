"""Perceptual (VGG feature-space) reconstruction loss — ``feature_loss``.

Re-design of the reference's CNN-VAE perceptual loss
(multimodal_compare/models/objectives.py:461-483 + the VGG19 module at
nn_modules.py:1066-1160): pixel-space MSE plus an MSE over VGG conv-layer
feature maps of the reconstruction vs the target.

Differences from the reference, both deliberate:

* the reference instantiates (and re-downloads) a pretrained VGG19 on
  **every loss call** and bounces tensors through ``.cuda()``; here the
  extractor parameters are converted once (eval/weights.py, when a
  torchvision ``vgg19`` checkpoint is available — otherwise fixed random
  features) and closed over by the jitted objective, so the whole loss fuses
  into the training program;
* the reference reduces the feature term to a single *batch-mean* scalar and
  broadcasts it over elements (nn_modules.py:1107-1108); we keep it
  per-sample (same expectation, strictly more informative gradient) and
  scale by the pixel count so the magnitude matches the reference's
  sum-reduction.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

_PARAMS: Optional[Dict[str, Any]] = None
_SOURCE = "uninitialized"


def extractor_params() -> Dict[str, Any]:
    """VGGFeatures params: converted torchvision vgg19 when a weights file is
    installed, else fixed (PRNG-0) random features.  Cached per process as
    host numpy arrays (device-independent; they enter jitted programs as
    ordinary captured buffers, not inlined constants)."""
    global _PARAMS, _SOURCE
    if _PARAMS is None:
        from multimodal_vae_comparison_tpu.eval import weights as W
        params = W.vgg19_feature_params()
        if params is not None:
            _SOURCE = "torchvision-vgg19"
        else:
            from multimodal_vae_comparison_tpu.models.nets import VGGFeatures
            dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
            params = VGGFeatures(parent=None).init(jax.random.PRNGKey(0),
                                                   dummy)
            _SOURCE = "fixed-random"
        _PARAMS = jax.tree_util.tree_map(np.asarray, params)
    return _PARAMS


def extractor_source() -> str:
    extractor_params()
    return _SOURCE


def reset_extractor_cache() -> None:
    """Drop the cached params (tests use this to exercise both sources)."""
    global _PARAMS, _SOURCE
    _PARAMS, _SOURCE = None, "uninitialized"


def feature_loss(dist, target, mask=None, batch_ndims=1):
    """Per-(K,B) log-likelihood contribution (higher is better): negative
    pixel MSE minus the per-sample VGG feature MSE scaled by pixel count.
    Images only; ``mask`` is ignored (as in the reference)."""
    from multimodal_vae_comparison_tpu.models.nets import VGGFeatures
    recon = dist.mean
    lead = recon.shape[:batch_ndims]
    img_shape = recon.shape[batch_ndims:]
    assert len(img_shape) == 3, (
        f"feature_loss is for (H, W, C) images, got feature shape {img_shape}")
    # fold leading (K, B) into the batch for the conv extractor with the
    # BATCH dim as the major reshape factor: under a data mesh B is the
    # sharded dim and GSPMD can only shard a merged dim through its
    # major-most factor — a K-major fold would replicate the whole VGG
    # extractor per device (same defect as base.decode_mod, round 4)
    if batch_ndims == 2:
        recon = recon.swapaxes(0, 1)
        target = jnp.broadcast_to(target, dist.mean.shape).swapaxes(0, 1)
    flat_r = recon.reshape((-1,) + tuple(img_shape))
    flat_t = jnp.broadcast_to(target, recon.shape).reshape(
        (-1,) + tuple(img_shape))
    flat_t = jax.lax.stop_gradient(flat_t)
    # parent=None: detach from any ambient module scope — the extractor is a
    # frozen standalone net, not a submodule of the VAE being traced
    ext = VGGFeatures(parent=None)
    p = extractor_params()
    feats_r = ext.apply(p, flat_r, taps="conv")
    feats_t = ext.apply(p, flat_t, taps="conv")
    feat_mse = jnp.zeros((flat_r.shape[0],), jnp.float32)
    for fr, ft in zip(feats_r, feats_t):
        feat_mse = feat_mse + jnp.mean(jnp.square(fr - ft),
                                       axis=(1, 2, 3)).astype(jnp.float32)
    pix_mse = jnp.sum(
        jnp.square(flat_r - flat_t).reshape(flat_r.shape[0], -1), axis=-1)
    n_pix = int(np.prod(img_shape))
    ll = -(pix_mse + feat_mse * n_pix)
    if batch_ndims == 2:
        return ll.reshape((lead[1], lead[0])).swapaxes(0, 1)
    return ll.reshape(lead)
