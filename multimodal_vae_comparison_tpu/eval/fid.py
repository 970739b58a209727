"""Frechet distance on in-memory data with a pluggable feature extractor.

Re-design of the reference FID pipeline (multimodal_compare/eval/fid_score.py,
363 LoC around pytorch-fid's InceptionV3).  The Frechet machinery
(mean/cov + matrix sqrt) is identical; the feature extractor is pluggable
because the pretrained InceptionV3 weights aren't available offline:

* default: VGG19-topology features (models/nets.VGGFeatures) — pretrained
  torchvision vgg19 weights when installed via eval/weights.py, otherwise
  fixed random projections, which still give a meaningful relative FID for
  model comparison (documented caveat: absolute values aren't comparable to
  Inception-FID numbers);
* any trained classifier's penultimate activations can be passed instead.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy import linalg


def active_feature_net() -> str:
    """Name of the feature net default_feature_fn would use right now —
    every reported FID number must carry this label (VERDICT r3 item 8):
    only 'inception_v3' is comparable to the reference's pytorch-fid
    numbers (fid_score.py:291-316); the VGG variants are internally
    consistent but NOT Inception-FID."""
    from multimodal_vae_comparison_tpu.eval import weights as W
    if W.inception_feature_params() is not None:
        return "inception_v3"
    return ("vgg19_pretrained" if W.find_weights_file("vgg19")
            else "vgg19_fixed_random")


def default_feature_fn(seed: int = 0) -> Callable[[np.ndarray], np.ndarray]:
    """Feature extractor priority: InceptionV3 pool3 when an
    ``inception_v3`` checkpoint is installed (the reference's Inception-FID,
    fid_score.py:12-66), else VGG19 features (pretrained if installed,
    fixed random otherwise)."""
    from multimodal_vae_comparison_tpu.eval import weights as W
    inc_params = W.inception_feature_params()
    if inc_params is not None:
        from multimodal_vae_comparison_tpu.models.inception import InceptionV3
        inc = InceptionV3()
        inc_apply = jax.jit(lambda p, x: inc.apply(p, x))

        def fn(images: np.ndarray) -> np.ndarray:
            return np.asarray(inc_apply(inc_params,
                                        jnp.asarray(images, jnp.float32)))
        return fn

    from multimodal_vae_comparison_tpu.models import perceptual
    from multimodal_vae_comparison_tpu.models.nets import VGGFeatures
    model = VGGFeatures()
    params = perceptual.extractor_params()

    def fn(images: np.ndarray) -> np.ndarray:
        x = jnp.asarray(images, jnp.float32)
        feats = model.apply(params, x)[-1]
        return np.asarray(feats.mean(axis=(1, 2)))

    return fn


def activation_statistics(images: np.ndarray, feature_fn,
                          batch_size: int = 64):
    feats = []
    for b in range(0, len(images), batch_size):
        feats.append(feature_fn(images[b:b + batch_size]))
    feats = np.concatenate(feats)
    mu = feats.mean(0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Frechet distance between two Gaussians
    (reference fid_score.py:140-180, standard formulation)."""
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def calculate_fid_given_data(real: np.ndarray, generated: np.ndarray,
                             feature_fn: Optional[Callable] = None) -> float:
    """FID between two in-memory image sets, NHWC float in [0, 1]
    (reference fid_score.py:291-316)."""
    if feature_fn is None:
        print(f"[fid] feature net: {active_feature_net()}")
        feature_fn = default_feature_fn()
    mu1, s1 = activation_statistics(real, feature_fn)
    mu2, s2 = activation_statistics(generated, feature_fn)
    return frechet_distance(mu1, s1, mu2, s2)
