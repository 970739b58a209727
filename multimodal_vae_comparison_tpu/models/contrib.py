"""Contrib API: example third-party mixing strategy.

Mirrors the reference plugin pattern
(multimodal_compare/models/contrib/example_contrib_mmvae.py): subclass the
base model, override ``mix``, and register the class in
``models/__init__.py``'s MIXING_REGISTRY under a new config name ("poe2").
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from multimodal_vae_comparison_tpu.models.mmvae import POE
from multimodal_vae_comparison_tpu.ops.fusion import product_of_experts


class POE2(POE):
    """Example contrib model: PoE without the universal prior expert."""

    def mix(self, qz_params, present: Tuple[str, ...]):
        mus = jnp.stack([qz_params[n]["shared"][0] for n in present])
        scales = jnp.stack([qz_params[n]["shared"][1] for n in present])
        return product_of_experts(mus, scales, include_prior=False)
