"""Forward-pass output containers as frozen pytrees.

Replaces the reference's mutable, assertion-heavy ``VAEOutput`` container
(multimodal_compare/models/output_storage.py:4-126) with ``flax.struct``
dataclasses: they are pytrees, so they flow through jit/vmap/shard_map
boundaries without special handling, and their field structure is static at
trace time.  Same eight semantic slots as the reference.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ModalityOutput:
    """Per-modality forward outputs (reference output_storage.py:8-57)."""

    encoder_dist: Optional[Any] = None        # q(z|x_m) over shared latents
    enc_dist_private: Optional[Any] = None    # q(z_private|x_m)
    joint_dist: Optional[Any] = None          # joint posterior used for m
    decoder_dist: Optional[Any] = None        # p(x_m|z_m) self-reconstruction
    joint_decoder_dist: Optional[Any] = None  # p(x_m|z_joint)
    dec_dist_private: Optional[Any] = None
    cross_decoder_dist: Optional[Dict[str, Any]] = None  # from other mods' z
    latents: Optional[jnp.ndarray] = None     # (K, B, D) samples decoded for m


@struct.dataclass
class VAEOutput:
    """Forward output keyed by modality name (reference output_storage.py:60-126)."""

    mods: Dict[str, ModalityOutput]

    def unpack(self, field: str):
        """Dict of per-modality values for one field (cf. unpack_values)."""
        return {k: getattr(v, field) for k, v in self.mods.items()}
