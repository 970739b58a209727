"""Multimodal VAE base: static model spec + shared encode/decode machinery.

TPU-first re-design of ``TorchMMVAE`` (multimodal_compare/models/mmvae_base.py).
The key departure from the reference: *modality structure is static*.  The
reference threads ``{"data": None}`` placeholders through dynamic dicts and
branches on them at runtime; under XLA that breaks tracing, so here the set of
present modalities is a static argument (a tuple of names) and each
present-set traces its own fused program.  Missing-modality imputation and
cross-generation become trace-time wiring, not runtime branching.

The per-modality VAE of the reference (models/vae.py:121-281) collapses into
``ModalitySpec`` + encoder/decoder submodules: the distributions are pure
pytrees so nothing else carries state.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multimodal_vae_comparison_tpu.models import objectives
from multimodal_vae_comparison_tpu.models.decoders import get_decoder
from multimodal_vae_comparison_tpu.models.distributions import (
    Normal, get_dist, kl_divergence)
from multimodal_vae_comparison_tpu.models.encoders import get_encoder
from multimodal_vae_comparison_tpu.models.output import VAEOutput


@dataclasses.dataclass(frozen=True)
class ModalitySpec:
    """Static description of one modality (from a ``modality_n`` config block)."""

    name: str                      # "mod_1", ...
    encoder: str                   # encoder class suffix, e.g. "CNN"
    decoder: str
    feature_dims: Tuple[int, ...]  # dataset feature dims, e.g. (64, 64, 3)
    mod_type: str = "image"
    recon_loss: str = "bce"
    prior: str = "normal"
    llik_scaling: float = 1.0
    private_latents: Optional[int] = None
    has_masks: bool = False

    @property
    def batch_ndims(self) -> int:
        return 1


def build_specs(cfg) -> Tuple[ModalitySpec, ...]:
    """ModalitySpec tuple from a parsed Config, resolving 'auto' llik scaling
    (reference mmvae_base.py:41-47: auto = min(data_dim)/prod(data_dim))."""
    dims = [int(np.prod(m.feature_dims)) for m in cfg.mods]
    min_dim = min(dims)
    specs = []
    for m, d in zip(cfg.mods, dims):
        scaling = float(min_dim) / d if m.llik_scaling == "auto" else float(m.llik_scaling)
        specs.append(ModalitySpec(
            name=m.name, encoder=m.encoder, decoder=m.decoder,
            feature_dims=tuple(m.feature_dims), mod_type=m.mod_type,
            recon_loss=m.recon_loss, prior=m.prior, llik_scaling=scaling,
            private_latents=m.private_latents,
            has_masks=m.mod_type in ("text", "language", "actions", "sequence"),
        ))
    return tuple(specs)


class MMVAE(nn.Module):
    """Base multimodal VAE (reference TorchMMVAE, mmvae_base.py:12-240).

    Subclasses implement ``forward`` (modality mixing + decoding) and
    ``objective`` (loss over one batch).  Both take the static tuple
    ``present`` of modality names with data available.
    """

    specs: Tuple[ModalitySpec, ...]
    n_latents: int
    obj: str = "elbo"
    beta: float = 1.0
    K: int = 1
    dtype: Any = jnp.float32
    # rematerialize encoder/decoder activations in the backward pass
    # (jax.checkpoint): trades FLOPs for HBM on the big video/ResNet trunks
    remat: bool = False

    def setup(self):
        encs, decs = {}, {}
        for spec in self.specs:
            out_latents = self.n_latents
            enc_cls = get_encoder(spec.encoder)
            dec_cls = get_decoder(spec.decoder)
            if self.remat:
                enc_cls = nn.remat(enc_cls)
                dec_cls = nn.remat(dec_cls)
            encs[spec.name] = enc_cls(latent_dim=out_latents,
                                      data_dim=spec.feature_dims,
                                      latent_private=spec.private_latents,
                                      dtype=self.dtype,
                                      name=f"enc_{spec.name}")
            decs[spec.name] = dec_cls(latent_dim=out_latents,
                                      data_dim=spec.feature_dims,
                                      latent_private=spec.private_latents,
                                      dtype=self.dtype,
                                      name=f"dec_{spec.name}")
        self.encoders = encs
        self.decoders = decs
        # learnable-scale prior (reference mmvae_base.py:35-38): mu fixed 0,
        # scale = softmax(raw) * D, raw trainable from zeros -> N(0, 1) at init.
        self._pz_raw = self.param("pz_logvar", nn.initializers.zeros,
                                  (1, self.n_latents))

    # -- spec helpers --------------------------------------------------------

    @property
    def mod_names(self) -> Tuple[str, ...]:
        return tuple(s.name for s in self.specs)

    def spec(self, name: str) -> ModalitySpec:
        return next(s for s in self.specs if s.name == name)

    @property
    def latent_factorization(self) -> bool:
        return any(s.private_latents is not None for s in self.specs)

    # -- distributions --------------------------------------------------------

    def pz_params(self):
        scale = jax.nn.softmax(self._pz_raw, axis=1) * self._pz_raw.shape[-1]
        return jnp.zeros_like(self._pz_raw), scale

    def pz(self):
        mu, scale = self.pz_params()
        return Normal(mu, scale)

    def posterior(self, spec: ModalitySpec, mu, scale):
        return get_dist(spec.prior)(mu, scale)

    def prior_for(self, spec: ModalitySpec, dim: Optional[int] = None):
        dim = dim or self.n_latents
        cls = get_dist(spec.prior)
        return cls(jnp.zeros((1, dim)), jnp.ones((1, dim)))

    def kld_std(self, spec: ModalitySpec, dist) -> jnp.ndarray:
        """Sum-over-latents KL(dist || unit prior of spec's family).

        Gaussian case runs the fused Pallas reduction on TPU
        (ops/pallas/kl_kernel.py); other families use the generic closed
        form / MC path.
        """
        if isinstance(dist, Normal) and spec.prior in ("normal", "gaussian"):
            from multimodal_vae_comparison_tpu.ops.pallas.kl_kernel import (
                kl_normal_std_fused)
            return kl_normal_std_fused(dist.loc, dist.scale)
        return kl_divergence(
            dist, self.prior_for(spec, dim=dist.loc.shape[-1])).sum(-1)

    # -- shared machinery ------------------------------------------------------

    def encode(self, batch: Dict[str, Dict[str, Any]],
               present: Tuple[str, ...]):
        """Encode present modalities; split shared/private if factorized
        (reference mmvae_base.py:139-159)."""
        out = {}
        for spec in self.specs:
            if spec.name not in present:
                out[spec.name] = {"shared": None, "private": None}
                continue
            mod = batch[spec.name]
            mu, scale = self.encoders[spec.name](mod["data"], mod.get("masks"))
            if spec.private_latents is None:
                out[spec.name] = {"shared": (mu, scale), "private": None}
            else:
                n = self.n_latents
                out[spec.name] = {
                    "shared": (mu[:, :n], scale[:, :n]),
                    "private": (mu[:, n:], scale[:, n:]),
                }
        return out

    def decode_mod(self, name: str, z: jnp.ndarray, mask=None):
        """Decode (K, B, D) samples with modality ``name``'s decoder.

        K folds into the batch axis for the decoder (keeps decoder shapes 2D
        at the interface and the matmuls large for the MXU) and unfolds after.
        """
        expected = self.n_latents + (self.spec(name).private_latents or 0)
        if z.shape[-1] != expected:
            # shared-only latents (prior/joint sampling, traversals, serving
            # decode): pad the private dims with the private prior's mean so
            # factorized (DMVAE-style) decoders accept them.  Anything other
            # than exactly-shared width is a caller bug — fail loudly rather
            # than zero-padding to plausible-looking garbage.
            if z.shape[-1] != self.n_latents:
                raise ValueError(
                    f"decode_mod('{name}') got latents of width "
                    f"{z.shape[-1]}; expected {expected} "
                    f"(or {self.n_latents} shared-only)")
            pad = jnp.zeros(z.shape[:-1] + (expected - z.shape[-1],), z.dtype)
            z = jnp.concatenate([z, pad], axis=-1)
        K, B = z.shape[0], z.shape[1]
        z_flat = z.reshape(K * B, z.shape[-1])
        mask_rep = None
        if mask is not None:
            mask_rep = jnp.tile(mask, (K,) + (1,) * (mask.ndim - 1))
        mean, scale = self.decoders[name](z_flat, mask_rep)
        mean = mean.reshape((K, B) + mean.shape[1:])
        return Normal(mean, scale)

    def recon_lpx(self, spec: ModalitySpec, dist, batch) -> jnp.ndarray:
        """Scaled per-(K,B) reconstruction log-likelihood for one modality."""
        target = batch[spec.name]["data"]
        mask = batch[spec.name].get("masks")
        lpx = objectives.recon_log_prob(spec.recon_loss, dist, target, mask,
                                        batch_ndims=dist.mean.ndim - target.ndim + 1)
        return lpx * spec.llik_scaling

    def sample_posterior(self, spec, params, key, K=None):
        qz = self.posterior(spec, *params)
        z = qz.rsample(key, (K or self.K,))
        return qz, z

    # -- to be implemented by mixing strategies ---------------------------------

    def __call__(self, batch, present: Optional[Tuple[str, ...]] = None):
        """Default entry point: full-present forward pass."""
        present = present or self.mod_names
        return self.forward(batch, present)

    def forward(self, batch, present: Tuple[str, ...]) -> VAEOutput:
        raise NotImplementedError

    def objective(self, batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        raise NotImplementedError
