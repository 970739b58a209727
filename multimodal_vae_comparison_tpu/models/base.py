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
    MixtureNormal, Normal, get_dist, kl_divergence, log_prob_joint)
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
    # name of the modality whose raw data conditions this modality's decoder
    # (resolved from the config's mod_type/name by build_specs); None = the
    # decoder sees only z.  Direct conditioning bypasses the latent
    # bottleneck for the conditioning modality — used for language-grounded
    # action decoding on VILANRO where the instruction must steer the
    # generated trajectory (reference vilanro_test.py:277-346 protocol).
    cond_on: Optional[str] = None
    # supply cond on every subset whenever the batch has the data
    # (conditional-VAE semantics) — measured motivation: with subset-gated
    # conditioning the trained decoder IGNORES the instruction
    # (flip_endpoint_shift 1 cm on vilanro_r4_cond) because the {img,lang}
    # subset's z already carries the goal; conditioning the {img}-only
    # subset forces the cross-attention to do the selection
    cond_always: bool = False

    @property
    def batch_ndims(self) -> int:
        return 1


def build_specs(cfg) -> Tuple[ModalitySpec, ...]:
    """ModalitySpec tuple from a parsed Config, resolving 'auto' llik scaling
    (reference mmvae_base.py:41-47: auto = min(data_dim)/prod(data_dim))."""
    dims = [int(np.prod(m.feature_dims)) for m in cfg.mods]
    min_dim = min(dims)
    # cond_on accepts either a modality block name ("mod_2") or a mod_type
    # ("language") — resolve both to the block name
    by_type = {m.mod_type: m.name for m in cfg.mods}
    names = {m.name for m in cfg.mods}
    specs = []
    for m, d in zip(cfg.mods, dims):
        scaling = float(min_dim) / d if m.llik_scaling == "auto" else float(m.llik_scaling)
        cond = getattr(m, "cond_on", None)
        if cond is not None:
            cond = cond if cond in names else by_type.get(cond)
            assert cond is not None and cond != m.name, (
                f"cond_on of {m.name} must name another modality "
                f"(by mod_type or mod_n), got {getattr(m, 'cond_on', None)}")
        specs.append(ModalitySpec(
            name=m.name, encoder=m.encoder, decoder=m.decoder,
            feature_dims=tuple(m.feature_dims), mod_type=m.mod_type,
            recon_loss=m.recon_loss, prior=m.prior, llik_scaling=scaling,
            private_latents=m.private_latents,
            has_masks=m.mod_type in ("text", "language", "actions", "sequence"),
            cond_on=cond,
            cond_always=bool(getattr(m, "cond_always", False)),
        ))
    return tuple(specs)


class _EndpointHead(nn.Module):
    """Tiny MLP head: joint latents -> predicted 3D action endpoint.

    Auxiliary latent supervision (VERDICT r3 item 1b): forces the joint
    posterior of the *non-action* modalities to carry the goal geometry the
    action decoder needs, instead of hoping reconstruction pressure puts it
    there.  Weighted like a modality via cfg.aux_endpoint."""

    hidden: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        h = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(z))
        return nn.Dense(3, dtype=jnp.float32)(h)


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
    # weight of the auxiliary endpoint-supervision loss (0 = off)
    aux_endpoint: float = 0.0
    # >1 = learnable mixture-of-Gaussians prior with this many components
    # (closes the prior/aggregate-posterior mismatch behind ~0 Joint Strict
    # under the reference's prior-sampling protocol)
    prior_components: int = 1

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
        if self.aux_endpoint > 0:
            self.aux_head = _EndpointHead(dtype=self.dtype)
        if self.prior_components > 1:
            C = self.prior_components
            # spread the component means; raw scale 0 -> softplus ~= 1.24
            # (slightly over-dispersed at init, shrinks during training)
            self._mog_loc = self.param(
                "pz_mog_loc", nn.initializers.normal(1.0),
                (C, self.n_latents))
            self._mog_rawscale = self.param(
                "pz_mog_rawscale", nn.initializers.zeros,
                (C, self.n_latents))
            self._mog_logits = self.param(
                "pz_mog_logits", nn.initializers.zeros, (C,))

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
        if self.prior_components > 1:
            scale = jax.nn.softplus(self._mog_rawscale + 0.5413) + 1e-4
            return MixtureNormal(self._mog_loc, scale, self._mog_logits)
        mu, scale = self.pz_params()
        return Normal(mu, scale)

    def sample_pz(self, key, num: int, temperature: float = 1.0):
        """(1, num, D) prior samples for joint generation — works for both
        the learned-scale Gaussian and the mixture prior."""
        pz = self.pz()
        if isinstance(pz, MixtureNormal):
            return pz.sample(key, num, temperature)[None]
        mu, scale = self.pz_params()
        eps = jax.random.normal(key, (1, num, self.n_latents))
        return mu + temperature * scale * eps

    def kld_to_prior(self, dist, z) -> jnp.ndarray:
        """(B,) KL(dist || learned prior): closed form for the Gaussian
        prior, MC over the already-drawn (K, B, D) posterior samples for
        the mixture prior (no closed form exists)."""
        pz = self.pz()
        if isinstance(pz, Normal):
            return kl_divergence(dist, pz).sum(-1)
        lq = dist.log_prob(z).sum(-1)          # (K, B)
        lp = pz.log_prob(z)                    # (K, B)
        return jnp.mean(lq - lp, axis=0)

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

    def _cond_for(self, name: str, batch, present: Tuple[str, ...]):
        """(data, mask) of the conditioning modality for ``name``'s decoder,
        or None when unconditioned / the conditioning modality is absent.

        Conditioning is only active when the conditioning modality is in
        ``present`` — a subset objective that excludes it must not leak its
        data through the decoder — unless the spec opts into
        ``cond_always`` (conditional-VAE semantics: the cond modality is an
        observed variable on every subset)."""
        spec = self.spec(name)
        if spec.cond_on is None:
            return None
        if not (spec.cond_always or spec.cond_on in present):
            return None
        mod = batch.get(spec.cond_on)
        if mod is None or mod.get("data") is None:
            return None
        return (mod["data"], mod.get("masks"))

    def decode_mod(self, name: str, z: jnp.ndarray, mask=None, cond=None):
        """Decode (K, B, D) samples with modality ``name``'s decoder.

        K folds into the batch axis for the decoder (keeps decoder shapes 2D
        at the interface and the matmuls large for the MXU) and unfolds after.
        ``cond`` is an optional (data, mask) pair of the conditioning
        modality's raw batch (see ModalitySpec.cond_on), tiled across K like
        the target mask.
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
        # fold with the BATCH dim as the major factor of the merge: under a
        # data mesh B is the sharded dim, and GSPMD can only shard a merged
        # dim through its major-most factor — reshape(K*B, D) with sharded B
        # minor forces XLA to replicate the whole decoder per device
        # (regression-tested by test_sharding.test_per_device_program_shrinks
        # _with_mesh: 8-device per-chip FLOPs 7.9M -> 1.5M).  The swapaxes is
        # local per shard (K is replicated) and fuses into the elementwise
        # consumers on a single chip.
        z_flat = z.swapaxes(0, 1).reshape(B * K, z.shape[-1])
        mask_rep = None
        if mask is not None:
            mask_rep = jnp.repeat(mask, K, axis=0)
        if cond is not None:
            cdata, cmask = cond
            cdata = jnp.repeat(cdata, K, axis=0)
            if cmask is not None:
                cmask = jnp.repeat(cmask, K, axis=0)
            out = self.decoders[name](z_flat, mask_rep,
                                      cond=cdata, cond_mask=cmask)
        else:
            out = self.decoders[name](z_flat, mask_rep)
        # image decoders return (mean, scale, logits) — the clipped logits
        # feed objectives.bce's stable softplus path (squash_dist)
        mean, scale = out[0], out[1]
        logits = out[2] if len(out) > 2 else None
        mean = mean.reshape((B, K) + mean.shape[1:]).swapaxes(0, 1)
        if logits is not None:
            logits = logits.reshape((B, K) + logits.shape[1:]).swapaxes(0, 1)
        return Normal(mean, scale, loc_logits=logits)

    def recon_lpx(self, spec: ModalitySpec, dist, batch) -> jnp.ndarray:
        """Scaled per-(K,B) reconstruction log-likelihood for one modality."""
        target = batch[spec.name]["data"]
        mask = batch[spec.name].get("masks")
        lpx = objectives.recon_log_prob(spec.recon_loss, dist, target, mask,
                                        batch_ndims=dist.mean.ndim - target.ndim + 1)
        return lpx * spec.llik_scaling

    def endpoint_spec(self) -> Optional[ModalitySpec]:
        """The action-waypoint modality the aux endpoint head supervises on
        (waypoints are padded by repeating the final achieved position, so
        data[:, -1, :3] IS the trajectory endpoint — data/datasets.py)."""
        return next((s for s in self.specs
                     if s.mod_type == "action_waypoints"), None)

    def aux_endpoint_loss(self, z: jnp.ndarray, batch):
        """(weighted loss term, per-sample mse metric) of the endpoint head
        on latents z of shape (K, B, D shared)."""
        spec = self.endpoint_spec()
        assert spec is not None, "aux_endpoint requires an action_waypoints modality"
        target = batch[spec.name]["data"][:, -1, ...]
        target = target.reshape(target.shape[0], -1)[:, :3]       # (B, 3)
        pred = self.aux_head(z[..., : self.n_latents])            # (K, B, 3)
        sq = jnp.sum((pred - target[None]) ** 2, axis=-1)         # (K, B)
        per_sample = jnp.mean(sq, axis=0)                         # (B,)
        return (self.aux_endpoint * jnp.sum(per_sample),
                jnp.mean(per_sample))

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
