"""The multimodal VAE zoo: MOE (MMVAE), POE (MVAE), MoPOE, DMVAE.

TPU-first re-implementations of the four mixing strategies in the reference
(multimodal_compare/models/mmvae_models.py, 530 LoC).  Faithful math, static
structure:

* POE's per-step subset subsampling (reference utils.py:86-112 +
  mmvae_models.py:159-187) unrolls over the *static* subset lattice — one
  fused XLA program instead of 2^M-1 dynamic dict rewrites per step;
* MoPoE's powerset fusion (mmvae_models.py:279-345) is fixed at build time;
  its batch-stratified mixture selection uses static split sizes
  (ops/fusion.py);
* MOE's cross-reconstruction matrix (mmvae_models.py:112-116) is trace-time
  wiring; DReG's gradient hook becomes objectives.scale_grad (custom_vjp);
* the PoE fusion itself is ops.fusion.product_of_experts, with the prior
  expert folded in analytically instead of concatenated
  (mmvae_models.py:235-250).

Deliberate fixes of reference quirks (documented in SURVEY.md §7):
* MOE's ELBO appends the own-reconstruction term once (the reference
  duplicates it once per cross pair, mmvae_models.py:52-62);
* product_of_experts returns a well-formed (mu, scale).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from multimodal_vae_comparison_tpu.models import objectives
from multimodal_vae_comparison_tpu.models.base import MMVAE
from multimodal_vae_comparison_tpu.models.distributions import (
    Normal, kl_divergence, log_mean_exp, log_prob_joint)
from multimodal_vae_comparison_tpu.models.output import ModalityOutput, VAEOutput
from multimodal_vae_comparison_tpu.ops.fusion import (
    mixture_component_selection, product_of_experts, subset_lattice)


def _kmean(lpx):
    """Average a (K, B) likelihood term over the K sample axis.

    ELBO objectives pair reconstruction terms with a KL that has no K axis;
    summing over K would scale recon K-fold and silently shrink the
    effective beta by K.  (B,)-shaped terms pass through unchanged."""
    return lpx.mean(axis=0) if lpx.ndim == 2 else lpx


def _mask_of(batch, name):
    return batch[name].get("masks")


class MOE(MMVAE):
    """Mixture-of-experts MMVAE (https://github.com/iffsid/mmvae;
    reference mmvae_models.py:10-131).

    Each present modality's posterior is sampled independently; every sample
    is decoded by every decoder (full cross-reconstruction matrix); missing
    modalities are imputed from the first present modality's samples.
    """

    def forward(self, batch, present: Tuple[str, ...]) -> VAEOutput:
        qz_params = self.encode(batch, present)
        filled = [n for n in self.mod_names if n in present]
        mods: Dict[str, ModalityOutput] = {}
        zs, qzs = {}, {}
        for spec in self.specs:
            name = spec.name
            if name in present:
                key = self.make_rng("sample")
                qz, z = self.sample_posterior(spec, qz_params[name]["shared"], key)
                qzs[name], zs[name] = qz, z
            else:
                qzs[name] = None
        for spec in self.specs:
            name = spec.name
            src = name if name in present else filled[0]
            z = zs[src]
            cond = self._cond_for(name, batch, present)
            dec = self.decode_mod(name, z, _mask_of(batch, name), cond=cond)
            cross = {}
            for other in self.mod_names:
                if other != name and other in present:
                    cross[other] = self.decode_mod(name, zs[other],
                                                   _mask_of(batch, name),
                                                   cond=cond)
            mods[name] = ModalityOutput(encoder_dist=qzs[name],
                                        decoder_dist=dec,
                                        cross_decoder_dist=cross,
                                        latents=z)
        return VAEOutput(mods=mods)

    def objective(self, batch):
        if self.obj in ("elbo", "elbo_iw"):
            return self._objective_elbo(batch)
        return self._objective_kweighted(batch)

    def _objective_elbo(self, batch):
        """Canonical MMVAE mixture ELBO (m_elbo_naive of
        https://github.com/iffsid/mmvae):

            (1/M) sum_m [ sum_n llik_n * log p(x_n | z_m) - beta KL(q_m||p) ]

        — every decoder trains on every modality's samples with unit weight,
        which is what aligns the shared space for cross-generation.

        TPU-first restructure (round 4): the cross-reconstruction matrix is
        M*M decoder applications; instead of M*M dispatches at batch K*B
        (forward()'s wiring — kept for eval), all M source samples stack
        along the folded K axis and each decoder runs ONCE at batch M*K*B.
        Identical math and RNG draw order; M-fold larger matmuls.

        Documented fix: the reference weights the cross terms by
        exp(log q_r(z_o) - log q_o(z_o)) (mmvae_models.py:52-62); with the
        sharp softmax+eta posterior scales that factor underflows to ~0, so
        the cross decoders receive no gradient and Img<->Txt coherency
        collapses (confirmed empirically on CdSprites+ L1).  The
        importance-weighted variant remains available as obj 'elbo_iw'.
        """
        weighted = self.obj == "elbo_iw"
        present = self.mod_names
        qz_params = self.encode(batch, present)
        qzs, zs = {}, {}
        for spec in self.specs:   # same make_rng order as forward()
            qz, z = self.sample_posterior(spec, qz_params[spec.name]["shared"],
                                          self.make_rng("sample"))
            qzs[spec.name], zs[spec.name] = qz, z
        M = len(self.specs)
        z_all = jnp.concatenate([zs[n] for n in self.mod_names], axis=0)
        lpx_by_tgt = {}                                     # name -> (M, K, B)
        for spec in self.specs:
            dec = self.decode_mod(spec.name, z_all, _mask_of(batch, spec.name),
                                  cond=self._cond_for(spec.name, batch, present))
            lpx = self.recon_lpx(spec, dec, batch)          # (M*K, B)
            lpx_by_tgt[spec.name] = lpx.reshape((M, self.K) + lpx.shape[1:])
        lpx_terms, klds, rec_per_mod = [], [], {}
        for i, spec in enumerate(self.specs):
            qz = qzs[spec.name]
            kld = (self.kld_to_prior(qz, zs[spec.name])
                   if self.prior_components > 1 else self.kld_std(spec, qz))
            klds.append(kld)
            lpx_own = lpx_by_tgt[spec.name][i]
            # metric convention (shared with POE/MoPoE/DMVAE): K-averaged,
            # llik_scaling divided out, batch-summed
            rec_per_mod[spec.name] = (-jnp.sum(_kmean(lpx_own))
                                      / spec.llik_scaling)
            lpx_terms.append(lpx_own)
            for j, other in enumerate(self.mod_names):
                if other == spec.name:
                    continue
                lpx_cross = lpx_by_tgt[spec.name][j]
                if weighted:
                    z_o = jax.lax.stop_gradient(zs[other])
                    lq_self = jnp.nan_to_num(qz.log_prob(z_o), nan=0.0).sum(-1)
                    lq_other = jax.lax.stop_gradient(
                        qzs[other].log_prob(z_o).sum(-1))
                    lpx_cross = jnp.exp(lq_self - lq_other) * lpx_cross
                lpx_terms.append(lpx_cross)
        lpx = jnp.stack([_kmean(t) for t in lpx_terms])
        kld = jnp.stack(klds)
        loss = objectives.elbo(lpx, kld, self.beta) / len(self.specs)
        metrics = {"kld": jnp.sum(jnp.mean(kld, axis=-1)),
                   **{f"reconstruction_loss_{k}": v
                      for k, v in rec_per_mod.items()}}
        return loss, metrics

    def _objective_kweighted(self, batch):
        """IWAE / DReG K-sample bounds, looser multimodal variant
        (reference objectives.py:342-387).

        All likelihood terms — lpz, lqz AND every decoder reconstruction —
        are computed from the latents handed to ``log_weights``, so when the
        DReG pass re-runs it on scale_grad-wrapped latents the reconstruction
        path's z-gradients pick up the importance-weight rescaling too
        (reference ``zss.register_hook`` rescales *every* path through zss).
        The first, unscaled pass feeds only the stop-gradient weights, so XLA
        CSEs its decodes against the scaled pass (identical primal values).
        """
        dreg = self.obj == "dreg"
        pz = self.pz()
        qz_params = self.encode(batch, self.mod_names)
        qzs, zs = {}, {}
        for spec in self.specs:
            qz, z = self.sample_posterior(spec, qz_params[spec.name]["shared"],
                                          self.make_rng("sample"))
            qzs[spec.name], zs[spec.name] = qz, z
        rec_per_mod = {}

        M = len(self.specs)

        def log_weights(zs_dict):
            # lattice-batched decoding (round 4): all M sources' samples
            # stack along the folded K axis; each decoder dispatches ONCE at
            # batch M*K*B instead of M times at K*B — identical math,
            # M-fold larger matmuls for the MXU
            z_all = jnp.concatenate([zs_dict[n] for n in self.mod_names],
                                    axis=0)                   # (M*K, B, D)
            lpx_by_tgt = {}                                   # -> (M, K, B)
            for tgt in self.mod_names:
                dec = self.decode_mod(tgt, z_all, _mask_of(batch, tgt),
                                      cond=self._cond_for(
                                          tgt, batch, self.mod_names))
                lpx_t = self.recon_lpx(self.spec(tgt), dec, batch)
                lpx_by_tgt[tgt] = lpx_t.reshape(
                    (M, self.K) + lpx_t.shape[1:])
            lws = []
            for i, spec in enumerate(self.specs):
                z_r = zs_dict[spec.name]                      # (K, B, D)
                lpz = log_prob_joint(pz, z_r)
                q_terms = []
                for other in self.mod_names:
                    q = qzs[other]
                    if dreg:
                        q = jax.tree_util.tree_map(jax.lax.stop_gradient, q)
                    q_terms.append(q.log_prob(z_r).sum(-1))
                lqz = log_mean_exp(jnp.stack(q_terms), axis=0)
                # reconstruct *all* modalities from z_r: own + crosses
                lpx_all = None
                for tgt in self.mod_names:
                    lpx_t = lpx_by_tgt[tgt][i]
                    if tgt == spec.name:
                        rec_per_mod[spec.name] = (-jnp.sum(_kmean(lpx_t))
                                                  / self.spec(tgt).llik_scaling)
                    lpx_all = lpx_t if lpx_all is None else lpx_all + lpx_t
                lws.append(lpz + lpx_all - self.beta * lqz)
            return jnp.stack(lws)                             # (M, K, B)

        lw = log_weights(zs)
        if not dreg:
            loss = -jnp.sum(log_mean_exp(lw.reshape(-1, lw.shape[-1]), axis=0))
        else:
            w = jax.lax.stop_gradient(jax.nn.softmax(lw, axis=1))  # over K
            zs_scaled = {name: objectives.scale_grad(
                zs[name], w[i][..., None]) for i, name in enumerate(self.mod_names)}
            lw2 = log_weights(zs_scaled)
            loss = -jnp.sum(jnp.mean(jnp.sum(w * lw2, axis=1), axis=0))
        metrics = {"kld": jnp.zeros(()), **{f"reconstruction_loss_{k}": v
                                            for k, v in rec_per_mod.items()}}
        return loss, metrics


class POE(MMVAE):
    """Product-of-experts MVAE (https://github.com/mhw32/multimodal-vae-public;
    reference mmvae_models.py:134-250).

    Joint posterior = PoE(prior expert, present experts); the training
    objective sums one ELBO per modality subset (sub-sampled training,
    reference mmvae_models.py:159-187) — here the subset loop unrolls at
    trace time over the static lattice.
    """

    def _check_priors(self):
        for spec in self.specs:
            assert spec.prior in ("normal", "gaussian"), \
                "POE only works with gaussian priors! Adjust the config"

    def mix(self, qz_params, present: Tuple[str, ...]):
        """PoE fusion of the present experts + analytic prior expert
        (reference modality_mixing, mmvae_models.py:210-232)."""
        mus = jnp.stack([qz_params[n]["shared"][0] for n in present])
        scales = jnp.stack([qz_params[n]["shared"][1] for n in present])
        mu, scale = product_of_experts(mus, scales, include_prior=True)
        return mu, scale

    def forward(self, batch, present: Tuple[str, ...]) -> VAEOutput:
        self._check_priors()
        qz_params = self.encode(batch, present)
        mu, scale = self.mix(qz_params, present)
        joint = Normal(mu, scale)
        z = joint.rsample(self.make_rng("sample"), (self.K,))
        mods = {}
        for spec in self.specs:
            dec = self.decode_mod(spec.name, z, _mask_of(batch, spec.name),
                                  cond=self._cond_for(spec.name, batch, present))
            enc = (Normal(*qz_params[spec.name]["shared"])
                   if spec.name in present else None)
            mods[spec.name] = ModalityOutput(encoder_dist=enc, joint_dist=joint,
                                             decoder_dist=dec, latents=z)
        return VAEOutput(mods=mods)

    def objective(self, batch):
        """Subset-lattice ELBO with lattice-batched decoding.

        TPU-first restructure (round 4, VERDICT item 2): the naive loop
        decodes each modality once per subset — S*M decoder dispatches at
        batch K*B, which starves the MXU at the reference's bs=24 envelope
        (the conv matmuls are 128-lane-padded and tiny).  Here every
        subset's samples are stacked along the already-folded K axis and
        each decoder runs ONCE on a (S*K, B) batch — identical math and
        identical per-subset RNG draws (same make_rng order as the old
        per-subset forward loop), S-fold larger matmuls.  Encoding happens
        once instead of once per subset (XLA CSEd the duplicates at runtime,
        but the jaxpr-walking MXU-FLOP counter double-counted them).
        """
        self._check_priors()
        lattice = subset_lattice(len(self.specs))
        S = len(lattice)
        presents = [tuple(self.specs[i].name for i in subset)
                    for subset in lattice]
        qz_params = self.encode(batch, self.mod_names)
        joints, z_subs = [], []
        for present in presents:
            mu, scale = self.mix(qz_params, present)
            joint = Normal(mu, scale)
            joints.append(joint)
            z_subs.append(joint.rsample(self.make_rng("sample"), (self.K,)))
        z_all = jnp.concatenate(z_subs, axis=0)            # (S*K, B, D)
        # (S, B) K-averaged recon log-prob per modality; one decoder
        # dispatch per modality unless its conditioning varies by subset
        lpx_sub = {}
        for spec in self.specs:
            mask = _mask_of(batch, spec.name)
            conds = [self._cond_for(spec.name, batch, p) for p in presents]
            # _cond_for builds a fresh (data, masks) tuple per call, so the
            # "all subsets share one conditioning input" fast path compares
            # the underlying arrays by identity, not the tuples.
            if all(c is None for c in conds) or all(
                    c is not None and c[0] is conds[0][0]
                    and c[1] is conds[0][1] for c in conds) or (
                    spec.cond_on is not None and spec.cond_always
                    and all(c is not None for c in conds)):
                dec = self.decode_mod(spec.name, z_all, mask, cond=conds[0])
                lpx = self.recon_lpx(spec, dec, batch)     # (S*K, B)
                lpx_sub[spec.name] = lpx.reshape(
                    (S, self.K) + lpx.shape[1:]).mean(axis=1)
            else:  # subset-dependent conditioning: per-subset decode
                lpx_sub[spec.name] = jnp.stack([
                    _kmean(self.recon_lpx(spec, self.decode_mod(
                        spec.name, z_subs[s], mask, cond=conds[s]), batch))
                    for s in range(S)])
        total = jnp.zeros(())
        total_kld = jnp.zeros(())
        rec_per_mod = {s.name: jnp.zeros(()) for s in self.specs}
        aux_spec = self.endpoint_spec() if self.aux_endpoint > 0 else None
        aux_metrics = {}
        for s, present in enumerate(presents):
            kld = self.kld_to_prior(joints[s], z_subs[s])
            lpx_sum = jnp.zeros(())
            for spec in self.specs:
                lpx = lpx_sub[spec.name][s]
                lpx_sum = lpx_sum + jnp.sum(lpx)
                if len(present) == 1 and present[0] == spec.name:
                    rec_per_mod[spec.name] = -jnp.sum(lpx) / spec.llik_scaling
            total = total + (-(lpx_sum - self.beta * jnp.sum(kld)))
            total_kld = total_kld + jnp.mean(kld)
            # auxiliary endpoint supervision on the joint posterior of all
            # NON-action modalities (the evaluation-time conditioning set):
            # supervising the full subset instead would be shortcut through
            # the action expert, which trivially encodes its own endpoint
            if (aux_spec is not None and aux_spec.name not in present
                    and len(present) == len(self.specs) - 1):
                aux_term, aux_mse = self.aux_endpoint_loss(z_subs[s], batch)
                total = total + aux_term
                aux_metrics["aux_endpoint_mse"] = aux_mse
        metrics = {"kld": total_kld / len(lattice), **aux_metrics,
                   **{f"reconstruction_loss_{k}": v for k, v in rec_per_mod.items()}}
        return total, metrics


class MoPOE(MMVAE):
    """Mixture-of-products-of-experts, generalized multimodal ELBO
    (https://arxiv.org/abs/2105.02470; reference mmvae_models.py:253-410)."""

    def subsets(self) -> Tuple[Tuple[int, ...], ...]:
        return tuple(subset_lattice(len(self.specs)))

    def mix(self, qz_params, present: Tuple[str, ...]):
        """PoE within each fully-present subset, stratified MoE across subsets
        (reference modality_mixing, mmvae_models.py:322-349)."""
        subset_dists = {}
        mus, scales = [], []
        for subset in self.subsets():
            names = [self.specs[i].name for i in subset]
            if not all(n in present for n in names):
                continue
            sub_mu = jnp.stack([qz_params[n]["shared"][0] for n in names])
            sub_scale = jnp.stack([qz_params[n]["shared"][1] for n in names])
            # prior expert joins only the full set (reference poe_fusion,
            # mmvae_models.py:385-394)
            include_prior = len(subset) == len(self.specs)
            mu, scale = product_of_experts(sub_mu, sub_scale,
                                           include_prior=include_prior)
            key = "_".join(sorted(names))
            subset_dists[key] = Normal(mu, scale)
            mus.append(mu)
            scales.append(scale)
        joint_mu, joint_scale = mixture_component_selection(
            jnp.stack(mus), jnp.stack(scales))
        return Normal(joint_mu, joint_scale), subset_dists

    def forward(self, batch, present: Tuple[str, ...]) -> VAEOutput:
        qz_params = self.encode(batch, present)
        joint, subset_dists = self.mix(qz_params, present)
        z = joint.rsample(self.make_rng("sample"), (self.K,))
        mods = {}
        for spec in self.specs:
            enc = (Normal(*qz_params[spec.name]["shared"])
                   if spec.name in present else None)
            dec = self.decode_mod(spec.name, z, _mask_of(batch, spec.name),
                                  cond=self._cond_for(spec.name, batch, present))
            mods[spec.name] = ModalityOutput(encoder_dist=enc, joint_dist=joint,
                                             decoder_dist=dec, latents=z)
        return VAEOutput(mods=mods)

    def objective(self, batch):
        present = self.mod_names
        qz_params = self.encode(batch, present)
        joint, subset_dists = self.mix(qz_params, present)
        z = joint.rsample(self.make_rng("sample"), (self.K,))
        pz = self.pz()
        # weighted group KLD over all subset posteriors + joint
        # (reference objectives.py:184-201)
        dists = list(subset_dists.values()) + [joint]
        w = 1.0 / len(dists)
        group_div = jnp.zeros(())
        for d in dists:
            if self.prior_components > 1:
                z_d = z if d is joint else d.rsample(
                    self.make_rng("sample"), (self.K,))
                div = self.kld_to_prior(d, z_d)
            else:
                div = kl_divergence(d, pz).sum(-1)
            group_div = group_div + w * jnp.mean(div)
        # reference reduces lpx with a batch mean (mmvae_models.py:315)
        lpx_total = jnp.zeros(())
        rec_per_mod = {}
        for spec in self.specs:
            dec = self.decode_mod(spec.name, z, _mask_of(batch, spec.name),
                                  cond=self._cond_for(spec.name, batch, present))
            lpx = _kmean(self.recon_lpx(spec, dec, batch))
            lpx_total = lpx_total + jnp.mean(lpx)
            rec_per_mod[spec.name] = -jnp.sum(lpx) / spec.llik_scaling
        loss = -(lpx_total - self.beta * group_div)
        metrics = {"kld": group_div,
                   **{f"reconstruction_loss_{k}": v for k, v in rec_per_mod.items()}}
        return loss, metrics


class DMVAE(MMVAE):
    """Private+shared disentangled multimodal VAE
    (https://github.com/seqam-lab/DMVAE; reference mmvae_models.py:413-530)."""

    def _check_factorized(self):
        assert self.latent_factorization, \
            "DMVAE requires private_latents in the config"

    def forward(self, batch, present: Tuple[str, ...]) -> VAEOutput:
        self._check_factorized()
        qz_params = self.encode(batch, present)
        filled = [n for n in present]
        mus = jnp.stack([qz_params[n]["shared"][0] for n in filled])
        scales = jnp.stack([qz_params[n]["shared"][1] for n in filled])
        joint_mu, joint_scale = product_of_experts(mus, scales,
                                                   include_prior=False)
        joint = Normal(joint_mu, joint_scale)
        z_joint = joint.rsample(self.make_rng("sample"), (self.K,))
        mods = {}
        for spec in self.specs:
            name = spec.name
            mask = _mask_of(batch, name)
            if name in present:
                qz = Normal(*qz_params[name]["shared"])
                qz_priv = Normal(*qz_params[name]["private"])
                z_shared = qz.rsample(self.make_rng("sample"), (self.K,))
                z_priv = qz_priv.rsample(self.make_rng("sample"), (self.K,))
            else:
                qz, qz_priv = None, None
                z_shared = z_joint
                B = z_joint.shape[1]
                prior_priv = Normal(jnp.zeros((B, spec.private_latents)),
                                    jnp.ones((B, spec.private_latents)))
                z_priv = prior_priv.rsample(self.make_rng("sample"), (self.K,))
            cond = self._cond_for(name, batch, present)
            dec = self.decode_mod(name, jnp.concatenate([z_shared, z_priv], -1),
                                  mask, cond=cond)
            dec_joint = self.decode_mod(
                name, jnp.concatenate([z_joint, z_priv], -1), mask, cond=cond)
            cross = {}
            for other in present:
                if other == name:
                    continue
                q_o = Normal(*qz_params[other]["shared"])
                z_o = q_o.rsample(self.make_rng("sample"), (self.K,))
                cross[other] = self.decode_mod(
                    name, jnp.concatenate([z_o, z_priv], -1), mask, cond=cond)
            mods[name] = ModalityOutput(encoder_dist=qz, enc_dist_private=qz_priv,
                                        joint_dist=joint, decoder_dist=dec,
                                        joint_decoder_dist=dec_joint,
                                        cross_decoder_dist=cross,
                                        latents=z_shared)
        return VAEOutput(mods=mods)

    def objective(self, batch):
        """Triple ELBO per modality: own + joint + cross-with-private-KL
        (reference mmvae_models.py:436-465)."""
        self._check_factorized()
        out = self.forward(batch, self.mod_names)
        pz = self.pz()
        total = jnp.zeros(())
        total_kld = jnp.zeros(())
        rec_per_mod = {}
        for spec in self.specs:
            mo = out.mods[spec.name]
            lpx = _kmean(self.recon_lpx(spec, mo.decoder_dist, batch))
            lpx_joint = _kmean(self.recon_lpx(spec, mo.joint_decoder_dist,
                                              batch))
            if self.prior_components > 1:
                kld = self.kld_to_prior(mo.encoder_dist, mo.latents)
                z_j = mo.joint_dist.rsample(self.make_rng("sample"),
                                            (self.K,))
                kld_joint = self.kld_to_prior(mo.joint_dist, z_j)
            else:
                kld = kl_divergence(mo.encoder_dist, pz).sum(-1)
                kld_joint = kl_divergence(mo.joint_dist, pz).sum(-1)
            prior_priv = Normal(jnp.zeros((1, spec.private_latents)),
                                jnp.ones((1, spec.private_latents)))
            lpx_cross = jnp.zeros(())
            kld_priv = jnp.zeros(())
            for other, cross in mo.cross_decoder_dist.items():
                lpx_cross = lpx_cross + jnp.sum(
                    _kmean(self.recon_lpx(spec, cross, batch)))
                kld_priv = kld_priv + jnp.sum(
                    self.kld_std(spec, mo.enc_dist_private))
            loss_m = (objectives.elbo(lpx, kld, self.beta)
                      + objectives.elbo(lpx_joint, kld_joint, self.beta)
                      + (-(lpx_cross - self.beta * kld_priv)))
            total = total + loss_m
            total_kld = total_kld + jnp.mean(kld)
            rec_per_mod[spec.name] = -jnp.sum(lpx) / spec.llik_scaling
        metrics = {"kld": total_kld / len(self.specs),
                   **{f"reconstruction_loss_{k}": v for k, v in rec_per_mod.items()}}
        return total, metrics


class UnimodalVAE(MMVAE):
    """Single-modality VAE used when the config has one modality block
    (reference trainer.py:112-113 falls back to the plain VAE)."""

    def forward(self, batch, present: Optional[Tuple[str, ...]] = None) -> VAEOutput:
        spec = self.specs[0]
        qz_params = self.encode(batch, (spec.name,))
        qz, z = self.sample_posterior(spec, qz_params[spec.name]["shared"],
                                      self.make_rng("sample"))
        dec = self.decode_mod(spec.name, z, _mask_of(batch, spec.name))
        return VAEOutput(mods={spec.name: ModalityOutput(
            encoder_dist=qz, decoder_dist=dec, latents=z)})

    def _gumbel_forward(self, batch):
        """Gumbel-softmax categorical latent path (reference vae.py:86-97):
        relu'd encoder output reshaped into (groups, cats) categorical logits,
        relaxed one-hot samples decoded through a sigmoid head."""
        from multimodal_vae_comparison_tpu.models.distributions import (
            OneHotCategorical)
        spec = self.specs[0]
        qz_params = self.encode(batch, (spec.name,))
        mu, _ = qz_params[spec.name]["shared"]
        cats = spec.feature_dims[1]
        groups = self.n_latents // cats
        logits = jax.nn.relu(mu).reshape(mu.shape[0], groups, cats)
        qz = OneHotCategorical(logits=logits)
        z = qz.rsample(self.make_rng("sample"), (self.K,))
        z = z.reshape(self.K, mu.shape[0], groups * cats)
        dec = self.decode_mod(spec.name, z, _mask_of(batch, spec.name))
        return VAEOutput(mods={spec.name: ModalityOutput(
            encoder_dist=qz, decoder_dist=dec, latents=z)})

    def objective(self, batch):
        spec = self.specs[0]
        if self.obj == "elbo_gumbel" or spec.prior == "gumbel":
            from multimodal_vae_comparison_tpu.models.distributions import (
                OneHotCategorical)
            out = self._gumbel_forward(batch)
            mo = out.mods[spec.name]
            lpx = self.recon_lpx(spec, mo.decoder_dist, batch)
            uniform = OneHotCategorical(
                logits=jnp.zeros_like(mo.encoder_dist.logits))
            kld = mo.encoder_dist.kl(uniform).sum(-1)
            loss = objectives.elbo(lpx, kld, self.beta)
            return loss, {"kld": jnp.sum(kld),
                          f"reconstruction_loss_{spec.name}": -jnp.sum(lpx)}
        out = self.forward(batch)
        mo = out.mods[spec.name]
        lpx = self.recon_lpx(spec, mo.decoder_dist, batch)
        if self.obj in ("elbo", "elbo_gumbel"):
            kld = (self.kld_to_prior(mo.encoder_dist, mo.latents)
                   if self.prior_components > 1
                   else self.kld_std(spec, mo.encoder_dist))
            loss = objectives.elbo(lpx, kld, self.beta)
            kld_m = jnp.sum(kld)
        elif self.obj == "dreg":
            # proper DReG: stop-gradient encoder params in lqz, and rescale
            # every z-path gradient (incl. the decoder's) by the stop-grad
            # softmax weights via scale_grad + re-decode.
            pz = self.pz()
            z = mo.latents
            q_sg = jax.tree_util.tree_map(jax.lax.stop_gradient, mo.encoder_dist)
            lw = log_prob_joint(pz, z) + lpx - q_sg.log_prob(z).sum(-1)
            w = objectives.dreg_grad_weights(lw)              # (K, B)
            z_s = objectives.scale_grad(z, w[..., None])
            dec_s = self.decode_mod(spec.name, z_s, _mask_of(batch, spec.name))
            lpx_s = self.recon_lpx(spec, dec_s, batch)
            lw_s = log_prob_joint(pz, z_s) + lpx_s - q_sg.log_prob(z_s).sum(-1)
            loss = objectives.dreg(lw_s)
            kld_m = jnp.zeros(())
        else:
            pz = self.pz()
            lqz = mo.encoder_dist.log_prob(mo.latents).sum(-1)
            lpz = log_prob_joint(pz, mo.latents)
            lw = lpz + lpx - lqz
            loss = objectives.iwae(lw)
            kld_m = jnp.zeros(())
        metrics = {"kld": kld_m,
                   f"reconstruction_loss_{spec.name}": -jnp.sum(lpx)}
        return loss, metrics
