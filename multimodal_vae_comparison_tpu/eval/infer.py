"""Inference wrapper: reload a trained model from its results directory.

Analog of ``MultimodalVAEInfer`` (multimodal_compare/eval/infer.py:8-71):
given a run dir (or its checkpoint path), re-parse the dumped ``config.yml``,
rebuild the DataModule and model, restore Orbax params, and expose
cross-/joint-generation APIs for the eval scripts.
"""
from __future__ import annotations

import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_vae_comparison_tpu.config import Config
from multimodal_vae_comparison_tpu.data.datamodule import DataModule
from multimodal_vae_comparison_tpu.training.trainer import build_model


class MultimodalVAEInfer:
    def __init__(self, path: str, ckpt: str = "last"):
        """:param path: results dir (results/<exp>/version_N) or a path
        inside it (e.g. .../model/last).
        :param ckpt: which checkpoint tag to restore ("last" or "best";
        falls back to the other if the requested one is absent)."""
        self._ckpt_tag = ckpt
        run_dir = path
        for _ in range(3):
            if os.path.exists(os.path.join(run_dir, "config.yml")):
                break
            run_dir = os.path.dirname(run_dir)
        assert os.path.exists(os.path.join(run_dir, "config.yml")), \
            f"no config.yml found above {path}"
        self.run_dir = run_dir
        self.config = Config(os.path.join(run_dir, "config.yml"),
                             eval_only=True)
        self.config.mPath = run_dir
        self.datamod = DataModule(self.config)
        self.datamod.setup()
        self.model = build_model(self.config)
        # generation is always single-sample: a K>1 training objective (IWAE/
        # DReG) would multiply the decode cost of every forward for nothing
        # (and oversized programs can exceed remote-compile request limits)
        if self.model.K != 1:
            self.model = type(self.model)(
                specs=self.model.specs, n_latents=self.model.n_latents,
                obj=self.model.obj, beta=self.model.beta, K=1,
                dtype=self.model.dtype, remat=self.model.remat,
                aux_endpoint=self.model.aux_endpoint,
                prior_components=self.model.prior_components)
        self.params = self._restore()

    def _restore(self):
        import orbax.checkpoint as ocp
        batch = next(self.datamod.batches("val", batch_size=2,
                                          drop_remainder=False))
        rng = jax.random.PRNGKey(0)
        abstract = self.model.init({"params": rng, "sample": rng}, batch,
                                   method=self.model.objective)
        other = {"last": "best", "best": "last"}[self._ckpt_tag]
        ckpt = os.path.join(self.run_dir, "model", self._ckpt_tag)
        if not os.path.isdir(ckpt):
            ckpt = os.path.join(self.run_dir, "model", other)
        assert os.path.isdir(ckpt), f"no checkpoint at {ckpt}"
        # raw restore + treedef rebuild: tolerant of both param-only (round-1)
        # and full-state (params/opt_state/step/best_val) checkpoint layouts.
        # Bounded retry: a reader may race a live trainer's save of 'last'
        # (orbax force=True briefly exposes a partial/absent directory).
        import time
        raw = None
        for attempt in range(5):
            try:
                raw = ocp.PyTreeCheckpointer().restore(os.path.abspath(ckpt))
                break
            except (FileNotFoundError, ValueError) as e:
                # only the in-progress-save signatures (partial/absent dir)
                # are worth retrying; anything else surfaces immediately
                if attempt == 4:
                    raise
                print(f"[infer] checkpoint restore attempt {attempt + 1}/5 "
                      f"failed ({type(e).__name__}: {e}); retrying...")
                time.sleep(2.0 * (attempt + 1))
        ref = jax.device_get(abstract)
        flat_ref, treedef = jax.tree_util.tree_flatten(ref)
        flat_raw = jax.tree_util.tree_leaves(raw["params"])
        assert len(flat_ref) == len(flat_raw), (
            f"checkpoint param count {len(flat_raw)} != model {len(flat_ref)}")
        return jax.tree_util.tree_unflatten(
            treedef, [np.asarray(g, dtype=np.asarray(r).dtype)
                      for r, g in zip(flat_ref, flat_raw)])

    # -- generation APIs ----------------------------------------------------------

    @property
    def mod_names(self):
        return self.model.mod_names

    def _full_batch(self, inputs: Dict[str, Dict]) -> Dict:
        batch = {}
        for name in self.mod_names:
            batch[name] = inputs.get(name, {"data": None, "masks": None})
            batch[name].setdefault("masks", None)
        return batch

    def forward(self, inputs: Dict[str, Dict], present: Tuple[str, ...]):
        batch = self._full_batch(inputs)
        return self.model.apply(
            self.params, batch, rngs={"sample": jax.random.PRNGKey(0)},
            method=lambda m, b: m.forward(b, present))

    def cross_generate(self, source_mod: str, data, masks=None) -> Dict[str, np.ndarray]:
        """Generate every modality from one source modality's data."""
        out = self.forward({source_mod: {"data": jnp.asarray(data),
                                         "masks": None if masks is None
                                         else jnp.asarray(masks)}},
                           present=(source_mod,))
        recons = {}
        for name in self.mod_names:
            dist = out.mods[name].decoder_dist
            if dist is not None:
                recons[name] = np.asarray(dist.mean[0])
        return recons

    def joint_generate(self, num_samples: int, seed: int = 0,
                       source: str = "prior",
                       temperature: float = 1.0) -> Dict[str, np.ndarray]:
        """Decode latent samples with every decoder (joint generation).

        source='prior': *learned*-prior samples (the reference protocol —
        it samples pz with its trained softmax scale, trainer.py:217-239).
        source='expost': samples the model's *aggregate posterior*
        q(z) = 1/N sum_i q(z|x_i) — a mixture over stored per-sample
        posterior params from the train split (ex-post density estimation in
        the spirit of Ghosh et al. 2020 "From VAEs to RAEs", with the exact
        mixture instead of a Gaussian fit); closes the prior/aggregate-
        posterior mismatch that drives joint coherency to 0 on hard levels.
        source='fitted': samples a C-component diagonal GMM fitted POST-HOC
        (EM, _fitted_prior) to aggregate-posterior samples — a parametric
        prior in the ex-post-density-estimation sense (Ghosh et al. 2020
        fit a single Gaussian; a GMM is the standard stronger density).
        Round-5 motivation: a TRAINING-TIME mixture prior
        (prior_components > 1) wins the prior-protocol Joint metric but its
        KL distorts the posterior geometry and collapses cross-generation
        (measured round 4: L3 T->I Strict 98.7 -> 0.4).  Fitting the prior
        AFTER training leaves the cross-generation champion untouched and
        still gives joint generation a prior that covers the aggregate
        posterior — one config, both protocols.
        ``temperature`` scales the sampling stddev.
        """
        key = jax.random.PRNGKey(seed)
        D = self.model.n_latents
        if source == "expost":
            mus, scales = self._expost_prior()
            k1, k2 = jax.random.split(key)
            idx = jax.random.randint(k1, (num_samples,), 0, len(mus))
            eps = jax.random.normal(k2, (num_samples, D))
            z = (mus[np.asarray(idx)]
                 + temperature * scales[np.asarray(idx)] * np.asarray(eps))
            z = z[None]
        elif source == "fitted":
            loc, scale, logw = self._fitted_prior()
            k1, k2 = jax.random.split(key)
            probs = np.exp(logw - logw.max())
            probs = probs / probs.sum()
            idx = np.asarray(jax.random.choice(
                k1, len(loc), (num_samples,), p=jnp.asarray(probs)))
            eps = np.asarray(jax.random.normal(k2, (num_samples, D)))
            z = (loc[idx] + temperature * scale[idx] * eps)[None]
        else:
            # sample_pz covers both the learned-scale Gaussian and the
            # mixture prior (prior_components > 1)
            z = self.model.apply(
                self.params, key, num_samples, temperature,
                method=lambda m, k, n, t: m.sample_pz(k, n, t))
        recons = {}
        for name in self.mod_names:
            dist = self.model.apply(
                self.params, name, jnp.asarray(z),
                method=lambda m, nm, zz: m.decode_mod(nm, zz))
            recons[name] = np.asarray(dist.mean[0])
        return recons

    def _expost_prior(self, max_samples: int = 2048):
        """Stored (mu, scale) rows of per-sample posteriors over the train
        split — the components of the aggregate posterior mixture.  Uses the
        fused joint posterior when the mixing model has one (POE/MoPOE),
        else the per-modality posteriors.  Cached per instance."""
        if getattr(self, "_expost_cache", None) is not None:
            return self._expost_cache
        mus, scales = [], []
        seen = 0
        D = self.model.n_latents
        # drop_remainder=False: a tiny train split (< one batch) must still
        # yield its samples, or np.concatenate below gets an empty list
        for batch in self.datamod.batches("train", batch_size=64,
                                          drop_remainder=False):
            out = self.forward(
                {n: batch[n] for n in self.mod_names},
                present=tuple(self.mod_names))
            for name in self.mod_names:
                dist = (out.mods[name].joint_dist
                        or out.mods[name].encoder_dist)
                if dist is None:
                    continue
                mus.append(np.asarray(dist.loc)[..., :D].reshape(-1, D))
                scales.append(np.asarray(dist.scale)[..., :D].reshape(-1, D))
                if out.mods[name].joint_dist is not None:
                    break   # one fused posterior covers all modalities
            seen += 64
            if seen >= max_samples:
                break
        self._expost_cache = (
            np.concatenate(mus, 0).astype(np.float32),
            np.concatenate(scales, 0).astype(np.float32))
        return self._expost_cache

    def _fitted_prior(self, components: int = 16, samples_per_row: int = 4,
                      iters: int = 75, seed: int = 0):
        """C-component diagonal GMM fitted by EM to samples of the
        aggregate posterior (ExPost-as-prior; see joint_generate docstring).
        Returns (loc (C, D), scale (C, D), log_weights (C,)); cached."""
        if getattr(self, "_fitted_cache", None) is not None:
            return self._fitted_cache
        mus, scales = self._expost_prior()
        rng = np.random.default_rng(seed)
        eps = rng.standard_normal((samples_per_row,) + mus.shape)
        x = (mus[None] + scales[None] * eps).reshape(-1, mus.shape[-1])
        x = x.astype(np.float64)
        self._fitted_cache = _fit_diag_gmm(x, components, iters=iters,
                                           seed=seed)
        return self._fitted_cache

    def get_test_samples(self, n: int, split: str = "test", seed: int = 0):
        """Samples + labels: a SEEDED RANDOM subset of the split (falls back
        to val, reference dataloader.py:166-176).

        Round-5 fix: this used to take the FIRST n rows.  The offline
        generators enumerate the factor cartesian product in spec order
        (data_proc/cdsprites.py; SPRITES test files concatenate per-action
        arrays), so a first-n subset is factor-SKEWED — at CdSprites+ L2 the
        first 250 test captions were 166 'big square' + 84 'big ellipse'
        (no heart, no 'small'), which froze Text->Image Strict at exactly
        166/250 across six independently-trained models.  The reference
        shuffles its dSprites indices at generation (cdSprites.py:132), so
        its first-n read is already random; a seeded permutation here is the
        order-independent equivalent."""
        if split == "test" and self.datamod._test is None:
            split = "val"
        data = {"test": self.datamod._test, "val": self.datamod._val,
                "train": self.datamod._train}[split]
        # cap at the split size: asking for more would pad-wrap the batch
        # (static shapes) and misalign it with the labels
        total = len(data[0]["data"])
        n = min(n, total)
        idx = np.random.default_rng(seed).permutation(total)[:n]
        batch = self.datamod._make_batch(data, idx)
        labels = {"test": self.datamod.labels_test,
                  "val": self.datamod.labels_val,
                  "train": self.datamod.labels_train}[split]
        if labels is None or not len(labels):
            return batch, None
        labels = np.asarray(labels)
        return batch, labels[idx]

    def get_wrapped_model(self):
        """Compat shim: the reference returns a Lightning wrapper
        (infer.py:29-39); here the infer object *is* the wrapped model."""
        return self

    def eval_statistics(self):
        """Run the dataset-specific benchmark (reference infer.py:54-63)."""
        fn = self.datamod.datasets[0].eval_statistics_fn()
        assert fn is not None, "dataset has no eval_statistics_fn"
        return fn(self)


def _fit_diag_gmm(x: np.ndarray, C: int, iters: int = 75, seed: int = 0,
                  min_var: float = 1e-4):
    """Diagonal-covariance GMM via EM (numpy; N up to ~10k, D up to ~128).

    Used by MultimodalVAEInfer._fitted_prior to fit an ExPost parametric
    prior to aggregate-posterior samples.  Plain EM with a random-rows
    init and a variance floor; deterministic under ``seed``.
    Returns (loc (C, D) f32, scale (C, D) f32, log_weights (C,) f32)."""
    rng = np.random.default_rng(seed)
    x = np.asarray(x, np.float64)
    n, d = x.shape
    C = min(C, n)
    loc = x[rng.choice(n, C, replace=False)].copy()
    var = np.tile(x.var(0) + 1e-3, (C, 1))
    logw = np.full(C, -np.log(C))
    for _ in range(iters):
        diff = x[:, None, :] - loc[None]                       # (N, C, D)
        ll = (-0.5 * ((diff ** 2) / var[None]).sum(-1)
              - 0.5 * np.log(2.0 * np.pi * var).sum(-1)[None]
              + logw[None])                                    # (N, C)
        ll -= ll.max(axis=1, keepdims=True)
        r = np.exp(ll)
        r /= r.sum(axis=1, keepdims=True)
        nk = r.sum(0) + 1e-8                                   # (C,)
        loc = (r.T @ x) / nk[:, None]
        var = np.maximum((r.T @ (x ** 2)) / nk[:, None] - loc ** 2, min_var)
        logw = np.log(nk / n)
    return (loc.astype(np.float32), np.sqrt(var).astype(np.float32),
            logw.astype(np.float32))
