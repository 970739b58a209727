"""Batched inference engine for trained multimodal VAEs.

New TPU-first subsystem (the reference has no serving path; its closest
analog is the ad-hoc per-sample eval loops, eval_cdsprites.py:273-320, which
re-dispatch the model once per input).  The engine:

* jits one cross-generation function per (present-set, bucket-size) pair and
  caches the executables;
* pads requests up to the next bucket size so XLA never sees a new shape
  (static shapes = zero recompiles in steady state);
* returns host numpy, trimmed to the true request size.
"""
from __future__ import annotations

import threading
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_BUCKETS = (1, 8, 32, 128)


class InferenceEngine:
    def __init__(self, infer, buckets: Sequence[int] = DEFAULT_BUCKETS):
        """:param infer: a MultimodalVAEInfer (or trainer adapter)."""
        self.exp = infer
        self.model = infer.model
        self.params = infer.params
        self.buckets = tuple(sorted(buckets))
        self._fns: Dict[Tuple, callable] = {}
        self._dec_fns: Dict[Tuple, callable] = {}
        # ThreadingHTTPServer handles requests on parallel threads; the
        # lock keeps one compile per (present-set, shape) instead of a
        # stampede.  jax.jit compiles lazily at the first *call*, so the
        # first call per shape must also run under the lock (_warm tracks
        # which shapes have been compiled).
        self._lock = threading.Lock()
        self._warm: set = set()

    # -- compiled paths ------------------------------------------------------------

    def _gen_fn(self, present: Tuple[str, ...]):
        with self._lock:
            if present in self._fns:
                return self._fns[present]

            def fn(params, batch, key):
                out = self.model.apply(
                    params, batch, rngs={"sample": key},
                    method=lambda m, b: m.forward(b, present))
                return {name: mo.decoder_dist.mean[0]
                        for name, mo in out.mods.items()
                        if mo.decoder_dist is not None}

            jitted = jax.jit(fn)
            self._fns[present] = jitted
            return jitted

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    # -- public API ------------------------------------------------------------------

    def generate(self, inputs: Dict[str, Dict[str, np.ndarray]],
                 seed: int = 0) -> Dict[str, np.ndarray]:
        """Cross-/self-generate all modalities from the given inputs.

        :param inputs: {"mod_i": {"data": (N, ...), "masks": optional}}
        :return: {"mod_j": (N, ...)} reconstructions for every modality
        """
        if not inputs:
            raise ValueError("generate() needs at least one input modality")
        unknown = sorted(set(inputs) - set(self.exp.mod_names))
        if unknown:
            raise KeyError(
                f"unknown modalities {unknown}; model has {list(self.exp.mod_names)}")
        present = tuple(sorted(inputs.keys()))
        sizes = {name: len(mod["data"]) for name, mod in inputs.items()}
        if len(set(sizes.values())) > 1:
            raise ValueError(f"input modalities disagree on batch size: {sizes}")
        n = len(next(iter(inputs.values()))["data"])
        outputs: Dict[str, list] = {}
        done = 0
        while done < n:
            take = min(n - done, self.buckets[-1])
            bucket = self._bucket(take)
            batch = {}
            for name in self.exp.mod_names:
                if name in inputs:
                    data = np.asarray(inputs[name]["data"][done:done + take])
                    masks = inputs[name].get("masks")
                    pad = bucket - take
                    if pad:
                        data = np.concatenate(
                            [data, np.repeat(data[-1:], pad, 0)], 0)
                    entry = {"data": jnp.asarray(data)}
                    if masks is not None:
                        m = np.asarray(masks[done:done + take])
                        if pad:
                            m = np.concatenate([m, np.repeat(m[-1:], pad, 0)], 0)
                        entry["masks"] = jnp.asarray(m)
                    else:
                        entry["masks"] = None
                    batch[name] = entry
                else:
                    batch[name] = {"data": None, "masks": None}
            fn = self._gen_fn(present)
            shape_key = (present, bucket)
            if shape_key in self._warm:
                out = fn(self.params, batch, jax.random.PRNGKey(seed))
            else:
                with self._lock:  # serialize the lazy trace+compile
                    out = fn(self.params, batch, jax.random.PRNGKey(seed))
                    self._warm.add(shape_key)
            for name, arr in out.items():
                outputs.setdefault(name, []).append(
                    np.asarray(arr)[:take])
            done += take
        return {k: np.concatenate(v) for k, v in outputs.items()}

    def decode_latents(self, z: np.ndarray) -> Dict[str, np.ndarray]:
        """Decode given latent vectors with every decoder."""
        zj = jnp.asarray(z)[None]

        def _dec(name, shape):
            key = (name, shape)
            with self._lock:
                if key not in self._dec_fns:
                    self._dec_fns[key] = jax.jit(
                        lambda p, zz: self.model.apply(
                            p, name, zz,
                            method=lambda m, nm, q: m.decode_mod(nm, q)).mean)
                return self._dec_fns[key]

        out = {}
        for name in self.exp.mod_names:
            fn = _dec(name, zj.shape)
            warm_key = ("dec", name, zj.shape)
            if warm_key in self._warm:
                dist_mean = fn(self.params, zj)
            else:
                with self._lock:  # serialize the lazy trace+compile
                    dist_mean = fn(self.params, zj)
                    self._warm.add(warm_key)
            out[name] = np.asarray(dist_mean[0])
        return out
