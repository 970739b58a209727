"""Parameter surgery: grow the latent space of a trained model.

Functional analog of the reference's ``VAE.change_latents``
(vae.py:206-220) which widens the latent space mid-training.  In a pure
pytree world this is parameter surgery: every kernel/bias whose dimension is
tied to the latent size is zero/random-padded to the new size, and a new
model instance with the larger ``n_latents`` consumes the padded params.

Only layers adjacent to the latent bottleneck change shape: the encoder
mu/scale heads' outputs and each decoder's first dense layer's inputs.
Padding with small random values preserves the learned function (outputs for
old dims unchanged; new dims start near zero influence).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _pad_axis(arr: jnp.ndarray, axis: int, new_size: int, rng,
              scale: float = 1e-3) -> jnp.ndarray:
    old = arr.shape[axis]
    if old >= new_size:
        return arr
    pad_shape = list(arr.shape)
    pad_shape[axis] = new_size - old
    pad = scale * jax.random.normal(rng, pad_shape, dtype=arr.dtype)
    return jnp.concatenate([arr, pad], axis=axis)


def grow_latents(params: Dict[str, Any], model, new_n_latents: int,
                 seed: int = 0):
    """Return (new_model, new_params) with the latent space widened.

    :param params: trained variables dict of ``model``
    :param model: the current MMVAE instance
    :param new_n_latents: must be >= model.n_latents
    """
    assert new_n_latents >= model.n_latents, \
        "New latent size must be the same or larger than the current one"
    delta = new_n_latents - model.n_latents
    # carry EVERY ctor field (remat included — dropping it would silently
    # disable rematerialization on the grown model)
    new_model = type(model)(specs=model.specs, n_latents=new_n_latents,
                            obj=model.obj, beta=model.beta, K=model.K,
                            dtype=model.dtype,
                            remat=getattr(model, "remat", False),
                            aux_endpoint=getattr(model, "aux_endpoint", 0.0),
                            prior_components=getattr(model,
                                                     "prior_components", 1))
    if delta == 0:
        return new_model, params

    rng = jax.random.PRNGKey(seed)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    paths = []
    for path, leaf in flat:
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        paths.append("/".join(str(k) for k in keys))
    # the z-consuming dense layer is the FIRST matching kernel per decoder
    # in creation order (flax names layers Dense_0, Dense_1, ...): matching
    # on input dim alone would also pad later hidden layers whose width
    # happens to equal n_latents
    input_kernels = _decoder_input_kernels(model, paths, [l for _, l in flat])
    new_leaves = []
    for path_str, (path, leaf) in zip(paths, flat):
        rng, sub = jax.random.split(rng)
        out = leaf
        # encoder heads: widen output axis (last)
        if ("mu_layer" in path_str or "logvar_layer" in path_str) and \
                leaf.ndim >= 1 and leaf.shape[-1] == _head_dim(model, path_str):
            out = _pad_axis(leaf, leaf.ndim - 1, _head_dim(model, path_str) + delta, sub)
        # prior raw params (incl. the mixture prior's per-component rows)
        elif (("pz_logvar" in path_str or "pz_mog_loc" in path_str
               or "pz_mog_rawscale" in path_str)
              and leaf.shape[-1] == model.n_latents):
            out = _pad_axis(leaf, leaf.ndim - 1, new_n_latents, sub)
        # decoder first dense: widen input axis (0) of the kernel
        elif path_str in input_kernels:
            out = _pad_axis(leaf, 0, leaf.shape[0] + delta, sub)
        new_leaves.append(out)
    new_params = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return new_model, new_params


def _head_dim(model, path_str: str) -> int:
    """Latent head size for the modality owning this path (incl. private)."""
    for spec in model.specs:
        if f"enc_{spec.name}" in path_str:
            return model.n_latents + (spec.private_latents or 0)
    return model.n_latents


def _decoder_input_kernels(model, paths, leaves) -> set:
    """Paths of the single z-consuming dense kernel per decoder: the first
    (creation-order) 2-D kernel whose input dim equals that modality's
    latent size."""
    chosen = {}
    for path_str, leaf in zip(paths, leaves):
        if "kernel" not in path_str or leaf.ndim != 2:
            continue
        for spec in model.specs:
            total = model.n_latents + (spec.private_latents or 0)
            if (f"dec_{spec.name}" in path_str
                    and leaf.shape[0] in (model.n_latents, total)):
                key = spec.name
                if key not in chosen or path_str < chosen[key]:
                    chosen[key] = path_str
    return set(chosen.values())
