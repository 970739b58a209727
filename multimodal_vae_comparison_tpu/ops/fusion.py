"""Posterior fusion primitives (PoE / MoE / MoPoE) as pure functions.

These are the hot fusion paths identified in SURVEY.md §7: the reference
implements them with dynamic tensor concatenation and per-subset Python loops
(multimodal_compare/models/mmvae_base.py:203-222, mmvae_models.py:279-410).
Here every fusion is a pure function over stacked expert parameters with
static shapes, so XLA fuses the whole thing into one kernel; a Pallas TPU
kernel for the PoE path lives in ops/pallas/poe_kernel.py and is dispatched
by :func:`product_of_experts` on TPU for large operands.

Semantics note (documented fix): the reference ``product_of_experts`` returns
the product *variance* in a slot named logvar which is then consumed as a
Normal *scale* (mmvae_base.py:221 — see SURVEY.md §2.1).  Our PoE takes
expert ``(mu, scale)`` with scale = stddev and returns a well-formed
``(mu, scale)``.
"""
from __future__ import annotations

import itertools
from typing import List, Sequence, Tuple

import jax.numpy as jnp

from multimodal_vae_comparison_tpu.constants import EPS


def poe_precision_fusion(mus: jnp.ndarray, scales: jnp.ndarray,
                         prior_precision: float = 1.0):
    """Product of diagonal-Gaussian experts via precision weighting.

    :param mus: stacked expert means, shape (E, ..., D)
    :param scales: stacked expert stddevs, shape (E, ..., D)
    :param prior_precision: precision of the universal N(0, 1/sqrt(p)) prior
        expert folded in analytically (reference concatenates an explicit
        zeros/ones expert instead, mmvae_models.py:235-250); pass 0.0 to
        disable the prior expert.
    :return: (mu, scale) of the product Gaussian, shape (..., D)
    """
    precision = 1.0 / (jnp.square(scales) + EPS)
    denom = jnp.sum(precision, axis=0) + prior_precision
    mu = jnp.sum(mus * precision, axis=0) / denom
    var = 1.0 / denom
    return mu, jnp.sqrt(var)


def product_of_experts(mus: jnp.ndarray, scales: jnp.ndarray,
                       include_prior: bool = True):
    """PoE joint posterior from stacked experts; see poe_precision_fusion.

    Dispatches to the Pallas TPU kernel (ops/pallas/poe_kernel.py) on TPU
    backends; jnp reference elsewhere.
    """
    from multimodal_vae_comparison_tpu.ops.pallas.poe_kernel import poe_fused
    return poe_fused(mus, scales, 1.0 if include_prior else 0.0)


def mixture_component_selection(mus: jnp.ndarray, scales: jnp.ndarray,
                                weights: Sequence[float] = None):
    """Stratified mixture-of-experts 'sampling' used by MoPoE.

    The reference draws from the mixture by partitioning the *batch* across
    components proportionally to the (uniform) weights
    (mmvae_models.py:396-410) — a data-dependent slicing pattern.  Because the
    weights are always uniform constants at trace time, we compute the split
    boundaries statically in Python, keeping all shapes static for XLA.

    :param mus: (S, B, D) stacked component means
    :param scales: (S, B, D) stacked component stddevs
    :param weights: optional per-component weights (default uniform); must be
        Python floats (static)
    :return: (B, D) selected means and stddevs
    """
    num_components, num_samples = mus.shape[0], mus.shape[1]
    if weights is None:
        weights = [1.0 / num_components] * num_components
    total = float(sum(weights))
    weights = [w / total for w in weights]
    starts, ends = [], []
    for k in range(num_components):
        start = 0 if k == 0 else ends[k - 1]
        end = num_samples if k == num_components - 1 else start + int(num_samples * weights[k])
        starts.append(start)
        ends.append(end)
    mu_sel = jnp.concatenate(
        [mus[k, starts[k]:ends[k], :] for k in range(num_components)], axis=0)
    scale_sel = jnp.concatenate(
        [scales[k, starts[k]:ends[k], :] for k in range(num_components)], axis=0)
    return mu_sel, scale_sel


def subset_lattice(num_mods: int, forbidden: Sequence[Tuple[int, ...]] = ()) -> List[Tuple[int, ...]]:
    """All non-empty subsets of modality indices, smallest first.

    Static at model-build time: the reference enumerates these dynamically per
    step (utils.py:86-112 for POE, mmvae_models.py:279-294 for MoPoE); here the
    lattice is fixed when the model is constructed so each subset's compute
    unrolls at trace time.
    """
    idx = range(num_mods)
    subsets = []
    for n in range(1, num_mods + 1):
        subsets.extend(itertools.combinations(idx, n))
    forbidden = {tuple(sorted(f)) for f in forbidden}
    return [s for s in subsets if s not in forbidden]
