"""Distributions as pure parameter pytrees.

The reference carries ``torch.distributions`` objects through its forward
outputs (multimodal_compare/models/output_storage.py).  Under XLA that object
graph is hostile to tracing, so here every distribution is a frozen
``flax.struct`` dataclass — a pytree of its parameters — with pure-function
``log_prob`` / ``rsample`` / ``kl`` methods.  Everything jits, vmaps and
shards transparently.

Conventions (deliberate, documented fixes of reference quirks):

* ``Normal``/``Laplace`` take ``(loc, scale)`` with ``scale`` the standard
  deviation / diversity, matching torch semantics.  Encoders in the reference
  produce ``softmax(raw)+eta`` and feed it to ``torch.dist.Normal`` as the
  *scale*; we keep that data flow but name it honestly.
* ``kl`` uses the closed form when available, otherwise an ``n_mc``-sample
  Monte-Carlo estimate (reference: multimodal_compare/utils.py:399-405).
* The reference ``product_of_experts`` returns the *variance* in the logvar
  slot (mmvae_base.py:203-222, noted in SURVEY.md §2.1); our PoE lives in
  ops/fusion.py and returns a well-formed ``Normal``.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from multimodal_vae_comparison_tpu.constants import ETA, LOG2PI


class Distribution:
    """Marker base class (not a pytree itself)."""


@struct.dataclass
class Normal(Distribution):
    loc: jnp.ndarray
    scale: jnp.ndarray
    # optional pre-sigmoid logits of ``loc`` when it is a squashed image
    # mean (VaeDecoder.squash_dist): lets objectives.bce use the stable
    # softplus-from-logits form, which stays finite in bf16 where the
    # probability-space eta clamp rounds away (1 - 1e-6 == 1 in bf16)
    loc_logits: Optional[jnp.ndarray] = None

    @property
    def mean(self):
        return self.loc

    @property
    def variance(self):
        return jnp.square(self.scale)

    def log_prob(self, x):
        var = jnp.square(self.scale)
        return -0.5 * (jnp.square(x - self.loc) / var + 2.0 * jnp.log(self.scale) + LOG2PI)

    def rsample(self, key, sample_shape: Tuple[int, ...] = ()):
        shape = tuple(sample_shape) + jnp.shape(self.loc)
        eps = jax.random.normal(key, shape, dtype=jnp.result_type(self.loc))
        return self.loc + eps * self.scale

    def kl(self, other: "Normal"):
        """Closed-form KL(self || other) for diagonal Gaussians."""
        var_ratio = jnp.square(self.scale / other.scale)
        t1 = jnp.square((self.loc - other.loc) / other.scale)
        return 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))


@struct.dataclass
class Laplace(Distribution):
    loc: jnp.ndarray
    scale: jnp.ndarray

    @property
    def mean(self):
        return self.loc

    def log_prob(self, x):
        return -jnp.abs(x - self.loc) / self.scale - jnp.log(2.0 * self.scale)

    def rsample(self, key, sample_shape: Tuple[int, ...] = ()):
        shape = tuple(sample_shape) + jnp.shape(self.loc)
        # inverse-CDF sampling from U(-1/2, 1/2)
        u = jax.random.uniform(key, shape, dtype=jnp.result_type(self.loc),
                               minval=-0.5 + 1e-7, maxval=0.5 - 1e-7)
        return self.loc - self.scale * jnp.sign(u) * jnp.log1p(-2.0 * jnp.abs(u))

    def kl(self, other: "Laplace"):
        """Closed-form KL between Laplace distributions."""
        scale_ratio = self.scale / other.scale
        delta = jnp.abs(self.loc - other.loc)
        t = delta / self.scale
        return (scale_ratio * jnp.exp(-t) + delta / other.scale - 1.0
                - jnp.log(scale_ratio))


@struct.dataclass
class Bernoulli(Distribution):
    """Bernoulli parameterized by probabilities (used for BCE likelihoods)."""

    probs: jnp.ndarray

    @property
    def mean(self):
        return self.probs

    def log_prob(self, x):
        p = jnp.clip(self.probs, ETA, 1.0 - ETA)
        return x * jnp.log(p) + (1.0 - x) * jnp.log1p(-p)


@struct.dataclass
class OneHotCategorical(Distribution):
    """Categorical over the last axis, parameterized by logits."""

    logits: jnp.ndarray

    @property
    def probs(self):
        return jax.nn.softmax(self.logits, axis=-1)

    @property
    def mean(self):
        return self.probs

    def log_prob(self, x_onehot):
        logp = jax.nn.log_softmax(self.logits, axis=-1)
        return jnp.sum(x_onehot * logp, axis=-1)

    def rsample(self, key, sample_shape: Tuple[int, ...] = (), temperature=1.0):
        """Gumbel-softmax relaxed sample (straight-through not applied)."""
        shape = tuple(sample_shape) + jnp.shape(self.logits)
        g = jax.random.gumbel(key, shape, dtype=jnp.result_type(self.logits))
        return jax.nn.softmax((self.logits + g) / temperature, axis=-1)

    def kl(self, other: "OneHotCategorical"):
        logp = jax.nn.log_softmax(self.logits, axis=-1)
        logq = jax.nn.log_softmax(other.logits, axis=-1)
        return jnp.sum(jnp.exp(logp) * (logp - logq), axis=-1)


# Distribution name map matching the reference's dist_map (vae.py:142-147).
DIST_MAP = {
    "normal": Normal,
    "gaussian": Normal,
    "laplace": Laplace,
    "categorical": OneHotCategorical,
    "bernoulli": Bernoulli,
    "gumbel": OneHotCategorical,   # gumbel-softmax sampling path
}


def get_dist(name: str):
    key = name.lower()
    if key not in DIST_MAP:
        raise KeyError(f"unknown distribution '{name}'; available: {sorted(DIST_MAP)}")
    return DIST_MAP[key]


@struct.dataclass
class MixtureNormal(Distribution):
    """Mixture of diagonal Gaussians — the learnable prior family (round 4).

    The prior/aggregate-posterior mismatch drives joint coherency to ~0
    under the reference's prior-sampling protocol (trainer.py:217-239):
    a single learned-scale Gaussian cannot cover a multimodal aggregate
    posterior.  A trained mixture (VampPrior-style, components learned
    directly in latent space as in Tomczak & Welling 2018's MoG baseline)
    closes that gap *inside* the model instead of via the ex-post
    aggregate-posterior sampler.

    ``log_prob`` is the JOINT density over the last axis — (..., D) in,
    (...) out — unlike the factorized families' per-dim convention; use
    :func:`log_prob_joint` at call sites that handle both.
    """

    locs: jnp.ndarray     # (C, D)
    scales: jnp.ndarray   # (C, D)
    logits: jnp.ndarray   # (C,)

    @property
    def mean(self):
        w = jax.nn.softmax(self.logits)
        return jnp.einsum("c,cd->d", w, self.locs)[None]

    def log_prob(self, x):
        # (..., D) -> (..., 1, D) against (C, D) components
        comp = Normal(self.locs, self.scales).log_prob(x[..., None, :]).sum(-1)
        logw = jax.nn.log_softmax(self.logits)
        return jax.scipy.special.logsumexp(comp + logw, axis=-1)

    def sample(self, key, num: int, temperature: float = 1.0):
        """(num, D) ancestral samples (component choice is not
        reparameterized — generation only)."""
        k1, k2 = jax.random.split(key)
        idx = jax.random.categorical(k1, self.logits, shape=(num,))
        eps = jax.random.normal(k2, (num, self.locs.shape[-1]),
                                dtype=self.locs.dtype)
        return self.locs[idx] + temperature * self.scales[idx] * eps


def log_prob_joint(dist, x):
    """Joint log-density over the event (last) axis for both conventions:
    factorized families return per-dim terms (sum them); MixtureNormal is
    already joint."""
    lp = dist.log_prob(x)
    return lp if isinstance(dist, MixtureNormal) else lp.sum(-1)


def kl_divergence(d1, d2, key=None, n_mc: int = 100):
    """Closed-form KL if both distributions share a family, else MC estimate.

    Mirrors the reference ``kl_divergence`` (utils.py:399-405): torch falls
    back to sampling when no registered closed form exists.
    """
    if type(d1) is type(d2) and hasattr(d1, "kl"):
        return d1.kl(d2)
    if key is None:
        raise ValueError("MC KL estimate between mixed families needs a PRNG key")
    samples = d1.rsample(key, (n_mc,))
    return jnp.mean(d1.log_prob(samples) - d2.log_prob(samples), axis=0)


def log_mean_exp(value, axis=0, keepdims=False):
    """log(mean(exp(value))) along ``axis`` (reference utils.py:395-396)."""
    n = value.shape[axis]
    return jax.scipy.special.logsumexp(value, axis=axis, keepdims=keepdims) - math.log(n)
