"""Optimizer factory.

The reference offers Adam(amsgrad=True) and AdaBelief
(multimodal_compare/models/trainer.py:75-89); both exist natively in optax.

TPU note (measured NEGATIVE result, round 5): the update rules here are
purely elementwise, so wrapping them in ``optax.flatten`` (one contiguous
state buffer, one streaming fusion instead of ~69 per-leaf fusions) looked
like a fixed-cost win for the 0.4 ms small-batch step.  The same-session
A/B on the real chip (`benchmarks/flat_opt_ab.py`, flat_opt_ab.json) says
otherwise: flat is ~9% SLOWER at bs24 (0.428 vs 0.392 ms scan-timed) —
under ``lax.scan`` XLA already fuses the per-leaf updates into the step,
while ``optax.flatten`` adds a real ravel/concat of every gradient leaf
into one buffer and a split back, which is data movement the per-leaf path
never pays.  Per-leaf is therefore the default; ``MVC_FLAT_OPT=1`` opts
into the flat path (bitwise-identical update, tests/test_flat_opt.py).
"""
from __future__ import annotations

import os

import optax


def _maybe_flatten(tx: optax.GradientTransformation) -> optax.GradientTransformation:
    if os.environ.get("MVC_FLAT_OPT", "0") == "1":
        return optax.flatten(tx)
    return tx


def make_optimizer(name: str, lr: float) -> optax.GradientTransformation:
    name = (name or "adam").lower()
    if name == "adam":
        # reference uses torch.optim.Adam(amsgrad=True) (trainer.py:79-83)
        return _maybe_flatten(optax.amsgrad(lr))
    if name == "adabelief":
        return _maybe_flatten(optax.adabelief(lr))
    if name == "adamw":
        return _maybe_flatten(optax.adamw(lr))
    if name == "sgd":
        return _maybe_flatten(optax.sgd(lr))
    raise KeyError(f"unknown optimizer '{name}'")
