"""Optimizer factory.

The reference offers Adam(amsgrad=True) and AdaBelief
(multimodal_compare/models/trainer.py:75-89); both exist natively in optax.

TPU note: the update rules here are purely elementwise, so we wrap them in
``optax.flatten`` — the optimizer state lives in ONE contiguous buffer and
the whole update compiles to a single fused streaming kernel instead of one
fusion per parameter leaf (~69 leaves on the flagship MVAE; at a 0.4 ms
train step the per-fusion dispatch overhead is a measurable slice of the
small-batch step).  Flattening an elementwise transform is bitwise identical
to the per-leaf update (pinned by tests/test_flat_opt.py); disable with
``MVC_FLAT_OPT=0`` for A/B runs.
"""
from __future__ import annotations

import os

import optax


def _maybe_flatten(tx: optax.GradientTransformation) -> optax.GradientTransformation:
    if os.environ.get("MVC_FLAT_OPT", "1") == "0":
        return tx
    return optax.flatten(tx)


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
