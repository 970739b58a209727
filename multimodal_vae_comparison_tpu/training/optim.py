"""Optimizer factory.

The reference offers Adam(amsgrad=True) and AdaBelief
(multimodal_compare/models/trainer.py:75-89); both exist natively in optax.
"""
from __future__ import annotations

import optax


def make_optimizer(name: str, lr: float) -> optax.GradientTransformation:
    name = (name or "adam").lower()
    if name == "adam":
        # reference uses torch.optim.Adam(amsgrad=True) (trainer.py:79-83)
        return optax.amsgrad(lr)
    if name == "adabelief":
        return optax.adabelief(lr)
    if name == "adamw":
        return optax.adamw(lr)
    if name == "sgd":
        return optax.sgd(lr)
    raise KeyError(f"unknown optimizer '{name}'")
