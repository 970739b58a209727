"""Device mesh + sharding layer (the reference has no distributed layer at
all — SURVEY.md §2.6; this is new first-class TPU work).

Design: a 1-D ``("data",)`` mesh is the natural fit at these model sizes
(largest trunk = ResNet-50); the batch is sharded over the data axis and
parameters are replicated.  XLA inserts the gradient ``psum`` over ICI from
the sharding annotations — no hand-written collectives in the train step.
The mesh helpers accept higher-dimensional meshes (e.g. ("data", "model"))
so tensor-sharded trunks can be layered on without touching the trainer.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              axes: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a Mesh over the first ``num_devices`` devices.

    :param axes: mesh axis names, default 1-D data-parallel
    :param shape: explicit per-axis sizes; default puts everything on axes[0]
    """
    devices = jax.devices()
    n = num_devices or len(devices)
    if shape is None:
        shape = [n] + [1] * (len(axes) - 1)
    assert int(np.prod(shape)) == n, f"mesh shape {shape} != {n} devices"
    dev_array = mesh_utils.create_device_mesh(tuple(shape),
                                              devices=devices[:n])
    return Mesh(dev_array, tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch pytree onto the mesh, batch-dim sharded."""
    sh = batch_sharding(mesh, axis)

    def _put(x):
        return None if x is None else jax.device_put(x, sh)

    return jax.tree_util.tree_map(_put, batch, is_leaf=lambda x: x is None)


def shard_params(params, mesh: Mesh):
    """Replicate a parameter pytree across the mesh."""
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), params)
