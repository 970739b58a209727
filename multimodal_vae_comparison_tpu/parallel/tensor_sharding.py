"""Parameter tensor-sharding over a 'model' mesh axis.

The models here are small enough that pure data parallelism is optimal, but
the framework supports hybrid dp+tp meshes: large Dense/Conv kernels are
sharded over the ``model`` axis by annotating them with NamedShardings; XLA
then inserts the all-gathers/reduce-scatters over ICI.  Used by
``__graft_entry__.dryrun_multichip`` to exercise the multi-axis path.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def infer_param_sharding(params, mesh: Mesh, axis: str = "model",
                         min_size: int = 2048):
    """Pytree of NamedShardings: shard the output dim of big 2-D kernels over
    ``axis``; everything else is replicated (over all axes except none)."""
    size = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]

    def spec_for(x):
        if (x.ndim >= 2 and x.size >= min_size
                and x.shape[-1] % size == 0):
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1) + [axis])))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_for, params)


def apply_param_sharding(params, shardings):
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
