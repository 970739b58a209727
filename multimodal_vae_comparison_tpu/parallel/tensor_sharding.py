"""Parameter tensor-sharding over a 'model' mesh axis.

The models here are small enough that pure data parallelism is optimal, but
the framework supports hybrid dp+tp meshes.  Two schemes:

* :func:`infer_param_sharding` — the minimal rule (shard the output dim of
  big kernels), kept for callers that want predictable one-way sharding;
* :func:`megatron_param_sharding` — Megatron-style pairing: within each
  module scope, consecutive big 2-D kernels alternate column-parallel
  (``P(..., 'model')``) and row-parallel (``P('model', ...)``) so an MLP's
  up/down projections (or attention's qkv/out) need one collective per pair
  instead of per matmul; conv kernels shard the output-channel dim.  The
  annotations are placement hints — XLA GSPMD propagates them through the
  jitted step and inserts the all-gathers/reduce-scatters over ICI.

Used by ``__graft_entry__.dryrun_multichip`` to exercise the multi-axis
path; equivalence against replicated execution is tested on the virtual
8-device CPU mesh (tests/test_sharding.py).
"""
from __future__ import annotations

from collections import defaultdict

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


def megatron_param_sharding(params, mesh: Mesh, axis: str = "model",
                            min_size: int = 2048):
    """Path-aware column/row-parallel alternation (see module docstring).

    Rules per parameter, in order:
    * <2-D or small or indivisible -> replicated;
    * conv kernel (ndim >= 3): shard the trailing (output-channel) dim;
    * 2-D kernel: the k-th big kernel within its module scope is
      column-parallel when k is even (shard dim -1), row-parallel when k is
      odd (shard dim -2) — the Megatron MLP/attention pairing.
    """
    size = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    # order of big 2-D kernels inside each parent scope
    order = defaultdict(int)
    specs = {}
    for path, x in flat:
        key = jax.tree_util.keystr(path)
        nd, shape = np.ndim(x), np.shape(x)
        if nd < 2 or np.size(x) < min_size:
            specs[key] = P()
            continue
        if nd >= 3:   # conv kernel HW...IO
            specs[key] = (P(*([None] * (nd - 1) + [axis]))
                          if shape[-1] % size == 0 else P())
            continue
        # pair at the parent-of-module scope: .../Block/Dense_k/kernel
        # alternates over k, the consecutive Dense layers of one block
        scope = jax.tree_util.keystr(path[:-2] if len(path) >= 2
                                     else path[:-1])
        k = order[scope]
        order[scope] += 1
        if k % 2 == 0 and shape[-1] % size == 0:
            specs[key] = P(None, axis)
        elif k % 2 == 1 and shape[-2] % size == 0:
            specs[key] = P(axis, None)
        elif shape[-1] % size == 0:
            specs[key] = P(None, axis)
        else:
            specs[key] = P()

    def spec_for(path, x):
        return NamedSharding(mesh, specs[jax.tree_util.keystr(path)])

    return jax.tree_util.tree_map_with_path(spec_for, params)


def apply_param_sharding(params, shardings):
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
