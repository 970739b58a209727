"""Analytic MXU FLOP counting by walking a jaxpr.

XLA's ``compiled.cost_analysis()["flops"]`` counts *every* HLO op (vector
adds, transcendentals, reductions), so throughput / that-count / MXU-peak can
nominally exceed 1.0 when VPU and MXU work overlap.  For a defensible MFU we
also count only the operations that actually run on the MXU systolic array —
``dot_general`` and ``conv_general_dilated`` — straight from the traced
jaxpr (forward + backward + optimizer, since the counter runs on the full
train step).  The reference publishes no utilization numbers at all
(SURVEY.md §6); this is new instrumentation.

Control-flow handling: ``scan`` bodies are multiplied by the trip count,
``while`` bodies counted once (a lower bound, flagged in the result),
``cond``/``switch`` take the *maximum* across branches.  Pallas kernels are
opaque to the jaxpr walk and are not counted (none of the framework's Pallas
kernels contain matmuls).
"""
from __future__ import annotations

import math
from typing import Any, Dict

import jax


def _dot_general_flops(eqn) -> int:
    (lc, rc), (lb, _rb) = eqn.params["dimension_numbers"]
    lhs = eqn.invars[0].aval.shape
    rhs = eqn.invars[1].aval.shape
    batch = math.prod(lhs[i] for i in lb)
    k = math.prod(lhs[i] for i in lc)
    m = math.prod(d for i, d in enumerate(lhs) if i not in lb and i not in lc)
    n = math.prod(d for i, d in enumerate(rhs) if i not in _rb and i not in rc)
    return 2 * batch * m * n * k


def _conv_flops(eqn) -> int:
    out = eqn.outvars[0].aval.shape          # (N, ..., out_ch) per dim numbers
    rhs = eqn.invars[1].aval.shape           # kernel
    dn = eqn.params["dimension_numbers"]
    groups = eqn.params.get("feature_group_count", 1)
    # kernel: in_ch/groups at rhs_spec[1]? jax conv dimension_numbers gives
    # rhs_spec = (out_ch_dim, in_ch_dim, *spatial)
    del groups  # jax kernels already store in_ch/groups at rhs_spec[1]
    rhs_spec = dn.rhs_spec
    kernel_spatial = math.prod(rhs[d] for d in rhs_spec[2:])
    in_ch_per_group = rhs[rhs_spec[1]]
    out_elems = math.prod(out)
    return 2 * out_elems * in_ch_per_group * kernel_spatial


def _count(jaxpr) -> Dict[str, Any]:
    flops = 0
    has_while = False
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "dot_general":
            flops += _dot_general_flops(eqn)
        elif prim == "conv_general_dilated":
            flops += _conv_flops(eqn)
        elif prim == "scan":
            inner = _count(eqn.params["jaxpr"].jaxpr)
            flops += inner["mxu_flops"] * eqn.params["length"]
            has_while |= inner["lower_bound"]
        elif prim in ("while",):
            for key in ("body_jaxpr", "cond_jaxpr"):
                inner = _count(eqn.params[key].jaxpr)
                flops += inner["mxu_flops"]
            has_while = True
        elif prim in ("cond", "switch"):
            branches = [_count(b.jaxpr) for b in eqn.params["branches"]]
            flops += max(b["mxu_flops"] for b in branches)
            has_while |= any(b["lower_bound"] for b in branches)
        else:
            # recurse into any nested jaxpr (pjit, remat, custom_vjp, ...)
            for val in eqn.params.values():
                inners = val if isinstance(val, (list, tuple)) else [val]
                for v in inners:
                    core_jaxpr = getattr(v, "jaxpr", None)
                    if core_jaxpr is not None and hasattr(core_jaxpr, "eqns"):
                        inner = _count(core_jaxpr)
                        flops += inner["mxu_flops"]
                        has_while |= inner["lower_bound"]
                    elif hasattr(v, "eqns"):
                        inner = _count(v)
                        flops += inner["mxu_flops"]
                        has_while |= inner["lower_bound"]
    return {"mxu_flops": flops, "lower_bound": has_while}


def mxu_flops(fn, *args, **kwargs) -> Dict[str, Any]:
    """Matmul/conv-only FLOPs of one call of ``fn(*args, **kwargs)``.

    Returns ``{"mxu_flops": int, "lower_bound": bool}``; ``lower_bound`` is
    True when a ``while`` loop made the count a one-iteration lower bound.
    """
    jaxpr = jax.make_jaxpr(fn, **{})(*args, **kwargs)
    return _count(jaxpr.jaxpr)
