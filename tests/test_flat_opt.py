"""The flat (single-buffer) optimizer path must be bitwise-identical to the
per-leaf update: amsgrad/adabelief are purely elementwise, so running them
over the raveled parameter vector reorders nothing.  Round-5 measured the
flat path ~9% SLOWER at bs24 on the real chip (benchmarks/flat_opt_ab.py —
optax.flatten's gradient ravel/concat costs more than the per-leaf fusions
it saves under lax.scan), so per-leaf is the default and ``MVC_FLAT_OPT=1``
opts in; these tests pin both the equivalence and the gate direction."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from multimodal_vae_comparison_tpu.training import optim


def _tree(seed=0):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 6)
    return {
        "dense": {"kernel": jax.random.normal(ks[0], (17, 33)),
                  "bias": jax.random.normal(ks[1], (33,))},
        "conv": {"kernel": jax.random.normal(ks[2], (3, 3, 4, 8)),
                 "bias": jax.random.normal(ks[3], (8,))},
        "scalarish": jax.random.normal(ks[4], (1,)),
        "big": jax.random.normal(ks[5], (257, 19)),
    }


def _make(name, flat):
    os.environ["MVC_FLAT_OPT"] = "1" if flat else "0"
    try:
        return optim.make_optimizer(name, 1e-3)
    finally:
        del os.environ["MVC_FLAT_OPT"]


@pytest.mark.parametrize("name", ["adam", "adabelief", "sgd"])
def test_flat_matches_per_leaf_bitwise(name):
    params = _tree(0)
    flat_tx = _make(name, flat=True)
    leaf_tx = _make(name, flat=False)

    p_flat, s_flat = params, flat_tx.init(params)
    p_leaf, s_leaf = params, leaf_tx.init(params)
    for step in range(5):
        grads = _tree(step + 1)
        u_f, s_flat = flat_tx.update(grads, s_flat, p_flat)
        p_flat = optax.apply_updates(p_flat, u_f)
        u_l, s_leaf = leaf_tx.update(grads, s_leaf, p_leaf)
        p_leaf = optax.apply_updates(p_leaf, u_l)
    for a, b in zip(jax.tree_util.tree_leaves(p_flat),
                    jax.tree_util.tree_leaves(p_leaf)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flat_optin_state_is_single_buffer():
    params = _tree(0)
    tx = _make("adam", flat=True)
    state = tx.init(params)
    arrays = [l for l in jax.tree_util.tree_leaves(state)
              if hasattr(l, "shape") and np.prod(l.shape) > 1]
    n = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))
    # every non-scalar state buffer is the full raveled parameter vector
    assert arrays and all(l.shape == (n,) for l in arrays)


def test_default_is_per_leaf():
    """Default (no env var) must be the per-leaf path — the flat path
    measured slower on the real chip (flat_opt_ab.json)."""
    params = _tree(0)
    os.environ.pop("MVC_FLAT_OPT", None)
    tx = optim.make_optimizer("adam", 1e-3)
    state = tx.init(params)
    shapes = {l.shape for l in jax.tree_util.tree_leaves(state)
              if hasattr(l, "shape")}
    assert (17, 33) in shapes  # per-leaf state mirrors the param tree
