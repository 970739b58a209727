"""Analytic MXU FLOP counter vs hand-computed golden values."""
import jax
import jax.numpy as jnp
import numpy as np

from multimodal_vae_comparison_tpu.ops.flops import mxu_flops


def test_plain_matmul():
    a = jnp.zeros((8, 16)); b = jnp.zeros((16, 32))
    got = mxu_flops(lambda x, y: x @ y, a, b)
    assert got["mxu_flops"] == 2 * 8 * 32 * 16
    assert not got["lower_bound"]


def test_batched_dot_general():
    a = jnp.zeros((4, 8, 16)); b = jnp.zeros((4, 16, 32))
    got = mxu_flops(lambda x, y: jnp.einsum("bmk,bkn->bmn", x, y), a, b)
    assert got["mxu_flops"] == 2 * 4 * 8 * 32 * 16


def test_conv2d():
    import flax.linen as nn
    conv = nn.Conv(features=32, kernel_size=(3, 3), padding="SAME")
    x = jnp.zeros((2, 8, 8, 3))
    params = conv.init(jax.random.PRNGKey(0), x)
    got = mxu_flops(lambda p, v: conv.apply(p, v), params, x)
    # out elems (2*8*8*32) x in_ch 3 x kernel 9 x 2
    assert got["mxu_flops"] == 2 * (2 * 8 * 8 * 32) * 3 * 9


def test_scan_multiplies_by_length():
    w = jnp.zeros((16, 16))

    def f(w):
        def body(c, _):
            return c @ w, ()
        c, _ = jax.lax.scan(body, jnp.zeros((4, 16)), None, length=10)
        return c
    got = mxu_flops(f, w)
    assert got["mxu_flops"] == 10 * 2 * 4 * 16 * 16


def test_grad_counts_backward_matmuls():
    w = jnp.zeros((16, 16)); x = jnp.zeros((4, 16))
    fwd = mxu_flops(lambda w: (x @ w).sum(), w)
    bwd = mxu_flops(jax.grad(lambda w: (x @ w).sum()), w)
    assert bwd["mxu_flops"] >= fwd["mxu_flops"]  # dL/dw = x^T @ dy


def test_train_step_flops_positive():
    import __graft_entry__ as ge
    import optax
    from multimodal_vae_comparison_tpu.training.trainer import (
        TrainState, make_train_step)
    model = ge._flagship()
    batch = ge._batch(4)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "sample": rng}, batch,
                        method=model.objective)
    tx = optax.amsgrad(1e-4)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = make_train_step(model, tx)
    got = mxu_flops(step, state, batch, rng)
    assert got["mxu_flops"] > 1e6
