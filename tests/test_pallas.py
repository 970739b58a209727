"""Pallas kernel correctness vs jnp references (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_vae_comparison_tpu.ops.pallas import attention as attn_mod
from multimodal_vae_comparison_tpu.ops.pallas import kl_kernel, poe_kernel
from multimodal_vae_comparison_tpu.models.nets import (
    dot_product_attention, key_padding_bias)
from multimodal_vae_comparison_tpu.ops.fusion import poe_precision_fusion


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(poe_kernel, "_INTERPRET", True)
    monkeypatch.setattr(kl_kernel, "_INTERPRET", True)
    monkeypatch.setattr(attn_mod, "_INTERPRET", True)


def test_poe_kernel_matches_reference():
    rng = np.random.default_rng(0)
    mus = jnp.array(rng.normal(size=(3, 8, 16)).astype(np.float32))
    scales = jnp.array(rng.uniform(0.3, 2.0, (3, 8, 16)).astype(np.float32))
    mu_k, scale_k = poe_kernel.poe_fused(mus, scales, 1.0)
    mu_r, scale_r = poe_precision_fusion(mus, scales, 1.0)
    np.testing.assert_allclose(np.asarray(mu_k), np.asarray(mu_r), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(scale_k), np.asarray(scale_r),
                               rtol=1e-4, atol=1e-6)


def test_poe_kernel_gradients_match_reference():
    rng = np.random.default_rng(1)
    mus = jnp.array(rng.normal(size=(2, 4, 8)).astype(np.float32))
    scales = jnp.array(rng.uniform(0.5, 1.5, (2, 4, 8)).astype(np.float32))

    def loss_k(m, s):
        mu, sc = poe_kernel.poe_fused(m, s, 1.0)
        return jnp.sum(mu * 1.3 + sc * 0.7)

    def loss_r(m, s):
        mu, sc = poe_precision_fusion(m, s, 1.0)
        return jnp.sum(mu * 1.3 + sc * 0.7)

    gk = jax.grad(loss_k, argnums=(0, 1))(mus, scales)
    gr = jax.grad(loss_r, argnums=(0, 1))(mus, scales)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_kl_kernel_matches_reference():
    rng = np.random.default_rng(2)
    mu = jnp.array(rng.normal(size=(16, 24)).astype(np.float32))
    scale = jnp.array(rng.uniform(0.2, 3.0, (16, 24)).astype(np.float32))
    got = kl_kernel.kl_normal_std_fused(mu, scale)
    want = kl_kernel._kl_reference(mu, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-6)


def test_kl_kernel_gradients():
    mu = jnp.array([[0.5, -1.0]])
    scale = jnp.array([[1.5, 0.7]])
    g = jax.grad(lambda m, s: kl_kernel.kl_normal_std_fused(m, s).sum(),
                 argnums=(0, 1))(mu, scale)
    gr = jax.grad(lambda m, s: kl_kernel._kl_reference(m, s).sum(),
                  argnums=(0, 1))(mu, scale)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


@pytest.mark.parametrize("tq,tk,block", [(8, 8, 8), (8, 30, 8), (4, 130, 128)])
def test_flash_attention_matches_reference(tq, tk, block):
    rng = np.random.default_rng(3)
    b, h, dh = 2, 2, 16
    q = jnp.array(rng.normal(size=(b, h, tq, dh)).astype(np.float32))
    k = jnp.array(rng.normal(size=(b, h, tk, dh)).astype(np.float32))
    v = jnp.array(rng.normal(size=(b, h, tk, dh)).astype(np.float32))
    mask = jnp.array(rng.random((b, tk)) > 0.3)
    mask = mask.at[:, 0].set(True)  # at least one visible key
    got = attn_mod.masked_flash_attention(q, k, v, mask, kv_block=block)
    want = dot_product_attention(q, k, v, key_padding_bias(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_flash_attention_no_mask():
    rng = np.random.default_rng(4)
    q = jnp.array(rng.normal(size=(1, 2, 6, 8)).astype(np.float32))
    k = jnp.array(rng.normal(size=(1, 2, 10, 8)).astype(np.float32))
    v = jnp.array(rng.normal(size=(1, 2, 10, 8)).astype(np.float32))
    got = attn_mod.masked_flash_attention(q, k, v)
    want = dot_product_attention(q, k, v, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_sample_boxmuller_bits_contract():
    """CPU contract test of the kernel's bits->normal math with REAL signed
    bit patterns: pltpu.prng_random_bits returns signed int32 on TPU, and a
    missing uint32 bitcast turns half the lanes into NaN (regression —
    interpret mode cannot execute prng_seed, so this math path is the only
    part of the kernel testable off-TPU)."""
    from multimodal_vae_comparison_tpu.ops.pallas.sample_kernel import (
        _boxmuller_from_bits)
    rng = np.random.default_rng(0)
    # raw int32 bits, sign bit set for ~half — the TPU PRNG's actual output
    signed = rng.integers(-2**31, 2**31, size=(64, 128), dtype=np.int64)
    signed = signed.astype(np.int32)
    assert (signed < 0).mean() > 0.3
    bits_a = jnp.asarray(signed.view(np.uint32))
    bits_b = jnp.asarray(
        rng.integers(0, 2**32, size=(64, 128), dtype=np.uint64)
        .astype(np.uint32))
    eps = np.asarray(_boxmuller_from_bits(bits_a, bits_b))
    assert np.isfinite(eps).all()
    assert abs(eps.mean()) < 0.05 and abs(eps.std() - 1.0) < 0.05
    # the bug being regressed: an arithmetic shift on the signed view makes
    # u1 negative -> log NaN
    u1_signed = (signed >> 8).astype(np.float32) * (1.0 / (1 << 24)) + 1e-7
    assert (u1_signed < 0).any()


def test_sample_kernel_statistics_and_grads(monkeypatch):
    from multimodal_vae_comparison_tpu.ops.pallas import sample_kernel, telemetry
    monkeypatch.setattr(sample_kernel, "_INTERPRET", True)
    telemetry.reset()
    mu = jnp.full((64, 128), 2.0)
    scale = jnp.full((64, 128), 0.5)
    z = sample_kernel.sample_normal_fused(mu, scale, jnp.asarray(7, jnp.int32))
    assert z.shape == mu.shape
    got_mean, got_std = float(z.mean()), float(z.std())
    assert abs(got_mean - 2.0) < 0.05, got_mean
    assert abs(got_std - 0.5) < 0.05, got_std
    # reparameterization gradients: dz/dmu = 1, dz/dscale = eps
    g_mu, g_scale = jax.grad(
        lambda m, s: sample_kernel.sample_normal_fused(
            m, s, jnp.asarray(7, jnp.int32)).sum(), argnums=(0, 1))(mu, scale)
    np.testing.assert_allclose(np.asarray(g_mu), 1.0)
    eps = (np.asarray(z) - 2.0) / 0.5
    np.testing.assert_allclose(np.asarray(g_scale), eps, rtol=1e-4, atol=1e-5)
    # honesty check: on CPU this exercises the jnp fallback (prng_seed has
    # no CPU lowering even in interpret mode) — the kernel's own math is
    # covered by test_sample_boxmuller_bits_contract above
    paths = telemetry.summary()
    assert any(k.startswith("sample:") for k in paths), paths


def test_block_sparse_attention_matches_reference(monkeypatch):
    """Strided block-sparse kernel vs the dense emulation of the identical
    block-granularity pattern (DeepSpeed StridedSparsityConfig semantics)."""
    from multimodal_vae_comparison_tpu.ops.pallas import sparse_attention

    monkeypatch.setattr(sparse_attention, "_INTERPRET", True)
    rng = np.random.default_rng(0)
    B, H, T, D, BLK, STRIDE = 2, 2, 64, 8, 8, 2
    q = jnp.array(rng.normal(size=(B, H, T, D)).astype(np.float32))
    k = jnp.array(rng.normal(size=(B, H, T, D)).astype(np.float32))
    v = jnp.array(rng.normal(size=(B, H, T, D)).astype(np.float32))
    out = sparse_attention.strided_block_sparse_attention(
        q, k, v, block=BLK, block_stride=STRIDE)
    ref = sparse_attention._reference_block_sparse(q, k, v, BLK, STRIDE)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_block_sparse_layout_counts():
    """The layout touches 1 + floor(i/stride) blocks for query block i —
    the compute the kernel skips is the point of block sparsity."""
    from multimodal_vae_comparison_tpu.ops.pallas.sparse_attention import (
        block_sparse_layout)

    kv_map, n_valid = block_sparse_layout(64, 8, 2)
    assert kv_map.shape[0] == 8
    np.testing.assert_array_equal(
        np.asarray(n_valid), [1 + i // 2 for i in range(8)])
    # row 5 attends strided blocks {1, 3} plus its diagonal {5}
    np.testing.assert_array_equal(np.asarray(kv_map)[5][:3], [1, 3, 5])
    live = int(np.asarray(n_valid).sum())
    assert live < 8 * 9 // 2  # strictly sparser than causal-dense


def test_block_sparse_attention_grad(monkeypatch):
    """VJP recomputes through the dense reference; grads must match it."""
    from multimodal_vae_comparison_tpu.ops.pallas import sparse_attention

    monkeypatch.setattr(sparse_attention, "_INTERPRET", True)
    rng = np.random.default_rng(1)
    q = jnp.array(rng.normal(size=(1, 1, 16, 4)).astype(np.float32))
    k = jnp.array(rng.normal(size=(1, 1, 16, 4)).astype(np.float32))
    v = jnp.array(rng.normal(size=(1, 1, 16, 4)).astype(np.float32))

    def loss_kernel(q, k, v):
        return jnp.sum(sparse_attention.strided_block_sparse_attention(
            q, k, v, block=4, block_stride=2) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(sparse_attention._reference_block_sparse(
            q, k, v, 4, 2) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_strided_sparse_self_attention_module(monkeypatch):
    """The flax module pads T to a block multiple and matches the dense
    emulation of the same pattern on the unpadded positions."""
    from multimodal_vae_comparison_tpu.models.nets import (
        StridedSparseSelfAttention)
    from multimodal_vae_comparison_tpu.ops.pallas import sparse_attention

    monkeypatch.setattr(sparse_attention, "_INTERPRET", True)
    rng = np.random.default_rng(0)
    x = jnp.array(rng.normal(size=(2, 21, 16)).astype(np.float32))  # pad->24
    mod = StridedSparseSelfAttention(num_heads=2, block=8, block_stride=2)
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    assert out.shape == (2, 21, 16)
    assert np.isfinite(np.asarray(out)).all()

    # padding invariance: the same inputs with T already a block multiple
    # of real data must produce identical outputs on the shared prefix
    x2 = jnp.concatenate([x, jnp.zeros((2, 3, 16))], axis=1)
    out2 = mod.apply(params, x2)
    np.testing.assert_allclose(np.asarray(out2[:, :21]), np.asarray(out),
                               rtol=2e-4, atol=2e-5)


def test_block_sparse_layout_transpose_consistency():
    """qv_map must be exactly the transpose of kv_map: (i attends j) in the
    forward layout <=> (j is attended by i) in the backward layout."""
    from multimodal_vae_comparison_tpu.ops.pallas.sparse_attention import (
        block_sparse_layout, block_sparse_layout_T)
    import numpy as np
    for t, blk, stride in ((64, 8, 2), (128, 16, 4), (96, 8, 3)):
        kv_map, n_valid = block_sparse_layout(t, blk, stride)
        qv_map, nq_valid = block_sparse_layout_T(t, blk, stride)
        fwd = {(i, int(kv_map[i, j]))
               for i in range(kv_map.shape[0]) for j in range(int(n_valid[i]))}
        bwd = {(int(qv_map[j, i]), j)
               for j in range(qv_map.shape[0]) for i in range(int(nq_valid[j]))}
        assert fwd == bwd
        assert int(np.asarray(n_valid).sum()) == int(np.asarray(nq_valid).sum())


def test_block_sparse_backward_matches_dense_multi_shape(monkeypatch):
    """Sparse Pallas backward (dq/dk/dv kernels, interpret mode) vs the
    dense-bias reference VJP across strides and rectangular extents."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from multimodal_vae_comparison_tpu.ops.pallas import sparse_attention

    monkeypatch.setattr(sparse_attention, "_INTERPRET", True)
    for (b, h, t, dh, blk, stride) in ((1, 2, 64, 16, 8, 2),
                                       (2, 1, 96, 8, 8, 3)):
        k0 = jax.random.PRNGKey(t + stride)
        ks = jax.random.split(k0, 4)
        q = jax.random.normal(ks[0], (b, h, t, dh))
        k = jax.random.normal(ks[1], (b, h, t, dh))
        v = jax.random.normal(ks[2], (b, h, t, dh))
        ct = jax.random.normal(ks[3], (b, h, t, dh))

        def f_sparse(q, k, v):
            return jnp.vdot(ct, sparse_attention.strided_block_sparse_attention(
                q, k, v, block=blk, block_stride=stride))

        def f_dense(q, k, v):
            return jnp.vdot(ct, sparse_attention._reference_block_sparse(
                q, k, v, blk, stride))

        gs = jax.grad(f_sparse, argnums=(0, 1, 2))(q, k, v)
        gd = jax.grad(f_dense, argnums=(0, 1, 2))(q, k, v)
        for a, bb, name in zip(gs, gd, "q k v".split()):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       atol=2e-4, rtol=2e-3,
                                       err_msg=f"d{name} t={t} stride={stride}")


def test_sparse_dispatch_split_by_grad_mode():
    """The Pallas threshold is 2048 on the AD path (fwd+bwd A/B winner)
    but stays 4096 forward-only, where dense still wins at T=2048
    (advisor round-4 finding)."""
    from multimodal_vae_comparison_tpu.ops.pallas.sparse_attention import (
        _dispatch_pallas)
    # training path
    assert _dispatch_pallas(2048, True, None, False)
    assert not _dispatch_pallas(1024, True, None, False)
    # forward-only path
    assert not _dispatch_pallas(2048, False, None, False)
    assert _dispatch_pallas(4096, False, None, False)
    # env override wins in both directions on both paths
    assert _dispatch_pallas(128, False, "1", False)
    assert not _dispatch_pallas(8192, True, "0", False)
    # interpret mode (CPU tests) always exercises the kernel
    assert _dispatch_pallas(128, False, None, True)
