"""Shared network building blocks (flax.linen, TPU-first).

Re-designed equivalents of the reference's ``nn_modules.py`` (1156 LoC of
torch blocks): positional encodings, masked transformer encoder/decoder
stacks, residual up/down conv blocks, 3D same-pad convs + axial attention
(VideoGPT family), ResNet-50 and ViT trunks, and a VGG19-topology feature
extractor for the perceptual loss.

TPU-first choices:

* NHWC layout everywhere (XLA's native conv layout on TPU);
* attention uses one fused einsum path with additive masks — no DeepSpeed
  sparse CUDA kernels (reference nn_modules.py:646-649); the strided-sparse
  pattern from VideoGPT is expressed as a *static* additive mask which XLA
  folds into the attention kernel (sequence lengths here are tiny);
* matmuls run in bfloat16 on TPU when ``dtype`` is set, params stay fp32.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_vae_comparison_tpu.constants import ETA

Dtype = Any


def group_norm(x, dtype=jnp.float32, groups: int = 8):
    """GroupNorm in place of the reference's BatchNorm.

    Deliberate TPU-first deviation: BatchNorm carries mutable running stats
    (awkward under jit) and needs cross-replica reduction when the batch is
    sharded over the mesh; GroupNorm is stateless, batch-size independent and
    identical per replica.
    """
    g = math.gcd(groups, x.shape[-1])
    return nn.GroupNorm(num_groups=g, dtype=dtype)(x)


class GroupNormMod(nn.Module):
    """Module wrapper so `norm()` factories inside blocks can instantiate it."""

    dtype: Dtype = jnp.float32
    groups: int = 8

    @nn.compact
    def __call__(self, x):
        g = math.gcd(self.groups, x.shape[-1])
        return nn.GroupNorm(num_groups=g, dtype=self.dtype)(x)


class FrozenBatchNorm(nn.Module):
    """Inference-mode batch norm with stop-gradient running statistics.

    The canonical TPU-friendly form of a pretrained torchvision trunk's
    BatchNorm: normalization uses the *stored* running mean/var (so converted
    ImageNet weights reproduce eval-mode behavior exactly, see
    eval/weights.py), scale/bias stay trainable for fine-tuning, and the
    stats live in the ordinary params tree but are stop-gradiented so no
    optimizer ever moves them.  At random init (mean 0, var 1) it reduces to
    a learnable affine.
    """

    dtype: Dtype = jnp.float32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = jax.lax.stop_gradient(
            self.param("mean", nn.initializers.zeros, (c,)))
        var = jax.lax.stop_gradient(
            self.param("var", nn.initializers.ones, (c,)))
        inv = (scale * jax.lax.rsqrt(var + self.eps)).astype(self.dtype)
        return x * inv + (bias - mean * scale
                          * jax.lax.rsqrt(var + self.eps)).astype(self.dtype)


def positional_encoding(length: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """Sinusoidal positional encoding table of shape (length, dim)."""
    pos = jnp.arange(length, dtype=jnp.float32)[:, None]
    i = jnp.arange(0, dim, 2, dtype=jnp.float32)[None, :]
    angle = pos / jnp.power(10000.0, i / dim)
    pe = jnp.zeros((length, dim), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angle))
    pe = pe.at[:, 1::2].set(jnp.cos(angle)[:, : dim // 2])
    return pe.astype(dtype)


class MLP(nn.Module):
    features: Sequence[int]
    activation: Callable = nn.relu
    activate_final: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype)(x)
            if i < len(self.features) - 1 or self.activate_final:
                x = self.activation(x)
        return x


def dot_product_attention(q, k, v, mask_bias=None, dtype=jnp.float32):
    """Fused attention: (B, H, Tq, Dh) x (B, H, Tk, Dh) -> (B, H, Tq, Dh).

    ``mask_bias`` is an additive bias broadcastable to (B, H, Tq, Tk)
    (0 for visible, large negative for masked).
    """
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask_bias is not None:
        logits = logits + mask_bias
    weights = jax.nn.softmax(logits, axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v,
                      preferred_element_type=jnp.float32).astype(dtype)


def key_padding_bias(key_mask: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """(B, Tk) boolean mask (True = valid) -> additive bias (B, 1, 1, Tk)."""
    if key_mask is None:
        return None
    return jnp.where(key_mask[:, None, None, :], 0.0, -1e9)


class MultiHeadAttention(nn.Module):
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, kv_in, mask_bias=None):
        d_model = q_in.shape[-1]
        assert d_model % self.num_heads == 0
        dh = d_model // self.num_heads
        dense = lambda name: nn.DenseGeneral((self.num_heads, dh), dtype=self.dtype, name=name)
        q = dense("query")(q_in).transpose(0, 2, 1, 3)
        k = dense("key")(kv_in).transpose(0, 2, 1, 3)
        v = dense("value")(kv_in).transpose(0, 2, 1, 3)
        from multimodal_vae_comparison_tpu.ops.pallas import telemetry
        from multimodal_vae_comparison_tpu.ops.pallas.attention import (
            masked_flash_attention, use_flash_attention)
        # key-padding masks come in as an additive (B, 1, 1, Tk) bias; the
        # Pallas kernel only handles that (per-key) mask form, not full
        # (B, H, Tq, Tk) biases like the strided-sparse pattern
        per_key_bias = mask_bias is None or (
            mask_bias.ndim == 4 and mask_bias.shape[1] == 1
            and mask_bias.shape[2] == 1)
        if use_flash_attention() and per_key_bias:
            key_mask = (None if mask_bias is None
                        else mask_bias[:, 0, 0, :] >= -1.0)
            out = masked_flash_attention(q, k, v, key_mask).astype(self.dtype)
            telemetry.record("attention", "pallas-flash")
        else:
            out = dot_product_attention(q, k, v, mask_bias, dtype=self.dtype)
            telemetry.record("attention", "xla-fused")
        out = out.transpose(0, 2, 1, 3).reshape(q_in.shape[:-1] + (d_model,))
        return nn.Dense(d_model, dtype=self.dtype, name="out")(out)


class TransformerEncoderLayer(nn.Module):
    """Post-norm transformer encoder layer (matches torch's default layout)."""

    num_heads: int
    ff_size: int
    activation: Callable = nn.gelu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, key_mask=None, deterministic=True):
        bias = key_padding_bias(key_mask)
        h = MultiHeadAttention(self.num_heads, dtype=self.dtype)(x, x, bias)
        x = nn.LayerNorm(dtype=self.dtype)(x + h)
        h = nn.Dense(self.ff_size, dtype=self.dtype)(x)
        h = self.activation(h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype)(h)
        return nn.LayerNorm(dtype=self.dtype)(x + h)


class TransformerEncoder(nn.Module):
    num_layers: int
    num_heads: int
    ff_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, key_mask=None, deterministic=True):
        for _ in range(self.num_layers):
            x = TransformerEncoderLayer(self.num_heads, self.ff_size,
                                        dtype=self.dtype)(x, key_mask, deterministic)
        return x


class TransformerDecoderLayer(nn.Module):
    """Decoder layer: self-attention over queries + cross-attention to memory."""

    num_heads: int
    ff_size: int
    activation: Callable = nn.gelu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, tgt_key_mask=None, mem_key_mask=None):
        bias_t = key_padding_bias(tgt_key_mask)
        h = MultiHeadAttention(self.num_heads, dtype=self.dtype)(tgt, tgt, bias_t)
        tgt = nn.LayerNorm(dtype=self.dtype)(tgt + h)
        bias_m = key_padding_bias(mem_key_mask)
        h = MultiHeadAttention(self.num_heads, dtype=self.dtype)(tgt, memory, bias_m)
        tgt = nn.LayerNorm(dtype=self.dtype)(tgt + h)
        h = nn.Dense(self.ff_size, dtype=self.dtype)(tgt)
        h = self.activation(h)
        h = nn.Dense(tgt.shape[-1], dtype=self.dtype)(h)
        return nn.LayerNorm(dtype=self.dtype)(tgt + h)


class TransformerDecoder(nn.Module):
    num_layers: int
    num_heads: int
    ff_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, tgt_key_mask=None, mem_key_mask=None):
        for _ in range(self.num_layers):
            tgt = TransformerDecoderLayer(self.num_heads, self.ff_size,
                                          dtype=self.dtype)(tgt, memory,
                                                            tgt_key_mask, mem_key_mask)
        return tgt


# ---------------------------------------------------------------------------
# Conv blocks
# ---------------------------------------------------------------------------

class ResDown(nn.Module):
    """Residual down-sampling block (reference nn_modules.py:14-38)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        skip = nn.Conv(self.channels, (3, 3), strides=2, padding=1, dtype=self.dtype)(x)
        h = nn.Conv(self.channels // 2, (3, 3), strides=2, padding=1, dtype=self.dtype)(x)
        h = group_norm(h, dtype=self.dtype)
        h = nn.elu(h)
        h = nn.Conv(self.channels, (3, 3), strides=1, padding=1, dtype=self.dtype)(h)
        h = group_norm(h, dtype=self.dtype)
        return nn.elu(h + skip)


class ResUp(nn.Module):
    """Residual up-sampling block (reference nn_modules.py:40-62)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h_, w_, c = x.shape
        x_up = jax.image.resize(x, (b, h_ * 2, w_ * 2, c), method="nearest")
        skip = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype)(x_up)
        h = nn.Conv(self.channels // 2, (3, 3), padding=1, dtype=self.dtype)(x_up)
        h = group_norm(h, dtype=self.dtype)
        h = nn.elu(h)
        h = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype)(h)
        h = group_norm(h, dtype=self.dtype)
        return nn.elu(h + skip)


class ConvTranspose2dTorch(nn.Module):
    """2x up-sampling transposed conv matching torch's
    ConvTranspose2d(k=4, stride=2, padding=1) output geometry."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # flax 'SAME' on (k=4, s=2) reproduces torch's (k=4, s=2, p=1)
        # exact-2x upsampling geometry
        return nn.ConvTranspose(self.features, (4, 4), strides=(2, 2),
                                padding="SAME", dtype=self.dtype)(x)


# ---------------------------------------------------------------------------
# VideoGPT-style 3D blocks
# ---------------------------------------------------------------------------

class SamePadConv3d(nn.Module):
    features: int
    kernel: int = 4
    strides: Tuple[int, int, int] = (1, 1, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (self.kernel,) * 3, strides=self.strides,
                       padding="SAME", dtype=self.dtype)(x)


class SamePadConvTranspose3d(nn.Module):
    features: int
    kernel: int = 4
    strides: Tuple[int, int, int] = (1, 1, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(self.features, (self.kernel,) * 3,
                                strides=self.strides, padding="SAME",
                                dtype=self.dtype)(x)


class AxialAttention(nn.Module):
    """Axial self-attention over a (B, T, H, W, C) video feature volume.

    Replaces the VideoGPT AxialBlock + DeepSpeed SparseAttention pair
    (reference nn_modules.py:517-882): attention runs along one axis at a
    time, which is both exact for axial and maps onto batched small matmuls
    that XLA tiles onto the MXU.
    """

    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        out = 0.0
        for axis, name in ((1, "t"), (2, "h"), (3, "w")):
            perm = [0, 1, 2, 3]
            perm.remove(axis)
            perm = perm + [axis]
            xp = jnp.transpose(x, perm + [4])           # (..., L, C)
            flat = xp.reshape(-1, xp.shape[-2], xp.shape[-1])
            att = MultiHeadAttention(self.num_heads, dtype=self.dtype,
                                     name=f"axial_{name}")(flat, flat)
            att = att.reshape(xp.shape)
            inv = [perm.index(i) for i in range(4)]
            out = out + jnp.transpose(att, inv + [4])
        return out


class AttentionResidualBlock(nn.Module):
    """VideoGPT attention-residual block (reference nn_modules.py:517-560)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = group_norm(x, dtype=self.dtype)
        h = nn.relu(h)
        h = SamePadConv3d(self.channels // 2, kernel=3, dtype=self.dtype)(h)
        h = group_norm(h, dtype=self.dtype)
        h = nn.relu(h)
        h = SamePadConv3d(self.channels, kernel=1, dtype=self.dtype)(h)
        h = group_norm(h, dtype=self.dtype)
        h = nn.relu(h)
        h = AxialAttention(num_heads=2, dtype=self.dtype)(h)
        return x + h


class SparseAttentionResidualBlock(nn.Module):
    """VideoGPT attention-residual block with the reference's
    ``attn_type='sparse'`` option (reference nn_modules.py:624-882, the
    DeepSpeed StridedSparsityConfig path): the (B, T, H, W, C) feature
    volume flattens to one spacetime token sequence and runs the strided
    block-sparse kernel — on TPU the Pallas kernel actually skips the
    masked blocks (ops/pallas/sparse_attention.py).  At VideoGPT's
    default downsampling a SPRITES clip is 8*16*16 = 2048 tokens, the
    regime where the Pallas fwd+bwd path wins the A/B
    (docs/performance.md)."""

    channels: int
    block: int = 128
    block_stride: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = group_norm(x, dtype=self.dtype)
        h = nn.relu(h)
        h = SamePadConv3d(self.channels // 2, kernel=3, dtype=self.dtype)(h)
        h = group_norm(h, dtype=self.dtype)
        h = nn.relu(h)
        h = SamePadConv3d(self.channels, kernel=1, dtype=self.dtype)(h)
        h = group_norm(h, dtype=self.dtype)
        h = nn.relu(h)
        b, t, hh, ww, c = h.shape
        seq = h.reshape(b, t * hh * ww, c)
        att = StridedSparseSelfAttention(
            num_heads=2, block=self.block, block_stride=self.block_stride,
            dtype=self.dtype)(seq)
        return x + att.reshape(b, t, hh, ww, c)


class StridedSparseSelfAttention(nn.Module):
    """VideoGPT's 'sparse' attention type as a real block-sparse kernel.

    Causal self-attention over (B, T, C) where each ``block``-sized query
    block attends its own (causally masked) block plus every
    ``block_stride``-th earlier block in full — DeepSpeed
    StridedSparsityConfig semantics (reference nn_modules.py:624-882).  On
    TPU the masked-out blocks are actually skipped
    (ops/pallas/sparse_attention.py); elsewhere the dense jnp emulation of
    the identical pattern runs.  T is padded to a block multiple internally
    (padded keys are causally invisible to real queries).
    """

    num_heads: int
    block: int = 128
    block_stride: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from multimodal_vae_comparison_tpu.ops.pallas.sparse_attention import (
            strided_block_sparse_attention)
        b, t, c = x.shape
        assert c % self.num_heads == 0
        dh = c // self.num_heads
        dense = lambda name: nn.DenseGeneral((self.num_heads, dh),
                                             dtype=self.dtype, name=name)
        q = dense("query")(x).transpose(0, 2, 1, 3)
        k = dense("key")(x).transpose(0, 2, 1, 3)
        v = dense("value")(x).transpose(0, 2, 1, 3)
        pad = (-t) % self.block
        if pad:
            widths = ((0, 0), (0, 0), (0, pad), (0, 0))
            q, k, v = (jnp.pad(a, widths) for a in (q, k, v))
        out = strided_block_sparse_attention(
            q, k, v, block=self.block, block_stride=self.block_stride)
        out = out[:, :, :t].astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, c)
        return nn.Dense(c, dtype=self.dtype, name="out")(out)


# ---------------------------------------------------------------------------
# ResNet-50 trunk (Enc_CNN's backbone; reference encoders.py:108-113)
# ---------------------------------------------------------------------------

class BottleneckBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # FrozenBatchNorm so torchvision's BN running stats install 1:1
        # (eval/weights.py); module order matches torchvision's
        # conv1/bn1/conv2/bn2/conv3/bn3/downsample naming for conversion.
        norm = lambda: FrozenBatchNorm(dtype=self.dtype)
        residual = x
        h = nn.Conv(self.features, (1, 1), dtype=self.dtype, use_bias=False)(x)
        h = nn.relu(norm()(h))
        h = nn.Conv(self.features, (3, 3), strides=self.strides, padding=1,
                    dtype=self.dtype, use_bias=False)(h)
        h = nn.relu(norm()(h))
        h = nn.Conv(self.features * 4, (1, 1), dtype=self.dtype, use_bias=False)(h)
        h = norm()(h)
        if residual.shape != h.shape:
            residual = nn.Conv(self.features * 4, (1, 1), strides=self.strides,
                               dtype=self.dtype, use_bias=False)(x)
            residual = norm()(residual)
        return nn.relu(h + residual)


class ResNet50(nn.Module):
    """ResNet-50 topology; used as the Enc_CNN trunk.

    The reference loads ImageNet-pretrained torchvision weights
    (encoders.py:108-113).  Offline we initialize randomly; ``load_weights``
    hooks in eval/weights.py can install converted weights when available.
    """

    num_outputs: int = 1000
    dtype: Dtype = jnp.float32
    stage_sizes: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(64, (7, 7), strides=2, padding=3, dtype=self.dtype,
                    use_bias=False)(x)
        h = FrozenBatchNorm(dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, n_blocks in enumerate(self.stage_sizes):
            for j in range(n_blocks):
                strides = 2 if i > 0 and j == 0 else 1
                h = BottleneckBlock(64 * 2 ** i, strides=strides,
                                    dtype=self.dtype)(h, train)
        h = jnp.mean(h, axis=(1, 2))
        return nn.Dense(self.num_outputs, dtype=self.dtype)(h)


class ViT(nn.Module):
    """Compact ViT trunk (Enc_VIT's backbone, reference encoders.py:130-161).

    torchvision's vit_b_16(image_size=64) = patch 16 over 64x64 -> 16 tokens;
    we keep the geometry but use a narrower default width suited to the tiny
    inputs (the reference's 86M-param ViT on 64x64 is wildly overparameterized
    for this benchmark; width is configurable to match if needed)."""

    patch: int = 16
    width: int = 256
    depth: int = 6
    heads: int = 8
    num_outputs: int = 1000
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        h = nn.Conv(self.width, (self.patch, self.patch),
                    strides=self.patch, dtype=self.dtype)(x)
        h = h.reshape(b, -1, self.width)
        cls = self.param("cls", nn.initializers.zeros, (1, 1, self.width))
        h = jnp.concatenate([jnp.tile(cls, (b, 1, 1)).astype(h.dtype), h], axis=1)
        pe = self.param("pos_embed", nn.initializers.normal(0.02),
                        (1, h.shape[1], self.width))
        h = h + pe.astype(h.dtype)
        h = TransformerEncoder(self.depth, self.heads, self.width * 4,
                               dtype=self.dtype)(h)
        return nn.Dense(self.num_outputs, dtype=self.dtype)(h[:, 0])


class MultiTransformer(nn.Module):
    """Transformer fusion network over stacked per-modality latent tokens
    (reference nn_modules.py:65-142): embeds a (B, T, D) sequence of latent
    vectors, runs a masked encoder (optionally followed by a time-query
    decoder), and emits fused (mu, scale).  ``zero_masking`` masks all-zero
    rows (the reference's padded-modality convention)."""

    latent_dim: int
    num_layers: int = 2
    num_heads: int = 2
    ff_size: int = 2048
    zero_masking: bool = False
    use_decoder: bool = False
    use_ml_layers: bool = True
    output_mean: bool = True
    pos_encoding: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        b, t = x.shape[0], x.shape[1]
        x = x.reshape(b, t, -1)
        if mask is None and self.zero_masking:
            mask = jnp.any(x != 0, axis=-1)
        h = nn.Dense(self.latent_dim, dtype=self.dtype,
                     name="skel_embedding")(x)
        if self.pos_encoding:
            h = h + positional_encoding(t, self.latent_dim, dtype=h.dtype)[None]
        h = TransformerEncoder(self.num_layers, self.num_heads, self.ff_size,
                               dtype=self.dtype)(h, key_mask=mask)
        if self.use_decoder:
            queries = jnp.tile(positional_encoding(
                t, self.latent_dim, dtype=h.dtype)[None], (b, 1, 1))
            h = TransformerDecoder(self.num_layers, self.num_heads,
                                   self.ff_size, dtype=self.dtype)(
                queries, h, tgt_key_mask=mask)
        if not self.use_ml_layers:
            mu, raw = h[:, 0], h[:, 1]
        else:
            z = h.mean(axis=1) if self.output_mean else h[:, 0]
            mu = nn.Dense(self.latent_dim, dtype=self.dtype, name="mu_layer")(z)
            raw = nn.Dense(self.latent_dim, dtype=self.dtype,
                           name="logvar_layer")(z)
        scale = jax.nn.softmax(raw.astype(jnp.float32), axis=-1) + ETA
        return mu.astype(jnp.float32), scale


class ResidualBlock1dConv(nn.Module):
    """Weighted-residual 1D conv block (reference nn_modules.py:144-177,
    MoPoE feature compressors): out = a*residual + b*conv_path."""

    channels_out: int
    kernel: int = 1
    strides: int = 1
    a: float = 2.0
    b: float = 0.3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        h = group_norm(x, dtype=self.dtype)
        h = nn.relu(h)
        h = nn.Conv(self.channels_out, (self.kernel,), strides=self.strides,
                    padding="SAME", dtype=self.dtype)(h)
        h = group_norm(h, dtype=self.dtype)
        h = nn.relu(h)
        h = nn.Conv(self.channels_out, (self.kernel,), strides=1,
                    padding="SAME", dtype=self.dtype)(h)
        if residual.shape != h.shape:
            residual = nn.Conv(self.channels_out, (1,), strides=self.strides,
                               dtype=self.dtype)(x)
        return self.a * residual + self.b * h


class ResidualFeatureCompressor(nn.Module):
    """Residual 1D-conv compressor emitting style/content (mu, raw-scale)
    pairs (reference nn_modules.py:210-228, from the MoPoE repo)."""

    out_style: int
    out_content: int
    a: float = 2.0
    b: float = 0.3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        def branch(name, out):
            return ResidualBlock1dConv(out, a=self.a, b=self.b,
                                       dtype=self.dtype, name=name)(feats)
        return (branch("style_mu", self.out_style),
                branch("style_logvar", self.out_style),
                branch("content_mu", self.out_content),
                branch("content_logvar", self.out_content))


class VGGFeatures(nn.Module):
    """VGG19-topology feature extractor for the perceptual 'feature_loss'.

    Reference uses torchvision's pretrained VGG19 (nn_modules.py:1066,
    objectives.py:461-483).  Offline, random fixed features still provide a
    useful multi-scale perceptual signal; pretrained weights can be installed
    via eval/weights.py.
    """

    dtype: Dtype = jnp.float32
    cfg: Sequence[Any] = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M")

    @nn.compact
    def __call__(self, x, taps: str = "pool"):
        """taps='pool': one feature map per max-pool stage (FID path);
        taps='conv': every conv's pre-activation output (the feature_loss
        accumulation points, reference nn_modules.py:1108-1152)."""
        pool_feats, conv_feats = [], []
        h = x
        for v in self.cfg:
            if v == "M":
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
                pool_feats.append(h)
            else:
                h = nn.Conv(v, (3, 3), padding=1, dtype=self.dtype)(h)
                conv_feats.append(h)
                h = nn.relu(h)
        return conv_feats if taps == "conv" else pool_feats
