"""Decoder zoo — config-selectable flax modules mirroring the encoders.

Functional re-design of the reference decoder library
(multimodal_compare/models/decoders.py, 725 LoC).  Conventions:

* decoders take ``(z, mask)`` with z of shape (B, total_latents) and return
  ``(mean, scale)`` where ``scale`` is the fixed likelihood scale 0.75 used by
  *every* reference decoder (decoders.py:96-98);
* image decoders emit NHWC in (eta, 1-eta) via sigmoid+clamp, matching the
  reference clamp (decoders.py:96);
* sequence decoders decode from positional time-queries with z as a 1-token
  memory, and zero the padded region via the mask
  (reference decoders.py:608-615, 708-723);
* K posterior samples are folded into the batch axis by the caller.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multimodal_vae_comparison_tpu.constants import DEC_SCALE, ETA

# logit(1 - ETA): clipping logits to ±this bound == clipping sigmoid(x) to
# [ETA, 1-ETA] (see VaeDecoder.squash_dist)
_LOGIT_BOUND = float(np.log((1.0 - ETA) / ETA))
from multimodal_vae_comparison_tpu.models import nets
from multimodal_vae_comparison_tpu.models.nets import (
    AttentionResidualBlock, ConvTranspose2dTorch, Dtype, ResUp,
    SamePadConvTranspose3d, positional_encoding,
)


class VaeDecoder(nn.Module):
    """Base decoder: holds dims; subclasses implement __call__."""

    latent_dim: int
    data_dim: Sequence[int]
    latent_private: Optional[int] = None
    dtype: Dtype = jnp.float32

    @property
    def out_dim(self) -> int:
        return self.latent_dim + (self.latent_private or 0)

    @staticmethod
    def scale_like(mean: jnp.ndarray) -> jnp.ndarray:
        return jnp.full((), DEC_SCALE, dtype=jnp.float32)

    @staticmethod
    def squash(x: jnp.ndarray) -> jnp.ndarray:
        return jnp.clip(jax.nn.sigmoid(x.astype(jnp.float32)), ETA, 1.0 - ETA)

    def squash_dist(self, h: jnp.ndarray, b: int):
        """(mean, scale, clipped_logits) in the COMPUTE dtype.

        The eta clamp is applied in logit space — ``sigmoid(clip(x, ±B))``
        with ``B = logit(1-eta)`` equals ``clip(sigmoid(x), eta, 1-eta)``
        exactly (sigmoid is monotone) — and the clipped logits ride along so
        ``objectives.bce`` can use the stable softplus form.  Measured
        motivation (round 4, docs/performance.md): the old fp32 upcast
        materialized fp32 image-size buffers in the loss chain and made the
        bs>=256 train step HBM-bandwidth-bound; in bf16 the naive
        ``log1p(-p)`` would hit -inf because 1-1e-6 rounds to 1.0, which is
        why the clip moves to logit space and the loss to logits."""
        x = jnp.clip(h, -_LOGIT_BOUND, _LOGIT_BOUND).reshape(b, *self.data_dim)
        mean = jax.nn.sigmoid(x)
        return mean, self.scale_like(mean), x


class Dec_CNN(VaeDecoder):
    """MLP + transposed-conv decoder from a 4x4 seed to ``data_dim`` images
    (reference decoders.py:35-98: fixed 64x64x3; here the upsample count is
    derived from ``data_dim`` so 128x128 VILANRO round-5 renders decode with
    the same architecture — 4 ConvT layers at 64, 5 at 128)."""

    hid_channels: int = 32
    hidden_dim: int = 512

    @nn.compact
    def __call__(self, z, mask=None, train: bool = False):
        b = z.shape[0]
        out_hw = int(self.data_dim[0])
        out_ch = int(self.data_dim[-1]) if len(self.data_dim) >= 3 else 3
        n_up = max(int(round(np.log2(out_hw / 4))), 1)   # 4x4 seed -> out_hw
        h = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype)(z))
        h = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype)(h))
        h = nn.relu(nn.Dense(self.hid_channels * 16, dtype=self.dtype)(h))
        h = h.reshape(b, 4, 4, self.hid_channels)
        for _ in range(n_up - 1):
            h = nn.relu(ConvTranspose2dTorch(self.hid_channels, dtype=self.dtype)(h))
        h = ConvTranspose2dTorch(out_ch, dtype=self.dtype)(h)
        return self.squash_dist(h, b)


class Dec_SVHN(VaeDecoder):
    """Transposed-conv decoder to 32x32x3 (reference decoders.py:101-160)."""

    @nn.compact
    def __call__(self, z, mask=None, train: bool = False):
        b = z.shape[0]
        h = nn.relu(nn.Dense(128, dtype=self.dtype)(z)).reshape(b, 1, 1, 128)
        # 1x1 -> 4x4 (torch ConvTranspose2d(k=4, s=1, p=0) geometry)
        h = nn.relu(nn.ConvTranspose(64, (4, 4), strides=(1, 1), padding="VALID",
                                     dtype=self.dtype)(h))
        for feat in (64, 32):
            h = nn.relu(ConvTranspose2dTorch(feat, dtype=self.dtype)(h))
        h = ConvTranspose2dTorch(3, dtype=self.dtype)(h)
        return self.squash_dist(h, b)


class Dec_SVHN2(VaeDecoder):
    """MMVAE-repo SVHN decoder (reference decoders.py:163-215)."""

    fBase: int = 32

    @nn.compact
    def __call__(self, z, mask=None, train: bool = False):
        b = z.shape[0]
        h = z.reshape(b, 1, 1, -1)
        h = nn.relu(nn.ConvTranspose(self.fBase * 4, (4, 4), strides=(1, 1),
                                     padding="VALID", dtype=self.dtype)(h))
        h = nn.relu(ConvTranspose2dTorch(self.fBase * 2, dtype=self.dtype)(h))
        h = nn.relu(ConvTranspose2dTorch(self.fBase, dtype=self.dtype)(h))
        h = ConvTranspose2dTorch(3, dtype=self.dtype)(h)
        return self.squash_dist(h, b)


class Dec_MNIST(VaeDecoder):
    """MLP decoder to 28x28 (reference decoders.py:218-260)."""

    hidden_dim: int = 400

    @nn.compact
    def __call__(self, z, mask=None, train: bool = False):
        b = z.shape[0]
        h = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype)(z))
        h = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype)(h))
        h = nn.Dense(int(np.prod(self.data_dim)), dtype=self.dtype)(h)
        return self.squash_dist(h, b)


class Dec_MNIST2(VaeDecoder):
    """MMVAE-repo MNIST decoder (reference decoders.py:263-305)."""

    hidden_dim: int = 400

    @nn.compact
    def __call__(self, z, mask=None, train: bool = False):
        b = z.shape[0]
        h = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype)(z))
        h = nn.Dense(int(np.prod(self.data_dim)), dtype=self.dtype)(h)
        return self.squash_dist(h, b)


class Dec_PolyMNIST(VaeDecoder):
    """PolyMNIST deconv decoder (reference decoders.py:308-355, MVTCAE)."""

    @nn.compact
    def __call__(self, z, mask=None, train: bool = False):
        b = z.shape[0]
        h = nn.relu(nn.Dense(2048, dtype=self.dtype)(z)).reshape(b, 4, 4, 128)
        h = nn.relu(nn.ConvTranspose(64, (3, 3), strides=(2, 2), padding="SAME",
                                     dtype=self.dtype)(h))
        h = nn.relu(nn.ConvTranspose(32, (3, 3), strides=(2, 2), padding="SAME",
                                     dtype=self.dtype)(h))
        h = nn.ConvTranspose(3, (3, 3), strides=(2, 2), padding="SAME",
                             dtype=self.dtype)(h)
        # 4 -> 8 -> 16 -> 32, center-crop to 28x28
        return self.squash_dist(h[:, 2:30, 2:30, :], b)


class Dec_RESCNN(VaeDecoder):
    """Residual upsampling decoder (reference decoders.py:358-383)."""

    ch: int = 64

    @nn.compact
    def __call__(self, z, mask=None, train: bool = False):
        b = z.shape[0]
        h = nn.Dense(16 * self.ch * 16, dtype=self.dtype)(z)
        h = h.reshape(b, 4, 4, 16 * self.ch)
        for mult in (8, 4, 2, 1):
            h = ResUp(self.ch * mult, dtype=self.dtype)(h, train)
        h = nn.Conv(3, (3, 3), padding=1, dtype=self.dtype)(h)
        return self.squash_dist(h, b)


class Dec_FNN(VaeDecoder):
    """Generic MLP decoder (reference decoders.py:386-401)."""

    hidden_dim: int = 128

    @nn.compact
    def __call__(self, z, mask=None, train: bool = False):
        b = z.shape[0]
        h = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype)(z))
        h = nn.Dense(int(np.prod(self.data_dim)), dtype=self.dtype)(h)
        return self.squash_dist(h, b)


def _time_query_decode(z, mask, seq_len, d_model, num_layers, num_heads,
                       ff_size, dtype, memory=None, memory_bias=None):
    """Shared sequence-decoding trunk: positional time-queries cross-attend to
    z as a single-token memory (reference decoders.py:594-615).

    ``memory``/``memory_bias`` extend the memory beyond the single z token
    (conditioned decoding, e.g. language tokens for action generation);
    ``memory_bias`` is an additive (B, 1, 1, Tm) key-padding bias.

    Deliberate fix vs the reference: NO self-attention among the queries.
    The reference's decoder self-attends over the queries under the padding
    mask during training but generates without a mask, so the attention
    pattern at valid positions shifts between train and generation and
    cross-generated sequences come out positionally smeared (confirmed
    empirically: 'ellipse' -> 'lllipp...').  Queries are pure positional
    encodings, so self-attention adds nothing; cross-attention-only decoding
    is mask-independent by construction and cheaper.
    """
    b = z.shape[0]
    queries = jnp.tile(positional_encoding(seq_len, d_model, dtype=dtype)[None],
                       (b, 1, 1))
    h = queries
    if memory is None:
        memory = z[:, None, :]
    from multimodal_vae_comparison_tpu.models.nets import (
        MultiHeadAttention)
    from flax import linen as nn
    for i in range(num_layers):
        att = MultiHeadAttention(num_heads, dtype=dtype,
                                 name=f"cross_attn_{i}")(h, memory,
                                                         memory_bias)
        h = nn.LayerNorm(dtype=dtype, name=f"ln1_{i}")(h + att)
        ff = nn.Dense(ff_size, dtype=dtype, name=f"ff1_{i}")(h)
        ff = nn.gelu(ff)
        ff = nn.Dense(d_model, dtype=dtype, name=f"ff2_{i}")(ff)
        h = nn.LayerNorm(dtype=dtype, name=f"ln2_{i}")(h + ff)
    return h


class Dec_Transformer(VaeDecoder):
    """Transformer decoder for arbitrary sequences (reference
    decoders.py:546-615): emits (B, T, joints, feats), zeroing padding."""

    ff_size: int = 1024
    num_layers: int = 4
    num_heads: int = 2

    @nn.compact
    def __call__(self, z, mask=None, train: bool = False):
        b = z.shape[0]
        seq_len = self.data_dim[0]
        njoints = self.data_dim[1]
        nfeats = self.data_dim[2] if len(self.data_dim) > 2 else 1
        d_model = self.out_dim if self.out_dim % self.num_heads == 0 else (
            self.out_dim + self.num_heads - self.out_dim % self.num_heads)
        zin = nn.Dense(d_model, dtype=self.dtype)(z) if d_model != z.shape[-1] else z
        out = _time_query_decode(zin, mask, seq_len, d_model, self.num_layers,
                                 self.num_heads, self.ff_size, self.dtype)
        out = nn.Dense(njoints * nfeats, dtype=self.dtype, name="finallayer")(out)
        out = out.reshape(b, seq_len, njoints, nfeats).astype(jnp.float32)
        if len(self.data_dim) <= 2:
            out = out.squeeze(-1)
        if mask is not None:
            m = mask.astype(out.dtype).reshape(b, seq_len, *([1] * (out.ndim - 2)))
            out = out * m
        return out, self.scale_like(out)


class Dec_TransformerCond(VaeDecoder):
    """Conditioned sequence decoder: Dec_Transformer whose memory holds the
    z token PLUS the conditioning modality's embedded tokens (cross-attention
    language grounding — VERDICT r3 item 1a; no reference counterpart, the
    reference decodes every modality from z alone, decoders.py:546-615).

    With ``cond=None`` (prior/joint generation without the conditioning
    modality) it degrades to the plain single-token-memory decoder — the two
    cases are separate static traces, so no runtime branching."""

    ff_size: int = 1024
    num_layers: int = 4
    num_heads: int = 4
    d_model: int = 128

    @nn.compact
    def __call__(self, z, mask=None, train: bool = False,
                 cond=None, cond_mask=None):
        b = z.shape[0]
        seq_len = self.data_dim[0]
        njoints = self.data_dim[1]
        nfeats = self.data_dim[2] if len(self.data_dim) > 2 else 1
        d_model = self.d_model
        z_tok = nn.Dense(d_model, dtype=self.dtype, name="z_proj")(z)[:, None, :]
        memory, bias = z_tok, None
        if cond is not None:
            # cond: (B, L, vocab) one-hot tokens -> embed + positions
            ce = nn.Dense(d_model, dtype=self.dtype, name="cond_embed")(cond)
            ce = ce + positional_encoding(ce.shape[1], d_model,
                                          dtype=self.dtype)[None]
            memory = jnp.concatenate([z_tok, ce], axis=1)
            if cond_mask is not None:
                keep = jnp.concatenate(
                    [jnp.ones((b, 1), bool), cond_mask.astype(bool)], axis=1)
                bias = jnp.where(keep, 0.0, -1e9).astype(jnp.float32)
                bias = bias[:, None, None, :]
        out = _time_query_decode(z_tok[:, 0], mask, seq_len, d_model,
                                 self.num_layers, self.num_heads,
                                 self.ff_size, self.dtype,
                                 memory=memory, memory_bias=bias)
        out = nn.Dense(njoints * nfeats, dtype=self.dtype, name="finallayer")(out)
        out = out.reshape(b, seq_len, njoints, nfeats).astype(jnp.float32)
        if len(self.data_dim) <= 2:
            out = out.squeeze(-1)
        if mask is not None:
            m = mask.astype(out.dtype).reshape(b, seq_len, *([1] * (out.ndim - 2)))
            out = out * m
        return out, self.scale_like(out)


class Dec_TxtTransformer(VaeDecoder):
    """Character-level text transformer decoder (reference
    decoders.py:676-723): emits (B, T, alphabet), zeroing padding."""

    ff_size: int = 128
    num_layers: int = 1
    num_heads: int = 2

    @nn.compact
    def __call__(self, z, mask=None, train: bool = False):
        b = z.shape[0]
        seq_len, vocab = self.data_dim[0], self.data_dim[1]
        d_model = self.out_dim if self.out_dim % self.num_heads == 0 else (
            self.out_dim + self.num_heads - self.out_dim % self.num_heads)
        zin = nn.Dense(d_model, dtype=self.dtype)(z) if d_model != z.shape[-1] else z
        out = _time_query_decode(zin, mask, seq_len, d_model, self.num_layers,
                                 self.num_heads, self.ff_size, self.dtype)
        out = nn.Dense(vocab, dtype=self.dtype, name="finallayer")(out)
        out = out.astype(jnp.float32)
        if mask is not None:
            out = out * mask.astype(out.dtype)[..., None]
        return out, self.scale_like(out)


class Dec_ConvTxt(VaeDecoder):
    """Deconvolutional text decoder (reference decoders.py:618-673)."""

    fBase: int = 64

    @nn.compact
    def __call__(self, z, mask=None, train: bool = False):
        b = z.shape[0]
        seq_len, vocab = self.data_dim[0], self.data_dim[1]
        start = max(seq_len // 8, 1)
        h = nn.Dense(start * self.fBase * 3, dtype=self.dtype)(z)
        h = h.reshape(b, start, self.fBase * 3)
        for feat in (self.fBase * 3, self.fBase * 2, self.fBase):
            h = nn.relu(nets.group_norm(
                nn.ConvTranspose(feat, (3,), strides=(2,), padding="SAME",
                                 dtype=self.dtype)(h), dtype=self.dtype))
        h = h.reshape(b, -1)
        out = nn.Dense(seq_len * vocab, dtype=self.dtype, name="toVocabSize")(h)
        mean = jax.nn.sigmoid(out.astype(jnp.float32)).reshape(b, seq_len, vocab)
        return mean, self.scale_like(mean)


class Dec_TransformerIMG(VaeDecoder):
    """Image-sequence decoder (reference decoders.py:404-485): time-query
    transformer then per-frame deconvolution."""

    ff_size: int = 1024
    num_layers: int = 4
    num_heads: int = 4
    hid_channels: int = 64

    @nn.compact
    def __call__(self, z, mask=None, train: bool = False):
        b = z.shape[0]
        seq_len = self.data_dim[0]
        d_model = 256
        zin = nn.Dense(d_model, dtype=self.dtype)(z)
        out = _time_query_decode(zin, mask, seq_len, d_model, self.num_layers,
                                 self.num_heads, self.ff_size, self.dtype)
        h = nn.Dense(self.hid_channels * 16, dtype=self.dtype)(out)
        h = h.reshape(b * seq_len, 4, 4, self.hid_channels)
        for _ in range(3):
            h = nn.silu(ConvTranspose2dTorch(self.hid_channels, dtype=self.dtype)(h))
        h = ConvTranspose2dTorch(3, dtype=self.dtype)(h)
        mean = jax.nn.sigmoid(h.astype(jnp.float32)).reshape(b, seq_len, *self.data_dim[1:])
        return mean, self.scale_like(mean)


class Dec_VideoGPT(VaeDecoder):
    """VideoGPT-style video decoder (reference decoders.py:488-543)."""

    n_res_layers: int = 4
    upsample: Tuple[int, int, int] = (1, 4, 4)
    hidden: int = 64
    attn_type: str = "axial"   # 'axial' | 'sparse' (nn_modules.py:624-882)

    @nn.compact
    def __call__(self, z, mask=None, train: bool = False):
        b = z.shape[0]
        t = self.data_dim[0]
        base = self.data_dim[1] // self.upsample[1]
        h = nn.Dense(self.hidden * t * base * base, dtype=self.dtype,
                     name="upsample_lin")(z)
        h = h.reshape(b, t, base, base, self.hidden)
        block_cls = (nets.SparseAttentionResidualBlock
                     if self.attn_type == "sparse"
                     else AttentionResidualBlock)
        for _ in range(self.n_res_layers):
            h = block_cls(self.hidden, dtype=self.dtype)(h, train)
        h = nn.relu(nets.group_norm(h, dtype=self.dtype))
        n_times = [int(np.log2(d)) for d in self.upsample]
        max_us = max(n_times)
        remaining = list(n_times)
        for i in range(max_us):
            strides = tuple(2 if r > 0 else 1 for r in remaining)
            feats = 3 if i == max_us - 1 else self.hidden
            h = SamePadConvTranspose3d(feats, kernel=4, strides=strides,
                                       dtype=self.dtype)(h)
            if i < max_us - 1:
                h = nn.relu(h)
            remaining = [r - 1 for r in remaining]
        mean = jax.nn.sigmoid(h.astype(jnp.float32))
        return mean, self.scale_like(mean)


class Dec_VideoGPTSparse(Dec_VideoGPT):
    """Dec_VideoGPT with the reference's ``attn_type='sparse'`` attention:
    strided block-sparse over the flattened spacetime tokens, served by the
    Pallas kernel on TPU (reference nn_modules.py:624-882)."""

    attn_type: str = "sparse"


DECODERS = {
    "CNN": Dec_CNN,
    "SVHN": Dec_SVHN,
    "SVHN2": Dec_SVHN2,
    "MNIST": Dec_MNIST,
    "MNIST2": Dec_MNIST2,
    "PolyMNIST": Dec_PolyMNIST,
    "RESCNN": Dec_RESCNN,
    "FNN": Dec_FNN,
    "Transformer": Dec_Transformer,
    "TransformerCond": Dec_TransformerCond,
    "TxtTransformer": Dec_TxtTransformer,
    "ConvTxt": Dec_ConvTxt,
    "TransformerIMG": Dec_TransformerIMG,
    "VideoGPT": Dec_VideoGPT,
    "VideoGPTSparse": Dec_VideoGPTSparse,
}


def get_decoder(name: str):
    """Decoder factory, mirrors DencoderFactory (reference vae.py:13-30)."""
    if name not in DECODERS:
        raise KeyError(f"Did not find decoder {name}; available: {sorted(DECODERS)}")
    return DECODERS[name]
