"""Encoder zoo — every encoder is a config-selectable flax module.

Functional re-design of the reference encoder library
(multimodal_compare/models/encoders.py, 868 LoC).  Same names, same
config-selection contract (``encoder: CNN`` -> ``Enc_CNN``), same
architectural roles; idiomatic differences:

* NHWC image layout (TPU native) instead of NCHW;
* every encoder is a pure ``nn.Module`` returning ``(mu, scale)`` with
  ``scale = softmax(raw) + eta`` matching the reference variance activation
  (encoders.py:49-54) — this unusual activation is load-bearing for the
  published accuracy numbers, so we keep it;
* private-latent widening of the output dim mirrors encoders.py:34-37;
* text encoders consume one-hot tensors directly (a one-hot x embedding
  matmul == embedding lookup, but stays differentiable and MXU-friendly);
* no ``torch.nn.DataParallel`` wrappers — parallelism is the mesh's job.

Encoders take ``(data, mask)`` and return ``(mu, scale)`` of shape
(B, out_dim).  Sequence encoders respect the boolean ``mask`` (True=valid).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multimodal_vae_comparison_tpu.constants import ETA
from multimodal_vae_comparison_tpu.models import nets
from multimodal_vae_comparison_tpu.models.nets import (
    AttentionResidualBlock, Dtype, ResDown, ResNet50, SamePadConv3d,
    TransformerEncoder, ViT, positional_encoding,
)


class VaeEncoder(nn.Module):
    """Base encoder: holds dims and the (mu, scale) head convention."""

    latent_dim: int
    data_dim: Sequence[int]
    latent_private: Optional[int] = None
    dtype: Dtype = jnp.float32

    @property
    def out_dim(self) -> int:
        return self.latent_dim + (self.latent_private or 0)

    def head(self, h: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """mu/scale head with the reference's softmax+eta scale activation."""
        mu = nn.Dense(self.out_dim, dtype=self.dtype, name="mu_layer")(h)
        raw = nn.Dense(self.out_dim, dtype=self.dtype, name="logvar_layer")(h)
        scale = jax.nn.softmax(raw.astype(jnp.float32), axis=-1) + ETA
        return mu.astype(jnp.float32), scale


class Enc_CNN(VaeEncoder):
    """ResNet-50 trunk + SiLU + linear heads for 64x64x3 images
    (reference encoders.py:86-127; pretrained weights optional offline)."""

    @nn.compact
    def __call__(self, data, mask=None, train: bool = False):
        h = ResNet50(num_outputs=1000, dtype=self.dtype)(data, train)
        h = nn.silu(h)
        return self.head(h)


class Enc_VIT(VaeEncoder):
    """ViT trunk for 64x64x3 images (reference encoders.py:130-161)."""

    @nn.compact
    def __call__(self, data, mask=None, train: bool = False):
        h = ViT(num_outputs=1000, dtype=self.dtype)(data, train)
        h = nn.silu(h)
        return self.head(h)


class Enc_CNN2(VaeEncoder):
    """Classic 4-layer conv VAE encoder for 64x64x3 images
    (reference encoders.py:163-223)."""

    hid_channels: int = 32
    hidden_dim: int = 512

    @nn.compact
    def __call__(self, data, mask=None, train: bool = False):
        h = data
        for _ in range(4):
            h = nn.silu(nn.Conv(self.hid_channels, (4, 4), strides=2,
                                padding=1, dtype=self.dtype)(h))
        h = h.reshape(h.shape[0], -1)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype)(h)
        return self.head(h)


def _append_coords(h: jnp.ndarray) -> jnp.ndarray:
    """Concatenate normalized x/y coordinate channels (CoordConv,
    Liu et al. 2018) to an NHWC feature map."""
    B, H, W = h.shape[0], h.shape[1], h.shape[2]
    ys = jnp.linspace(-1.0, 1.0, H, dtype=h.dtype)
    xs = jnp.linspace(-1.0, 1.0, W, dtype=h.dtype)
    yy = jnp.broadcast_to(ys[:, None], (H, W))
    xx = jnp.broadcast_to(xs[None, :], (H, W))
    coords = jnp.broadcast_to(jnp.stack([yy, xx], -1)[None], (B, H, W, 2))
    return jnp.concatenate([h, coords], axis=-1)


class Enc_CNNCoord(VaeEncoder):
    """Enc_CNN2 with coordinate channels appended at the input and at every
    conv scale (CoordConv).  New TPU-side encoder, no reference counterpart:
    the plain conv stack encodes object *positions* poorly into a small
    latent (measured: linear probe z->position R^2 = 0.37 on VILANRO), which
    starves position-conditioned cross-generation (image+language ->
    waypoint actions).  Coordinate channels make position a first-class
    input feature."""

    hid_channels: int = 32
    hidden_dim: int = 512

    @nn.compact
    def __call__(self, data, mask=None, train: bool = False):
        h = data
        for _ in range(4):
            h = _append_coords(h)
            h = nn.silu(nn.Conv(self.hid_channels, (4, 4), strides=2,
                                padding=1, dtype=self.dtype)(h))
        h = h.reshape(h.shape[0], -1)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype)(h)
        return self.head(h)


class Enc_CNNSpatial(VaeEncoder):
    """Conv trunk + SPATIAL-SOFTMAX (soft-argmax) keypoint head (round 4).

    New TPU-side encoder, no reference counterpart.  Diagnosis that
    motivates it: on VILANRO the CoordConv/plain conv encoders MEMORIZE
    geometry (aux endpoint-head train RMSE 4 cm vs val 19.5 cm = chance on
    vilanro_r4_cond) — flattened conv features let a dense layer key on
    scene-specific texture instead of extracting coordinates.  Spatial
    softmax (Levine et al. 2016, end-to-end visuomotor policies) reduces
    each feature map to the (x, y) expectation of its activation
    distribution, so position is read out *structurally* and generalizes
    across scenes by construction.  The keypoint coordinates (plus per-map
    mean activation as a presence feature) feed the mu/scale head."""

    hid_channels: int = 32
    n_maps: int = 32
    hidden_dim: int = 256
    # softmax temperature over space; learnable via param below

    @nn.compact
    def __call__(self, data, mask=None, train: bool = False):
        h = data
        for _ in range(3):                       # 64 -> 32 -> 16 -> 8
            h = nn.silu(nn.Conv(self.hid_channels, (4, 4), strides=2,
                                padding=1, dtype=self.dtype)(h))
        h = nn.Conv(self.n_maps, (3, 3), padding=1, dtype=self.dtype)(h)
        b, hh, ww, c = h.shape
        temp = self.param("ss_log_temp", nn.initializers.zeros, (1,))
        logits = (h.astype(jnp.float32)
                  * jnp.exp(temp)).reshape(b, hh * ww, c)
        attn = jax.nn.softmax(logits, axis=1).reshape(b, hh, ww, c)
        ys = jnp.linspace(-1.0, 1.0, hh)[None, :, None, None]
        xs = jnp.linspace(-1.0, 1.0, ww)[None, None, :, None]
        ky = jnp.sum(attn * ys, axis=(1, 2))     # (B, C) expected y
        kx = jnp.sum(attn * xs, axis=(1, 2))     # (B, C) expected x
        presence = jnp.mean(h.astype(jnp.float32), axis=(1, 2))
        feats = jnp.concatenate([kx, ky, presence], axis=-1).astype(self.dtype)
        g = nn.silu(nn.Dense(self.hidden_dim, dtype=self.dtype)(feats))
        return self.head(g)


class Enc_MNIST(VaeEncoder):
    """2-layer MLP MNIST encoder (reference encoders.py:226-265)."""

    hidden_dim: int = 400

    @nn.compact
    def __call__(self, data, mask=None, train: bool = False):
        h = data.reshape(data.shape[0], -1)
        h = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype)(h))
        h = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype)(h))
        return self.head(h)


class Enc_MNISTMoE(VaeEncoder):
    """MLP MNIST encoder from the MMVAE repo (reference encoders.py:304-341,
    with its undefined-name bug fixed)."""

    hidden_dim: int = 400

    @nn.compact
    def __call__(self, data, mask=None, train: bool = False):
        h = data.reshape(data.shape[0], -1)
        h = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype)(h))
        mu = nn.Dense(self.out_dim, dtype=self.dtype)(h)
        raw = nn.Dense(self.out_dim, dtype=self.dtype)(h).astype(jnp.float32)
        scale = jax.nn.softmax(raw, axis=-1) * raw.shape[-1] + ETA
        return mu.astype(jnp.float32), scale


class Enc_RESCNN(VaeEncoder):
    """Fully-convolutional residual encoder (reference encoders.py:272-301)."""

    ch: int = 64

    @nn.compact
    def __call__(self, data, mask=None, train: bool = False):
        h = nn.elu(nn.Conv(self.ch, (7, 7), padding=3, dtype=self.dtype)(data))
        for mult in (2, 4, 8, 16):
            h = ResDown(self.ch * mult, dtype=self.dtype)(h, train)
        h = h.reshape(h.shape[0], -1)
        return self.head(h)


class Enc_PolyMNIST(VaeEncoder):
    """PolyMNIST conv encoder (reference encoders.py:343-384, MVTCAE)."""

    hidden_dim: int = 400

    @nn.compact
    def __call__(self, data, mask=None, train: bool = False):
        h = data
        for feat in (32, 64, 128):
            h = nn.relu(nn.Conv(feat, (3, 3), strides=2, padding=1,
                                dtype=self.dtype)(h))
        h = h.reshape(h.shape[0], -1)
        h = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype)(h))
        mu = nn.Dense(self.out_dim, dtype=self.dtype)(h)
        raw = nn.Dense(self.out_dim, dtype=self.dtype)(h).astype(jnp.float32)
        scale = jax.nn.softmax(raw, axis=-1) * raw.shape[-1] + ETA
        return mu.astype(jnp.float32), scale


class Enc_SVHN(VaeEncoder):
    """SVHN 32x32x3 conv encoder (reference encoders.py:439-478)."""

    @nn.compact
    def __call__(self, data, mask=None, train: bool = False):
        h = data
        for feat, pad in ((32, 1), (64, 1), (64, 1), (128, 0)):
            h = nn.relu(nn.Conv(feat, (4, 4), strides=2, padding=pad,
                                dtype=self.dtype)(h))
        h = h.reshape(h.shape[0], -1)
        return self.head(h)


class Enc_SVHN2(VaeEncoder):
    """SVHN encoder from the MMVAE repo (reference encoders.py:389-437)."""

    fBase: int = 32

    @nn.compact
    def __call__(self, data, mask=None, train: bool = False):
        h = data
        for mult in (1, 2, 4):
            h = nn.relu(nn.Conv(self.fBase * mult, (4, 4), strides=2,
                                padding=1, dtype=self.dtype)(h))
        mu = nn.Conv(self.out_dim, (4, 4), strides=1, padding=0,
                     dtype=self.dtype)(h).reshape(h.shape[0], -1)
        raw = nn.Conv(self.out_dim, (4, 4), strides=1, padding=0,
                      dtype=self.dtype)(h).reshape(h.shape[0], -1).astype(jnp.float32)
        scale = jax.nn.softmax(raw, axis=-1) * raw.shape[-1] + ETA
        return mu.astype(jnp.float32), scale


class Enc_FNN(VaeEncoder):
    """Generic MLP encoder for flattened data (reference encoders.py:480-512)."""

    hidden_dim: int = 128

    @nn.compact
    def __call__(self, data, mask=None, train: bool = False):
        h = data.reshape(data.shape[0], -1)
        h = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype)(h))
        return self.head(h)


class Enc_Transformer(VaeEncoder):
    """ACTOR-style transformer encoder for arbitrary sequences
    (reference encoders.py:656-729): per-step linear embedding + positional
    encoding + masked transformer, mean-pooled over valid steps."""

    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 2

    @nn.compact
    def __call__(self, data, mask=None, train: bool = False):
        b, t = data.shape[0], data.shape[1]
        x = data.reshape(b, t, -1)
        d_model = max(self.num_heads, self.out_dim - self.out_dim % self.num_heads) or self.num_heads
        x = nn.Dense(d_model, dtype=self.dtype, name="skel_embedding")(x)
        x = x + positional_encoding(t, d_model, dtype=x.dtype)[None]
        h = TransformerEncoder(self.num_layers, self.num_heads, self.ff_size,
                               dtype=self.dtype)(x, key_mask=mask)
        if mask is not None:
            m = mask.astype(h.dtype)[..., None]
            h = (h * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
        else:
            h = h.mean(axis=1)
        return self.head(h)


class Enc_TxtTransformer(VaeEncoder):
    """Character-level text transformer encoder
    (reference encoders.py:793-835): tiny d_model, 1 layer, 2 heads; the
    one-hot x embedding matmul replaces the index embedding lookup."""

    ff_size: int = 128
    num_layers: int = 1
    num_heads: int = 2
    d_model: int = 64

    @nn.compact
    def __call__(self, data, mask=None, train: bool = False):
        b, t = data.shape[0], data.shape[1]
        x = data.reshape(b, t, -1)
        x = nn.Dense(self.d_model, dtype=self.dtype, name="embedding")(x)
        x = x + positional_encoding(t, self.d_model, dtype=x.dtype)[None]
        h = TransformerEncoder(self.num_layers, self.num_heads, self.ff_size,
                               dtype=self.dtype)(x, key_mask=mask)
        if mask is not None:
            m = mask.astype(h.dtype)[..., None]
            h = (h * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
        else:
            h = h.mean(axis=1)
        return self.head(h)


class Enc_ConvTxt(VaeEncoder):
    """Convolutional text encoder (reference encoders.py:732-790):
    char embedding + strided 1D conv pyramid over the sequence axis."""

    fBase: int = 32
    embed_dim: int = 32

    @nn.compact
    def __call__(self, data, mask=None, train: bool = False):
        b, t = data.shape[0], data.shape[1]
        x = data.reshape(b, t, -1)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="embedding")(x)
        for feat in (self.fBase, self.fBase * 2, self.fBase * 3):
            x = nn.relu(nets.group_norm(
                nn.Conv(feat, (3,), strides=2, padding=1, dtype=self.dtype,
                        use_bias=False)(x), dtype=self.dtype))
        x = x.reshape(b, -1)
        return self.head(x)


class Enc_TxtRNN(VaeEncoder):
    """Bidirectional GRU text encoder (reference encoders.py:838-869)."""

    hidden_size: int = 512

    @nn.compact
    def __call__(self, data, mask=None, train: bool = False):
        b, t = data.shape[0], data.shape[1]
        x = data.reshape(b, t, -1)
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="embed")(x)
        # final carries via seq_lengths: the forward summary stops at each
        # sequence's true end (not after consuming padding), and the
        # backward carry is the state after the FULL right-to-left pass —
        # indexing outputs (old fwd[:, -1] + bwd[:, 0]) read padded steps
        # forward and only the last token backward (flax reverse=True
        # leaves outputs in flipped order by default)
        lengths = (mask.reshape(b, t).sum(-1).astype(jnp.int32)
                   if mask is not None else jnp.full((b,), t, jnp.int32))
        fwd, _ = nn.RNN(nn.GRUCell(self.hidden_size), name="gru_fwd")(
            x, seq_lengths=lengths, return_carry=True)
        bwd, _ = nn.RNN(nn.GRUCell(self.hidden_size), reverse=True,
                        name="gru_bwd")(x, seq_lengths=lengths,
                                        return_carry=True)
        h = fwd + bwd
        ps = nn.Dense(self.out_dim * 2, dtype=self.dtype, name="o2p")(h)
        mu, raw = jnp.split(ps, 2, axis=-1)
        scale = jax.nn.softmax(raw.astype(jnp.float32), axis=-1) + ETA
        return mu.astype(jnp.float32), scale


class Enc_TransformerIMG(VaeEncoder):
    """Image-sequence encoder (reference encoders.py:515-598): conv
    downsample per frame, then a transformer over the frame axis."""

    ff_size: int = 1024
    num_layers: int = 4
    num_heads: int = 4
    hid_channels: int = 64

    @nn.compact
    def __call__(self, data, mask=None, train: bool = False):
        b, t = data.shape[0], data.shape[1]
        frames = data.reshape((b * t,) + data.shape[2:])
        h = frames
        for _ in range(4):
            h = nn.silu(nn.Conv(self.hid_channels, (4, 4), strides=2,
                                padding=1, dtype=self.dtype)(h))
        h = h.reshape(b, t, -1)
        d_model = 256
        h = nn.Dense(d_model, dtype=self.dtype)(h)
        h = h + positional_encoding(t, d_model, dtype=h.dtype)[None]
        h = TransformerEncoder(self.num_layers, self.num_heads, self.ff_size,
                               dtype=self.dtype)(h, key_mask=mask)
        if mask is not None:
            m = mask.astype(h.dtype)[..., None]
            h = (h * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
        else:
            h = h.mean(axis=1)
        return self.head(h)


class Enc_VideoGPT(VaeEncoder):
    """VideoGPT-style 3D conv + axial-attention encoder for video
    (reference encoders.py:601-653).  Input (B, T, H, W, C)."""

    n_res_layers: int = 4
    downsample: Tuple[int, int, int] = (1, 4, 4)
    hidden: int = 64
    attn_type: str = "axial"   # 'axial' | 'sparse' (nn_modules.py:624-882)

    @nn.compact
    def __call__(self, data, mask=None, train: bool = False):
        h = data
        n_times = [int(np.log2(d)) for d in self.downsample]
        max_ds = max(n_times)
        remaining = list(n_times)
        for i in range(max_ds):
            strides = tuple(2 if r > 0 else 1 for r in remaining)
            h = SamePadConv3d(self.hidden, kernel=4, strides=strides,
                              dtype=self.dtype)(h)
            if i < max_ds - 1:
                h = nn.relu(h)
            remaining = [r - 1 for r in remaining]
        block_cls = (nets.SparseAttentionResidualBlock
                     if self.attn_type == "sparse"
                     else AttentionResidualBlock)
        for _ in range(self.n_res_layers):
            h = block_cls(self.hidden, dtype=self.dtype)(h, train)
        h = nets.group_norm(h, dtype=self.dtype)
        h = nn.relu(h)
        h = h.mean(axis=(1, 2, 3))
        return self.head(h)


class Enc_VideoGPTSparse(Enc_VideoGPT):
    """Enc_VideoGPT with the reference's ``attn_type='sparse'`` attention:
    strided block-sparse over the flattened spacetime tokens, served by the
    Pallas kernel on TPU (reference nn_modules.py:624-882)."""

    attn_type: str = "sparse"


ENCODERS = {
    "CNN": Enc_CNN,
    "VIT": Enc_VIT,
    "CNN2": Enc_CNN2,
    "CNNCoord": Enc_CNNCoord,
    "CNNSpatial": Enc_CNNSpatial,
    "MNIST": Enc_MNIST,
    "MNISTMoE": Enc_MNISTMoE,
    "RESCNN": Enc_RESCNN,
    "PolyMNIST": Enc_PolyMNIST,
    "SVHN": Enc_SVHN,
    "SVHN2": Enc_SVHN2,
    "FNN": Enc_FNN,
    "Transformer": Enc_Transformer,
    "TxtTransformer": Enc_TxtTransformer,
    "ConvTxt": Enc_ConvTxt,
    "TxtRNN": Enc_TxtRNN,
    "TransformerIMG": Enc_TransformerIMG,
    "VideoGPT": Enc_VideoGPT,
    "VideoGPTSparse": Enc_VideoGPTSparse,
}


def get_encoder(name: str):
    """Encoder factory, mirrors DencoderFactory (reference vae.py:13-30)."""
    if name not in ENCODERS:
        raise KeyError(f"Did not find encoder {name}; available: {sorted(ENCODERS)}")
    return ENCODERS[name]
