"""InceptionV3 trunk (flax) for Inception-FID feature extraction.

The reference computes FID with pytorch-fid's InceptionV3 pool3 features
(multimodal_compare/eval/fid_score.py:12-66).  This is the torchvision
``inception_v3`` topology up to the final 2048-d average pool, with
FrozenBatchNorm so a torchvision state dict installs 1:1 via
eval/weights.convert_inception (file ``inception_v3.{pt,pth,npz}`` in the
weights dir).  Submodule names mirror the torch module paths exactly, so the
conversion is a mechanical key walk.

Note: pytorch-fid ships the original TF-trained weights whose pooling
differs in a few blocks (count_include_pad); with torchvision ImageNet
weights the FID values are the standard "torchvision-FID" variant —
self-consistent, near-identical rankings, documented here.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_vae_comparison_tpu.models.nets import Dtype, FrozenBatchNorm

Kernel = Union[int, Tuple[int, int]]


class BasicConv(nn.Module):
    """torchvision BasicConv2d: conv(no bias) + BN(eps=1e-3) + relu."""

    features: int
    kernel: Kernel
    strides: int = 1
    padding: Any = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel if isinstance(self.kernel, tuple) \
            else (self.kernel, self.kernel)
        p = self.padding
        if isinstance(p, int):
            p = ((p, p), (p, p))
        elif isinstance(p, tuple) and isinstance(p[0], int):
            p = ((p[0], p[0]), (p[1], p[1]))
        h = nn.Conv(self.features, k, strides=self.strides, padding=p,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        h = FrozenBatchNorm(dtype=self.dtype, eps=1e-3, name="bn")(h)
        return nn.relu(h)


def _avg_pool3(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))


class InceptionA(nn.Module):
    pool_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = lambda f, k, p=0, name=None: BasicConv(f, k, padding=p,
                                                   dtype=self.dtype, name=name)
        b1 = c(64, 1, name="branch1x1")(x)
        b5 = c(48, 1, name="branch5x5_1")(x)
        b5 = c(64, 5, 2, name="branch5x5_2")(b5)
        b3 = c(64, 1, name="branch3x3dbl_1")(x)
        b3 = c(96, 3, 1, name="branch3x3dbl_2")(b3)
        b3 = c(96, 3, 1, name="branch3x3dbl_3")(b3)
        bp = c(self.pool_features, 1, name="branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b5, b3, bp], -1)


class InceptionB(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, 3, strides=2, dtype=self.dtype,
                       name="branch3x3")(x)
        bd = BasicConv(64, 1, dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv(96, 3, padding=1, dtype=self.dtype,
                       name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, 3, strides=2, dtype=self.dtype,
                       name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], -1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        c = lambda f, k, p=0, name=None: BasicConv(f, k, padding=p,
                                                   dtype=self.dtype, name=name)
        b1 = c(192, 1, name="branch1x1")(x)
        b7 = c(c7, 1, name="branch7x7_1")(x)
        b7 = c(c7, (1, 7), (0, 3), name="branch7x7_2")(b7)
        b7 = c(192, (7, 1), (3, 0), name="branch7x7_3")(b7)
        bd = c(c7, 1, name="branch7x7dbl_1")(x)
        bd = c(c7, (7, 1), (3, 0), name="branch7x7dbl_2")(bd)
        bd = c(c7, (1, 7), (0, 3), name="branch7x7dbl_3")(bd)
        bd = c(c7, (7, 1), (3, 0), name="branch7x7dbl_4")(bd)
        bd = c(192, (1, 7), (0, 3), name="branch7x7dbl_5")(bd)
        bp = c(192, 1, name="branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b7, bd, bp], -1)


class InceptionD(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = lambda f, k, s=1, p=0, name=None: BasicConv(
            f, k, strides=s, padding=p, dtype=self.dtype, name=name)
        b3 = c(192, 1, name="branch3x3_1")(x)
        b3 = c(320, 3, 2, name="branch3x3_2")(b3)
        b7 = c(192, 1, name="branch7x7x3_1")(x)
        b7 = c(192, (1, 7), 1, (0, 3), name="branch7x7x3_2")(b7)
        b7 = c(192, (7, 1), 1, (3, 0), name="branch7x7x3_3")(b7)
        b7 = c(192, 3, 2, name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], -1)


class InceptionE(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = lambda f, k, p=0, name=None: BasicConv(f, k, padding=p,
                                                   dtype=self.dtype, name=name)
        b1 = c(320, 1, name="branch1x1")(x)
        b3 = c(384, 1, name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            c(384, (1, 3), (0, 1), name="branch3x3_2a")(b3),
            c(384, (3, 1), (1, 0), name="branch3x3_2b")(b3)], -1)
        bd = c(448, 1, name="branch3x3dbl_1")(x)
        bd = c(384, 3, 1, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            c(384, (1, 3), (0, 1), name="branch3x3dbl_3a")(bd),
            c(384, (3, 1), (1, 0), name="branch3x3dbl_3b")(bd)], -1)
        bp = c(192, 1, name="branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b3, bd, bp], -1)


class InceptionV3(nn.Module):
    """Returns 2048-d pool3 features.  Input: NHWC float in [0, 1] at any
    resolution (resized to 299 and rescaled to [-1, 1] like pytorch-fid)."""

    dtype: Dtype = jnp.float32
    resize_input: bool = True

    @nn.compact
    def __call__(self, x):
        if self.resize_input and x.shape[1:3] != (299, 299):
            x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[-1]),
                                 "bilinear")
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, -1)
        x = x * 2.0 - 1.0
        c = lambda f, k, s=1, p=0, name=None: BasicConv(
            f, k, strides=s, padding=p, dtype=self.dtype, name=name)
        h = c(32, 3, 2, name="Conv2d_1a_3x3")(x)
        h = c(32, 3, name="Conv2d_2a_3x3")(h)
        h = c(64, 3, 1, 1, name="Conv2d_2b_3x3")(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        h = c(80, 1, name="Conv2d_3b_1x1")(h)
        h = c(192, 3, name="Conv2d_4a_3x3")(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        h = InceptionA(32, dtype=self.dtype, name="Mixed_5b")(h)
        h = InceptionA(64, dtype=self.dtype, name="Mixed_5c")(h)
        h = InceptionA(64, dtype=self.dtype, name="Mixed_5d")(h)
        h = InceptionB(dtype=self.dtype, name="Mixed_6a")(h)
        h = InceptionC(128, dtype=self.dtype, name="Mixed_6b")(h)
        h = InceptionC(160, dtype=self.dtype, name="Mixed_6c")(h)
        h = InceptionC(160, dtype=self.dtype, name="Mixed_6d")(h)
        h = InceptionC(192, dtype=self.dtype, name="Mixed_6e")(h)
        h = InceptionD(dtype=self.dtype, name="Mixed_7a")(h)
        h = InceptionE(dtype=self.dtype, name="Mixed_7b")(h)
        h = InceptionE(dtype=self.dtype, name="Mixed_7c")(h)
        return h.mean(axis=(1, 2))   # adaptive avg pool -> (N, 2048)
