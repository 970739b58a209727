"""ctypes bindings for the native host data kernels (native/mmvae_io.cpp).

The reference's loader is pure Python (SURVEY.md §2: num_workers=0,
per-epoch re-tokenize); here the host hot paths that assemble TPU batches —
row gather, fused uint8→float32 normalize, character one-hot — run in C++
(OpenMP) with a transparent numpy fallback when the toolchain is absent.

The shared library is built on first import with ``make -C native`` if
``libmmvae_io.so`` is missing.  ``available()`` reports whether the native
path is active; every public function works either way.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmmvae_io.so")

_lib = None


def _load() -> None:
    global _lib
    if _lib is not None:
        return
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            _lib = False
            return
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _lib = False
        return
    c_i64 = ctypes.c_int64
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.gather_f32.argtypes = [f32p, i64p, c_i64, c_i64, f32p]
    lib.gather_u8.argtypes = [u8p, i64p, c_i64, c_i64, u8p]
    lib.gather_u8_to_f32.argtypes = [u8p, i64p, c_i64, c_i64,
                                     ctypes.c_float, f32p]
    lib.one_hot_text.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_int32), c_i64,
                                 c_i64, c_i64, f32p, u8p]
    lib.mmvae_io_version.restype = ctypes.c_int
    _lib = lib


def available() -> bool:
    """True when the C++ kernels are built and loadable."""
    _load()
    return bool(_lib) and _lib.mmvae_io_version() >= 1


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def _check_bounds(idx: np.ndarray, n_src: int):
    """The C kernels are raw memcpys; match the numpy fallback's IndexError
    instead of silently reading out of bounds."""
    if len(idx) and (int(idx.min()) < 0 or int(idx.max()) >= n_src):
        raise IndexError(
            f"gather index out of range for source of length {n_src}: "
            f"min={int(idx.min())} max={int(idx.max())}")


def gather(src: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """out[i] = src[idx[i]] — native memcpy gather for f32/bool/u8 rows,
    numpy fancy-indexing otherwise."""
    _load()
    src = np.ascontiguousarray(src)
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    # bounds-check both paths so behavior never depends on whether the
    # native lib loaded (numpy would silently accept negative indices)
    _check_bounds(idx, len(src))
    if not _lib:
        return src[idx]
    n = len(idx)
    row = int(np.prod(src.shape[1:], dtype=np.int64))
    out_shape = (n,) + src.shape[1:]
    if src.dtype == np.float32:
        out = np.empty(out_shape, np.float32)
        _lib.gather_f32(_ptr(src, ctypes.c_float), _ptr(idx, ctypes.c_int64),
                        n, row, _ptr(out, ctypes.c_float))
        return out
    if src.dtype in (np.uint8, np.bool_):
        view = src.view(np.uint8)
        out = np.empty(out_shape, np.uint8)
        _lib.gather_u8(_ptr(view, ctypes.c_uint8), _ptr(idx, ctypes.c_int64),
                       n, row, _ptr(out, ctypes.c_uint8))
        return out.view(src.dtype)
    return src[idx]


def gather_normalize(src: np.ndarray, idx: np.ndarray,
                     scale: float = 1.0 / 255.0) -> np.ndarray:
    """Fused out[i] = src[idx[i]] * scale for uint8 image rows → float32."""
    _load()
    src = np.ascontiguousarray(src)
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    _check_bounds(idx, len(src))
    if not _lib or src.dtype != np.uint8:
        return src[idx].astype(np.float32) * np.float32(scale)
    n = len(idx)
    row = int(np.prod(src.shape[1:], dtype=np.int64))
    out = np.empty((n,) + src.shape[1:], np.float32)
    _lib.gather_u8_to_f32(_ptr(src, ctypes.c_uint8),
                          _ptr(idx, ctypes.c_int64), n, row,
                          ctypes.c_float(scale), _ptr(out, ctypes.c_float))
    return out


def one_hot_text(texts: Sequence[str], seq_len: int
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Batch 27-alphabet char one-hot + masks; bit-matches
    text.encode_text_batch (reference utils.py:414-421 contract)."""
    _load()
    if not _lib:
        from multimodal_vae_comparison_tpu.data.text import encode_text_batch
        return encode_text_batch(list(texts), seq_len)
    encoded: List[bytes] = [t.encode("utf8") for t in texts]
    n = len(encoded)
    stride = max(1, max((len(b) for b in encoded), default=1))
    buf = np.zeros((n, stride), np.uint8)
    lengths = np.zeros((n,), np.int32)
    for i, b in enumerate(encoded):
        buf[i, :len(b)] = np.frombuffer(b, np.uint8)
        lengths[i] = len(b)
    out = np.zeros((n, seq_len, 27), np.float32)
    masks = np.zeros((n, seq_len), np.uint8)
    _lib.one_hot_text(buf.ctypes.data_as(ctypes.c_char_p),
                      _ptr(lengths, ctypes.c_int32), n, stride, seq_len,
                      _ptr(out, ctypes.c_float), _ptr(masks, ctypes.c_uint8))
    return out, masks.astype(bool)
