"""Native C++ data-kernel bindings vs numpy references."""
import numpy as np
import pytest

from multimodal_vae_comparison_tpu.data import native
from multimodal_vae_comparison_tpu.data import text as text_utils


def test_native_builds_and_loads():
    assert native.available(), "native lib failed to build/load"


def test_gather_f32_matches_numpy():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(100, 7, 3)).astype(np.float32)
    idx = rng.integers(0, 100, size=32)
    np.testing.assert_array_equal(native.gather(src, idx), src[idx])


def test_gather_bool_matches_numpy():
    rng = np.random.default_rng(1)
    src = rng.random((50, 12)) > 0.5
    idx = rng.integers(0, 50, size=20)
    np.testing.assert_array_equal(native.gather(src, idx), src[idx])


def test_gather_normalize_fused():
    rng = np.random.default_rng(2)
    src = rng.integers(0, 256, size=(40, 8, 8, 3), dtype=np.uint8)
    idx = rng.integers(0, 40, size=16)
    got = native.gather_normalize(src, idx)
    want = src[idx].astype(np.float32) / 255.0
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert got.dtype == np.float32


def test_one_hot_text_matches_python():
    texts = ["big red square", "small heart", "x" * 60, ""]
    got_d, got_m = native.one_hot_text(texts, 45)
    want_d, want_m = text_utils.encode_text_batch(texts, 45)
    np.testing.assert_array_equal(got_d, want_d)
    np.testing.assert_array_equal(got_m, want_m)
