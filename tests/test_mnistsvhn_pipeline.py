"""MNIST-SVHN builder + SIF embedding tests (VERDICT round-1 items 4/7)."""
import os

import numpy as np
import pytest

from multimodal_vae_comparison_tpu.data_proc import mnistsvhn
from multimodal_vae_comparison_tpu.eval.text_embeddings import (
    SIFEmbeddings, text_embedding_analysis)


def test_pair_indices_label_aligned():
    rng = np.random.default_rng(0)
    la = rng.integers(0, 10, 300)
    lb = rng.integers(0, 10, 300)
    ia, ib = mnistsvhn.pair_indices(la, lb, pairs=3, rng=rng)
    assert len(ia) == len(ib)
    np.testing.assert_array_equal(la[ia], lb[ib])  # pairs share the label


def test_surrogate_builder_contract(tmp_path):
    pytest.importorskip("sklearn")
    d = mnistsvhn.build_surrogate(str(tmp_path), pairs_train=2, pairs_test=1,
                                  seed=0)
    for f in ("mnist.npz", "svhn.npz", "mnist_idx_train.npy",
              "svhn_idx_train.npy", "mnist_idx_test.npy",
              "svhn_idx_test.npy", "SURROGATE.txt"):
        assert os.path.isfile(os.path.join(d, f)), f
    m = np.load(os.path.join(d, "mnist.npz"))
    s = np.load(os.path.join(d, "svhn.npz"))
    assert m["data"].shape[1:] == (28, 28, 1) and m["data"].dtype == np.uint8
    assert s["data"].shape[1:] == (32, 32, 3)
    ia = np.load(os.path.join(d, "mnist_idx_train.npy"))
    ib = np.load(os.path.join(d, "svhn_idx_train.npy"))
    np.testing.assert_array_equal(m["labels"][ia], s["labels"][ib])
    # train/test index disjointness
    it = np.load(os.path.join(d, "mnist_idx_test.npy"))
    assert not set(ia.tolist()) & set(it.tolist())


def test_dataset_class_loads_built_pairs(tmp_path):
    pytest.importorskip("sklearn")
    d = mnistsvhn.build_surrogate(str(tmp_path), pairs_train=2, pairs_test=1)
    from multimodal_vae_comparison_tpu.data.datasets import MNIST_SVHN
    mn = MNIST_SVHN(os.path.join(d, "mnist_idx_train.npy"),
                    os.path.join(d, "mnist_idx_test.npy"), "mnist")
    data, masks = mn.get_data("train")
    assert data.ndim == 4 and data.shape[1:] == (28, 28, 1)
    assert 0.0 <= data.min() and data.max() <= 1.0
    assert mn.labels() is not None and len(mn.labels()) == len(data)
    sv = MNIST_SVHN(os.path.join(d, "svhn_idx_train.npy"),
                    os.path.join(d, "svhn_idx_test.npy"), "svhn")
    sdata, _ = sv.get_data("train")
    assert sdata.shape[1:] == (32, 32, 3)
    assert len(sdata) == len(data)  # aligned pairing
    np.testing.assert_array_equal(np.asarray(mn.labels()),
                                  np.asarray(sv.labels()))


def test_sif_embeddings_semantics():
    caps = [f"{s} {c} {sh}" for s in ("big", "small")
            for c in ("red", "blue", "green")
            for sh in ("square", "heart", "ellipse")] * 4
    emb = SIFEmbeddings(dim=16, min_occur=1).fit(caps)
    # identical sentences embed identically
    same = emb.similarity("big red square", "big red square")
    assert same > 0.999
    # one-word difference is closer than all-words different
    near = emb.similarity("big red square", "small red square")
    far = emb.similarity("big red square", "small blue heart")
    assert near > far


def test_text_embedding_analysis_separates_matched_from_shuffled():
    rng = np.random.default_rng(0)
    vocab = [(s, c, sh) for s in ("big", "small")
             for c in ("red", "blue", "green", "pink")
             for sh in ("square", "heart", "ellipse")]
    gt = [" ".join(vocab[rng.integers(len(vocab))]) for _ in range(200)]
    recon = [g if rng.random() < 0.8 else
             " ".join(vocab[rng.integers(len(vocab))]) for g in gt]
    out = text_embedding_analysis(gt, recon, dim=16)
    assert out["embedding_cosine"] > out["embedding_cosine_shuffled_baseline"]


def test_write_handles_unequal_modality_lengths(tmp_path):
    """Regression: real MNIST (60k) and SVHN (73k) differ in length; the
    pairing must use per-modality index ranges, not one shared range."""
    rng = np.random.default_rng(0)
    mnist = rng.integers(0, 255, (40, 28, 28, 1), dtype=np.uint8)
    svhn = rng.integers(0, 255, (70, 32, 32, 3), dtype=np.uint8)
    mlab = np.arange(40) % 10
    slab = np.arange(70) % 10
    mnistsvhn._write(str(tmp_path), mnist, mlab, svhn, slab,
                     pairs_train=2, pairs_test=1, test_fraction=0.2, rng=rng)
    for tag in ("train", "test"):
        ia = np.load(os.path.join(str(tmp_path), f"mnist_idx_{tag}.npy"))
        ib = np.load(os.path.join(str(tmp_path), f"svhn_idx_{tag}.npy"))
        assert ia.max() < 40 and ib.max() < 70
        np.testing.assert_array_equal(mlab[ia], slab[ib])
    # SVHN indices beyond len(mnist) are reachable (nothing silently dropped)
    ib_all = np.concatenate([
        np.load(os.path.join(str(tmp_path), "svhn_idx_train.npy")),
        np.load(os.path.join(str(tmp_path), "svhn_idx_test.npy"))])
    assert ib_all.max() >= 40
