"""Loaders for MNIST-SVHN, SPRITES, CELEBA, FASHIONMNIST, POLYMNIST fixtures."""
import os
import pickle

import numpy as np
import pytest

from multimodal_vae_comparison_tpu.data.datasets import (
    CELEBA, CUB, FASHIONMNIST, MNIST_SVHN, POLYMNIST, SPRITES)


def test_mnist_svhn_loader(tmp_path):
    import torch
    rng = np.random.default_rng(0)
    n = 70
    np.savez(os.path.join(str(tmp_path), "mnist.npz"),
             data=rng.integers(0, 255, (n, 28, 28), dtype=np.uint8),
             labels=rng.integers(0, 10, n))
    np.savez(os.path.join(str(tmp_path), "svhn.npz"),
             data=rng.integers(0, 255, (n, 3, 32, 32), dtype=np.uint8),
             labels=rng.integers(0, 10, n))
    idx_m = os.path.join(str(tmp_path), "train-ms-mnist-idx.pt")
    idx_s = os.path.join(str(tmp_path), "train-ms-svhn-idx.pt")
    torch.save(torch.arange(n), idx_m)
    torch.save(torch.arange(n), idx_s)
    mn = MNIST_SVHN(idx_m, None, "mnist")
    data, masks = mn.get_data("train")
    assert data.shape == (10, 28, 28, 1)  # 1-in-7 subsample of 70
    assert masks is None
    assert len(mn.labels()) == 10
    sv = MNIST_SVHN(idx_s, None, "svhn")
    sdata, _ = sv.get_data("train")
    assert sdata.shape == (10, 32, 32, 3)
    assert sdata.max() <= 1.0


def test_sprites_loader(tmp_path):
    rng = np.random.default_rng(1)
    for act in SPRITES.actions_list:
        for d in SPRITES.directions:
            np.save(os.path.join(str(tmp_path), f"{act}_{d}_frames_train.npy"),
                    rng.random((2, 8, 64, 64, 3)).astype(np.float32))
            np.save(os.path.join(str(tmp_path), f"{act}_{d}_attributes_train.npy"),
                    rng.random((2, 8, 4, 6)).astype(np.float32))
    frames = SPRITES(str(tmp_path), None, "frames")
    fdata, _ = frames.get_data("train")
    assert fdata.shape == (18, 8, 64, 64, 3)
    attrs = SPRITES(str(tmp_path), None, "attributes")
    adata, _ = attrs.get_data("train")
    assert adata.shape == (18, 4, 6)
    actions = SPRITES(str(tmp_path), None, "actions")
    acdata, _ = actions.get_data("train")
    assert acdata.shape == (18, 9)
    np.testing.assert_allclose(acdata.sum(-1), 1.0)
    labels = actions.labels()
    assert labels[0] == "walk front"


def test_celeba_loader(tmp_path):
    rng = np.random.default_rng(2)
    img_path = os.path.join(str(tmp_path), "imgs.npy")
    att_path = os.path.join(str(tmp_path), "atts.npy")
    np.save(img_path, rng.integers(0, 255, (10, 64, 64, 3), dtype=np.uint8))
    np.save(att_path, rng.choice([-1.0, 1.0], (10, 4)))
    img = CELEBA(img_path, None, "image")
    data, _ = img.get_data("train")
    assert data.shape == (10, 64, 64, 3) and data.max() <= 1.0
    att = CELEBA(att_path, None, "atts")
    adata, _ = att.get_data("train")
    assert adata.shape == (10, 4, 2)
    np.testing.assert_allclose(adata.sum(-1), 1.0)
    decoded = att.decode_output(adata[:2])
    assert len(decoded) == 2 and isinstance(decoded[0], str)


def test_fashionmnist_loader(tmp_path):
    rng = np.random.default_rng(3)
    np.savez(os.path.join(str(tmp_path), "fashionmnist.npz"),
             data=rng.integers(0, 255, (12, 28, 28), dtype=np.uint8),
             labels=rng.integers(0, 10, 12))
    img = FASHIONMNIST(str(tmp_path), None, "image")
    data, _ = img.get_data("train")
    assert data.shape == (12, 28, 28, 1)
    lab = FASHIONMNIST(str(tmp_path), None, "label")
    ldata, _ = lab.get_data("train")
    assert ldata.shape == (12, 10)
    np.testing.assert_allclose(ldata.sum(-1), 1.0)


def test_polymnist_loader(tmp_path):
    rng = np.random.default_rng(4)
    path = os.path.join(str(tmp_path), "m0.npy")
    np.save(path, rng.integers(0, 255, (9, 28, 28, 3), dtype=np.uint8))
    ds = POLYMNIST(path, None, "m0")
    data, _ = ds.get_data("train")
    assert data.shape == (9, 28, 28, 3) and data.max() <= 1.0


def test_cub_loader(tmp_path):
    rng = np.random.default_rng(5)
    img_path = os.path.join(str(tmp_path), "imgs.npy")
    np.save(img_path, rng.integers(0, 255, (6, 64, 64, 3), dtype=np.uint8))
    cap_path = os.path.join(str(tmp_path), "caps.pkl")
    with open(cap_path, "wb") as f:
        pickle.dump(["a small bird with blue wings"] * 6, f)
    img = CUB(img_path, None, "image")
    data, _ = img.get_data("train")
    assert data.shape == (6, 64, 64, 3)
    txt = CUB(cap_path, None, "text")
    tdata, tmasks = txt.get_data("train")
    assert tdata.shape == (6, 246, 27)
    assert tmasks.shape == (6, 246)


def test_polymnist_builder_and_labels(tmp_path):
    """data_proc/polymnist builder contract: 5 modality arrays sharing the
    digit label per sample, labels.npy plumbed through POLYMNIST.labels()."""
    from multimodal_vae_comparison_tpu.data_proc.polymnist import (
        build_surrogate)
    out = build_surrogate(str(tmp_path), samples_train=20, samples_test=8,
                          seed=0)
    labels = np.load(os.path.join(out, "labels.npy"))
    assert labels.shape == (20,)
    for m in range(5):
        arr = np.load(os.path.join(out, f"m{m}.npy"))
        assert arr.shape == (20, 28, 28, 3) and arr.dtype == np.uint8
        assert np.load(os.path.join(out, f"test_m{m}.npy")).shape[0] == 8
    # modalities differ (different instance + background) but share labels
    m0 = np.load(os.path.join(out, "m0.npy")).astype(np.float32)
    m1 = np.load(os.path.join(out, "m1.npy")).astype(np.float32)
    assert np.abs(m0 - m1).mean() > 1.0
    ds = POLYMNIST(os.path.join(out, "m0.npy"),
                   os.path.join(out, "test_m0.npy"), "m0")
    data, _ = ds.get_data("train")
    assert data.shape == (20, 28, 28, 3)
    assert np.array_equal(ds.labels(), labels)
    ds.get_data("test")
    assert np.array_equal(ds.labels(),
                          np.load(os.path.join(out, "test_labels.npy")))
    assert ds.eval_statistics_fn() is not None


def test_polymnist_train_test_instances_disjoint(tmp_path):
    """Regression: test-set glyph instances must come from a held-out pool —
    identical instances in both splits inflate judged test metrics."""
    from multimodal_vae_comparison_tpu.data_proc.polymnist import (
        build_surrogate)
    out = build_surrogate(str(tmp_path), samples_train=60, samples_test=30,
                          seed=1)
    for m in range(5):
        train = np.load(os.path.join(out, f"m{m}.npy"))
        test = np.load(os.path.join(out, f"test_m{m}.npy"))
        train_rows = {t.tobytes() for t in train}
        assert not any(t.tobytes() in train_rows for t in test)
