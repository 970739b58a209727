"""Data pipeline tests: text encoding, datasets, DataModule, prefetch."""
import os

import numpy as np
import pytest

from multimodal_vae_comparison_tpu.config import Config
from multimodal_vae_comparison_tpu.data import text as text_utils
from multimodal_vae_comparison_tpu.data.datamodule import (
    DataModule, prefetch_to_device)
from multimodal_vae_comparison_tpu.data.datasets import (
    CDSPRITESPLUS, SYNTHETIC, get_dataset_class)


def test_one_hot_roundtrip():
    data, masks = text_utils.encode_text_batch(["red square", "blue"], 12)
    assert data.shape == (2, 12, 27)
    assert masks.shape == (2, 12)
    assert masks[0].sum() == 10 and masks[1].sum() == 4
    decoded = text_utils.onehot2text(data, masks)
    assert decoded == ["red square", "blue"]


def test_one_hot_truncation():
    data, masks = text_utils.encode_text_batch(["a" * 50], 10)
    assert data.shape == (1, 10, 27)
    assert masks[0].sum() == 10


def test_synthetic_dataset_consistency():
    img_ds = SYNTHETIC("32", None, "image", seed=3)
    txt_ds = SYNTHETIC("32", None, "text", seed=3)
    imgs, _ = img_ds.get_data()
    txt, masks = txt_ds.get_data()
    assert imgs.shape == (32, 64, 64, 3)
    assert txt.shape[0] == 32 and txt.shape[2] == 27
    labels = txt_ds.labels()
    decoded = text_utils.onehot2text(txt, masks)
    assert decoded == labels  # captions match across modality instances


def test_cdsprites_h5_loader(tmp_path):
    import h5py
    path = os.path.join(str(tmp_path), "traindata.h5")
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        f.create_dataset("image", data=rng.integers(
            0, 255, (10, 64, 64, 3), dtype=np.uint8))
        f.create_dataset("text", data=np.array(
            [b"red square on white"] * 10))
    img = CDSPRITESPLUS(path, None, "image")
    data, masks = img.get_data()
    assert data.shape == (10, 64, 64, 3)
    assert masks is None
    assert 0 <= data.min() and data.max() <= 1.0
    txt = CDSPRITESPLUS(path, None, "text")
    tdata, tmasks = txt.get_data()
    assert tdata.shape == (10, 45, 27)
    assert tmasks.shape == (10, 45)
    assert text_utils.onehot2text(tdata, tmasks)[0] == "red square on white"


def _cfg(tmp_path, n="48", bs=16):
    return Config({
        "batch_size": bs, "epochs": 1, "exp_name": "d", "lr": 1e-3,
        "n_latents": 4, "dataset_name": "synthetic", "labels": None,
        "test_split": 0.25,
        "modality_1": {"encoder": "FNN", "decoder": "FNN", "mod_type": "image",
                       "path": n},
        "modality_2": {"encoder": "FNN", "decoder": "TxtTransformer",
                       "mod_type": "text", "path": n},
    }, results_root=str(tmp_path))


def test_datamodule_shared_shuffle_and_split(tmp_path):
    dm = DataModule(_cfg(tmp_path))
    dm.setup()
    assert dm.n_train == 36 and dm.n_val == 12
    # feature dims were wired into the config
    assert dm.config.mods[0].feature_dims == [64, 64, 3]
    assert dm.config.mods[1].feature_dims[1] == 27
    # labels follow the shuffle: decode text of first val sample
    batch = next(dm.batches("val", batch_size=4))
    decoded = text_utils.onehot2text(batch["mod_2"]["data"],
                                     batch["mod_2"]["masks"])
    assert decoded == dm.labels_val[:4]


def test_batches_static_shapes(tmp_path):
    dm = DataModule(_cfg(tmp_path, n="50", bs=16))
    dm.setup()
    shapes = [b["mod_1"]["data"].shape for b in dm.batches("train")]
    assert all(s == (16, 64, 64, 3) for s in shapes)
    # 37 train samples -> 2 full batches, remainder dropped
    assert len(shapes) == 2
    padded = list(dm.batches("train", drop_remainder=False))
    assert len(padded) == 3
    assert padded[-1]["mod_1"]["data"].shape == (16, 64, 64, 3)


def test_prefetch_preserves_order_and_masks(tmp_path):
    dm = DataModule(_cfg(tmp_path))
    dm.setup()
    host = list(dm.batches("train"))
    dev = list(prefetch_to_device(dm.batches("train")))
    assert len(host) == len(dev)
    for h, d in zip(host, dev):
        np.testing.assert_array_equal(h["mod_1"]["data"],
                                      np.asarray(d["mod_1"]["data"]))
        assert d["mod_1"]["masks"] is None
        np.testing.assert_array_equal(h["mod_2"]["masks"],
                                      np.asarray(d["mod_2"]["masks"]))


def test_dataset_registry():
    assert get_dataset_class("CDSPRITESPLUS".lower()) is CDSPRITESPLUS
    with pytest.raises(KeyError):
        get_dataset_class("unknown")
    for name in ["cub", "mnist_svhn", "sprites", "celeba", "fashionmnist",
                 "polymnist", "vilanro", "synthetic"]:
        assert get_dataset_class(name) is not None


def test_vilanro_action_tokens_roundtrip(tmp_path):
    """Quantile-discretized action tokens: load -> one-hot -> decode recovers
    the continuous trajectory to within one bin width; padding stays zero."""
    import pickle

    from multimodal_vae_comparison_tpu.data.datasets import VILANRO

    rng = np.random.default_rng(0)
    # variable-length (L, 4) expert-like trajectories: small deltas + gripper
    trajs = []
    for _ in range(40):
        L = int(rng.integers(4, 20))
        xyz = rng.normal(0, 0.08, (L, 3)).clip(-1, 1)
        grip = np.full((L, 1), 1.0)
        trajs.append(np.concatenate([xyz, grip], -1).astype(np.float32))
    with open(tmp_path / "endeff_actions_final.pkl", "wb") as f:
        pickle.dump(trajs, f)
    (tmp_path / "vocab.txt").write_text("reach\nthe\nred\nblock\n")

    ds = VILANRO(str(tmp_path / "endeff_actions_final.pkl"), None,
                 "action_tokens")
    data, masks = ds.get_data("train")
    K = ds.ACTION_BINS
    assert data.shape == (40, 100, 4, K)
    assert ds.feature_dims["action_tokens"] == [100, 4, K]
    # one-hot: exactly one token per (step, dim)
    np.testing.assert_array_equal(data.sum(-1), np.ones((40, 100, 4)))

    decoded = ds.decode_output(data, masks)
    assert decoded.shape == (40, 100, 4)
    # real steps recovered within a bin width; quantile bins concentrate
    # resolution where the expert operates, so the error is small
    for i, t in enumerate(trajs):
        L = min(len(t), 100)
        err = np.abs(decoded[i, :L] - t[:L])
        assert err.max() < 0.1, err.max()
        assert np.median(err) < 0.02
    # padded steps decode to zero under the mask
    np.testing.assert_array_equal(decoded[~np.asarray(masks)], 0.0)


def test_config_cli_override_for_absent_yaml_key(tmp_path):
    """Regression: --K 10 on a config whose YAML has no K: line must apply
    (it silently trained with K=1 before)."""
    import yaml
    from multimodal_vae_comparison_tpu.config import Config
    cfg_yaml = {
        "batch_size": 4, "epochs": 1, "exp_name": "t", "lr": 1e-3,
        "mixing": "moe", "n_latents": 4, "dataset_name": "synthetic",
        "labels": None, "test_split": 0.25,
        "modality_1": {"encoder": "FNN", "decoder": "FNN",
                       "mod_type": "image", "path": "16"},
    }
    p = tmp_path / "c.yml"
    p.write_text(yaml.safe_dump(cfg_yaml))
    cfg = Config(str(p), overrides={"K": 10, "beta": 2.5, "profile": "x"},
                 eval_only=True)
    assert cfg.K == 10 and cfg.beta == 2.5
    assert not hasattr(cfg, "profile")   # non-config CLI flags stay out


def test_batches_pad_when_split_smaller_than_batch(tmp_path):
    """Regression: a split smaller than one pad's worth must still yield a
    full static-shape batch (padding tiles the split)."""
    import yaml
    from multimodal_vae_comparison_tpu.config import Config
    from multimodal_vae_comparison_tpu.data.datamodule import DataModule
    cfg = Config({
        "batch_size": 8, "epochs": 1, "exp_name": "t", "lr": 1e-3,
        "mixing": "moe", "n_latents": 4, "dataset_name": "synthetic",
        "labels": None, "test_split": 0.25, "seed": 1,
        "modality_1": {"encoder": "FNN", "decoder": "FNN",
                       "mod_type": "image", "path": "12"},
    }, results_root=str(tmp_path))
    dm = DataModule(cfg)
    dm.setup()
    # val split has 3 samples < batch_size 8
    batches = list(dm.batches("val", batch_size=8, drop_remainder=False))
    assert len(batches) == 1
    assert batches[0]["mod_1"]["data"].shape[0] == 8
