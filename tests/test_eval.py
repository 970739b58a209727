"""Eval subsystem integration tests: infer reload + CdSprites+ benchmark."""
import os

import numpy as np
import pytest

from multimodal_vae_comparison_tpu.config import Config
from multimodal_vae_comparison_tpu.eval import eval_cdsprites as ec


def make_cdsprites_h5(path, n=60, seed=0):
    """Tiny level-1-style CdSprites+ file: 3 shapes with distinct looks."""
    import h5py
    rng = np.random.default_rng(seed)
    shapes = ["square", "ellipse", "heart"]
    imgs = np.zeros((n, 64, 64, 3), np.uint8)
    texts = []
    for i in range(n):
        s = shapes[i % 3]
        if s == "square":
            imgs[i, 10:50, 10:50] = [200, 40, 40]
        elif s == "ellipse":
            yy, xx = np.mgrid[:64, :64]
            imgs[i][((yy - 32) / 25) ** 2 + ((xx - 32) / 15) ** 2 <= 1] = [40, 200, 40]
        else:
            imgs[i, 20:40, 15:45] = [40, 40, 200]
        imgs[i] = np.clip(imgs[i] + rng.integers(0, 20, imgs[i].shape), 0, 255)
        texts.append(s.encode("utf8"))
    with h5py.File(path, "w") as f:
        f.create_dataset("image", data=imgs)
        f.create_dataset("text", data=np.array(texts))
    return path


def trained_run(tmp_path, h5path):
    cfg = Config({
        "batch_size": 12, "epochs": 1, "exp_name": "cd", "lr": 1e-3,
        "mixing": "poe", "n_latents": 6, "obj": "elbo", "optimizer": "adam",
        "seed": 1, "test_split": 0.2, "viz_freq": 100,
        "dataset_name": "cdspritesplus", "labels": None,
        "modality_1": {"encoder": "FNN", "decoder": "FNN", "mod_type": "image",
                       "path": h5path, "recon_loss": "bce"},
        "modality_2": {"encoder": "TxtTransformer", "decoder": "TxtTransformer",
                       "mod_type": "text", "path": h5path,
                       "recon_loss": "category_ce"},
    }, results_root=str(tmp_path))
    from multimodal_vae_comparison_tpu.training.trainer import Trainer
    trainer = Trainer(cfg, enable_viz=False)
    trainer.fit(epochs=1, log_fn=None)
    return cfg, trainer


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cdeval")
    h5 = make_cdsprites_h5(os.path.join(str(tmp), "traindata.h5"))
    cfg, trainer = trained_run(tmp, h5)
    return tmp, cfg, trainer


def test_infer_reload_and_cross_generate(run):
    tmp, cfg, trainer = run
    from multimodal_vae_comparison_tpu.eval.infer import MultimodalVAEInfer
    exp = MultimodalVAEInfer(cfg.mPath)
    batch, labels = exp.get_test_samples(4)
    recons = exp.cross_generate("mod_2", batch["mod_2"]["data"],
                                batch["mod_2"]["masks"])
    assert recons["mod_1"].shape == (4, 64, 64, 3)
    assert recons["mod_2"].shape[0] == 4
    joint = exp.joint_generate(6)
    assert joint["mod_1"].shape == (6, 64, 64, 3)


def test_cdsprites_benchmark_end_to_end(run, monkeypatch):
    tmp, cfg, trainer = run
    monkeypatch.setenv("CDSPRITES_CLASSIFIER_DIR", str(tmp / "clf"))
    monkeypatch.setenv("CDSPRITES_EVAL_SAMPLES", "8")
    stats = ec.cdsprites_eval(trainer)
    for key in ["Text-Image Strict", "Image-Text Strict", "Image-Text Letters",
                "Joint Strict", "Joint Features"]:
        assert key in stats
        assert 0 <= stats[key] <= 100
    assert os.path.exists(os.path.join(cfg.mPath, "cdspritesplus_stats.txt"))


def test_text_analysis_helpers():
    assert ec.get_attribute("shape", "big red square at top left") == "square"
    assert ec.get_attribute("size", "big red square") == "big"
    assert ec.get_attribute("color", "big red square") == "red"
    assert ec.get_attribute_from_recon("shape", "square", 1) == "square"
    assert ec.get_attribute_from_recon("size", "small heart", 2) == "small"
    assert ec.get_attribute_from_recon("shape", "small pink heart", 3) == "heart"
    assert ec.count_same_letters("square", "squxre") == 5
    assert ec.try_retrieve_atts("small pink heart", 3) == "small pink heart"
    assert "Unknown" in ec.try_retrieve_atts("xyzzy", 1)


def test_classifier_trains_to_high_accuracy(tmp_path):
    """The auto-trained shape classifier must actually learn the fixture."""
    from multimodal_vae_comparison_tpu.eval.classifiers import (
        CNNClassifier, classifier_accuracy, train_classifier)
    h5 = make_cdsprites_h5(os.path.join(str(tmp_path), "t.h5"), n=90)
    import h5py
    with h5py.File(h5) as f:
        imgs = np.asarray(f["image"]).astype(np.float32) / 255.0
        texts = [t.decode() for t in f["text"]]
    classes = ec.CLASS_MAPPINGS["shape"]
    y = np.array([classes.index(t) for t in texts])
    model = CNNClassifier(num_classes=3)
    params = train_classifier(model, imgs, y, epochs=8, batch_size=30)
    acc = classifier_accuracy(model, params, imgs, y)
    assert acc > 0.9, f"classifier failed to learn: acc={acc}"


def test_infer_uses_k1_model(run):
    """K>1 training objectives must not inflate inference decode cost
    (oversized programs also exceeded remote-compile limits)."""
    tmp, cfg, trainer = run
    import yaml
    # fake a K=10 config in a copy of the run dir
    import shutil
    dst = str(tmp / "k10run")
    shutil.copytree(cfg.mPath, dst)
    params = yaml.safe_load(open(os.path.join(dst, "config.yml")))
    params["K"] = 10
    params["obj"] = "iwae"
    yaml.dump(params, open(os.path.join(dst, "config.yml"), "w"))
    from multimodal_vae_comparison_tpu.eval.infer import MultimodalVAEInfer
    exp = MultimodalVAEInfer(dst)
    assert exp.model.K == 1
    batch, _ = exp.get_test_samples(2)
    recs = exp.cross_generate("mod_2", batch["mod_2"]["data"],
                              batch["mod_2"]["masks"])
    assert recs["mod_1"].shape[0] == 2


def test_classifier_cache_corruption_tolerated(tmp_path):
    """A truncated cache pkl (e.g. from a killed run) is retrained, not
    fatal; save is atomic so no .tmp residue is left behind."""
    import os
    import numpy as np
    from multimodal_vae_comparison_tpu.eval.classifiers import (
        CNNClassifier, get_or_train_classifier)
    cache = str(tmp_path / "judge.pkl")
    open(cache, "wb").close()                       # 0-byte corrupt cache
    rng = np.random.default_rng(0)
    imgs = rng.random((20, 32, 32, 1)).astype("float32")
    y = rng.integers(0, 2, 20)
    params = get_or_train_classifier(
        cache, CNNClassifier(num_classes=2), lambda: (imgs, y),
        epochs=1, batch_size=10)
    assert params is not None
    assert os.path.getsize(cache) > 0
    assert not os.path.exists(cache + ".tmp")
    # second call loads the healthy cache
    p2 = get_or_train_classifier(
        cache, CNNClassifier(num_classes=2), lambda: (None, None),
        epochs=1, batch_size=10)
    assert p2 is not None


def test_get_test_samples_caps_at_split_size():
    """Requesting more samples than the split holds must not pad-wrap the
    batch out of alignment with the labels (MNIST-SVHN regression)."""
    import types
    import numpy as np
    from multimodal_vae_comparison_tpu.data.datamodule import DataModule
    from multimodal_vae_comparison_tpu.eval.infer import MultimodalVAEInfer

    dm = DataModule.__new__(DataModule)
    data = np.arange(7, dtype=np.float32)[:, None]
    dm._test = [{"data": data, "masks": None}]
    dm._val = dm._train = dm._test
    dm.batch_size = 4
    dm.labels_test = np.arange(7)
    dm.labels_val = dm.labels_train = dm.labels_test
    fake = types.SimpleNamespace(datamod=dm)
    batch, labels = MultimodalVAEInfer.get_test_samples(fake, 100)
    assert len(batch["mod_1"]["data"]) == 7
    assert len(labels) == 7
    np.testing.assert_array_equal(batch["mod_1"]["data"][:, 0], labels)
