"""Judge-training holdout contract (round-3 review finding).

Judged evals without a ``test_datapath`` sample the VAL split, so every
judge must train on the TRAIN split only — otherwise the printed
``*_judge_accuracy_real`` calibration scores the judge on its own training
data.  These tests pin the split accessor, the multi-head accuracy
normalization, and one full judged eval end-to-end (FashionMNIST, the
cheapest family).
"""
import os

import numpy as np

from multimodal_vae_comparison_tpu.config import Config
from multimodal_vae_comparison_tpu.training.trainer import Trainer


def test_split_arrays_disjoint_and_label_aligned(tmp_path):
    rng = np.random.default_rng(0)
    n = 40
    np.savez(os.path.join(str(tmp_path), "fashionmnist.npz"),
             data=rng.integers(0, 255, (n, 28, 28), dtype=np.uint8),
             labels=np.arange(n) % 10)
    cfg = Config({
        "batch_size": 4, "epochs": 1, "exp_name": "t", "lr": 1e-3,
        "mixing": "poe", "n_latents": 4, "dataset_name": "fashionmnist",
        "labels": None, "test_split": 0.25,
        "modality_1": {"encoder": "FNN", "decoder": "FNN", "mod_type": "image",
                       "path": str(tmp_path)},
        "modality_2": {"encoder": "FNN", "decoder": "FNN", "mod_type": "label",
                       "path": str(tmp_path)},
    }, results_root=str(tmp_path))
    from multimodal_vae_comparison_tpu.data.datamodule import DataModule
    dm = DataModule(cfg)
    dm.setup()
    train_imgs, _ = dm.split_arrays(0, "train")
    val_imgs, _ = dm.split_arrays(0, "val")
    assert len(train_imgs) == 30 and len(val_imgs) == 10
    # disjoint: no val image appears in the train split
    tr = {im.tobytes() for im in train_imgs}
    assert not any(im.tobytes() in tr for im in val_imgs)
    # labels_train aligns with the one-hot label modality's train split
    lab_onehot, _ = dm.split_arrays(1, "train")
    np.testing.assert_array_equal(np.argmax(lab_onehot, -1),
                                  np.asarray(dm.labels_train))


def test_multihead_accuracy_normalized():
    from multimodal_vae_comparison_tpu.eval.classifiers import (
        VideoClassifier, classifier_accuracy)
    import jax

    model = VideoClassifier(num_classes=3, heads=4, hidden=4)
    imgs = np.random.default_rng(0).random((6, 2, 8, 8, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), imgs[:1])
    labels = np.random.default_rng(1).integers(0, 3, (6, 4))
    acc = classifier_accuracy(model, params, imgs, labels)
    assert 0.0 <= acc <= 1.0  # was up to `heads`x inflated


def test_fashionmnist_eval_end_to_end(tmp_path):
    """Full judged eval on a tiny 1-epoch model: the judge trains on the
    train split, calibration runs on val, and all stats are fractions."""
    rng = np.random.default_rng(2)
    n = 48
    np.savez(os.path.join(str(tmp_path), "fashionmnist.npz"),
             data=rng.integers(0, 255, (n, 28, 28), dtype=np.uint8),
             labels=np.arange(n) % 10)
    cfg = Config({
        "batch_size": 8, "epochs": 1, "exp_name": "fm", "lr": 1e-3,
        "mixing": "poe", "n_latents": 4, "dataset_name": "fashionmnist",
        "labels": None, "test_split": 0.25,
        "modality_1": {"encoder": "FNN", "decoder": "FNN", "mod_type": "image",
                       "path": str(tmp_path)},
        "modality_2": {"encoder": "FNN", "decoder": "FNN", "mod_type": "label",
                       "path": str(tmp_path), "recon_loss": "category_ce"},
    }, results_root=str(tmp_path))
    trainer = Trainer(cfg, enable_viz=False)
    trainer.fit(epochs=1, log_fn=None)
    os.environ["FASHIONMNIST_CLASSIFIER_DIR"] = str(tmp_path / "clf")
    try:
        from multimodal_vae_comparison_tpu.eval.eval_fashionmnist import (
            fashionmnist_eval)
        stats = fashionmnist_eval(trainer)
    finally:
        del os.environ["FASHIONMNIST_CLASSIFIER_DIR"]
    for k, v in stats.items():
        assert 0.0 <= v <= 1.0, (k, v)
    assert "judge_accuracy_real" in stats


def test_cub_color_labels_validity():
    from multimodal_vae_comparison_tpu.eval.eval_cub import _color_labels
    labels, valid = _color_labels([
        "a small blue bird with a yellow belly",
        "this bird has feathers",            # no color word -> invalid
        "a large bird that is red",
    ])
    np.testing.assert_array_equal(valid, [True, False, True])
    assert labels[0] == 0 and labels[2] == 1  # blue, red


def test_sif_embeddings_min_occur():
    from multimodal_vae_comparison_tpu.eval.text_embeddings import (
        SIFEmbeddings)
    sents = ["red ball", "red cube", "blue ball", "rare"]
    emb = SIFEmbeddings(min_occur=2).fit(sents)   # 'cube'/'rare' filtered
    assert set(emb.vocab) == {"red", "ball"}
    assert sorted(emb.vocab.values()) == [0, 1]   # ids contiguous


def test_celeba_eval_end_to_end(tmp_path):
    """Judged CelebA eval on a tiny 1-epoch model: 4-head judge trains on
    the train split; all stats are fractions with a calibration entry."""
    rng = np.random.default_rng(3)
    img_path = os.path.join(str(tmp_path), "imgs.npy")
    att_path = os.path.join(str(tmp_path), "atts.npy")
    np.save(img_path, rng.integers(0, 255, (40, 64, 64, 3), dtype=np.uint8))
    np.save(att_path, rng.choice([-1.0, 1.0], (40, 4)))
    cfg = Config({
        "batch_size": 8, "epochs": 1, "exp_name": "cel", "lr": 1e-3,
        "mixing": "poe", "n_latents": 4, "dataset_name": "celeba",
        "labels": None, "test_split": 0.25,
        "modality_1": {"encoder": "FNN", "decoder": "FNN", "mod_type": "image",
                       "path": img_path, "recon_loss": "bce"},
        "modality_2": {"encoder": "FNN", "decoder": "FNN", "mod_type": "atts",
                       "path": att_path, "recon_loss": "category_ce"},
    }, results_root=str(tmp_path))
    trainer = Trainer(cfg, enable_viz=False)
    trainer.fit(epochs=1, log_fn=None)
    os.environ["CELEBA_CLASSIFIER_DIR"] = str(tmp_path / "clf")
    try:
        from multimodal_vae_comparison_tpu.eval.eval_celeba import celeba_eval
        stats = celeba_eval(trainer)
    finally:
        del os.environ["CELEBA_CLASSIFIER_DIR"]
    assert "judge_accuracy_real" in stats
    for k, v in stats.items():
        assert 0.0 <= v <= 1.0, (k, v)


def test_mnistsvhn_eval_end_to_end(tmp_path):
    """Judged MNIST-SVHN eval through the real pairing files (surrogate
    builder) with the shared train-split digit judges."""
    import pytest
    pytest.importorskip("sklearn")
    from multimodal_vae_comparison_tpu.data_proc import mnistsvhn
    d = mnistsvhn.build_surrogate(str(tmp_path / "ms"), pairs_train=2,
                                  pairs_test=1, seed=0)
    cfg = Config({
        "batch_size": 8, "epochs": 1, "exp_name": "ms", "lr": 1e-3,
        "mixing": "poe", "n_latents": 4, "dataset_name": "mnist_svhn",
        "labels": None, "test_split": 0.25,
        "modality_1": {"encoder": "FNN", "decoder": "FNN", "mod_type": "mnist",
                       "path": os.path.join(d, "mnist_idx_train.npy"),
                       "test_datapath": os.path.join(d, "mnist_idx_test.npy"),
                       "recon_loss": "bce"},
        "modality_2": {"encoder": "FNN", "decoder": "FNN", "mod_type": "svhn",
                       "path": os.path.join(d, "svhn_idx_train.npy"),
                       "test_datapath": os.path.join(d, "svhn_idx_test.npy"),
                       "recon_loss": "bce"},
    }, results_root=str(tmp_path))
    trainer = Trainer(cfg, enable_viz=False)
    trainer.fit(epochs=1, log_fn=None)
    os.environ["MNISTSVHN_CLASSIFIER_DIR"] = str(tmp_path / "clf")
    try:
        from multimodal_vae_comparison_tpu.eval.eval_mnistsvhn import (
            mnistsvhn_eval)
        stats = mnistsvhn_eval(trainer)
    finally:
        del os.environ["MNISTSVHN_CLASSIFIER_DIR"]
    assert any(k.endswith("judge_accuracy_real") for k in stats)
    for k, v in stats.items():
        assert 0.0 <= v <= 1.0, (k, v)


def test_polymnist_eval_end_to_end(tmp_path):
    """Judged PolyMNIST eval (5 modalities) with train-split digit judges."""
    import pytest
    pytest.importorskip("sklearn")
    from multimodal_vae_comparison_tpu.data_proc.polymnist import (
        build_surrogate)
    d = build_surrogate(str(tmp_path / "pm"), samples_train=40,
                        samples_test=16, seed=0)
    mods = {}
    for m in range(5):
        mods[f"modality_{m+1}"] = {
            "encoder": "FNN", "decoder": "FNN", "mod_type": f"m{m}",
            "path": os.path.join(d, f"m{m}.npy"),
            "test_datapath": os.path.join(d, f"test_m{m}.npy"),
            "recon_loss": "bce"}
    cfg = Config({
        "batch_size": 8, "epochs": 1, "exp_name": "pm", "lr": 1e-3,
        "mixing": "moe", "n_latents": 4, "dataset_name": "polymnist",
        "labels": None, "test_split": 0.25, **mods,
    }, results_root=str(tmp_path))
    trainer = Trainer(cfg, enable_viz=False)
    trainer.fit(epochs=1, log_fn=None)
    os.environ["POLYMNIST_CLASSIFIER_DIR"] = str(tmp_path / "clf")
    try:
        from multimodal_vae_comparison_tpu.eval.eval_polymnist import (
            polymnist_eval)
        stats = polymnist_eval(trainer)
    finally:
        del os.environ["POLYMNIST_CLASSIFIER_DIR"]
    assert "judge_accuracy_real_mean" in stats
    for k, v in stats.items():
        assert 0.0 <= v <= 1.0, (k, v)


def test_cub_eval_end_to_end(tmp_path):
    """Judged CUB eval: color judge trains on parseable train-split captions
    only; unparseable captions drop out of the metric denominators."""
    import pickle
    rng = np.random.default_rng(4)
    img_path = os.path.join(str(tmp_path), "imgs.npy")
    cap_path = os.path.join(str(tmp_path), "caps.pkl")
    np.save(img_path, rng.integers(0, 255, (40, 64, 64, 3), dtype=np.uint8))
    colors = ["blue", "red", "yellow", "brown", "grey", "white"]
    caps = [f"a small {colors[i % 6]} bird with a yellow belly"
            for i in range(38)] + ["this bird has feathers"] * 2
    with open(cap_path, "wb") as f:
        pickle.dump(caps, f)
    cfg = Config({
        "batch_size": 8, "epochs": 1, "exp_name": "cub", "lr": 1e-3,
        "mixing": "poe", "n_latents": 4, "dataset_name": "cub",
        "labels": None, "test_split": 0.25,
        "modality_1": {"encoder": "FNN", "decoder": "FNN", "mod_type": "image",
                       "path": img_path, "recon_loss": "bce"},
        "modality_2": {"encoder": "TxtTransformer", "decoder": "TxtTransformer",
                       "mod_type": "text", "path": cap_path,
                       "recon_loss": "category_ce"},
    }, results_root=str(tmp_path))
    trainer = Trainer(cfg, enable_viz=False)
    trainer.fit(epochs=1, log_fn=None)
    os.environ["CUB_CLASSIFIER_DIR"] = str(tmp_path / "clf")
    try:
        from multimodal_vae_comparison_tpu.eval.eval_cub import cub_eval
        stats = cub_eval(trainer)
    finally:
        del os.environ["CUB_CLASSIFIER_DIR"]
    assert "judge_accuracy_real" in stats
    assert 0.0 <= stats["text_to_image_color"] <= 1.0


def test_action_judge_learns_motion_only_classes():
    """The round-5 motion-aware action judge must separate clips that
    differ ONLY in motion direction — exactly what the mean-pooled
    VideoClassifier blends away (its 79.3% real-frame calibration capped
    actions→frames, VERDICT r4 item 5)."""
    import jax
    from multimodal_vae_comparison_tpu.eval.classifiers import (
        ActionVideoClassifier, classifier_accuracy, train_classifier)

    rng = np.random.default_rng(0)
    T, H = 6, 12
    n_per = 48

    def clip(direction):
        # a bright 2x2 dot sweeping across the SAME positions in both
        # classes: only the temporal ORDER differs, so time-mean-pooled
        # features are identical by construction
        start = rng.integers(0, H)
        xs = np.zeros((T, H, H, 3), np.float32)
        for t in range(T):
            pos = (start + (t if direction else T - 1 - t)) % (H - 1)
            xs[t, pos:pos + 2, pos:pos + 2] = 1.0
        return xs

    clips = np.stack([clip(d) for d in (0, 1) for _ in range(n_per)])
    labels = np.repeat([0, 1], n_per)
    order = rng.permutation(len(clips))
    clips, labels = clips[order], labels[order]
    tr = len(clips) * 3 // 4
    model = ActionVideoClassifier(num_classes=2, hid_channels=8,
                                  hidden_dim=32)
    params = train_classifier(model, clips[:tr], labels[:tr], epochs=60,
                              batch_size=16, lr=3e-3)
    acc = classifier_accuracy(model, params, clips[tr:], labels[tr:])
    assert acc >= 0.9, f"motion-only holdout accuracy {acc}"
