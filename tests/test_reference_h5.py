"""Drop-in support for the reference's REAL traindata.h5 layout.

The published CdSprites+ archives are written by the reference generator
exactly like this (multimodal_compare/data_proc/cdSprites.py:280-283):

    hf.create_dataset('image', data=np.asarray(imgs))   # (N,64,64,3) uint8
    hf.create_dataset('text', data=captions)            # list[str] -> vlen

i.e. uint8 HWC images read with cv2 and a *variable-length string* text
dataset (our own generator writes fixed-length bytes — both must load).
This test builds a byte-identical-layout fixture and runs config parsing,
DataModule setup, label extraction and one real training epoch against it
unmodified (VERDICT round 2, item 2).
"""
import os

import numpy as np
import pytest


@pytest.fixture()
def reference_h5_dir(tmp_path):
    h5py = pytest.importorskip("h5py")
    level_dir = tmp_path / "CdSpritesplus" / "level2"
    level_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    caps, imgs = [], []
    for size in ("big", "small"):            # product order like the ref
        for shape in ("square", "ellipse", "heart"):
            for _ in range(8):
                imgs.append(rng.integers(0, 256, (64, 64, 3), np.uint8))
                caps.append(f"{size} {shape}")
    for name in ("traindata.h5", "testdata.h5"):
        with h5py.File(level_dir / name, "w") as hf:
            # exactly the reference's calls: ndarray for images, a python
            # list of str for text (h5py stores it as vlen utf8)
            hf.create_dataset("image", data=np.asarray(imgs))
            hf.create_dataset("text", data=caps)
    return str(level_dir)


def test_reference_layout_loads(reference_h5_dir):
    from multimodal_vae_comparison_tpu.data.datasets import CDSPRITESPLUS

    pth = os.path.join(reference_h5_dir, "traindata.h5")
    ds = CDSPRITESPLUS(pth, os.path.join(reference_h5_dir, "testdata.h5"),
                       "image")
    data, masks = ds.get_data("train")
    assert data.shape == (48, 64, 64, 3)
    assert data.dtype == np.float32 and data.max() <= 1.0
    assert ds.level() == 2
    labels = ds.labels()
    assert labels[0] == ["big", "square"]

    txt = CDSPRITESPLUS(pth, None, "text")
    tdata, tmasks = txt.get_data("train")
    assert tdata.shape[0] == 48 and tdata.shape[2] == 27
    from multimodal_vae_comparison_tpu.data import text as text_utils
    decoded = text_utils.onehot2text(tdata[:1], tmasks[:1])
    assert decoded[0].strip() == "big square"


def test_reference_layout_trains_end_to_end(reference_h5_dir, tmp_path):
    """One real epoch (CLI config -> Trainer.fit) on the reference-layout h5."""
    from multimodal_vae_comparison_tpu.config import Config
    from multimodal_vae_comparison_tpu.training.trainer import Trainer

    cfg = Config({
        "batch_size": 8, "beta": 1, "dataset_name": "cdspritesplus",
        "epochs": 1, "exp_name": "ref_h5_smoke", "labels": None,
        "lr": 1e-3, "mixing": "moe", "n_latents": 4, "obj": "elbo",
        "optimizer": "adam", "pre_trained": None, "seed": 1,
        "test_split": 0.2, "viz_freq": 100,
        "mPath": str(tmp_path / "run"),
        "modality_1": {"decoder": "CNN", "encoder": "CNN2",
                       "mod_type": "image", "prior": "normal",
                       "private_latents": None, "recon_loss": "bce",
                       "path": os.path.join(reference_h5_dir, "traindata.h5"),
                       "test_datapath": os.path.join(reference_h5_dir,
                                                     "testdata.h5")},
        "modality_2": {"decoder": "TxtTransformer", "encoder": "TxtTransformer",
                       "mod_type": "text", "prior": "normal",
                       "private_latents": None, "recon_loss": "category_ce",
                       "path": os.path.join(reference_h5_dir, "traindata.h5"),
                       "test_datapath": os.path.join(reference_h5_dir,
                                                     "testdata.h5")},
    })
    trainer = Trainer(cfg, enable_viz=False)
    history = trainer.fit(epochs=1, log_fn=None)
    assert np.isfinite(history["train_loss"])
