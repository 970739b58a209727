"""End-to-end visualization-path tests (reference trainer.py:156-178).

The trainer swallows viz exceptions by design ('viz must never kill
training'), so a broken viz path fails silently in production — these tests
call the viz functions directly, where errors propagate.  Regression target:
save_joint_samples/decode_mod crashed on private-latent (DMVAE) models and
every traversal was silently skipped.
"""
import os

import numpy as np

from multimodal_vae_comparison_tpu.config import Config
from multimodal_vae_comparison_tpu.training.trainer import Trainer
from multimodal_vae_comparison_tpu.visualization import (
    analyse_data, save_joint_samples, save_reconstructions)


def _cfg(tmp_path, **over):
    params = {
        "batch_size": 8, "epochs": 1, "exp_name": "viz", "lr": 1e-3,
        "mixing": "moe", "n_latents": 4, "obj": "elbo", "optimizer": "adam",
        "seed": 1, "test_split": 0.25, "viz_freq": 1,
        "dataset_name": "synthetic", "labels": None,
        "modality_1": {"encoder": "FNN", "decoder": "FNN", "mod_type": "image",
                       "path": "32", "recon_loss": "bce"},
        "modality_2": {"encoder": "FNN", "decoder": "FNN", "mod_type": "image",
                       "path": "32", "recon_loss": "bce"},
    }
    params.update(over)
    return Config(params, results_root=str(tmp_path))


def _run_viz(tmp_path, cfg):
    trainer = Trainer(cfg, enable_viz=False)
    trainer.fit(epochs=1, log_fn=None)
    epoch_dir = os.path.join(cfg.mPath, "visuals", "epoch_0")
    os.makedirs(epoch_dir, exist_ok=True)
    save_reconstructions(trainer, epoch_dir, n=4)
    save_joint_samples(trainer, epoch_dir, n=4)
    analyse_data(trainer, epoch_dir, max_points=32)
    return epoch_dir


def test_viz_outputs_written(tmp_path):
    epoch_dir = _run_viz(tmp_path, _cfg(tmp_path))
    files = os.listdir(epoch_dir)
    assert any(f.startswith("recon_from_") for f in files), files
    assert any(f.startswith("traversals_") for f in files), files
    assert any(f.startswith("joint_samples_") for f in files), files


def test_viz_works_with_private_latents(tmp_path):
    """Regression: decode_mod must accept shared-only prior samples on a
    factorized (DMVAE) model — traversals/joint samples were silently
    skipped for every private-latent run."""
    cfg = _cfg(
        tmp_path, mixing="dmvae",
        modality_1={"encoder": "FNN", "decoder": "FNN", "mod_type": "image",
                    "path": "32", "recon_loss": "bce", "private_latents": 3},
        modality_2={"encoder": "FNN", "decoder": "FNN", "mod_type": "image",
                    "path": "32", "recon_loss": "bce", "private_latents": 3})
    epoch_dir = _run_viz(tmp_path, cfg)
    files = os.listdir(epoch_dir)
    assert any(f.startswith("traversals_") for f in files), files
    assert any(f.startswith("joint_samples_") for f in files), files
