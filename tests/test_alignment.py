"""Cross-modal alignment regression test.

Trains a tiny bimodal MoE on the synthetic dataset and asserts that
image->text cross-generation beats chance by a wide margin.  This guards the
class of bug where self-reconstruction is perfect but cross-generation is
broken (e.g. the train/generation mask mismatch in decoder self-attention
fixed in models/decoders.py:_time_query_decode).
"""
import numpy as np

from multimodal_vae_comparison_tpu.config import Config
from multimodal_vae_comparison_tpu.data import text as tu
from multimodal_vae_comparison_tpu.eval.eval_cdsprites import _as_infer
from multimodal_vae_comparison_tpu.training.trainer import Trainer


def test_cross_generation_beats_chance(tmp_path):
    cfg = Config({
        "batch_size": 32, "epochs": 40, "exp_name": "align", "lr": 1e-3,
        "mixing": "moe", "n_latents": 12, "obj": "elbo", "optimizer": "adam",
        "seed": 1, "test_split": 0.1, "viz_freq": 1000,
        "dataset_name": "synthetic", "labels": None,
        "modality_1": {"encoder": "FNN", "decoder": "FNN", "mod_type": "image",
                       "path": "256", "recon_loss": "bce",
                       "llik_scaling": "auto"},
        "modality_2": {"encoder": "TxtTransformer",
                       "decoder": "TxtTransformer", "mod_type": "text",
                       "path": "256", "recon_loss": "category_ce",
                       "llik_scaling": "auto"},
    }, results_root=str(tmp_path))
    trainer = Trainer(cfg, enable_viz=False)
    trainer.fit(log_fn=None)
    exp = _as_infer(trainer)
    batch, _ = exp.get_test_samples(16)
    rec = exp.cross_generate("mod_1", batch["mod_1"]["data"])
    pred = tu.onehot2text(rec["mod_2"])
    gt = tu.onehot2text(np.asarray(batch["mod_2"]["data"]),
                        np.asarray(batch["mod_2"]["masks"]))
    acc = np.mean([sum(a == b for a, b in zip(p, g)) / len(g)
                   for p, g in zip(pred, gt)])
    # chance letter accuracy over the 27-symbol alphabet is < 0.1
    assert acc > 0.3, f"img->txt letter acc {acc:.3f}; sample {pred[0]!r} vs {gt[0]!r}"