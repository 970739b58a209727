"""FashionMNIST benchmark: label<->image coherence + latent probe.

The reference trains FashionMNIST bimodal (datasets.py:749-810) without a
bundled eval; this applies the standard judge-then-agree protocol with a
10-class garment judge, plus the linear latent probe shared with
eval_mnistsvhn.py.
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np

from multimodal_vae_comparison_tpu.eval.classifiers import (
    CNNClassifier, get_or_train_classifier, judge_calibration,
    mods_by_type as _mods_by_type, predict)
from multimodal_vae_comparison_tpu.eval.eval_mnistsvhn import (
    latent_digit_accuracy)


def fashionmnist_eval(trainer_or_infer) -> Dict[str, float]:
    from multimodal_vae_comparison_tpu.eval.eval_cdsprites import _as_infer
    from multimodal_vae_comparison_tpu.utils import print_save_stats
    exp = _as_infer(trainer_or_infer)
    mapping = _mods_by_type(exp)
    cache_dir = os.environ.get("FASHIONMNIST_CLASSIFIER_DIR", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "classifiers"))
    img_idx = exp.mod_names.index(mapping["image"])
    model = CNNClassifier(num_classes=10)
    cache = os.path.join(cache_dir, "fashionmnist_clf_v2.pkl")

    def data_fn():
        # TRAIN split only: the calibration below scores the val split
        imgs, _ = exp.datamod.split_arrays(img_idx, "train")
        labels = np.asarray(exp.datamod.labels_train)
        return imgs.astype(np.float32), labels

    params = get_or_train_classifier(cache, model, data_fn, epochs=6)
    n = min(500, exp.datamod.n_val)
    batch, _ = exp.get_test_samples(n)
    y = np.argmax(np.asarray(batch[mapping["label"]]["data"]), -1)
    stats = {"latent_accuracy": latent_digit_accuracy(exp)}
    # judge calibration on held-out REAL images (VERDICT r2 item 6)
    stats["judge_accuracy_real"] = judge_calibration(
        model, params, np.asarray(batch[mapping["image"]]["data"]), y,
        name="fashionmnist")
    recons = exp.cross_generate(mapping["label"],
                                batch[mapping["label"]]["data"])
    pred = predict(model, params, recons[mapping["image"]])
    stats["label_to_image"] = float((pred == y).mean())
    recons = exp.cross_generate(mapping["image"],
                                batch[mapping["image"]]["data"])
    stats["image_to_label"] = float(
        (np.argmax(recons[mapping["label"]], -1) == y).mean())
    joint = exp.joint_generate(min(n, 256))
    pred_img = predict(model, params, joint[mapping["image"]])
    stats["joint_coherence"] = float(
        (pred_img == np.argmax(joint[mapping["label"]], -1)).mean())
    run_dir = getattr(exp, "run_dir", None) or exp.config.mPath
    if run_dir:
        print_save_stats({k: {"value": 100 * v, "stdev": None}
                          for k, v in stats.items()}, run_dir, "fashionmnist")
    return stats
