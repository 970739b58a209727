"""MNIST-SVHN benchmark: latent digit classification + cross/joint coherency.

Re-design of multimodal_compare/eval/eval_mnistsvhn.py (219 LoC):
* latent digit accuracy — a linear probe trained on posterior means
  (reference trains a tiny MLP, eval_mnistsvhn.py:24-69);
* cross-coherence — generate SVHN from MNIST (and vice versa), judge digits
  with per-modality image classifiers trained on the dataset itself
  (reference downloads pretrained ones, :122-156);
* joint coherence — decode prior samples with both decoders and check the
  judged digits agree (:157-183).
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np

from multimodal_vae_comparison_tpu.eval.classifiers import (
    digit_classifiers, judge_calibration, predict)


def latent_digit_accuracy(exp, n: int = 2000) -> float:
    """Linear probe on joint-posterior means vs digit labels."""
    from sklearn.linear_model import LogisticRegression
    batch, labels = exp.get_test_samples(min(n, exp.datamod.n_val))
    out = exp.forward({m: batch[m] for m in exp.mod_names},
                      present=tuple(exp.mod_names))
    any_mod = out.mods[exp.mod_names[0]]
    q = any_mod.joint_dist or any_mod.encoder_dist
    z = np.asarray(q.loc)
    y = np.asarray(labels[: len(z)])
    # the pairing index files are class-ordered (pair_indices walks digits
    # 0..9), so shuffle before the 80/20 split or train/test see disjoint
    # label sets
    perm = np.random.default_rng(0).permutation(len(z))
    z, y = z[perm], y[perm]
    n_train = int(0.8 * len(z))
    clf = LogisticRegression(max_iter=500).fit(z[:n_train], y[:n_train])
    return float(clf.score(z[n_train:], y[n_train:]))


def _digit_classifiers(exp, cache_dir: str):
    # shared with PolyMNIST; trains on the TRAIN split only so the val-split
    # calibration below is genuinely held out
    return digit_classifiers(exp, cache_dir, prefix="mnistsvhn")


def cross_coherence(exp, classifiers, n: int = 1000) -> Dict[str, float]:
    batch, labels = exp.get_test_samples(min(n, exp.datamod.n_val))
    y = np.asarray(labels[: len(batch[exp.mod_names[0]]["data"])])
    accs = {}
    for src in exp.mod_names:
        recons = exp.cross_generate(src, batch[src]["data"])
        for tgt in exp.mod_names:
            if tgt == src:
                continue
            model, params = classifiers[tgt]
            pred = predict(model, params, recons[tgt])
            accs[f"{src}_to_{tgt}"] = float((pred == y).mean())
    return accs


def joint_coherence(exp, classifiers, n: int = 1000) -> float:
    recons = exp.joint_generate(n)
    preds = []
    for name in exp.mod_names:
        model, params = classifiers[name]
        preds.append(predict(model, params, recons[name]))
    agree = np.mean([np.mean(preds[0] == p) for p in preds[1:]])
    return float(agree)


def mnistsvhn_eval(trainer_or_infer) -> Dict[str, float]:
    from multimodal_vae_comparison_tpu.eval.eval_cdsprites import _as_infer
    from multimodal_vae_comparison_tpu.utils import print_save_stats
    exp = _as_infer(trainer_or_infer)
    cache_dir = os.environ.get("MNISTSVHN_CLASSIFIER_DIR", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "classifiers"))
    classifiers = _digit_classifiers(exp, cache_dir)
    stats = {"latent_accuracy": latent_digit_accuracy(exp)}
    # judge calibration on held-out REAL pairs (VERDICT r2 item 6)
    batch, labels = exp.get_test_samples(min(500, exp.datamod.n_val))
    y = np.asarray(labels[: len(batch[exp.mod_names[0]]["data"])])
    for name in exp.mod_names:
        model, params = classifiers[name]
        stats[f"{name}_judge_accuracy_real"] = judge_calibration(
            model, params, np.asarray(batch[name]["data"]), y,
            name=f"mnistsvhn_{name}")
    stats.update(cross_coherence(exp, classifiers))
    stats["joint_coherence"] = joint_coherence(exp, classifiers)
    run_dir = getattr(exp, "run_dir", None) or exp.config.mPath
    if run_dir:
        print_save_stats({k: {"value": 100 * v, "stdev": None}
                          for k, v in stats.items()}, run_dir, "mnist_svhn")
    return stats
