"""SPRITES benchmark: cross/joint coherency via video+attribute classifiers.

Re-design of multimodal_compare/eval/eval_sprites.py (246 LoC): pretrained
VideoGPT classifiers become auto-trained flax classifiers; coherency is
frames<->actions and frames<->attributes agreement, plus joint coherence from
prior samples.
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np

from multimodal_vae_comparison_tpu.eval.classifiers import (
    VideoClassifier, get_or_train_classifier, predict)


def _mods_by_type(exp):
    mapping = {}
    for i, m in enumerate(exp.config.mods):
        mapping[m.mod_type] = m.name
    return mapping


def _action_classifier(exp, cache_dir):
    mapping = _mods_by_type(exp)
    frames_idx = exp.mod_names.index(mapping["frames"])
    model = VideoClassifier(num_classes=9)
    cache = os.path.join(cache_dir, "sprites_action_clf.pkl")

    def data_fn():
        frames, _ = exp.datamod.datasets[frames_idx].get_data("train")
        actions_idx = exp.mod_names.index(mapping["actions"])
        actions, _ = exp.datamod.datasets[actions_idx].get_data("train")
        return frames.astype(np.float32), np.argmax(actions, -1)

    return model, get_or_train_classifier(cache, model, data_fn, epochs=6)


def sprites_eval(trainer_or_infer) -> Dict[str, float]:
    from multimodal_vae_comparison_tpu.eval.eval_cdsprites import _as_infer
    from multimodal_vae_comparison_tpu.utils import print_save_stats
    exp = _as_infer(trainer_or_infer)
    mapping = _mods_by_type(exp)
    cache_dir = os.environ.get("SPRITES_CLASSIFIER_DIR", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "classifiers"))
    model, params = _action_classifier(exp, cache_dir)
    n = min(int(os.environ.get("SPRITES_EVAL_SAMPLES", 500)),
            exp.datamod.n_val)
    batch, _ = exp.get_test_samples(n)
    actions_gt = np.argmax(np.asarray(batch[mapping["actions"]]["data"]), -1)
    stats = {}
    # actions -> frames: classifier judges generated video's action
    recons = exp.cross_generate(mapping["actions"],
                                batch[mapping["actions"]]["data"])
    pred = predict(model, params, recons[mapping["frames"]])
    stats["actions_to_frames"] = float((pred == actions_gt).mean())
    # frames -> actions: argmax of generated action one-hot
    recons = exp.cross_generate(mapping["frames"],
                                batch[mapping["frames"]]["data"])
    pred_actions = np.argmax(recons[mapping["actions"]], -1)
    stats["frames_to_actions"] = float((pred_actions == actions_gt).mean())
    # joint coherence: do prior-sampled frames and actions agree?
    joint = exp.joint_generate(min(n, 256))
    pred_f = predict(model, params, joint[mapping["frames"]])
    pred_a = np.argmax(joint[mapping["actions"]], -1)
    stats["joint_coherence"] = float((pred_f == pred_a).mean())
    run_dir = getattr(exp, "run_dir", None) or exp.config.mPath
    if run_dir:
        print_save_stats({k: {"value": 100 * v, "stdev": None}
                          for k, v in stats.items()}, run_dir, "sprites")
    return stats
