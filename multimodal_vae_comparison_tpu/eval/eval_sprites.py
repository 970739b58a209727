"""SPRITES benchmark: cross/joint coherency via video+attribute classifiers.

Re-design of multimodal_compare/eval/eval_sprites.py (246 LoC): the
reference's pretrained VideoGPT judge classifiers
(sprites_classifier_frame2action/.../frame2attributes.pth, loaded at
eval_sprites.py:50-62) become auto-trained flax classifiers; coverage
mirrors the reference's four cross directions
(frames->actions, actions->frames, frames->atts, atts->frames,
calculate_cross_coherency eval_sprites.py:64-95), the two joint agreement
numbers (action-frame and attribute-frame, calculate_joint_coherency
eval_sprites.py:116-144) and the per-feature labelled t-SNE
(labelled_tsne eval_sprites.py:147-161).
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np

from multimodal_vae_comparison_tpu.eval.classifiers import (
    VideoClassifier, get_or_train_classifier, mods_by_type as _mods_by_type,
    predict)


def _frames_train_data(exp, mapping):
    # TRAIN split only: judge calibration scores the val split below
    frames_idx = exp.mod_names.index(mapping["frames"])
    frames, _ = exp.datamod.split_arrays(frames_idx, "train")
    return frames.astype(np.float32)


def _action_classifier(exp, cache_dir):
    mapping = _mods_by_type(exp)
    # round 5: motion-aware judge (temporal deltas + spatiotemporal flatten)
    # — the mean-pooled VideoClassifier capped calibration at 79.3% and
    # therefore actions→frames exactly there (ActionVideoClassifier docstring)
    from multimodal_vae_comparison_tpu.eval.classifiers import (
        ActionVideoClassifier)
    model = ActionVideoClassifier(num_classes=9)
    cache = os.path.join(cache_dir, "sprites_action_clf_v3.pkl")

    def data_fn():
        frames = _frames_train_data(exp, mapping)
        actions_idx = exp.mod_names.index(mapping["actions"])
        actions, _ = exp.datamod.split_arrays(actions_idx, "train")
        return frames, np.argmax(actions, -1)

    return model, get_or_train_classifier(cache, model, data_fn, epochs=30,
                                          lr=3e-4)


def _attribute_classifier(exp, cache_dir):
    """4-head judge over (skin, pants, top, hair), 6 classes each — the
    frame2attributes role (reference eval_sprites.py:60-62)."""
    mapping = _mods_by_type(exp)
    # round 4: spatial-flatten frame judge — the mean-pooled VideoClassifier
    # capped calibration at 64.9% (see FrameAttributeClassifier docstring)
    from multimodal_vae_comparison_tpu.eval.classifiers import (
        FrameAttributeClassifier)
    model = FrameAttributeClassifier(num_classes=6, heads=4)
    cache = os.path.join(cache_dir, "sprites_att_clf_v4.pkl")

    def data_fn():
        frames = _frames_train_data(exp, mapping)
        atts_idx = exp.mod_names.index(mapping["attributes"])
        atts, _ = exp.datamod.split_arrays(atts_idx, "train")
        return frames, np.argmax(atts, -1)  # (N, 4) integer targets

    # appearance attributes need a longer-trained judge than the action
    # one — 8 epochs left it at 28% per-attribute on real frames (chance
    # 17%), which floored every judged attribute metric
    return model, get_or_train_classifier(cache, model, data_fn, epochs=40,
                                          lr=3e-4)


def labelled_tsne(exp, n: int = 250) -> None:
    """Per-feature labelled t-SNE of each modality's latents
    (reference labelled_tsne, eval_sprites.py:147-161): one plot per label
    family — the 9 action/direction combos and each of the 4 attributes."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    mapping = _mods_by_type(exp)
    batch, _ = exp.get_test_samples(n)
    out = exp.forward(batch, present=tuple(exp.mod_names))
    actions = np.argmax(np.asarray(batch[mapping["actions"]]["data"]), -1)
    atts = np.argmax(np.asarray(batch[mapping["attributes"]]["data"]), -1)
    from multimodal_vae_comparison_tpu.data.datasets import SPRITES
    label_sets = [("action", [SPRITES.label_map[a] for a in actions])]
    for i, att_name in enumerate(SPRITES.attr_map):
        label_sets.append((att_name, [f"{att_name}_{v}" for v in atts[:, i]]))
    run_dir = getattr(exp, "run_dir", None) or exp.config.mPath
    vis_dir = os.path.join(run_dir, "visuals")
    os.makedirs(vis_dir, exist_ok=True)
    try:
        from sklearn.manifold import TSNE
    except Exception:
        return
    for nm in exp.mod_names:
        mo = out.mods[nm]
        if mo.latents is None:
            continue
        z = np.asarray(mo.latents[0])
        emb = TSNE(n_components=2, init="pca",
                   perplexity=min(30, max(2, len(z) // 4))).fit_transform(z)
        for fam, labs in label_sets:
            fig, ax = plt.subplots(figsize=(6, 6))
            for u in sorted(set(labs)):
                m = [i for i, l in enumerate(labs) if l == u]
                ax.scatter(emb[m, 0], emb[m, 1], s=8, label=u)
            ax.legend(fontsize=5, markerscale=0.6)
            fig.savefig(os.path.join(vis_dir, f"eval_tsne_{nm}_{fam}.png"),
                        dpi=120)
            plt.close(fig)


def sprites_eval(trainer_or_infer) -> Dict[str, float]:
    from multimodal_vae_comparison_tpu.eval.eval_cdsprites import _as_infer
    from multimodal_vae_comparison_tpu.utils import print_save_stats
    exp = _as_infer(trainer_or_infer)
    mapping = _mods_by_type(exp)
    cache_dir = os.environ.get("SPRITES_CLASSIFIER_DIR", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "classifiers"))
    act_model, act_params = _action_classifier(exp, cache_dir)
    att_model, att_params = _attribute_classifier(exp, cache_dir)
    n = min(int(os.environ.get("SPRITES_EVAL_SAMPLES", 500)),
            exp.datamod.n_val)
    batch, _ = exp.get_test_samples(n)
    actions_gt = np.argmax(np.asarray(batch[mapping["actions"]]["data"]), -1)
    atts_gt = np.argmax(np.asarray(batch[mapping["attributes"]]["data"]), -1)
    stats = {}
    # judge calibration: the 4-head judge's own accuracy on REAL frames —
    # bounds every judged attribute number below
    pred_real = predict(att_model, att_params,
                        np.asarray(batch[mapping["frames"]]["data"]))
    stats["att_judge_accuracy_real"] = float((pred_real == atts_gt).mean())
    print(f"[judge] sprites_att_judge_accuracy_real: "
          f"{100 * stats['att_judge_accuracy_real']:.1f}%")
    pred_real_act = predict(act_model, act_params,
                            np.asarray(batch[mapping["frames"]]["data"]))
    stats["action_judge_accuracy_real"] = float(
        (pred_real_act == actions_gt).mean())
    print(f"[judge] sprites_action_judge_accuracy_real: "
          f"{100 * stats['action_judge_accuracy_real']:.1f}%")
    # actions -> frames: video classifier judges the generated video's action
    recons = exp.cross_generate(mapping["actions"],
                                batch[mapping["actions"]]["data"])
    pred = predict(act_model, act_params, recons[mapping["frames"]])
    stats["actions_to_frames"] = float((pred == actions_gt).mean())
    # atts -> frames: 4-head judge; strict all-4 plus per-attribute mean
    recons = exp.cross_generate(mapping["attributes"],
                                batch[mapping["attributes"]]["data"])
    pred = predict(att_model, att_params, recons[mapping["frames"]])
    stats["atts_to_frames"] = float((pred == atts_gt).all(-1).mean())
    stats["atts_to_frames_mean"] = float((pred == atts_gt).mean())
    # frames -> actions / frames -> atts: argmax of the generated one-hots
    recons = exp.cross_generate(mapping["frames"],
                                batch[mapping["frames"]]["data"])
    pred_actions = np.argmax(recons[mapping["actions"]], -1)
    stats["frames_to_actions"] = float((pred_actions == actions_gt).mean())
    pred_atts = np.argmax(recons[mapping["attributes"]], -1)
    stats["frames_to_atts"] = float((pred_atts == atts_gt).all(-1).mean())
    stats["frames_to_atts_mean"] = float((pred_atts == atts_gt).mean())
    # joint coherence: do prior-sampled frames agree with the sampled
    # actions (action_frame) and attributes (att_frame)?
    joint = exp.joint_generate(min(n, 256))
    pred_f = predict(act_model, act_params, joint[mapping["frames"]])
    pred_a = np.argmax(joint[mapping["actions"]], -1)
    stats["joint_coherence"] = float((pred_f == pred_a).mean())
    pred_fa = predict(att_model, att_params, joint[mapping["frames"]])
    joint_atts = np.argmax(joint[mapping["attributes"]], -1)
    stats["joint_att_frame"] = float((pred_fa == joint_atts).mean())
    try:
        labelled_tsne(exp)
    except Exception:
        pass
    run_dir = getattr(exp, "run_dir", None) or exp.config.mPath
    if run_dir:
        print_save_stats({k: {"value": 100 * v, "stdev": None}
                          for k, v in stats.items()}, run_dir, "sprites")
    return stats
