"""CLI to (re)train benchmark judge classifiers.

Analog of multimodal_compare/eval/train_classifiers.py's training entry
points: per-attribute CdSprites+ image classifiers and the SPRITES action
video classifier.  Usage:

    python -m multimodal_vae_comparison_tpu.eval.train_classifiers \
        --dataset cdspritesplus --path data/level2/traindata.h5 --level 2

Cache names carry the evals' current ``_v2``/``_v3`` suffix (judges trained
under the holdout recipe), and a 15% slice of the provided file is held out
for the printed accuracy — a judge scored on its own training data reads
deceptively high (the round-2 SPRITES incident).  The provided file should
be the TRAINING file; judged evals calibrate on ``test_datapath``/val data,
which must stay disjoint from it.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from multimodal_vae_comparison_tpu.eval.classifiers import (
    CNNClassifier, VideoClassifier, classifier_accuracy, save_classifier,
    train_classifier)


def _holdout_split(n: int, seed: int = 0):
    """85/15 train/holdout index split for the printed accuracy."""
    order = np.random.default_rng(seed).permutation(n)
    n_hold = max(1, int(0.15 * n))
    return order[n_hold:], order[:n_hold]


def train_cdsprites(path: str, level: int, out_dir: str) -> None:
    from multimodal_vae_comparison_tpu.data.datasets import CDSPRITESPLUS
    from multimodal_vae_comparison_tpu.eval.eval_cdsprites import (
        CLASS_MAPPINGS, LEVEL_ATTRIBUTES, get_attribute)
    img_ds = CDSPRITESPLUS(path, None, "image")
    images, _ = img_ds.get_data("train")
    images = images.astype(np.float32)
    labels = img_ds.labels()
    texts = [" ".join(l) if isinstance(l, (list, tuple)) else str(l)
             for l in labels]
    tr, ho = _holdout_split(len(images))
    for att in LEVEL_ATTRIBUTES[level]:
        classes = CLASS_MAPPINGS[att]
        y = np.array([classes.index(get_attribute(att, t)) for t in texts])
        model = CNNClassifier(num_classes=len(classes))
        params = train_classifier(model, images[tr], y[tr], log_fn=print)
        acc = classifier_accuracy(model, params, images[ho], y[ho])
        # same name the evals load (eval_cdsprites.get_all_classifiers)
        out = os.path.join(
            out_dir, f"cdspritesplus_classifier_level{level}_{att}_v2.pkl")
        save_classifier(params, out)
        print(f"{att}: holdout acc {acc:.3f} -> {out}")


def train_sprites(path: str, out_dir: str) -> None:
    from multimodal_vae_comparison_tpu.data.datasets import SPRITES
    frames_ds = SPRITES(path, None, "frames")
    actions_ds = SPRITES(path, None, "actions")
    frames, _ = frames_ds.get_data("train")
    actions, _ = actions_ds.get_data("train")
    frames = frames.astype(np.float32)
    y = np.argmax(actions, -1)
    tr, ho = _holdout_split(len(frames))
    model = VideoClassifier(num_classes=9)
    params = train_classifier(model, frames[tr], y[tr], log_fn=print)
    acc = classifier_accuracy(model, params, frames[ho], y[ho])
    # same name the eval loads (eval_sprites._action_classifier)
    out = os.path.join(out_dir, "sprites_action_clf_v2.pkl")
    save_classifier(params, out)
    print(f"actions: holdout acc {acc:.3f} -> {out}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", required=True,
                        choices=["cdspritesplus", "sprites"])
    parser.add_argument("--path", required=True)
    parser.add_argument("--level", type=int, default=1)
    parser.add_argument("--out_dir", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "classifiers"))
    args = parser.parse_args()
    if args.dataset == "cdspritesplus":
        train_cdsprites(args.path, args.level, args.out_dir)
    else:
        train_sprites(args.path, args.out_dir)


if __name__ == "__main__":
    main()
