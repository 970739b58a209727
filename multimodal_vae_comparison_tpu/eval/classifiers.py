"""Attribute classifiers used by the automatic benchmarks.

Flax re-design of the reference classifier module
(multimodal_compare/eval/train_classifiers.py): a conv image classifier per
attribute (shape/size/color/position/background for CdSprites+, digits for
MNIST-SVHN) and a video classifier for SPRITES.  The reference ships
pretrained ``.pth`` files; offline we *train* classifiers on the dataset
itself via ``train_classifier`` and cache the params beside the data — the
eval scripts auto-train on first use.
"""
from __future__ import annotations

import os
import pickle
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn


class CNNClassifier(nn.Module):
    """4-conv image classifier (reference train_classifiers.py:59-123).

    ``heads > 0`` returns (B, heads, num_classes) logits — a multi-attribute
    judge (e.g. the 4 binary CelebA attributes at once)."""

    num_classes: int
    hid_channels: int = 32
    hidden_dim: int = 256
    heads: int = 0

    @nn.compact
    def __call__(self, x):
        h = x
        for _ in range(4):
            h = nn.relu(nn.Conv(self.hid_channels, (4, 4), strides=2,
                                padding=1)(h))
        h = h.reshape(h.shape[0], -1)
        h = nn.relu(nn.Dense(self.hidden_dim)(h))
        if self.heads:
            out = nn.Dense(self.heads * self.num_classes)(h)
            return out.reshape(out.shape[0], self.heads, self.num_classes)
        return nn.Dense(self.num_classes)(h)


class VideoClassifier(nn.Module):
    """3D-conv video classifier (reference train_classifiers.py:12-57 uses a
    VideoGPT encoder; a conv3d stack gives the same judge role).

    ``heads > 0`` makes it a multi-attribute judge: logits come back as
    (B, heads, num_classes) — the reference's frame2attributes classifier
    (eval_sprites.py:60-62) predicts all 4 SPRITES attributes at once."""

    num_classes: int
    hidden: int = 32
    heads: int = 0

    @nn.compact
    def __call__(self, x):
        h = x
        for feats in (self.hidden, self.hidden * 2, self.hidden * 2):
            h = nn.relu(nn.Conv(feats, (3, 3, 3), strides=(1, 2, 2),
                                padding="SAME")(h))
        h = h.mean(axis=(1, 2, 3))
        h = nn.relu(nn.Dense(self.hidden * 4)(h))
        if self.heads:
            out = nn.Dense(self.heads * self.num_classes)(h)
            return out.reshape(out.shape[0], self.heads, self.num_classes)
        return nn.Dense(self.num_classes)(h)


class FrameAttributeClassifier(nn.Module):
    """Spatially-aware multi-head attribute judge on video frames (round 4).

    The round-3 VideoClassifier judge global-mean-pools over (T, H, W)
    before its dense head; SPRITES attributes are the colors of specific
    body parts (hair at the top of the sprite, pants at the bottom), so
    pooling away the spatial layout blends them — that judge calibrated at
    64.9% per-attribute on REAL frames and capped every judged metric.
    This judge classifies frame 0 (attributes are static across the clip)
    through stride-2 convs and a SPATIAL flatten, preserving where each
    color lives.  Role analog: reference frame2attributes
    (eval_sprites.py:60-62, train_classifiers.py:12-57)."""

    num_classes: int
    heads: int = 4
    hid_channels: int = 32
    hidden_dim: int = 256

    @nn.compact
    def __call__(self, x):
        h = x[:, 0] if x.ndim == 5 else x        # (B, H, W, C) frame 0
        for _ in range(4):
            h = nn.relu(nn.Conv(self.hid_channels, (4, 4), strides=2,
                                padding=1)(h))
        h = h.reshape(h.shape[0], -1)            # spatial flatten, no pool
        h = nn.relu(nn.Dense(self.hidden_dim)(h))
        out = nn.Dense(self.heads * self.num_classes)(h)
        return out.reshape(out.shape[0], self.heads, self.num_classes)


class ActionVideoClassifier(nn.Module):
    """Motion-aware action judge on video clips (round 5).

    The round-3 VideoClassifier action judge global-mean-pools over
    (T, H, W), blending away both the motion dynamics (walk vs slash vs
    spellcast) and the pose direction (front/left/right) that define the 9
    SPRITES action classes — it calibrated at 79.3% on real frames and
    capped actions→frames exactly there (RESULTS.md round 4).  Two fixes,
    mirroring the round-4 spatial-flatten attribute judge:

    * frame-to-frame temporal differences concatenate onto the input
      channels, handing the judge the motion field explicitly;
    * the conv stack downsamples but the head sees a full spatiotemporal
      FLATTEN (no global pool), preserving where and when the limbs move.

    Role analog: reference frame2action classifier
    (eval_sprites.py:50-58, train_classifiers.py:12-57)."""

    num_classes: int
    hid_channels: int = 32
    hidden_dim: int = 256

    @nn.compact
    def __call__(self, x):
        # (B, T, H, W, C) -> motion channels: x_t - x_{t-1}, zero for t=0
        delta = jnp.concatenate(
            [jnp.zeros_like(x[:, :1]), x[:, 1:] - x[:, :-1]], axis=1)
        h = jnp.concatenate([x, delta], axis=-1)
        for i, feats in enumerate((self.hid_channels, self.hid_channels * 2,
                                   self.hid_channels * 2)):
            t_stride = 1 if i == 0 else 2
            h = nn.relu(nn.Conv(feats, (3, 3, 3),
                                strides=(t_stride, 2, 2),
                                padding="SAME")(h))
        h = h.reshape(h.shape[0], -1)             # spatiotemporal flatten
        h = nn.relu(nn.Dense(self.hidden_dim)(h))
        return nn.Dense(self.num_classes)(h)


def train_classifier(model: nn.Module, images: np.ndarray, labels: np.ndarray,
                     epochs: int = 12, batch_size: int = 128, lr: float = 1e-3,
                     seed: int = 0, log_fn=None) -> Dict:
    """Train a classifier to convergence on (images, int labels).

    The whole epoch runs as one lax.scan (data staged on device once), so on
    remote-dispatch TPU setups the loop is one call per epoch, not one per
    batch.
    """
    rng = jax.random.PRNGKey(seed)
    params = model.init(rng, jnp.zeros((1,) + images.shape[1:]))
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    n = len(images)
    n_batches = max(n // batch_size, 1)
    usable = n_batches * min(batch_size, n)
    order = np.random.default_rng(seed).permutation(n)[:usable]
    x_dev = jnp.asarray(images[order]).reshape(
        n_batches, -1, *images.shape[1:])
    # labels may carry extra per-head dims, e.g. (N, 4) attribute targets
    y_dev = jnp.asarray(labels[order]).reshape(
        n_batches, -1, *labels.shape[1:])

    @jax.jit
    def epoch_fn(params, opt_state, xs, ys):
        # data arrives as arguments — closing over it would bake hundreds of
        # MB of constants into the program (oversized-compile failures)
        def body(carry, xy):
            params, opt_state = carry
            x, y = xy

            def loss_fn(p):
                logits = model.apply(p, x)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (xs, ys))
        return params, opt_state, jnp.mean(losses)

    for epoch in range(epochs):
        params, opt_state, loss = epoch_fn(params, opt_state, x_dev, y_dev)
        if log_fn:
            log_fn(f"classifier epoch {epoch}: loss={float(loss):.4f}")
    return params


def classifier_accuracy(model, params, images, labels,
                        batch_size: int = 256) -> float:
    correct = total = 0
    for b in range(0, len(images), batch_size):
        logits = model.apply(params, jnp.asarray(images[b:b + batch_size]))
        pred = np.argmax(np.asarray(logits), -1)
        lab = np.asarray(labels[b:b + batch_size])
        # normalize by label COUNT, not image count: a multi-head judge
        # ((B, heads) labels) contributes heads matches per image
        correct += int((pred == lab).sum())
        total += lab.size
    return correct / max(total, 1)


def judge_calibration(model, params, images, labels, name: str = "judge",
                      batch_size: int = 256) -> float:
    """Judge accuracy on held-out REAL labeled data, as a fraction.

    Every judged eval prints/stores this next to its judged metrics
    (VERDICT round 2, item 6): a judged coherence number is only meaningful
    relative to what the judge scores on real data — the round-2 SPRITES
    incident (a 28%-accurate judge flooring every judged metric) is the
    failure mode this guards against.
    """
    acc = classifier_accuracy(model, params, np.asarray(images),
                              np.asarray(labels), batch_size=batch_size)
    print(f"[judge] {name}_accuracy_real: {100 * acc:.1f}%")
    return acc


def predict(model, params, images, batch_size: int = 256) -> np.ndarray:
    preds = []
    for b in range(0, len(images), batch_size):
        logits = model.apply(params, jnp.asarray(images[b:b + batch_size]))
        preds.append(np.argmax(np.asarray(logits), -1))
    return np.concatenate(preds)


def save_classifier(params, path: str) -> None:
    """Atomic write (tmp + rename): an interrupted run must never leave a
    truncated cache that later loads as EOFError."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(jax.device_get(params), f)
    os.replace(tmp, path)


def load_classifier(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


def mods_by_type(exp) -> Dict[str, str]:
    """{mod_type -> modality name} from the run config (shared by every
    judged eval; later modality wins on duplicate mod_types)."""
    return {m.mod_type: m.name for m in exp.config.mods}


def digit_classifiers(exp, cache_dir: str, prefix: str,
                      num_classes: int = 10, epochs: int = 6) -> Dict:
    """One per-modality digit judge (MNIST-SVHN and PolyMNIST share this).

    Trains on the datamodule's TRAIN split with its aligned labels — NOT the
    raw file — so calibration on the val split is genuinely held out."""
    out = {}
    for i, name in enumerate(exp.mod_names):
        model = CNNClassifier(num_classes=num_classes)
        cache = os.path.join(cache_dir, f"{prefix}_digit_{name}_v2.pkl")

        def data_fn(i=i):
            data, _ = exp.datamod.split_arrays(i, "train")
            labels = np.asarray(exp.datamod.labels_train)
            return data.astype(np.float32), labels

        out[name] = (model, get_or_train_classifier(cache, model, data_fn,
                                                    epochs=epochs))
    return out


def get_or_train_classifier(cache_path: str, model: nn.Module,
                            data_fn: Callable[[], Tuple[np.ndarray, np.ndarray]],
                            **train_kwargs):
    """Load a cached classifier or train+cache one (offline replacement for
    the reference's downloaded ./eval/classifiers/*.pth).  A corrupt or
    truncated cache is discarded and retrained, not fatal."""
    if os.path.exists(cache_path):
        try:
            return load_classifier(cache_path)
        except Exception:
            os.remove(cache_path)
    images, labels = data_fn()
    params = train_classifier(model, images, labels, **train_kwargs)
    save_classifier(params, cache_path)
    return params
