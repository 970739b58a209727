"""Pretrained-weight installation for the flax trunks.

The reference loads torchvision checkpoints at construction time:

* ``Enc_CNN``: ImageNet ResNet-50 (reference encoders.py:108-113,
  ``resnet50(weights=ResNet50_Weights.IMAGENET1K_V1)``);
* ``VGG19`` feature extractor for the perceptual ``feature_loss``
  (reference nn_modules.py:1100-1106, ``vgg19-dcbb9e9d.pth``);
* ``Enc_VIT`` is built with ``vit_b_16(image_size=64)`` and **no** weights
  argument (encoders.py:144) — i.e. random init in the reference too, so
  there is nothing to convert for it.

This environment has no network and no torchvision, so installation is
opportunistic: drop torchvision-format checkpoints (``.pt``/``.pth`` readable
by ``torch.load`` or ``.npz``) into the weights directory and they are
converted into the flax parameter trees; otherwise everything falls back to
the documented random init.

Weights directory resolution: ``$MVAE_TPU_WEIGHTS_DIR`` if set, else
``<repo>/weights``.  Expected file names: ``resnet50.{pt,pth,npz}``,
``vgg19.{pt,pth,npz}``.

The converters are pure functions over ``{name: ndarray}`` state dicts and
are unit-tested on synthetic state dicts (tests/test_weights.py).
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def weights_dir() -> str:
    return os.environ.get("MVAE_TPU_WEIGHTS_DIR",
                          os.path.join(_REPO_ROOT, "weights"))


def find_weights_file(name: str) -> Optional[str]:
    for ext in (".pt", ".pth", ".npz"):
        p = os.path.join(weights_dir(), name + ext)
        if os.path.isfile(p):
            return p
    return None


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch-serialized or npz state dict into numpy arrays."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: np.asarray(z[k]) for k in z.files}
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv2d OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _dense_kernel(w: np.ndarray) -> np.ndarray:
    """torch Linear (out, in) -> flax (in, out)."""
    return np.transpose(w, (1, 0))


def _fbn(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """torchvision BatchNorm2d entry -> FrozenBatchNorm params."""
    return {"scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
            "bias": np.asarray(sd[f"{prefix}.bias"], np.float32),
            "mean": np.asarray(sd[f"{prefix}.running_mean"], np.float32),
            "var": np.asarray(sd[f"{prefix}.running_var"], np.float32)}


# ---------------------------------------------------------------------------
# VGG19 (feature_loss extractor + VGG-FID features)
# ---------------------------------------------------------------------------

def convert_vgg19(sd: Dict[str, np.ndarray],
                  n_convs: int = 8) -> Dict[str, Any]:
    """torchvision ``vgg19`` state dict -> VGGFeatures params.

    VGGFeatures' default cfg mirrors vgg19's first ``n_convs`` conv layers
    (64,64,M,128,128,M,256x4,M); torchvision names them
    ``features.{0,2,5,7,10,12,14,16}.{weight,bias}`` in definition order.
    """
    conv_keys = sorted(
        (int(k.split(".")[1]) for k in sd
         if k.startswith("features.") and k.endswith(".weight")
         and sd[k].ndim == 4))
    assert len(conv_keys) >= n_convs, (
        f"vgg19 state dict has {len(conv_keys)} convs, need {n_convs}")
    params = {}
    for i, idx in enumerate(conv_keys[:n_convs]):
        params[f"Conv_{i}"] = {
            "kernel": _conv_kernel(np.asarray(sd[f"features.{idx}.weight"],
                                              np.float32)),
            "bias": np.asarray(sd[f"features.{idx}.bias"], np.float32),
        }
    return {"params": params}


# ---------------------------------------------------------------------------
# ResNet-50 (Enc_CNN trunk)
# ---------------------------------------------------------------------------

def convert_resnet50(sd: Dict[str, np.ndarray],
                     stage_sizes: Tuple[int, ...] = (3, 4, 6, 3)
                     ) -> Dict[str, Any]:
    """torchvision ``resnet50`` state dict -> nets.ResNet50 params.

    Structure map (torchvision -> flax auto-names inside ResNet50):
      conv1/bn1            -> Conv_0 / FrozenBatchNorm_0
      layer{s+1}.{j}       -> BottleneckBlock_{sum(stage_sizes[:s]) + j}
        conv{1..3}/bn{1..3}  -> Conv_{0..2} / FrozenBatchNorm_{0..2}
        downsample.0/.1      -> Conv_3 / FrozenBatchNorm_3
      fc                   -> Dense_0
    """
    out: Dict[str, Any] = {
        "Conv_0": {"kernel": _conv_kernel(np.asarray(sd["conv1.weight"],
                                                     np.float32))},
        "FrozenBatchNorm_0": _fbn(sd, "bn1"),
        "Dense_0": {"kernel": _dense_kernel(np.asarray(sd["fc.weight"],
                                                       np.float32)),
                    "bias": np.asarray(sd["fc.bias"], np.float32)},
    }
    blk = 0
    for s, n_blocks in enumerate(stage_sizes):
        for j in range(n_blocks):
            t = f"layer{s + 1}.{j}"
            block: Dict[str, Any] = {}
            for c in range(3):
                block[f"Conv_{c}"] = {"kernel": _conv_kernel(
                    np.asarray(sd[f"{t}.conv{c + 1}.weight"], np.float32))}
                block[f"FrozenBatchNorm_{c}"] = _fbn(sd, f"{t}.bn{c + 1}")
            if f"{t}.downsample.0.weight" in sd:
                block["Conv_3"] = {"kernel": _conv_kernel(
                    np.asarray(sd[f"{t}.downsample.0.weight"], np.float32))}
                block["FrozenBatchNorm_3"] = _fbn(sd, f"{t}.downsample.1")
            out[f"BottleneckBlock_{blk}"] = block
            blk += 1
    return {"params": out}


# ---------------------------------------------------------------------------
# InceptionV3 (FID features; reference fid_score.py uses pool3)
# ---------------------------------------------------------------------------

def convert_inception(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torchvision ``inception_v3`` state dict -> models/inception.InceptionV3
    params.  flax submodule names mirror the torch module paths, so this is a
    mechanical key walk; fc/AuxLogits are dropped (pool3 features only)."""
    out: Dict[str, Any] = {}

    def put(path, leaf, value):
        node = out
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = value

    for key, val in sd.items():
        parts = key.split(".")
        if parts[0] in ("fc", "AuxLogits") or parts[-1] == "num_batches_tracked":
            continue
        val = np.asarray(val, np.float32)
        mod, leaf = parts[:-1], parts[-1]
        if mod[-1] == "conv" and leaf == "weight":
            put(mod, "kernel", _conv_kernel(val))
        elif mod[-1] == "bn":
            name = {"weight": "scale", "bias": "bias",
                    "running_mean": "mean", "running_var": "var"}[leaf]
            put(mod, name, val)
        else:
            raise KeyError(f"unexpected inception_v3 entry {key}")
    return {"params": out}


def inception_feature_params() -> Optional[Dict[str, Any]]:
    """Converted InceptionV3 params, or None when no weights file exists."""
    path = find_weights_file("inception_v3")
    if path is None:
        return None
    return convert_inception(load_state_dict(path))


# ---------------------------------------------------------------------------
# Installation into live parameter trees
# ---------------------------------------------------------------------------

def _check_and_merge(dst: Dict, src: Dict, path: str = "") -> Dict:
    """Recursively replace leaves of ``dst`` present in ``src``; shapes must
    match exactly (no silent truncation)."""
    merged = dict(dst)
    for k, v in src.items():
        if k not in merged:
            raise KeyError(f"converted weights have unknown entry {path}/{k}")
        if isinstance(v, dict):
            merged[k] = _check_and_merge(merged[k], v, f"{path}/{k}")
        else:
            have = np.asarray(merged[k])
            if have.shape != v.shape:
                raise ValueError(
                    f"shape mismatch at {path}/{k}: model {have.shape} vs "
                    f"checkpoint {v.shape}")
            merged[k] = v.astype(have.dtype)
    return merged


def _find_subtrees(tree: Any, key_name: str, path=()) -> List[Tuple[tuple, Dict]]:
    """All subtrees whose dict key starts with ``key_name`` (flax auto-names
    modules ``ResNet50_0`` etc.)."""
    found = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            if isinstance(k, str) and k.startswith(key_name):
                found.append((path + (k,), v))
            if isinstance(v, dict):
                found.extend(_find_subtrees(v, key_name, path + (k,)))
    return found


def _replace_at(tree: Dict, path: tuple, value: Any) -> Dict:
    if not path:
        return value
    out = dict(tree)
    out[path[0]] = _replace_at(tree[path[0]], path[1:], value)
    return out


def install_pretrained(variables: Dict[str, Any],
                       verbose: bool = True) -> Tuple[Dict[str, Any], List[str]]:
    """Install any available converted trunks into a model's variables tree.

    Scans for ``ResNet50_*`` subtrees and replaces them with converted
    torchvision weights when ``resnet50.{pt,pth,npz}`` exists in the weights
    dir.  Returns (variables, report-lines); a no-op without weights files.
    """
    report: List[str] = []
    path = find_weights_file("resnet50")
    if path is not None:
        sd = load_state_dict(path)
        converted = convert_resnet50(sd)["params"]
        for subpath, subtree in _find_subtrees(variables, "ResNet50_"):
            merged = _check_and_merge(subtree, converted,
                                      "/".join(map(str, subpath)))
            variables = _replace_at(variables, subpath, merged)
            report.append(f"installed resnet50 weights at "
                          f"{'/'.join(map(str, subpath))} from {path}")
    if verbose:
        for line in report:
            print(f"[weights] {line}")
    return variables, report


def vgg19_feature_params() -> Optional[Dict[str, Any]]:
    """Converted VGG19 params for the perceptual extractor, or None when no
    weights file is present (callers fall back to fixed random features)."""
    path = find_weights_file("vgg19")
    if path is None:
        return None
    return convert_vgg19(load_state_dict(path))
