"""VILANRO latent-grounding probes: localize *why* a trained trimodal model
misses in closed-loop, below the level of the success rate.

The reference evaluates VILANRO models only by replay success
(multimodal_compare/models/vilanro_test.py:277-346); when a model scores low
that number says nothing about which link failed — image encoding, language
grounding, or the multimodal fusion.  This module adds three diagnostics
(no reference counterpart; introduced during the round-3 failure analysis):

1. **Linear latent probes** (ridge / logistic on posterior means):
   - image-only z  -> all object positions     (does the encoder see geometry?)
   - language-only z -> goal color             (does the encoder read language?)
   - joint z       -> object positions         (does fusion preserve geometry?)
   - joint z       -> goal offset              (is the *task quantity* present?)
2. **Instruction-flip probe**: re-infer the action endpoint with the
   instruction rewritten to name the distractor; the endpoint displacement
   measures how much the language modality actually steers the plan.
3. **Endpoint-magnitude calibration**: predicted-endpoint norm vs true goal
   offset norm (regression-to-the-mean shrink) and their cosine alignment.

    python -m multimodal_vae_comparison_tpu.eval.vilanro_probe \
        --model results/vilanro_r3_way_p2c/version_0 --scenes 400
"""
from __future__ import annotations

import argparse
from typing import Dict, List, Tuple

import numpy as np

from multimodal_vae_comparison_tpu.lanro.env import make


def modality_roles(exp) -> Dict[str, str]:
    """Map semantic roles -> modality names from the run config (the same
    resolution vilanro_test.infer_loop does)."""
    mapping = {m.mod_type: m.name for m in exp.config.mods}
    act_type = next((t for t in ("actions", "action_tokens",
                                 "action_waypoints") if t in mapping), None)
    roles = {
        "language": mapping.get("language"),
        "action": mapping.get(act_type) if act_type else None,
        "action_type": act_type,
        "image": mapping.get("front RGB") or mapping.get("image"),
    }
    assert roles["language"] and roles["action"] and roles["image"], (
        f"expected language/actions/front RGB modalities, got {mapping}")
    return roles


def instruction_encoder(exp, lang_mod: str):
    """One-hot + mask encoder over the run's frozen training vocab."""
    lang_idx = int(lang_mod.split("_")[1]) - 1
    vocab = exp.datamod.datasets[lang_idx].vocab
    max_len = exp.config.mods[lang_idx].feature_dims[0]

    def encode(instruction: str):
        words = [w for w in instruction.split(" ") if w in vocab]
        idx = np.zeros((max_len,), np.int64)
        mask = np.zeros((max_len,), bool)
        for i, w in enumerate(words[:max_len]):
            idx[i] = vocab.index(w)
            mask[i] = True
        return np.eye(len(vocab), dtype=np.float32)[idx], mask

    return encode


def collect_scenes(env_id: str, n: int, seed: int,
                   img_size: int = 64) -> Dict[str, np.ndarray]:
    """Reset n fresh scenes and record observations + ground truth."""
    imgs, instrs, flips = [], [], []
    obj_pos, goal_off, goal_color = [], [], []
    colors: List[str] = []
    for t in range(n):
        env = make(env_id, seed=seed + 7919 * t, img_size=img_size)
        obs = env.reset()
        goal = env.sim.objects[env.goal_idx]
        others = [o for i, o in enumerate(env.sim.objects)
                  if i != env.goal_idx]
        imgs.append(obs["rgb"].astype(np.float32) / 255.0)
        instrs.append(obs["instruction"])
        # rewrite the instruction to name a distractor (grounding probe)
        flip = obs["instruction"]
        if others:
            flip = (flip.replace(goal.color, others[0].color)
                        .replace(goal.shape, others[0].shape))
        flips.append(flip)
        obj_pos.append(np.concatenate([o.pos for o in env.sim.objects]))
        goal_off.append(np.asarray(goal.pos) - np.asarray(env.sim.ee))
        if goal.color not in colors:
            colors.append(goal.color)
        goal_color.append(colors.index(goal.color))
    return {
        "imgs": np.stack(imgs), "instrs": instrs, "flips": flips,
        "obj_pos": np.stack(obj_pos).astype(np.float32),
        "goal_off": np.stack(goal_off).astype(np.float32),
        "goal_color": np.asarray(goal_color),
    }


def _posterior_means(exp, roles, scenes, present: Tuple[str, ...],
                     instructions=None) -> np.ndarray:
    enc = instruction_encoder(exp, roles["language"])
    pairs = [enc(s) for s in (instructions or scenes["instrs"])]
    inputs = {
        roles["image"]: {"data": scenes["imgs"], "masks": None},
        roles["language"]: {
            "data": np.stack([p[0] for p in pairs]),
            "masks": np.stack([p[1] for p in pairs])},
    }
    out = exp.forward(inputs, present=present)
    return np.asarray(out.mods[roles["image"]].joint_dist.mean)


def _predicted_endpoints(exp, roles, scenes, instructions) -> np.ndarray:
    """Decode the action modality and return the planned EE endpoint.

    For waypoints the final waypoint IS the endpoint the evaluator executes
    (first-difference replay telescopes to it, vilanro_test.py); for per-step
    deltas / tokens the endpoint is the (decoded) delta sum."""
    enc = instruction_encoder(exp, roles["language"])
    pairs = [enc(s) for s in instructions]
    inputs = {
        roles["image"]: {"data": scenes["imgs"], "masks": None},
        roles["language"]: {
            "data": np.stack([p[0] for p in pairs]),
            "masks": np.stack([p[1] for p in pairs])},
    }
    out = exp.forward(inputs,
                      present=(roles["image"], roles["language"]))
    raw = np.asarray(out.mods[roles["action"]].decoder_dist.mean[0])
    if roles["action_type"] == "action_waypoints":
        return raw[:, -1, :3]
    if roles["action_type"] == "action_tokens":
        act_ds = exp.datamod.datasets[int(roles["action"].split("_")[1]) - 1]
        raw = act_ds.decode_output(raw)
    return raw[..., :3].sum(axis=1)


def _ridge_r2(z: np.ndarray, y: np.ndarray, seed: int = 0) -> float:
    """Held-out R^2 of a ridge probe z -> y (mean over target dims)."""
    from sklearn.linear_model import Ridge
    from sklearn.metrics import r2_score
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(z))
    cut = int(0.8 * len(z))
    tr, te = perm[:cut], perm[cut:]
    model = Ridge(alpha=1.0).fit(z[tr], y[tr])
    return float(r2_score(y[te], model.predict(z[te])))

def _logreg_acc(z: np.ndarray, y: np.ndarray, seed: int = 0) -> float:
    from sklearn.linear_model import LogisticRegression
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(z))
    cut = int(0.8 * len(z))
    tr, te = perm[:cut], perm[cut:]
    if len(np.unique(y[tr])) < 2:
        return float((y[te] == y[tr][0]).mean())
    model = LogisticRegression(max_iter=2000).fit(z[tr], y[tr])
    return float(model.score(z[te], y[te]))


def probe_report(exp, env_id: str = "NLReach2-v0", scenes_n: int = 400,
                 seed: int = 0) -> Dict[str, float]:
    roles = modality_roles(exp)
    img_idx = int(roles["image"].split("_")[1]) - 1
    img_size = int(exp.config.mods[img_idx].feature_dims[0])
    scenes = collect_scenes(env_id, scenes_n, seed, img_size=img_size)
    img, lang = roles["image"], roles["language"]
    z_img = _posterior_means(exp, roles, scenes, (img,))
    z_lang = _posterior_means(exp, roles, scenes, (lang,))
    z_joint = _posterior_means(exp, roles, scenes, (img, lang))

    ep_true = _predicted_endpoints(exp, roles, scenes, scenes["instrs"])
    ep_flip = _predicted_endpoints(exp, roles, scenes, scenes["flips"])
    goal = scenes["goal_off"]
    goal_norm = np.linalg.norm(goal, axis=1)
    ep_norm = np.linalg.norm(ep_true, axis=1)
    cos = (ep_true * goal).sum(1) / np.maximum(ep_norm * goal_norm, 1e-9)

    return {
        "probe_img_to_obj_pos_r2": _ridge_r2(z_img, scenes["obj_pos"]),
        "probe_lang_to_goal_color_acc": _logreg_acc(z_lang,
                                                    scenes["goal_color"]),
        "probe_joint_to_obj_pos_r2": _ridge_r2(z_joint, scenes["obj_pos"]),
        "probe_joint_to_goal_offset_r2": _ridge_r2(z_joint, goal),
        "flip_endpoint_shift_m": float(
            np.linalg.norm(ep_true - ep_flip, axis=1).mean()),
        "endpoint_shrink_ratio": float(
            np.median(ep_norm / np.maximum(goal_norm, 1e-9))),
        "endpoint_goal_cosine": float(cos.mean()),
        "scenes": float(scenes_n),
    }


def main():
    from multimodal_vae_comparison_tpu.eval.infer import MultimodalVAEInfer
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True, help="trained run dir")
    parser.add_argument("--env", default="NLReach2-v0")
    parser.add_argument("--scenes", type=int, default=400)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    exp = MultimodalVAEInfer(args.model)
    stats = probe_report(exp, args.env, args.scenes, args.seed)
    print(stats)
    from multimodal_vae_comparison_tpu.utils import print_save_stats
    print_save_stats(
        {k: {"value": float(v), "stdev": None} for k, v in stats.items()},
        args.model, f"vilanro_probe_{args.env}")


if __name__ == "__main__":
    main()
