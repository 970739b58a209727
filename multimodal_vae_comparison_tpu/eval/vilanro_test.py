"""VILANRO closed-loop evaluation: image+instruction -> predicted action
trajectory -> env replay -> success rate.

Analog of multimodal_compare/models/vilanro_test.py:277-346: for N trials the
trained trimodal model cross-generates the action sequence from the current
camera image and the NL instruction, the trajectory is replayed in the
environment, and the task success predicate scores the episode.

    python -m multimodal_vae_comparison_tpu.eval.vilanro_test \
        --model results/vilanro_mvae/version_0 --env NLReach2-v0 --trials 500
"""
from __future__ import annotations

import argparse
from typing import Dict

import numpy as np

from multimodal_vae_comparison_tpu.lanro.env import make


def infer_loop(exp, env_id: str = "NLReach2-v0", trials: int = 500,
               seed: int = 0, log_every: int = 100,
               replan_every: int = 0) -> Dict[str, float]:
    """Closed-loop eval of a trained trimodal model (image+language+actions).

    ``replan_every=0`` replays one open-loop trajectory inferred from the
    initial image — the reference protocol (vilanro_test.py:277-346, one
    forward then up to 70 blind steps).  ``replan_every=k`` re-infers the
    trajectory from the *current* camera image every k steps and executes
    the first k actions (receding-horizon control) — an extra capability
    mode reported separately from the reference-protocol number."""
    env = make(env_id, seed=seed)
    # modality roles from config mod_types
    mapping = {m.mod_type: m.name for m in exp.config.mods}
    lang_mod = mapping.get("language")
    act_mod = mapping.get("actions")
    img_mod = mapping.get("front RGB") or mapping.get("image")
    assert lang_mod and act_mod and img_mod, (
        f"expected language/actions/front RGB modalities, got {mapping}")
    lang_idx = int(lang_mod.split("_")[1]) - 1
    lang_ds = exp.datamod.datasets[lang_idx]
    vocab = lang_ds.vocab
    lang_dims = exp.config.mods[lang_idx].feature_dims

    def encode_instruction(instruction: str):
        words = [w for w in instruction.split(" ") if w in vocab]
        idx = np.zeros((lang_dims[0],), np.int64)
        mask = np.zeros((lang_dims[0],), bool)
        for i, w in enumerate(words[: lang_dims[0]]):
            idx[i] = vocab.index(w)
            mask[i] = True
        return np.eye(len(vocab), dtype=np.float32)[idx], mask

    def predict_traj(obs):
        img = obs["rgb"].astype(np.float32) / 255.0
        onehot, mask = encode_instruction(obs["instruction"])
        inputs = {
            img_mod: {"data": img[None], "masks": None},
            lang_mod: {"data": onehot[None], "masks": mask[None]},
        }
        out = exp.forward(inputs, present=(img_mod, lang_mod))
        return np.asarray(out.mods[act_mod].decoder_dist.mean[0][0])

    successes = 0
    for trial in range(trials):
        obs = env.reset()
        traj = predict_traj(obs)
        done = False
        steps = 0
        while not done and steps < len(traj):
            action = np.asarray(traj[steps if not replan_every
                                     else steps % replan_every],
                                np.float64).reshape(-1)[:4]
            if action.shape[0] < 4:
                action = np.concatenate([action, [1.0]])
            obs, reward, done, info = env.step(action)
            steps += 1
            if replan_every and not done and steps % replan_every == 0:
                traj = predict_traj(obs)
                if not len(traj):
                    break
        successes += int(env.is_success())
        if log_every and (trial + 1) % log_every == 0:
            print(f"trial {trial + 1}/{trials}: "
                  f"success so far {successes / (trial + 1):.3f}")
    return {"success_rate": successes / trials, "trials": trials,
            "replan_every": replan_every}


def main():
    from multimodal_vae_comparison_tpu.eval.infer import MultimodalVAEInfer
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True, help="trained run dir")
    parser.add_argument("--env", default="NLReach2-v0")
    parser.add_argument("--trials", type=int, default=500)
    parser.add_argument("--replan", type=int, default=0,
                        help="re-infer from the current image every k steps "
                             "(0 = reference open-loop protocol)")
    args = parser.parse_args()
    exp = MultimodalVAEInfer(args.model)
    stats = infer_loop(exp, args.env, args.trials,
                       replan_every=args.replan)
    print(stats)
    # same stats-txt artifact contract as the dataset benchmarks
    from multimodal_vae_comparison_tpu.utils import print_save_stats
    print_save_stats(
        {k: {"value": float(v), "stdev": None} for k, v in stats.items()},
        args.model, f"vilanro_{args.env}_replan{args.replan}")


if __name__ == "__main__":
    main()
