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
               seed: int = 0, log_every: int = 100) -> Dict[str, float]:
    """Closed-loop eval of a trained trimodal model (image+language+actions)."""
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

    successes = 0
    for trial in range(trials):
        obs = env.reset()
        img = obs["rgb"].astype(np.float32) / 255.0
        words = [w for w in obs["instruction"].split(" ") if w in vocab]
        idx = np.zeros((lang_dims[0],), np.int64)
        mask = np.zeros((lang_dims[0],), bool)
        for i, w in enumerate(words[: lang_dims[0]]):
            idx[i] = vocab.index(w)
            mask[i] = True
        onehot = np.eye(len(vocab), dtype=np.float32)[idx]
        inputs = {
            img_mod: {"data": img[None], "masks": None},
            lang_mod: {"data": onehot[None], "masks": mask[None]},
        }
        out = exp.forward(inputs, present=(img_mod, lang_mod))
        traj = np.asarray(out.mods[act_mod].decoder_dist.mean[0][0])
        done = False
        for action in traj:
            action = np.asarray(action, np.float64).reshape(-1)[:4]
            if action.shape[0] < 4:
                action = np.concatenate([action, [1.0]])
            obs, reward, done, info = env.step(action)
            if done:
                break
        successes += int(env.is_success())
        if log_every and (trial + 1) % log_every == 0:
            print(f"trial {trial + 1}/{trials}: "
                  f"success so far {successes / (trial + 1):.3f}")
    return {"success_rate": successes / trials, "trials": trials}


def main():
    from multimodal_vae_comparison_tpu.eval.infer import MultimodalVAEInfer
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True, help="trained run dir")
    parser.add_argument("--env", default="NLReach2-v0")
    parser.add_argument("--trials", type=int, default=500)
    args = parser.parse_args()
    exp = MultimodalVAEInfer(args.model)
    stats = infer_loop(exp, args.env, args.trials)
    print(stats)


if __name__ == "__main__":
    main()
