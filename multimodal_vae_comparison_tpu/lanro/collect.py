"""VILANRO dataset collection: scripted-policy rollouts -> pkl modality files.

Analog of multimodal_compare/models/vilanro_datasets.py (430 LoC): rolls a
scripted expert in the language-conditioned env and dumps the trimodal
dataset in the exact file layout the VILANRO dataset class loads
(image_final.pkl, instructions_final.pkl, endeff_actions_final.pkl,
vocab.txt).

    python -m multimodal_vae_comparison_tpu.lanro.collect \
        --env NLReach2-v0 --episodes 2000 --out data/vilanro/D1
"""
from __future__ import annotations

import argparse
import os
import pickle
from typing import List

import numpy as np

from multimodal_vae_comparison_tpu.lanro.env import LanroEnv, make


def scripted_policy(env: LanroEnv) -> np.ndarray:
    """One expert action: move toward the goal object; grasp/lift if needed."""
    goal = env.goal_object
    delta = goal.pos - env.sim.ee
    dist = np.linalg.norm(delta)
    if env.task == "reach":
        grip = 1.0
    elif env.task == "push":
        # approach slightly behind, then push through
        grip = 1.0
        if dist < 0.06:
            delta = delta + delta / (dist + 1e-9) * 0.05
    else:  # lift
        if dist > 0.03 and not goal.grasped:
            grip = 1.0
        elif not goal.grasped:
            grip = -1.0
        else:
            delta = np.array([0.0, 0.0, 0.15]) - env.sim.ee + goal.pos * 0
            delta = np.array([0.0, 0.0, 0.05])
            grip = -1.0
    step = np.clip(delta, -0.04, 0.04)
    return np.array([step[0], step[1], step[2], grip], np.float32)


def collect(env_id: str, episodes: int, out_dir: str, seed: int = 0,
            max_len: int = 100) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    env = make(env_id, seed=seed)
    images: List[np.ndarray] = []
    instructions: List[str] = []
    trajectories: List[np.ndarray] = []
    successes = 0
    for ep in range(episodes):
        obs = env.reset()
        images.append(obs["rgb"])    # initial scene: what the policy sees
        instructions.append(env.instruction)
        traj = []
        done = False
        while not done and len(traj) < max_len:
            action = scripted_policy(env)
            traj.append(action)
            obs, reward, done, info = env.step(action)
        successes += int(env.is_success())
        trajectories.append(np.stack(traj))
    vocab = sorted({w for ins in instructions for w in ins.split(" ")})
    with open(os.path.join(out_dir, "image_final.pkl"), "wb") as f:
        pickle.dump(images, f)
    with open(os.path.join(out_dir, "instructions_final.pkl"), "wb") as f:
        pickle.dump(instructions, f)
    with open(os.path.join(out_dir, "endeff_actions_final.pkl"), "wb") as f:
        pickle.dump(trajectories, f)
    with open(os.path.join(out_dir, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab) + "\n")
    return {"episodes": episodes, "expert_success": successes / episodes,
            "vocab_size": len(vocab), "out_dir": out_dir}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", default="NLReach2-v0")
    parser.add_argument("--episodes", type=int, default=2000)
    parser.add_argument("--out", required=True)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    stats = collect(args.env, args.episodes, args.out, args.seed)
    print(stats)


if __name__ == "__main__":
    main()
