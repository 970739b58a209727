"""Kinematic LANRO env, scripted collection, VILANRO dataset roundtrip."""
import os

import numpy as np
import pytest

from multimodal_vae_comparison_tpu.lanro import make
from multimodal_vae_comparison_tpu.lanro.collect import collect, scripted_policy


def test_registry_and_reset():
    env = make("NLReach2-v0", seed=3)
    obs = env.reset()
    assert obs["rgb"].shape == (64, 64, 3)
    assert obs["rgb"].dtype == np.uint8
    goal = env.goal_object
    assert goal.color in obs["instruction"]
    assert goal.shape in obs["instruction"]
    with pytest.raises(KeyError):
        make("NoSuchEnv-v0")


@pytest.mark.parametrize("env_id", ["NLReach2-v0", "NLPush2-v0", "NLLift2-v0"])
def test_scripted_policy_succeeds(env_id):
    env = make(env_id, seed=1)
    successes = 0
    for trial in range(10):
        env.reset()
        done = False
        steps = 0
        while not done and steps < 100:
            _, _, done, info = env.step(scripted_policy(env))
            steps += 1
        successes += int(env.is_success())
    assert successes >= 8, f"{env_id}: expert only {successes}/10"


def test_random_policy_mostly_fails():
    env = make("NLReach2-v0", seed=2)
    rng = np.random.default_rng(0)
    successes = 0
    for _ in range(10):
        env.reset()
        for _ in range(30):
            _, _, done, _ = env.step(rng.uniform(-1, 1, 4) * 0.04)
            if done:
                break
        successes += int(env.is_success())
    assert successes <= 5


def test_collect_vilanro_roundtrip(tmp_path):
    stats = collect("NLReach2-v0", episodes=12, out_dir=str(tmp_path), seed=0)
    assert stats["expert_success"] > 0.7
    for f in ["image_final.pkl", "instructions_final.pkl",
              "endeff_actions_final.pkl", "vocab.txt"]:
        assert os.path.exists(os.path.join(str(tmp_path), f))
    # the VILANRO dataset class can load what collect wrote
    from multimodal_vae_comparison_tpu.data.datasets import VILANRO
    lang = VILANRO(os.path.join(str(tmp_path), "instructions_final.pkl"),
                   None, "language")
    data, masks = lang.get_data("train")
    assert data.shape[0] == 12 and masks.shape[0] == 12
    acts = VILANRO(os.path.join(str(tmp_path), "endeff_actions_final.pkl"),
                   None, "actions")
    adata, amasks = acts.get_data("train")
    assert adata.shape == (12, 100, 4)
    rgb = VILANRO(os.path.join(str(tmp_path), "image_final.pkl"),
                  None, "front RGB")
    idata, _ = rgb.get_data("train")
    assert idata.shape == (12, 64, 64, 3)
    assert idata.max() <= 1.0
