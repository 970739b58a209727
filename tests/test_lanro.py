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


@pytest.mark.parametrize("env_id", ["NLReach2-v0", "NLPush2-v0",
                                    "NLLift2-v0", "NLGrasp2-v0",
                                    "NLLeft2-v0", "NLRight2-v0",
                                    "Slide-v0", "Stack2-v0",
                                    "Empty-v0", "PickAndPlace-v0",
                                    "NLPickAndPlace2-v0"])
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


@pytest.mark.parametrize("env_id", ["PandaNLReach2-v0", "PandaStack2-v0"])
def test_joint_space_arm_envs(env_id):
    """relative_joints action mode: 8-dim actions through the 7-DoF IK arm
    (reference panda.py action_type='relative_joints')."""
    env = make(env_id, seed=4)
    obs = env.reset()
    assert env.action_dim == 8
    assert obs["joints"].shape == (7,)
    successes = 0
    for trial in range(6):
        env.reset()
        done, steps = False, 0
        while not done and steps < 100:
            a = scripted_policy(env)
            assert a.shape == (8,)
            _, _, done, info = env.step(a)
            steps += 1
        successes += int(env.is_success())
    assert successes >= 4, f"{env_id}: joint-space expert {successes}/6"


def test_arm_fk_ik_roundtrip():
    from multimodal_vae_comparison_tpu.lanro.arm import (
        ArmKinematics, NEUTRAL_JOINT_VALUES)
    arm = ArmKinematics()
    rng = np.random.default_rng(0)
    for _ in range(10):
        target = np.array([rng.uniform(-0.25, 0.25),
                           rng.uniform(-0.25, 0.25),
                           rng.uniform(0.02, 0.2)])
        q = arm.ik(NEUTRAL_JOINT_VALUES.copy(), target, iters=60)
        assert np.linalg.norm(arm.fk(q) - target) < 5e-3, target


def test_gymnasium_api_surface():
    env = make("NLReach2-v0", seed=5, gymnasium_api=True)
    obs, info = env.reset(seed=11)
    assert isinstance(info, dict) and obs["rgb"].shape == (64, 64, 3)
    assert env.action_space.shape == (4,)
    a = env.action_space.sample(np.random.default_rng(0))
    assert env.action_space.contains(a)
    obs, reward, terminated, truncated, info = env.step(a)
    assert isinstance(terminated, bool) and isinstance(truncated, bool)
    assert env.render().shape == (64, 64, 3)
    # seeded resets reproduce the episode
    o1, _ = env.reset(seed=7)
    i1 = env.instruction
    o2, _ = env.reset(seed=7)
    assert env.instruction == i1
    np.testing.assert_array_equal(o1["rgb"], o2["rgb"])


def test_slide_dynamics_glide():
    """Low-friction pucks keep gliding after the pusher stops (reference
    tasks/slide.py lateral_friction=0.1)."""
    from multimodal_vae_comparison_tpu.lanro.simulation import (
        KinematicSimulation)
    sim = KinematicSimulation(seed=0, friction=0.05)
    sim.reset(1)
    obj = sim.objects[0]
    obj.pos = np.array([0.0, 0.0, 0.02])
    sim.ee = np.array([-0.05, 0.0, 0.05])
    for _ in range(3):  # push through the puck
        sim.step(np.array([0.04, 0.0, 0.0, 1.0]))
    pos_after_push = obj.pos[:2].copy()
    for _ in range(10):  # hands off: puck should keep moving
        sim.step(np.array([0.0, 0.0, 0.0, 1.0]))
        sim.ee = np.array([-0.2, 0.2, 0.15])  # keep EE away
    assert np.linalg.norm(obj.pos[:2] - pos_after_push) > 0.01


def test_stacking_rest_height():
    from multimodal_vae_comparison_tpu.lanro.simulation import (
        KinematicSimulation)
    sim = KinematicSimulation(seed=0)
    sim.reset(2)
    a, b = sim.objects
    b.pos = np.array([0.1, 0.1, 0.02])
    a.grasped = True
    sim.ee = np.array([0.1, 0.1, 0.12])
    sim.step(np.array([0.0, 0.0, 0.0, 1.0]))  # open gripper -> release
    assert not a.grasped
    assert abs(a.pos[2] - (b.pos[2] + b.size + a.size)) < 1e-6


def test_stack_with_xy_offset_stays_stacked():
    """A completed stack with a small xy offset (within the success
    tolerance) must not be resolved as a lateral collision: the z-exclusion
    is inclusive at the exact rest height z-diff == a.size + b.size."""
    from multimodal_vae_comparison_tpu.lanro.simulation import (
        KinematicSimulation)
    sim = KinematicSimulation(seed=0)
    sim.reset(2)
    a, b = sim.objects
    b.pos = np.array([0.1, 0.1, 0.02])
    a.grasped = True
    sim.ee = np.array([0.12, 0.1, 0.12])  # 2cm xy offset from the base
    sim.step(np.array([0.0, 0.0, 0.0, 1.0]))  # release on top
    assert not a.grasped
    top_z = a.pos[2]
    assert abs(top_z - (b.pos[2] + b.size + a.size)) < 1e-6
    sim.ee = np.array([-0.2, 0.2, 0.15])  # hands off
    for _ in range(10):
        sim.step(np.array([0.0, 0.0, 0.0, 1.0]))
    # neither shoved apart laterally nor dropped off the stack
    assert np.linalg.norm(a.pos[:2] - b.pos[:2]) < 0.03
    assert abs(a.pos[2] - top_z) < 1e-6


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


def test_collect_hindsight_chunks(tmp_path):
    """chunk_every=k emits (mid-episode frame, suffix trajectory) extras:
    suffixes shrink by k steps and frames differ from the initial scene."""
    import pickle
    stats = collect("NLReach2-v0", episodes=4, out_dir=str(tmp_path), seed=0,
                    chunk_every=5)
    assert stats["samples"] > stats["episodes"]
    with open(os.path.join(str(tmp_path), "endeff_actions_final.pkl"),
              "rb") as f:
        trajs = pickle.load(f)
    with open(os.path.join(str(tmp_path), "image_final.pkl"), "rb") as f:
        images = pickle.load(f)
    assert len(trajs) == len(images) == stats["samples"]
    # first episode's chunks follow it: each 5 shorter than the last
    base = len(trajs[0])
    n_chunks = (base - 1) // 5
    for j in range(1, n_chunks + 1):
        assert len(trajs[j]) == base - 5 * j
        np.testing.assert_array_equal(trajs[j], trajs[0][5 * j:])
    if n_chunks:
        assert not np.array_equal(images[1], images[0])


def test_expert_suffix_completes_task():
    """expert_suffix rolls the scripted expert on a deep copy: the returned
    trajectory must finish the task when replayed on the original env, and
    the original env must not be mutated by the copy's rollout."""
    from multimodal_vae_comparison_tpu.lanro.collect import expert_suffix
    from multimodal_vae_comparison_tpu.lanro.env import make
    env = make("NLReach2-v0", seed=3)
    env.reset()
    ee_before = env.sim.ee.copy()
    traj = expert_suffix(env)
    assert np.array_equal(env.sim.ee, ee_before)  # env untouched
    done = False
    for a in traj:
        if done:
            break
        _, _, done, _ = env.step(np.asarray(a, np.float64))
    assert env.is_success()


def test_coulomb_glide_distance():
    """Kinetic friction is Coulomb (constant deceleration): a puck hit at
    speed v glides ~v^2/2a, not an exponential-decay tail (round-3
    force-based dynamics, reference slide.py lateral_friction)."""
    from multimodal_vae_comparison_tpu.lanro.simulation import (
        MU_ACCEL, KinematicSimulation)
    sim = KinematicSimulation(seed=0, friction=0.05)
    sim.reset(1)
    obj = sim.objects[0]
    obj.pos = np.array([-0.2, 0.0, 0.02])
    obj.vel = np.array([0.02, 0.0])
    start = obj.pos[:2].copy()
    sim.ee = np.array([0.25, 0.25, 0.2])  # far away: free gliding
    for _ in range(60):
        sim.step(np.array([0.0, 0.0, 0.0, 1.0]))
        sim.ee = np.array([0.25, 0.25, 0.2])
    dist = np.linalg.norm(obj.pos[:2] - start)
    a = 0.05 * MU_ACCEL
    # discrete Coulomb integration: sum of v, v-a, v-2a, ... = v^2/2a + v/2
    expect = 0.02 ** 2 / (2 * a) + 0.02 / 2
    assert abs(dist - expect) < 0.05 * expect + 0.002, (dist, expect)
    assert not np.any(obj.vel)  # came to rest


def test_ee_momentum_transfer():
    """The impulse an object picks up equals the EE velocity along the
    contact normal — a slow nudge imparts less speed than a fast sweep."""
    from multimodal_vae_comparison_tpu.lanro.simulation import (
        KinematicSimulation)
    speeds = {}
    for v in (0.01, 0.04):
        sim = KinematicSimulation(seed=0, friction=0.05)
        sim.reset(1)
        obj = sim.objects[0]
        obj.pos = np.array([0.0, 0.0, 0.02])
        obj.vel = np.zeros(2)
        sim.ee = np.array([-obj.size - 0.016, 0.0, 0.03])
        sim.step(np.array([v, 0.0, 0.0, 1.0]))
        speeds[v] = float(np.linalg.norm(obj.vel))
    assert speeds[0.04] > speeds[0.01] > 0.0
    assert abs(speeds[0.04] - 0.04) < 0.015


def test_object_object_collision():
    """A gliding puck hitting a resting one transfers momentum along the
    collision normal; both end up moving, neither overlaps."""
    from multimodal_vae_comparison_tpu.lanro.simulation import (
        KinematicSimulation)
    sim = KinematicSimulation(seed=0, friction=0.05)
    sim.reset(2)
    a, b = sim.objects
    a.pos = np.array([-0.05, 0.0, 0.02])
    b.pos = np.array([0.05, 0.0, 0.02])
    a.vel = np.array([0.03, 0.0])
    b.vel = np.zeros(2)
    sim.ee = np.array([0.25, 0.25, 0.2])
    moved_b = False
    for _ in range(30):
        sim.step(np.array([0.0, 0.0, 0.0, 1.0]))
        sim.ee = np.array([0.25, 0.25, 0.2])
        if np.linalg.norm(b.vel) > 0:
            moved_b = True
        assert (np.linalg.norm(a.pos[:2] - b.pos[:2])
                >= a.size + b.size - 1e-6)
    assert moved_b
    assert b.pos[0] > 0.05  # knocked forward


def test_unsupported_object_falls():
    """Gravity: pull the base out from under a stacked object and the top
    object falls back to the table (not scripted: physics settles it)."""
    from multimodal_vae_comparison_tpu.lanro.simulation import (
        KinematicSimulation)
    sim = KinematicSimulation(seed=0, friction=1.0)
    sim.reset(2)
    top, base = sim.objects
    base.pos = np.array([0.1, 0.1, 0.02])
    top.pos = np.array([0.1, 0.1, 0.02 + base.size + top.size])
    sim.ee = np.array([0.25, 0.25, 0.2])
    sim.step(np.array([0.0, 0.0, 0.0, 1.0]))
    assert abs(top.pos[2] - (base.pos[2] + base.size + top.size)) < 1e-9
    base.pos = np.array([-0.2, -0.2, 0.02])   # support removed
    for _ in range(5):
        sim.step(np.array([0.0, 0.0, 0.0, 1.0]))
        sim.ee = np.array([0.25, 0.25, 0.2])
    assert abs(top.pos[2] - 0.02) < 1e-9


def test_collect_waypoints_replay_reaches_expert_endpoint(tmp_path):
    """--waypoints stores start-relative achieved EE positions; replaying
    their first differences must reproduce the expert rollout exactly
    (same seed -> same scenes) and succeed where the expert did."""
    import pickle
    stats = collect("NLReach2-v0", episodes=6, out_dir=str(tmp_path),
                    seed=11, waypoints=True)
    assert stats["expert_success"] > 0.7
    with open(os.path.join(str(tmp_path), "endeff_actions_final.pkl"),
              "rb") as f:
        trajs = pickle.load(f)
    successes = 0
    for ep, w in enumerate(trajs):
        w = np.asarray(w)
        assert w.shape[-1] == 4
        env = make("NLReach2-v0", seed=11)
        # same construction order as collect(): one env reused across
        # episodes, so replay episode `ep` after ep resets
        for _ in range(ep):
            env.reset()
            for _ in range(100):
                _, _, done, _ = env.step(scripted_policy(env))
                if done:
                    break
        env.reset()
        start = env.sim.ee.copy()
        deltas = np.diff(w[:, :3], axis=0, prepend=np.zeros((1, 3)))
        for k in range(len(w)):
            env.step(np.concatenate([deltas[k], w[k, 3:]]))
        # replayed endpoint == recorded waypoint endpoint
        np.testing.assert_allclose(env.sim.ee - start, w[-1, :3], atol=1e-9)
        successes += int(env.is_success())
    assert successes / len(trajs) > 0.7


def test_waypoints_hindsight_chunks_are_rebased(tmp_path):
    """Chunk suffixes must be relative to the EE at the chunk start, not the
    episode start: w_chunk[k] = w_full[t0+k] - w_full[t0-1]."""
    import pickle
    collect("NLReach2-v0", episodes=3, out_dir=str(tmp_path), seed=5,
            chunk_every=5, waypoints=True)
    with open(os.path.join(str(tmp_path), "endeff_actions_final.pkl"),
              "rb") as f:
        trajs = pickle.load(f)
    base = np.asarray(trajs[0])
    if len(base) > 5 and len(trajs) > 1:
        chunk = np.asarray(trajs[1])
        np.testing.assert_allclose(
            chunk[:, :3], base[5:, :3] - base[4, :3], atol=1e-6)
        np.testing.assert_array_equal(chunk[:, 3], base[5:, 3])


def test_waypoint_model_end_to_end_eval(tmp_path):
    """Full waypoint pipeline through the real batched evaluator: collect
    --waypoints data, train a tiny trimodal model, reload it with
    MultimodalVAEInfer, and run infer_loop — covering the action_waypoints
    first-difference decode path (vilanro_test.py) that the TPU configs use."""
    from multimodal_vae_comparison_tpu.config import Config
    from multimodal_vae_comparison_tpu.eval.infer import MultimodalVAEInfer
    from multimodal_vae_comparison_tpu.eval.vilanro_test import infer_loop
    from multimodal_vae_comparison_tpu.training.trainer import Trainer

    data_dir = tmp_path / "data"
    collect("NLReach2-v0", episodes=6, out_dir=str(data_dir), seed=3,
            waypoints=True)
    cfg = Config({
        "batch_size": 4, "epochs": 2, "exp_name": "way_e2e", "lr": 1e-3,
        "mixing": "poe", "n_latents": 8, "obj": "elbo", "optimizer": "adam",
        "seed": 1, "test_split": 0.25, "viz_freq": 100, "labels": None,
        "dataset_name": "vilanro",
        "modality_1": {"encoder": "TxtTransformer", "decoder": "TxtTransformer",
                       "mod_type": "language",
                       "path": str(data_dir / "instructions_final.pkl"),
                       "recon_loss": "category_ce"},
        "modality_2": {"encoder": "Transformer", "decoder": "Transformer",
                       "mod_type": "action_waypoints",
                       "path": str(data_dir / "endeff_actions_final.pkl"),
                       "recon_loss": "mse"},
        "modality_3": {"encoder": "FNN", "decoder": "FNN",
                       "mod_type": "front RGB",
                       "path": str(data_dir / "image_final.pkl"),
                       "recon_loss": "bce"},
    }, results_root=str(tmp_path))
    Trainer(cfg, enable_viz=False).fit(epochs=2)
    exp = MultimodalVAEInfer(cfg.mPath)
    res = infer_loop(exp, env_id="NLReach2-v0", trials=2, seed=7,
                     log_every=0)
    assert res["trials"] == 2
    assert 0.0 <= res["success_rate"] <= 1.0
    # reach diagnostics: endpoint-error stats plus the grounding-vs-precision
    # split (NLReach2 has 2 objects, so the distractor keys must be present)
    assert 0.0 <= res["within_2x_tolerance"] <= 1.0
    assert 0.0 <= res["nearest_is_distractor"] <= 1.0
    assert 0.0 <= res["distractor_within_tolerance"] <= 1.0
    # latent-grounding probe on the same trained model (vilanro_probe.py):
    # smoke the full diagnostic — ridge/logistic probes fit, the
    # instruction-flip endpoint shift and shrink/cosine stats come out finite
    from multimodal_vae_comparison_tpu.eval.vilanro_probe import probe_report
    rep = probe_report(exp, env_id="NLReach2-v0", scenes_n=20, seed=5)
    for key in ("probe_img_to_obj_pos_r2", "probe_lang_to_goal_color_acc",
                "probe_joint_to_obj_pos_r2", "probe_joint_to_goal_offset_r2",
                "flip_endpoint_shift_m", "endpoint_shrink_ratio",
                "endpoint_goal_cosine"):
        assert np.isfinite(rep[key]), (key, rep)
    assert rep["flip_endpoint_shift_m"] >= 0.0
    assert 0.0 <= rep["probe_lang_to_goal_color_acc"] <= 1.0
    # train-split endpoint calibration: the fitted gain is clipped to
    # [1, 10] and flows through the evaluator's gain pathway
    res_cal = infer_loop(exp, env_id="NLReach2-v0", trials=2, seed=7,
                         log_every=0, calibrate=True)
    assert 1.0 <= res_cal["calibration_gain"] <= 10.0


def test_vilanro_dataset_loads_waypoints(tmp_path):
    collect("NLReach2-v0", episodes=4, out_dir=str(tmp_path), seed=0,
            waypoints=True)
    from multimodal_vae_comparison_tpu.data.datasets import VILANRO
    ds = VILANRO(os.path.join(str(tmp_path), "endeff_actions_final.pkl"),
                 None, "action_waypoints")
    data, masks = ds.get_data("train")
    assert data.shape == (4, 100, 4) and masks.shape == (4, 100)
    # waypoints are positions: the final valid entry is the net displacement,
    # typically much larger than one 0.04-clipped step
    lens = masks.sum(1).astype(int)
    finals = np.stack([data[i, lens[i] - 1, :3] for i in range(4)])
    assert (np.linalg.norm(finals, axis=1) > 0.05).any()
