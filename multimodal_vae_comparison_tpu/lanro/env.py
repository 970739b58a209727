"""Gym-style language-conditioned environments + registry.

Mirrors the reference's gymnasium registration surface
(lanro_gym/__init__.py:1-129): NLReach / NLPush / NLLift tasks with 2-3
objects, natural-language goal instructions, dict observations and sparse
success rewards — over the kinematic backend (simulation.py).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from multimodal_vae_comparison_tpu.lanro.simulation import (
    COLOR_MAP, KinematicSimulation, SHAPE_IDS)

INSTRUCTION_TEMPLATES = {
    "reach": ["reach the {color} {shape}", "touch the {color} {shape}"],
    "push": ["push the {color} {shape}", "move the {color} {shape}"],
    "lift": ["lift the {color} {shape}", "pick up the {color} {shape}"],
}


class LanroEnv:
    """reset() -> obs dict; step(action) -> (obs, reward, done, info).

    obs = {"rgb": (64, 64, 3) uint8, "instruction": str}
    action = (dx, dy, dz, gripper) float32
    """

    def __init__(self, task: str = "reach", num_objects: int = 2,
                 max_steps: int = 100, seed: int = 0):
        assert task in INSTRUCTION_TEMPLATES
        self.task = task
        self.num_objects = num_objects
        self.max_steps = max_steps
        self.sim = KinematicSimulation(seed)
        self.rng = np.random.default_rng(seed + 1)
        self.goal_idx = 0
        self.instruction = ""
        self._t = 0
        self._initial_pos = None

    # -- episode ---------------------------------------------------------------

    def reset(self) -> Dict:
        self.sim.reset(self.num_objects)
        self.goal_idx = int(self.rng.integers(self.num_objects))
        goal = self.sim.objects[self.goal_idx]
        template = INSTRUCTION_TEMPLATES[self.task][
            self.rng.integers(len(INSTRUCTION_TEMPLATES[self.task]))]
        self.instruction = template.format(color=goal.color, shape=goal.shape)
        self._t = 0
        self._initial_pos = goal.pos.copy()
        return self._obs()

    def step(self, action) -> Tuple[Dict, float, bool, Dict]:
        self.sim.step(np.asarray(action, np.float64))
        self._t += 1
        success = self.is_success()
        done = success or self._t >= self.max_steps
        return self._obs(), float(success), done, {"is_success": success}

    def _obs(self) -> Dict:
        return {"rgb": self.sim.render(), "instruction": self.instruction,
                "ee": self.sim.ee.copy(), "gripper": self.sim.gripper}

    # -- success predicates (reference tasks/: reach/push/lift) -----------------

    def is_success(self) -> bool:
        goal = self.sim.objects[self.goal_idx]
        if self.task == "reach":
            return bool(np.linalg.norm(self.sim.ee - goal.pos) < 0.05)
        if self.task == "push":
            moved = np.linalg.norm(goal.pos[:2] - self._initial_pos[:2])
            return bool(moved > 0.08)
        # lift
        return bool(goal.pos[2] > 0.10)

    @property
    def goal_object(self):
        return self.sim.objects[self.goal_idx]


ENV_REGISTRY = {
    "NLReach2-v0": dict(task="reach", num_objects=2),
    "NLReach3-v0": dict(task="reach", num_objects=3),
    "NLPush2-v0": dict(task="push", num_objects=2),
    "NLPush3-v0": dict(task="push", num_objects=3),
    "NLLift2-v0": dict(task="lift", num_objects=2),
    "NLLift3-v0": dict(task="lift", num_objects=3),
}


def make(env_id: str, seed: int = 0, **kwargs) -> LanroEnv:
    if env_id not in ENV_REGISTRY:
        raise KeyError(f"unknown env '{env_id}'; available: "
                       f"{sorted(ENV_REGISTRY)}")
    params = dict(ENV_REGISTRY[env_id])
    params.update(kwargs)
    return LanroEnv(seed=seed, **params)
