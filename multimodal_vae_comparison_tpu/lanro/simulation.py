"""Kinematic tabletop simulation + top-down renderer.

Replaces the reference's PyBulletSimulation/PyBulletRobot pair
(lanro_gym/simulation.py:23, robots/pybrobot.py:17) with an analytic world:
the end-effector integrates clamped velocity commands, grasping is
proximity+gripper based, and the camera is a top-down cv2 rasterizer emitting
the same 64x64x3 RGB observations the VILANRO dataset carries.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

WORKSPACE = np.array([[-0.3, 0.3], [-0.3, 0.3], [0.0, 0.3]])  # x, y, z bounds
MAX_STEP = 0.04          # max EE displacement per step (m)
GRASP_RADIUS = 0.05      # proximity for a successful grasp

SHAPE_IDS = ["cube", "cylinder", "sphere"]
COLOR_MAP = {"red": (200, 40, 40), "green": (40, 180, 60),
             "blue": (40, 90, 210), "yellow": (230, 210, 60),
             "purple": (150, 60, 180), "orange": (240, 140, 40)}


@dataclasses.dataclass
class SceneObject:
    shape: str
    color: str
    pos: np.ndarray           # (3,)
    size: float = 0.03
    grasped: bool = False


class KinematicSimulation:
    def __init__(self, seed: int = 0):
        self.rng = np.random.default_rng(seed)
        self.objects: List[SceneObject] = []
        self.ee = np.array([0.0, 0.0, 0.15])
        self.gripper = 1.0   # 1 = open, 0 = closed

    # -- world setup ------------------------------------------------------------

    def reset(self, num_objects: int = 2,
              colors: Optional[List[str]] = None,
              shapes: Optional[List[str]] = None) -> None:
        self.ee = np.array([0.0, 0.0, 0.15])
        self.gripper = 1.0
        self.objects = []
        colors = colors or list(COLOR_MAP)
        shapes = shapes or SHAPE_IDS
        used = []
        for _ in range(num_objects):
            while True:
                color = colors[self.rng.integers(len(colors))]
                shape = shapes[self.rng.integers(len(shapes))]
                if (color, shape) not in used:
                    used.append((color, shape))
                    break
            pos = np.array([self.rng.uniform(-0.22, 0.22),
                            self.rng.uniform(-0.22, 0.22), 0.02])
            self.objects.append(SceneObject(shape, color, pos))

    # -- dynamics ------------------------------------------------------------------

    def step(self, action: np.ndarray) -> None:
        """action = (dx, dy, dz, gripper_cmd in [-1, 1])."""
        delta = np.clip(np.asarray(action[:3], np.float64),
                        -MAX_STEP, MAX_STEP)
        self.ee = np.clip(self.ee + delta, WORKSPACE[:, 0], WORKSPACE[:, 1])
        self.gripper = float(np.clip((action[3] + 1) / 2, 0.0, 1.0))
        # push contact: an open gripper sweeping into an object displaces it
        for obj in self.objects:
            if obj.grasped:
                continue
            gap = self.ee[:2] - obj.pos[:2]
            dist = np.linalg.norm(gap)
            contact = obj.size + 0.015
            if dist < contact and self.ee[2] < 0.08:
                direction = -gap / (dist + 1e-9)
                obj.pos[:2] = np.clip(
                    obj.pos[:2] + direction * (contact - dist),
                    WORKSPACE[:2, 0], WORKSPACE[:2, 1])
        for obj in self.objects:
            if obj.grasped:
                if self.gripper > 0.6:           # released
                    obj.grasped = False
                    obj.pos = self.ee.copy()
                    obj.pos[2] = 0.02
                else:
                    obj.pos = self.ee.copy()
            elif (self.gripper < 0.4
                  and np.linalg.norm(self.ee - obj.pos) < GRASP_RADIUS):
                obj.grasped = True

    # -- camera ------------------------------------------------------------------

    def _to_px(self, pos: np.ndarray, size: int = 64) -> Tuple[int, int]:
        x = int((pos[0] - WORKSPACE[0, 0]) / (WORKSPACE[0, 1] - WORKSPACE[0, 0])
                * (size - 1))
        y = int((pos[1] - WORKSPACE[1, 0]) / (WORKSPACE[1, 1] - WORKSPACE[1, 0])
                * (size - 1))
        return x, y

    def render(self, size: int = 64) -> np.ndarray:
        """Top-down RGB view (reference: front RGB camera images)."""
        import cv2
        img = np.full((size, size, 3), (120, 110, 100), np.uint8)  # table
        for obj in self.objects:
            x, y = self._to_px(obj.pos, size)
            r = max(int(obj.size / 0.6 * size), 3)
            color = COLOR_MAP[obj.color]
            if obj.shape == "cube":
                cv2.rectangle(img, (x - r, y - r), (x + r, y + r), color, -1)
            elif obj.shape == "cylinder":
                cv2.circle(img, (x, y), r, color, -1)
            else:  # sphere: circle + highlight
                cv2.circle(img, (x, y), r, color, -1)
                cv2.circle(img, (x - r // 3, y - r // 3), max(r // 3, 1),
                           (255, 255, 255), -1)
        ex, ey = self._to_px(self.ee, size)
        cv2.drawMarker(img, (ex, ey), (20, 20, 20), cv2.MARKER_CROSS, 9, 2)
        return img
