"""Golden-scene physics contract for the LANRO stand-in simulator.

The reference's evaluation environment is real PyBullet dynamics
(multimodal_compare/models/lanro_gym/simulation.py:23, robots/pybrobot.py:17);
ours is an analytic contact model (lanro/simulation.py).  PyBullet is not
installable in this image, so the divergence cannot be regression-tested
against it — instead these tests BOUND the stand-in's behavior with stated
tolerances (VERDICT r3 item 5): impulse transfer, Coulomb friction glide,
constant-deceleration profile, object-object momentum exchange, stack
stability, grasp-lift-release, and placement height.  Every VILANRO number
in RESULTS.md can cite this suite as the bounded-divergence contract; the
numeric bands here replace the prose divergence list in docs/datasets.md.
"""
import numpy as np
import pytest

from multimodal_vae_comparison_tpu.lanro.simulation import (
    GRASP_RADIUS, GRAVITY_STEP, KinematicSimulation, MAX_STEP, MU_ACCEL,
    RESTITUTION, SceneObject, WORKSPACE)


def _scene(friction=1.0, objects=()):
    sim = KinematicSimulation(seed=0, friction=friction)
    sim.reset(num_objects=0)
    for o in objects:
        sim.objects.append(o)
    return sim


def _obj(x, y, z=0.02, color="red", shape="cube", size=0.03):
    return SceneObject(shape, color, np.array([x, y, z], float), size=size)


def _settle(sim, steps=60):
    for _ in range(steps):
        sim.step(np.array([0.0, 0.0, 0.0, 1.0]))


class TestPushImpulse:
    """Contract 1: a full-speed EE hit transfers the EE velocity's normal
    component; with table friction (mu_a = MU_ACCEL) the object glides
    v^2/(2 mu_a) after release — quasi-static pushing, total displacement
    bounded to [0.02, 0.09] m for a single 0.04 m/step hit (de-penetration
    shove up to the 0.045 contact radius + glide v^2/2a ~= 0.018)."""

    def test_single_hit_displacement_band(self):
        obj = _obj(0.05, 0.0)
        sim = _scene(friction=1.0, objects=[obj])
        sim.ee = np.array([0.0, 0.0, 0.02])
        start = obj.pos[:2].copy()
        sim.step(np.array([MAX_STEP, 0.0, 0.0, 1.0]))   # one full-speed hit
        _settle(sim)
        disp = np.linalg.norm(obj.pos[:2] - start)
        # analytic: contact shove (penetration resolution, <= 0.045) + glide
        # v^2/(2*mu_a) = 0.04^2 / 0.09 ~= 0.018
        assert 0.02 <= disp <= 0.09, disp
        # the push is colinear with the hit: no lateral drift
        assert abs(obj.pos[1] - start[1]) < 1e-9

    def test_push_does_not_teleport(self):
        """No step may move a free object farther than the EE step plus the
        current glide velocity — the old scripted-displacement backend could
        jump objects; the force backend cannot."""
        obj = _obj(0.05, 0.0)
        sim = _scene(friction=1.0, objects=[obj])
        sim.ee = np.array([0.0, 0.0, 0.02])
        for _ in range(20):
            before = obj.pos[:2].copy()
            v_before = np.linalg.norm(obj.vel)
            sim.step(np.array([MAX_STEP, 0.0, 0.0, 1.0]))
            step_d = np.linalg.norm(obj.pos[:2] - before)
            assert step_d <= 2 * MAX_STEP + v_before + 1e-9, step_d


class TestFrictionGlide:
    """Contract 2: Coulomb kinetic friction — constant deceleration mu_a per
    step (linear speed decay, NOT exponential), glide distance ~ v^2/(2 a)."""

    def test_constant_deceleration_profile(self):
        obj = _obj(-0.2, 0.0)
        sim = _scene(friction=0.05, objects=[obj])
        obj.vel = np.array([0.03, 0.0])
        mu_a = 0.05 * MU_ACCEL
        speeds = []
        for _ in range(8):
            sim.step(np.array([0.0, 0.0, 0.0, 1.0]))
            speeds.append(np.linalg.norm(obj.vel))
        diffs = np.diff([0.03] + speeds)
        np.testing.assert_allclose(diffs, -mu_a, atol=1e-9)

    def test_low_friction_glide_distance(self):
        """A slide-table puck (friction 0.05) hit at full speed glides
        0.25-0.45 m — the Slide task's working range (reference
        tasks/slide.py lateral_friction=0.1)."""
        obj = _obj(-0.22, 0.0)
        sim = _scene(friction=0.05, objects=[obj])
        sim.ee = np.array([-0.27, 0.0, 0.02])
        start = obj.pos[:2].copy()
        sim.step(np.array([MAX_STEP, 0.0, 0.0, 1.0]))
        _settle(sim, steps=120)
        disp = np.linalg.norm(obj.pos[:2] - start)
        assert 0.25 <= disp <= 0.45, disp

    def test_high_friction_stops_within_a_step(self):
        """friction=1.0: any speed <= mu_a is zeroed — quasi-static tables
        never accumulate residual sliding."""
        obj = _obj(0.0, 0.0)
        sim = _scene(friction=1.0, objects=[obj])
        obj.vel = np.array([MU_ACCEL * 0.99, 0.0])
        sim.step(np.array([0.0, 0.0, 0.0, 1.0]))
        assert np.all(obj.vel == 0.0)


class TestObjectCollision:
    """Contract 3: equal-mass object-object collision exchanges normal
    momentum with restitution 0.2 and leaves no interpenetration."""

    def test_momentum_exchange(self):
        a, b = _obj(-0.05, 0.0), _obj(0.012, 0.0, color="blue")
        sim = _scene(friction=0.05, objects=[a, b])
        a.vel = np.array([0.06, 0.0])
        a.pos[:2] = [-0.05, 0.0]
        sim.step(np.array([0.0, 0.0, 0.0, 1.0]))
        # after the hit: b moves forward, a slower than before
        imp = (1.0 + RESTITUTION) / 2.0 * 0.06
        assert b.vel[0] == pytest.approx(imp, rel=0.35)
        assert a.vel[0] < 0.06
        # conservation up to the restitution loss (equal masses)
        total = a.vel[0] + b.vel[0]
        assert total <= 0.06 + 1e-9

    def test_no_interpenetration_after_step(self):
        a, b = _obj(-0.02, 0.0), _obj(0.02, 0.0, color="blue")
        sim = _scene(friction=1.0, objects=[a, b])
        a.vel = np.array([0.05, 0.0])
        for _ in range(5):
            sim.step(np.array([0.0, 0.0, 0.0, 1.0]))
            gap = np.linalg.norm(a.pos[:2] - b.pos[:2])
            assert gap >= a.size + b.size - 1e-6, gap


class TestStacking:
    """Contract 4: a completed stack is stable (no drift, no shove-apart) and
    a released object settles at z = base_z + base_size + own_size exactly —
    the documented placement-height rule (docs/datasets.md)."""

    def test_stack_is_stationary(self):
        base = _obj(0.1, 0.1)
        top = _obj(0.1, 0.1, z=0.02 + 0.06, color="blue")
        sim = _scene(friction=1.0, objects=[base, top])
        sim.ee = np.array([-0.2, -0.2, 0.15])
        p_base, p_top = base.pos.copy(), top.pos.copy()
        _settle(sim, steps=30)
        np.testing.assert_allclose(base.pos, p_base, atol=1e-9)
        np.testing.assert_allclose(top.pos, p_top, atol=1e-9)

    def test_release_on_top_rests_at_exact_height(self):
        base = _obj(0.0, 0.0)
        top = _obj(0.2, 0.2, color="blue")
        sim = _scene(friction=1.0, objects=[base, top])
        # grasp the blue cube
        sim.ee = top.pos.copy()
        sim.step(np.array([0.0, 0.0, 0.0, -1.0]))
        assert top.grasped
        # carry it over the base at height, then release
        for _ in range(40):
            d = np.clip(np.array([0.0, 0.0, 0.12]) + base.pos * [1, 1, 0]
                        - sim.ee, -MAX_STEP, MAX_STEP)
            sim.step(np.concatenate([d, [-1.0]]))
        sim.step(np.array([0.0, 0.0, 0.0, 1.0]))        # open gripper
        _settle(sim, steps=20)
        assert np.linalg.norm(top.pos[:2] - base.pos[:2]) < base.size + top.size
        assert top.pos[2] == pytest.approx(
            base.pos[2] + base.size + top.size, abs=1e-9)

    def test_release_clear_of_others_rests_on_table(self):
        obj = _obj(0.0, 0.0)
        sim = _scene(friction=1.0, objects=[obj])
        sim.ee = obj.pos.copy()
        sim.step(np.array([0.0, 0.0, 0.0, -1.0]))
        for _ in range(5):
            sim.step(np.array([0.0, MAX_STEP, MAX_STEP, -1.0]))
        sim.step(np.array([0.0, 0.0, 0.0, 1.0]))
        _settle(sim, steps=20)
        assert obj.pos[2] == pytest.approx(0.02, abs=1e-9)


class TestGraspLift:
    """Contract 5: grasp within GRASP_RADIUS with a closed gripper; a grasped
    object tracks the EE exactly; an unsupported object falls at
    GRAVITY_STEP per step to its rest height."""

    def test_grasp_requires_proximity_and_closed_gripper(self):
        obj = _obj(0.0, 0.0)
        sim = _scene(friction=1.0, objects=[obj])
        sim.ee = obj.pos + np.array([GRASP_RADIUS + 0.02, 0.0, 0.0])
        sim.step(np.array([0.0, 0.0, 0.0, -1.0]))
        assert not obj.grasped                      # too far
        sim.ee = obj.pos.copy()
        sim.step(np.array([0.0, 0.0, 0.0, 1.0]))
        assert not obj.grasped                      # open gripper
        sim.step(np.array([0.0, 0.0, 0.0, -1.0]))
        assert obj.grasped

    def test_lift_hold_tracks_ee(self):
        obj = _obj(0.0, 0.0)
        sim = _scene(friction=1.0, objects=[obj])
        sim.ee = obj.pos.copy()
        sim.step(np.array([0.0, 0.0, 0.0, -1.0]))
        for _ in range(4):
            sim.step(np.array([0.0, 0.0, MAX_STEP, -1.0]))
            np.testing.assert_allclose(obj.pos, sim.ee, atol=1e-12)
        assert obj.pos[2] > 0.1

    def test_gravity_fall_rate(self):
        obj = _obj(0.0, 0.0, z=0.2)
        sim = _scene(friction=1.0, objects=[obj])
        sim.ee = np.array([-0.25, -0.25, 0.15])
        z = obj.pos[2]
        sim.step(np.array([0.0, 0.0, 0.0, 1.0]))
        assert obj.pos[2] == pytest.approx(z - GRAVITY_STEP, abs=1e-12)
        _settle(sim, steps=10)
        assert obj.pos[2] == pytest.approx(0.02, abs=1e-12)


class TestWorkspaceBounds:
    """Contract 6: neither the EE nor free objects ever leave the workspace."""

    def test_ee_clipped(self):
        sim = _scene()
        for _ in range(30):
            sim.step(np.array([MAX_STEP, MAX_STEP, MAX_STEP, 1.0]))
        assert np.all(sim.ee <= WORKSPACE[:, 1] + 1e-12)

    def test_object_clipped(self):
        obj = _obj(0.28, 0.0)
        sim = _scene(friction=0.05, objects=[obj])
        obj.vel = np.array([0.06, 0.0])
        for _ in range(20):
            sim.step(np.array([0.0, 0.0, 0.0, 1.0]))
        assert obj.pos[0] <= WORKSPACE[0, 1] + 1e-12
