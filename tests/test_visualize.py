"""Replay-path validation: the bytes published for the reference's PyBullet
replayer decode and drive a (simulated) animator consistently.

The reference consumer (scripts/PyBullet/visualize_motion.py:58-84) decodes
visualize_quadTraj_lcmt and, per frame, sets the robot pose from
(pos, quat(getQuaternionFromEuler(eul[[2,1,0]])), qJ). This test performs the
same decode + conversions with numpy and asserts the kinematic content is
consistent: stance feet from FK of the published (pos, eul, qJ) land on the
ground at the published pFoot. When pybullet is importable the real animator
is driven headless as well.
"""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from hkdmpc_tpu.models import hkd
from hkdmpc_tpu.solver import ddp
from tests.test_solver import make_trot

pytestmark = pytest.mark.skipif(
    not os.path.exists("/root/reference/lcmtypes"),
    reason="reference lcmtypes not available")


class _Capture:
    def __init__(self):
        self.msgs = []

    def publish(self, chan, buf):
        self.msgs.append((chan, bytes(buf)))


def _quat_from_rpy(rpy):
    """pybullet.getQuaternionFromEuler (XYZ fixed-axis) in numpy: (x,y,z,w)."""
    r, p, y = rpy
    cr, sr = np.cos(r / 2), np.sin(r / 2)
    cp, sp = np.cos(p / 2), np.sin(p / 2)
    cy, sy = np.cos(y / 2), np.sin(y / 2)
    return np.array([
        sr * cp * cy - cr * sp * sy,
        cr * sp * cy + sr * cp * sy,
        cr * cp * sy - sr * sp * cy,
        cr * cp * cy + sr * sp * sy,
    ])


def test_replay_channel_decodes_and_replays():
    from hkdmpc_tpu.comm.lcm_types import load_reference_types
    from hkdmpc_tpu.utils.visualize import publish_replay

    pb, x0, opt = make_trot(plan_duration=0.3)
    prob, state = pb.build(x0)
    res = ddp.solve_jit(prob, state, opt)
    pb.unflatten(res.state)

    tx = _Capture()
    publish_replay(pb.phases, tx)
    (chan, buf), = tx.msgs
    assert chan == "visualize_mc_motion"

    types = load_reference_types("/root/reference/lcmtypes")
    msg = types["visualize_quadTraj_lcmt"].decode(buf)

    n = int(msg["len"])
    assert n == sum(ph.horizon for ph in pb.phases)
    # published body trajectory is the solved nominal
    flat = np.concatenate([ph.Xbar[:ph.horizon] for ph in pb.phases])
    np.testing.assert_allclose(msg["pos"], flat[:, 3:6].astype(np.float32),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(msg["eul"], flat[:, 0:3].astype(np.float32),
                               rtol=1e-6, atol=1e-6)

    # the consumer's frame loop (visualize_motion.py:76-84)
    contacts = np.concatenate(
        [np.tile(ph.contact, (ph.horizon, 1)) for ph in pb.phases])
    for k in range(0, n - 1, 5):
        eul_k = np.asarray(msg["eul"][k], np.float64)
        rpy_k = eul_k[[2, 1, 0]]
        quat_k = _quat_from_rpy(rpy_k)
        assert abs(np.linalg.norm(quat_k) - 1.0) < 1e-9
        pos_k = np.asarray(msg["pos"][k], np.float64)
        qJ_k = np.asarray(msg["qJ"][k], np.float64)

        # FK of the pose the animator would set reproduces the published
        # feet; stance feet are on the ground
        feet = np.asarray(hkd.foot_positions(
            jnp.asarray(pos_k), jnp.asarray(eul_k), jnp.asarray(qJ_k)))
        np.testing.assert_allclose(
            feet.reshape(12), np.asarray(msg["pFoot"][k], np.float64),
            atol=1e-5, err_msg=f"frame {k}")
        for leg in range(4):
            if contacts[k, leg] > 0:
                assert abs(feet[leg, 2]) < 0.03, (k, leg, feet[leg])

    # grf payload matches the solved controls
    flat_u = np.concatenate([ph.Ubar for ph in pb.phases])
    np.testing.assert_allclose(msg["grf"], flat_u[:, :12].astype(np.float32),
                               rtol=1e-5, atol=1e-5)


def test_replay_drives_pybullet_if_available():
    pybullet = pytest.importorskip("pybullet")
    from hkdmpc_tpu.comm.lcm_types import load_reference_types
    from hkdmpc_tpu.utils.visualize import publish_replay

    pb, x0, opt = make_trot(plan_duration=0.2)
    prob, state = pb.build(x0)
    res = ddp.solve_jit(prob, state, opt)
    pb.unflatten(res.state)
    tx = _Capture()
    publish_replay(pb.phases, tx)
    types = load_reference_types("/root/reference/lcmtypes")
    msg = types["visualize_quadTraj_lcmt"].decode(tx.msgs[0][1])

    cid = pybullet.connect(pybullet.DIRECT)
    try:
        body = pybullet.createMultiBody(
            baseMass=9.0,
            baseCollisionShapeIndex=pybullet.createCollisionShape(
                pybullet.GEOM_BOX, halfExtents=[0.2, 0.1, 0.05]))
        for k in range(int(msg["len"]) - 1):
            rpy = np.asarray(msg["eul"][k], np.float64)[[2, 1, 0]]
            quat = pybullet.getQuaternionFromEuler(rpy)
            pybullet.resetBasePositionAndOrientation(
                body, np.asarray(msg["pos"][k], np.float64), quat)
        pos, _ = pybullet.getBasePositionAndOrientation(body)
        assert np.isfinite(pos).all()
    finally:
        pybullet.disconnect(cid)
