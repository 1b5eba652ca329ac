"""Closed-loop MPC test: the orchestrator drives the HKD model itself.

The plant is the same forward-Euler HKD model (a kinodynamic consistency
check, like the reference's PyBullet kinematic replay but with assertions):
apply the first published control with the published feedback gains, step the
true dynamics, feed the measured state back. The controller must keep
tracking the trot reference.
"""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from hkdmpc_tpu.models import hkd
from hkdmpc_tpu.mpc.solver import HKDMPCSolver, MPCConfig

REF_DATA = "/root/reference/Reference/Data/trot/quad_reference.csv"
REF_SETTINGS = "/root/reference/HKDMPC/settings/ddp_setting.info"
REF_CPARAMS = "/root/reference/HKDMPC/settings/constraint_params.info"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_DATA), reason="reference data not available")


def euler_to_measured_rpy(eul):
    # controller expects (roll, pitch, yaw); internal state is (yaw, pitch, roll)
    return np.asarray([eul[2], eul[1], eul[0]])


def test_closed_loop_trot():
    solver = HKDMPCSolver(REF_DATA, REF_SETTINGS, REF_CPARAMS, MPCConfig())
    cmd = solver.initialize()
    assert cmd.N_mpcsteps == 8
    assert np.isfinite(cmd.hkd_controls).all()

    # plant state: start at the stand pose
    x = HKDMPCSolver.default_stand_state(solver.problem.phases[0].contact)
    dt = solver.cfg.timestep

    # The consumer applies commands with one control-cycle latency (the
    # reference publishes nsteps+7 controls precisely "to account for delay",
    # HKDMPC.cpp:245-246, and zeroes the first control of the shifted horizon
    # each update, HKDProblem.cpp:219 — so command k=0 of a fresh message is
    # not meant to actuate; the delayed entry k=1 is).
    cmds = [cmd]  # cmds[s] = command available at plant step s
    heights, tracking_err = [], []
    for step in range(25):
        contact = solver.problem.phases[0].contact.astype(float)
        # policy: u = u_ff + K (x - x_nominal) from the delayed command
        cmd_use = cmds[step]
        k = 0 if step == 0 else 1
        u = cmd_use.hkd_controls[k].copy()
        dx12 = x[:12] - cmd_use.des_body_state[k]
        u[:12] += cmd_use.feedback[k] @ dx12
        x = np.asarray(hkd.dynamics(jnp.asarray(x), jnp.asarray(u),
                                    jnp.asarray(contact), dt))
        heights.append(x[5])
        # measured -> controller
        qJ_meas = np.tile([0.0, -0.8, 1.6], 4)  # swing-leg joint proxy
        qd = x[12:24].reshape(4, 3)
        for leg in range(4):
            if contact[leg] == 0:
                qJ_meas[3 * leg: 3 * leg + 3] = qd[leg]
        cmds.append(solver.update(
            rpy=euler_to_measured_rpy(x[0:3]), p=x[3:6], v=x[9:12],
            omega=x[6:9], qJ=qJ_meas, mpc_time=step * dt))
        ref_idx = solver.ref.k_cur
        ref_body = solver.ref.body_state[ref_idx]
        tracking_err.append(np.linalg.norm(x[3:6] - ref_body[3:6]))
        assert np.isfinite(x).all()

    heights = np.asarray(heights)
    # robot body stays upright near the 0.25 m reference height
    assert np.all(heights > 0.15) and np.all(heights < 0.40), heights
    # position tracking error stays bounded
    assert np.max(tracking_err) < 0.2, tracking_err


def test_command_contract():
    solver = HKDMPCSolver(REF_DATA, REF_SETTINGS, REF_CPARAMS, MPCConfig())
    cmd = solver.initialize()
    d = cmd.to_lcm_dict()
    assert d["hkd_controls"].shape == (10, 24)
    assert d["feedback"].shape == (10, 12, 12)
    assert d["contacts"].shape == (10, 4)
    # first phase of trot is full stance
    np.testing.assert_array_equal(d["contacts"][0], [1, 1, 1, 1])
    # encodes to the LCM wire format
    from hkdmpc_tpu.comm.lcm_types import load_reference_types
    types = load_reference_types("/root/reference/lcmtypes")
    buf = types["hkd_command_lcmt"].encode(d)
    out = types["hkd_command_lcmt"].decode(buf)
    np.testing.assert_allclose(out["hkd_controls"],
                               d["hkd_controls"].astype(np.float32), rtol=1e-6)
