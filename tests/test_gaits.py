"""Solver coverage across gait families (BASELINE configs 2-4).

- flytrot: flight phases (no stance legs -> no GRF constraint rows)
- barrelroll: aggressive attitude maneuver
- synthesized hop: AL touchdown + ReB cone on a pronk/hop schedule
- gait transition: trot -> hop -> pronk in one horizon (synthesized)
"""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from hkdmpc_tpu.config import load_constraint_params, load_ddp_setting
from hkdmpc_tpu.models import hkd
from hkdmpc_tpu.reference import QuadReference
from hkdmpc_tpu.reference.refgen import GaitSynthesizer
from hkdmpc_tpu.solver import ddp
from hkdmpc_tpu.solver.problem import HKDProblem

REF_ROOT = "/root/reference/Reference/Data"
REF_SETTINGS = "/root/reference/HKDMPC/settings/ddp_setting.info"
REF_CPARAMS = "/root/reference/HKDMPC/settings/constraint_params.info"


def solve_reference_file(path, plan=0.6, qJ0=(0.0, -0.8, 1.6)):
    ref = QuadReference.from_file(path)
    cp = load_constraint_params(REF_CPARAMS)
    opt = load_ddp_setting(REF_SETTINGS)
    pb = HKDProblem(ref, plan_duration=plan, cparams=cp)
    pb.initialization()
    body = ref.body_state[0].copy()
    qJ = ref.qJ[0].copy() if np.any(ref.qJ[0]) else np.tile(qJ0, 4)
    qd = hkd.compute_hkd_state(
        jnp.array(body[:3]), jnp.array(body[3:6]), jnp.array(qJ),
        jnp.array(pb.phases[0].contact, dtype=float))
    x0 = np.concatenate([body[:12], np.asarray(qd)])
    prob, state = pb.build(x0)
    res = ddp.solve_jit(prob, state, opt)
    return pb, res


@pytest.mark.skipif(not os.path.exists(f"{REF_ROOT}/flytrot/quad_reference.csv"),
                    reason="no reference data")
@pytest.mark.slow
def test_flytrot_with_flight_phases():
    pb, res = solve_reference_file(f"{REF_ROOT}/flytrot/quad_reference.csv")
    # flight phases present
    assert any((ph.contact == 0).all() for ph in pb.phases)
    assert not bool(res.solve_failed)
    assert float(res.dyn_feas) < 1e-2
    assert float(res.max_tconstr) < 5e-3


@pytest.mark.skipif(not os.path.exists(f"{REF_ROOT}/barrelroll/quad_reference.csv"),
                    reason="no reference data")
@pytest.mark.slow
def test_barrelroll():
    pb, res = solve_reference_file(f"{REF_ROOT}/barrelroll/quad_reference.csv")
    assert not bool(res.solve_failed)
    assert float(res.dyn_feas) < 5e-2


def test_synthesized_hop(tmp_path):
    gs = GaitSynthesizer()
    path = gs.write(str(tmp_path / "hop.csv"), [("hop", 1.0, 0.2)])
    pb, res = solve_reference_file(path)
    assert not bool(res.solve_failed)
    assert float(res.dyn_feas) < 1e-2
    assert float(res.max_tconstr) < 5e-3
    assert float(res.max_pconstr) > -1e-6


@pytest.mark.slow
def test_gait_transition_trot_hop_pronk(tmp_path):
    gs = GaitSynthesizer()
    path = gs.write(str(tmp_path / "mix.csv"),
                    [("trot", 0.4, 0.3), ("hop", 0.4, 0.2),
                     ("pronk", 0.4, 0.3)], lead_in=0.1)
    pb, res = solve_reference_file(path)
    assert not bool(res.solve_failed)
    assert float(res.dyn_feas) < 1e-2

    # MPC across the gait transitions: phase structure changes every which
    # way; must never recompile-fail or blow up
    opt = load_ddp_setting(REF_SETTINGS).runtime()
    pb.unflatten(res.state)
    xk = np.asarray(res.state.Xbar[1])
    feas_hist = []
    for _ in range(30):
        pb.update()
        prob2, state2 = pb.build(xk)
        res2 = ddp.solve_jit(prob2, state2, opt)
        assert not bool(res2.solve_failed)
        assert np.isfinite(float(res2.cost))
        feas_hist.append(float(res2.dyn_feas))
        pb.unflatten(res2.state)
        xk = np.asarray(res2.state.Xbar[1])
    # with runtime caps (1 DDP iter/solve) feasibility spikes when fresh
    # phases appear at gait boundaries, but must stay bounded and recover
    assert max(feas_hist) < 5.0, feas_hist
    assert np.median(feas_hist) < 0.5, feas_hist


def test_reorder_states_mhpc_convention():
    """QuadReference.reorder_states == the reference's MHPC reorder
    (QuadReference.cpp:287-323): body [eul,pos,omega,v]->[pos,eul,v,omega]
    with z=0.25, left/right leg pairs swapped, hip/knee signs flipped,
    qJd zeroed."""
    import numpy as np
    from hkdmpc_tpu.reference import QuadReference

    ref = QuadReference.from_file(
        "/root/reference/Reference/Data/trot/quad_reference.csv")
    b0 = ref.body_state.copy()
    qj0 = ref.qJ.copy()
    grf0 = ref.grf.copy()
    c0 = ref.contact.copy()

    ref.reorder_states()

    np.testing.assert_allclose(ref.body_state[:, 0:2], b0[:, 3:5])
    assert np.all(ref.body_state[:, 2] == 0.25)
    np.testing.assert_allclose(ref.body_state[:, 3:6], b0[:, 0:3])
    np.testing.assert_allclose(ref.body_state[:, 6:9], b0[:, 9:12])
    np.testing.assert_allclose(ref.body_state[:, 9:12], b0[:, 6:9])
    # leg pair swap + hip/knee sign flip
    np.testing.assert_allclose(ref.qJ[:, 0], qj0[:, 3])
    np.testing.assert_allclose(ref.qJ[:, 1], -qj0[:, 4])
    np.testing.assert_allclose(ref.qJ[:, 2], -qj0[:, 5])
    np.testing.assert_allclose(ref.grf[:, 0:3], grf0[:, 3:6])
    np.testing.assert_allclose(ref.contact, c0[:, [1, 0, 3, 2]])
    assert np.all(ref.qJd == 0)


def test_record_motion_towr_roundtrip(tmp_path):
    """TOWR recorder analog (scripts/record_motion.py): a synthetic
    mc_towr_data_t trajectory converts to the PreProcessedData CSV set,
    which from_preprocessed turns into a loadable quad_reference; the
    closed-form IK is FK-consistent with the recorded foot positions."""
    import numpy as np
    import jax.numpy as jnp
    import sys
    sys.path.insert(0, "/root/repo/scripts")
    from record_motion import towr_msg_to_traj, write_traj_to_file
    from hkdmpc_tpu.comm.lcm_types import load_reference_types
    from hkdmpc_tpu.models import hkd
    from hkdmpc_tpu.reference import QuadReference
    from hkdmpc_tpu.reference.refgen import from_preprocessed

    n = 10
    stance = np.array([
        [0.17, -0.12, 0.0], [0.17, 0.12, 0.0],
        [-0.20, -0.12, 0.0], [-0.20, 0.12, 0.0]]).reshape(12)
    msg = {
        "len": n,
        "microtime": (np.arange(n) * 10000).astype(np.int32),
        "base_pos": np.column_stack(
            [0.01 * np.arange(n), np.zeros(n), np.full(n, 0.27)]),
        "base_vel": np.tile([1.0, 0.0, 0.0], (n, 1)),
        "eul": np.tile([0.0, 0.02, 0.0], (n, 1)),
        "eulrate": np.tile([0.0, 0.0, 0.1], (n, 1)),
        "ee_pos": np.tile(stance, (n, 1))
        + np.column_stack([np.repeat(0.01 * np.arange(n), 1)]
                          + [np.zeros(n)] * 11),
        "contact": np.ones((n, 4), np.int16),
    }
    # wire round trip through the mini lcm-gen
    towr_t = load_reference_types(
        "/root/reference/scripts/PyBullet/lcmtypes")["mc_towr_data_t"]
    msg = towr_t.decode(towr_t.encode(msg))

    time, body, jnt, ee, contact = towr_msg_to_traj(msg)
    assert body.shape == (n, 12) and jnt.shape == (n, 12)

    # IK consistency: FK of the recorded joints reproduces ee_pos
    for k in (0, n - 1):
        eul_zyx = body[k, 0:3][::-1]
        feet = np.asarray(hkd.foot_positions(
            jnp.asarray(body[k, 3:6]), jnp.asarray(eul_zyx),
            jnp.asarray(jnt[k])))
        np.testing.assert_allclose(feet.reshape(12), ee[k], atol=1e-6)

    out = tmp_path / "towr"
    write_traj_to_file(str(out), time, body, jnt, ee, contact)
    from_preprocessed(str(out), str(tmp_path / "towr_ref.csv"))
    q = QuadReference.from_file(str(tmp_path / "towr_ref.csv"))
    assert q.n == n
    assert abs(q.dt - 0.01) < 1e-9
    np.testing.assert_allclose(q.contact, np.ones((n, 4)))
