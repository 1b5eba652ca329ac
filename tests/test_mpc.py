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


@pytest.mark.slow
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


class _CaptureTransport:
    def __init__(self):
        self.published = []

    def subscribe(self, chan):
        pass

    def publish(self, chan, buf):
        self.published.append((chan, bytes(buf)))


def test_solver_info_and_intermtraj_publish():
    """solver_info carries the four true per-iteration buffers
    (MultiPhaseDDP.cpp:532-541) and intermediate_ddp_traj round-trips the
    current trajectory (MultiPhaseDDP.h:76-88)."""
    from hkdmpc_tpu.comm.lcm_types import load_reference_types
    from hkdmpc_tpu.mpc.runtime import MPCService

    solver = HKDMPCSolver(REF_DATA, REF_SETTINGS, REF_CPARAMS, MPCConfig())
    solver.initialize()
    tx = _CaptureTransport()
    svc = MPCService(solver, tx)
    svc.publish_solver_info()
    svc.publish_trajectory()

    types = load_reference_types("/root/reference/lcmtypes")
    by_chan = dict(tx.published)
    assert set(by_chan) == {"solver_info", "intermediate_ddp_traj"}

    info = types["solver_info_lcmt"].decode(by_chan["solver_info"])
    res = solver.last_result
    ct = np.asarray(res.cost_trace)
    ct = ct[~np.isnan(ct)]
    n = int(info["n_iter"])
    assert n == len(ct)
    np.testing.assert_allclose(info["cost"], ct.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(
        info["dyn_feas"], np.asarray(res.feas_trace)[:n].astype(np.float32),
        rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        info["eqn_feas"], np.asarray(res.eqn_trace)[:n].astype(np.float32),
        rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        info["ineq_feas"], np.asarray(res.ineq_trace)[:n].astype(np.float32),
        rtol=1e-5, atol=1e-7)
    # per-iteration series must not be constant-filled fakes: the initial
    # cost differs from the converged cost on this problem
    assert not np.allclose(info["cost"][0], info["cost"][-1])

    traj = types["solver_intermtraj_lcmt"].decode(by_chan["intermediate_ddp_traj"])
    want_tau = sum(ph.horizon for ph in solver.problem.phases)
    assert int(traj["tau_sz"]) == want_tau
    assert int(traj["x_sz"]) == 24 and int(traj["u_sz"]) == 24
    x0 = solver.problem.phases[0].Xbar[0]
    np.testing.assert_allclose(traj["x_tau"][0], x0.astype(np.float32),
                               rtol=1e-6, atol=1e-7)
    assert np.isfinite(traj["x_tau"]).all() and np.isfinite(traj["u_tau"]).all()


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


@pytest.mark.slow
def test_mpc_through_trot_jump_trot():
    """BASELINE config 4: the gaitLib trot->jump->trot sequence end-to-end
    through the receding-horizon MPC loop (360 steps, 3.6 s), propagating the
    solver's own one-step prediction — the same validation level as the
    reference's kinematic PyBullet replay, with assertions.

    The converted reference is kinematically inconsistent in flight (z held
    at 0.36 through the 0.42 s aerial phase, v constant), so exact tracking
    is impossible by construction; the test pins what a correct solver must
    deliver: every re-solve healthy, a physically consistent flight arc
    (launch above the reference apex, ballistic fall, landing recovery), and
    bounded height tracking throughout."""
    from hkdmpc_tpu.reference.refgen import from_post_csv, foot_ik
    from hkdmpc_tpu.reference import QuadReference

    import tempfile
    with tempfile.TemporaryDirectory() as td:
        full = from_post_csv(
            "/root/reference/Reference/Data/gaitLib/trot_jump_trot",
            os.path.join(td, "tjt.csv"))
        q = QuadReference.from_file(full)
        solver = HKDMPCSolver(full, REF_SETTINGS, REF_CPARAMS, MPCConfig())

    x = solver.ref.hkd_state_table()[0].copy()
    solver.initialize(x0=x)
    assert float(solver.last_result.dyn_feas) < 1e-3

    def measure(x, contact, t):
        qJ = np.tile([0.0, -0.8, 1.6], 4)
        qd = x[12:24].reshape(4, 3)
        for leg in range(4):
            qJ[3 * leg: 3 * leg + 3] = (
                qd[leg] if contact[leg] == 0
                else foot_ik(x[3:6], x[0:3], qd[leg], leg))
        return dict(rpy=euler_to_measured_rpy(x[0:3]), p=x[3:6], v=x[9:12],
                    omega=x[6:9], qJ=qJ, mpc_time=t)

    zs, z_errs, contacts_seen = [], [], set()
    n_steps = 360  # launch ~2.9 s, flight to 3.29 s, landing recovery
    for step in range(n_steps):
        contact = solver.problem.phases[0].contact
        contacts_seen.add(tuple(contact))
        solver.update(**measure(x, contact, step * 0.01))
        assert not bool(solver.last_result.solve_failed), step
        ph0 = solver.problem.phases[0]
        x = (ph0.Xbar[1] if ph0.horizon >= 1
             else solver.problem.phases[1].Xbar[0]).copy()
        assert np.isfinite(x).all(), step
        zs.append(x[5])
        z_errs.append(abs(x[5] - q.body_state[min(step + 1, q.n - 1), 5]))

    zs = np.asarray(zs)
    # the long flight is executed as a real ballistic arc: apex above the
    # reference's (kinematically inconsistent) constant 0.36
    assert zs.max() > 0.45, zs.max()
    # height tracking bounded through takeoff/flight/landing
    assert np.max(z_errs) < 0.35, np.max(z_errs)
    # upright and recovered after landing
    assert 0.08 < zs[-1] < 0.45, zs[-1]
    assert np.all(zs > 0.05) and np.all(zs < 0.9)
    # the loop walked through flight and stance phases
    assert (0, 0, 0, 0) in contacts_seen
    assert (1, 1, 1, 1) in contacts_seen


@pytest.mark.slow
def test_async_service_at_100hz():
    """Drive MPCService.run_async with a >=100 Hz mpc_data stream over the
    native transport (the reference's robot loop rate, HKDMPC.cpp:26-29).
    The overlapped loop must keep the socket drained (zero transport queue
    drops), serve the freshest measurement (published mpc_times strictly
    increase; the final command answers the newest surviving request), and
    account for every received message — nothing silently lost."""
    import threading
    import time

    from hkdmpc_tpu.comm.lcm_types import load_reference_types
    from hkdmpc_tpu.comm.transport import LCMTransport
    from hkdmpc_tpu.mpc.runtime import MPCService

    try:
        tx = LCMTransport("udpm://239.255.76.67:7669?ttl=0")
    except Exception as e:  # no multicast in sandbox
        pytest.skip(f"multicast unavailable: {e}")
    probe = LCMTransport("udpm://239.255.76.67:7669?ttl=0")
    probe.subscribe("__probe__")
    probe.publish("__probe__", b"x")
    if probe.receive(timeout_ms=2000) is None:
        pytest.skip("multicast loopback unavailable in sandbox")

    solver = HKDMPCSolver(REF_DATA, REF_SETTINGS, REF_CPARAMS,
                          MPCConfig(fused_step=True, plan_duration=0.3))
    solver.initialize()
    svc = MPCService(solver, tx)
    base = dict(rpy=np.zeros(3), p=np.array([0.0, 0.0, 0.25]),
                v=np.zeros(3), omega=np.zeros(3),
                qJ=np.tile([0.0, -0.8, 1.6], 4))
    solver.update(mpc_time=0.0, **base)  # compile the fused program

    published = []
    orig_publish = svc.publish_command
    svc.publish_command = lambda cmd: (published.append(cmd),
                                       orig_publish(cmd))[-1]

    types = load_reference_types("/root/reference/lcmtypes")
    data_t = types["hkd_data_lcmt"]
    sender = LCMTransport("udpm://239.255.76.67:7669?ttl=0")
    N = 100

    def send_stream():
        for i in range(N):
            msg = {"reset_mpc": False, "MS": False,
                   "mpctime": 0.01 * (i + 1),
                   "contact": [1, 1, 1, 1], "p": base["p"],
                   "vWorld": base["v"], "rpy": base["rpy"],
                   "omegaBody": base["omega"],
                   "qJ": base["qJ"].astype(np.float32),
                   "foot_placements": np.zeros(12, np.float32)}
            sender.publish("mpc_data", data_t.encode(msg))
            time.sleep(0.01)

    th = threading.Thread(target=send_stream)
    th.start()
    stats = svc.run_async(max_messages=N, duration_s=60)
    th.join()

    # every received message is accounted for — none silently lost
    assert stats["received"] >= 0.9 * N, stats
    assert stats["received"] == (stats["solved"] + stats["superseded"]
                                 + stats["resets"] + stats["unserved"]), stats
    assert stats["unserved"] == 0, stats
    # the overlapped loop kept the socket drained: no transport-level drops
    assert stats["queue_drops"] == 0, stats
    assert stats["frag_evictions"] == 0, stats
    assert stats["solved"] == len(published) > 0

    # newest-wins ordering: served mpc_times strictly increase, and the last
    # served command answers the newest received request
    t_served = [cmd.mpc_times[0] for cmd in published]
    assert all(b > a for a, b in zip(t_served, t_served[1:])), t_served
    if stats["received"] == N:
        np.testing.assert_allclose(t_served[-1], 0.01 * N)
    # zero corruption: all published commands decode finite
    for cmd in published:
        assert np.isfinite(cmd.hkd_controls).all()
        assert np.isfinite(cmd.feedback).all()

    tx.close()
    sender.close()
    probe.close()
