"""Integration tests for the HS-DDP solver on the reference's trot gait.

Oracles (the reference C++ solver can't build here — no Eigen/LCM in the
image), so these tests pin the solver to analytic invariants plus regression
values from a converged run:
  - cost descent to a converged optimum
  - multiple-shooting defects driven to ~0
  - AL touchdown constraint satisfied to threshold
  - friction cones satisfied
  - receding-horizon MPC loop stays feasible with runtime iteration caps
"""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hkdmpc_tpu.config import load_constraint_params, load_ddp_setting
from hkdmpc_tpu.models import hkd
from hkdmpc_tpu.reference import QuadReference
from hkdmpc_tpu.solver import ddp
from hkdmpc_tpu.solver.problem import HKDProblem

REF_DATA = "/root/reference/Reference/Data/trot/quad_reference.csv"
REF_SETTINGS = "/root/reference/HKDMPC/settings/ddp_setting.info"
REF_CPARAMS = "/root/reference/HKDMPC/settings/constraint_params.info"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_DATA), reason="reference gait data not available")


def make_trot(plan_duration=0.6):
    ref = QuadReference.from_file(REF_DATA)
    cp = load_constraint_params(REF_CPARAMS)
    opt = load_ddp_setting(REF_SETTINGS)
    pb = HKDProblem(ref, plan_duration=plan_duration, cparams=cp)
    pb.initialization()
    body = np.zeros(12)
    body[5] = 0.2486  # stand height (HKDMPC.cpp:45)
    qJ = np.tile([0.0, -0.8, 1.6], 4)
    qd = hkd.compute_hkd_state(
        jnp.array(body[:3]), jnp.array(body[3:6]), jnp.array(qJ),
        jnp.array(pb.phases[0].contact, dtype=float))
    x0 = np.concatenate([body, np.asarray(qd)])
    return pb, x0, opt


@pytest.fixture(scope="module")
def trot_solution():
    pb, x0, opt = make_trot()
    prob, state = pb.build(x0)
    res = ddp.solve_jit(prob, state, opt)
    return pb, x0, opt, prob, res


def test_cold_solve_converges(trot_solution):
    _, _, _, _, res = trot_solution
    assert not bool(res.solve_failed)
    assert float(res.cost) < 15.0                 # converged ~9.36
    assert float(res.dyn_feas) < 1e-3             # defects closed
    assert float(res.max_tconstr) < 2e-3          # touchdown height met
    assert float(res.max_pconstr) > -1e-8         # friction cones satisfied


def test_cost_trace_monotone_after_feasible(trot_solution):
    _, _, _, _, res = trot_solution
    ct = np.asarray(res.cost_trace)
    ct = ct[~np.isnan(ct)]
    # initial iterations trade cost for feasibility (merit descent);
    # once the defects close, cost must descend monotonically
    tail = ct[-3:]
    assert np.all(np.diff(tail) <= 1e-9)


def test_friction_cone_on_solution(trot_solution):
    _, _, _, prob, res = trot_solution
    U = np.asarray(res.state.Ubar)
    kinds = np.asarray(prob.kind)
    contact = np.asarray(prob.contact)
    mu = 0.7
    for t in np.flatnonzero(kinds == 1):
        f = U[t, :12].reshape(4, 3)
        for leg in range(4):
            if contact[t, leg] > 0:
                fx, fy, fz = f[leg]
                assert fz >= -1e-8
                assert abs(fx) <= mu * fz + 1e-6
                assert abs(fy) <= mu * fz + 1e-6


def test_stance_feet_stationary_on_solution(trot_solution):
    # qdummy of a stance leg must not move during a stance phase
    # (dynamics freeze it: hkinodyn qdummy rows)
    _, _, _, prob, res = trot_solution
    X = np.asarray(res.state.Xbar)
    kinds = np.asarray(prob.kind)
    contact = np.asarray(prob.contact)
    for t in np.flatnonzero(kinds == 1):
        for leg in range(4):
            if contact[t, leg] > 0:
                np.testing.assert_allclose(
                    X[t + 1, 12 + 3 * leg: 15 + 3 * leg],
                    X[t, 12 + 3 * leg: 15 + 3 * leg], atol=1e-9)


def test_touchdown_feet_on_ground(trot_solution):
    # at every terminal node with a touchdown constraint, the swing foot
    # height must be within tolerance of the ground
    _, _, _, prob, res = trot_solution
    X = np.asarray(res.state.Xbar)
    term = np.asarray(prob.term_mask)
    td = np.asarray(prob.td_mask)
    for j in np.flatnonzero(term > 0):
        for leg in range(4):
            if td[j, leg] > 0:
                pf = hkd.foot_position(
                    jnp.array(X[j, 3:6]), jnp.array(X[j, 0:3]),
                    jnp.array(X[j, 12 + 3 * leg: 15 + 3 * leg]), leg)
                assert abs(float(pf[2])) < 2e-3


def test_mpc_receding_horizon_loop(trot_solution):
    pb, x0, opt, prob, res = trot_solution
    opt_rt = opt.runtime()
    pb.unflatten(res.state)
    xk = np.asarray(res.state.Xbar[1])
    for it in range(5):
        pb.update()
        prob2, state2 = pb.build(xk)
        res2 = ddp.solve_jit(prob2, state2, opt_rt)
        assert not bool(res2.solve_failed)
        assert float(res2.dyn_feas) < 5e-3
        assert float(res2.max_tconstr) < 5e-3
        pb.unflatten(res2.state)
        xk = np.asarray(res2.state.Xbar[1])
        # trace buffers are sized by the iteration caps (round 5):
        # runtime caps 2x1 -> 3 entries (seed + up to 2 pushes), first
        # entry always the pre-iteration seed
        assert res2.cost_trace.shape[0] == ddp.trace_len_for(opt_rt) == 3
        assert not np.isnan(float(res2.cost_trace[0]))
    # cold caps keep the larger buffer
    assert res.cost_trace.shape[0] == ddp.trace_len_for(opt)


def test_single_shooting_mode():
    import dataclasses
    pb, x0, opt = make_trot(plan_duration=0.3)
    opt_ss = dataclasses.replace(opt, MS=False)
    prob, state = pb.build(x0)
    res = ddp.solve_jit(prob, state, opt_ss)
    assert not bool(res.solve_failed)
    assert float(res.cost) < 50.0
    # single shooting: defects only at phase starts, driven by rollout chaining
    assert float(res.dyn_feas) < 1.0


def test_long_horizon_solve():
    """Long-horizon scaling (SURVEY §5): a 2.0 s plan (T=215, ~12 phases)
    solves through the same flattened static-shape machinery — the graph
    builder, warm-start bookkeeping and backward sweep are sized by T, so
    nothing beyond T~75 had been demonstrated before this test. Runtime
    iteration caps keep CPU time bounded; the full-convergence behavior is
    covered by the T=75 suite and the TPU bench point (DESIGN.md §3g)."""
    pb, x0, opt = make_trot(plan_duration=2.0)
    assert pb.T >= 215          # ~3x the MPC window
    assert len(pb.phases) >= 10
    n_trans = sum(ph.horizon for ph in pb.phases) + len(pb.phases) - 1
    assert n_trans <= pb.T      # the scaled margin fits the phase density
    prob, state = pb.build(x0)
    res = ddp.solve_jit(prob, state, opt, pb.all_shooting())
    assert not bool(res.solve_failed)
    assert np.isfinite(float(res.cost))
    # multiple-shooting defects closed (same bar as the T=75 cold solve)
    assert float(res.dyn_feas) < 1e-3
    assert float(res.max_pconstr) > -1e-8
    # warm-started runtime-caps re-solve after a receding-horizon update
    # stays healthy (the MPC regime at long horizon)
    pb.unflatten(res.state)
    pb.update()
    x1 = np.asarray(res.state.Xbar[1])
    prob2, state2 = pb.build(x1)
    res2 = ddp.solve_jit(prob2, state2, opt.runtime(), pb.all_shooting())
    assert not bool(res2.solve_failed)
    assert float(res2.dyn_feas) < 1e-2
