"""Auxiliary subsystem tests: checkpoint/resume, f32-vs-f64 parity,
logging roundtrip, gaitLib conversion + solve, sweep inverse."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hkdmpc_tpu.config import load_constraint_params, load_ddp_setting
from hkdmpc_tpu.models import hkd
from hkdmpc_tpu.reference import QuadReference
from hkdmpc_tpu.reference.refgen import from_post_csv
from hkdmpc_tpu.solver import ddp
from hkdmpc_tpu.solver.problem import HKDProblem
from hkdmpc_tpu.utils.checkpoint import load_problem, save_problem

from tests.test_solver import make_trot, REF_SETTINGS, REF_CPARAMS

GAITLIB = "/root/reference/Reference/Data/gaitLib"


def test_checkpoint_roundtrip(tmp_path):
    pb, x0, opt = make_trot(plan_duration=0.3)
    prob, state = pb.build(x0)
    res = ddp.solve_jit(prob, state, opt)
    pb.unflatten(res.state)
    pb.update()

    ckpt = str(tmp_path / "mpc_state.npz")
    save_problem(ckpt, pb)

    pb2, _, _ = make_trot(plan_duration=0.3)
    load_problem(ckpt, pb2)
    assert len(pb2.phases) == len(pb.phases)
    for a, b in zip(pb.phases, pb2.phases):
        np.testing.assert_array_equal(a.contact, b.contact)
        np.testing.assert_allclose(a.Xbar, b.Xbar)
        np.testing.assert_allclose(a.K, b.K)
        np.testing.assert_allclose(a.al_sigma, b.al_sigma)

    # resumed problem continues solving identically
    prob_a, state_a = pb.build(x0)
    prob_b_, state_b_ = pb2.build(x0)
    ra = ddp.solve_jit(prob_a, state_a, opt.runtime())
    rb = ddp.solve_jit(prob_b_, state_b_, opt.runtime())
    assert abs(float(ra.cost) - float(rb.cost)) < 1e-10


def test_log_file_set_roundtrip(tmp_path):
    """The complete reference log-file set (HSDDP_Utils.h:80-222): four
    sequence logs + dynamics partial dumps, internally consistent with the
    solve (cost log sums to the reported total cost)."""
    from hkdmpc_tpu.utils.logging import load_log, log_solution

    pb, x0, opt = make_trot(plan_duration=0.3)
    prob, state = pb.build(x0)
    res = ddp.solve_jit(prob, state, opt)
    pb.unflatten(res.state)
    prob2, state2 = pb.build(x0)
    folder = str(tmp_path)
    log_solution(folder, pb, prob2, state2, opt)

    names = ["state_log.txt", "control_log.txt", "cost_log.txt",
             "value_grad_log.txt", "dynamics_partial_A.txt",
             "dynamics_partial_B.txt"]
    for n in names:
        assert os.path.exists(os.path.join(folder, n)), n

    n_rows = sum(ph.horizon + 1 for ph in pb.phases)
    states = load_log(os.path.join(folder, "state_log.txt"))
    controls = load_log(os.path.join(folder, "control_log.txt"))
    costs = load_log(os.path.join(folder, "cost_log.txt"))
    grads = load_log(os.path.join(folder, "value_grad_log.txt"))
    assert states.shape == (n_rows, 24)
    assert controls.shape == (n_rows, 24)
    assert grads.shape == (n_rows, 24)
    assert costs.shape == (n_rows, 1)

    # rows reproduce the warm-start arrays (5 significant digits)
    j = 0
    for ph in pb.phases:
        np.testing.assert_allclose(states[j: j + ph.horizon + 1], ph.Xbar,
                                   rtol=1e-4, atol=1e-4)
        # last control row duplicated (HSDDP_Utils.h:130-131)
        np.testing.assert_allclose(controls[j + ph.horizon],
                                   controls[j + ph.horizon - 1])
        j += ph.horizon + 1

    # cost log sums to the solve's reported cost
    assert abs(costs.sum() - float(res.cost)) < 1e-3 * max(1.0, float(res.cost))

    # A partials: one (24,24) block per step, blank-line separated
    with open(os.path.join(folder, "dynamics_partial_A.txt")) as f:
        blocks = [b for b in f.read().strip().split("\n\n") if b.strip()]
    assert len(blocks) == sum(ph.horizon for ph in pb.phases)
    first = np.asarray([[float(w) for w in r.split()]
                        for r in blocks[0].splitlines()])
    assert first.shape == (24, 24)
    assert np.isfinite(first).all()


def test_f32_solve_close_to_f64():
    """dtype study (SURVEY §7 hard part: f64->f32): the f32 solve must reach
    the same optimum within loose tolerance on the trot cold solve."""
    ref64 = QuadReference.from_file(
        "/root/reference/Reference/Data/trot/quad_reference.csv")
    cp = load_constraint_params(REF_CPARAMS)
    opt = load_ddp_setting(REF_SETTINGS)
    results = {}
    for dtype in (jnp.float64, jnp.float32):
        pb = HKDProblem(ref64, cparams=cp, dtype=dtype)
        pb.initialization()
        body = np.zeros(12)
        body[5] = 0.2486
        qJ = np.tile([0.0, -0.8, 1.6], 4)
        qd = hkd.compute_hkd_state(
            jnp.array(body[:3], dtype), jnp.array(body[3:6], dtype),
            jnp.array(qJ, dtype), jnp.array(pb.phases[0].contact, dtype))
        x0 = np.concatenate([body, np.asarray(qd)])
        prob, state = pb.build(x0)
        results[str(dtype.__name__)] = ddp.solve_jit(prob, state, opt)
    c64 = float(results["float64"].cost)
    c32 = float(results["float32"].cost)
    assert not bool(results["float32"].solve_failed)
    assert abs(c32 - c64) / c64 < 0.05, (c32, c64)
    assert float(results["float32"].dyn_feas) < 5e-3


@pytest.mark.skipif(not os.path.isdir(GAITLIB), reason="no gaitLib data")
def test_gaitlib_bounding_solves(tmp_path):
    path = from_post_csv(f"{GAITLIB}/bounding", str(tmp_path / "bounding.csv"))
    ref = QuadReference.from_file(path)
    cp = load_constraint_params(REF_CPARAMS)
    opt = load_ddp_setting(REF_SETTINGS)
    pb = HKDProblem(ref, cparams=cp)
    pb.initialization()
    body = ref.body_state[0]
    qd = hkd.compute_hkd_state(
        jnp.array(body[:3]), jnp.array(body[3:6]), jnp.array(ref.qJ[0]),
        jnp.array(pb.phases[0].contact, dtype=float))
    x0 = np.concatenate([body[:12], np.asarray(qd)])
    prob, state = pb.build(x0)
    res = ddp.solve_jit(prob, state, opt)
    assert not bool(res.solve_failed)
    assert float(res.dyn_feas) < 1e-2


def test_stage_timer_profile_solve():
    """TIME_PER_ITERATION analog (utils/timing.py): the stage-by-stage
    profiled driver runs the same math and fills all four stage buckets
    (HSDDP_Utils.h:11-19)."""
    from hkdmpc_tpu.utils.timing import StageTimer, profile_solve

    pb, x0, opt = make_trot(plan_duration=0.2)
    prob, state = pb.build(x0)
    timer = StageTimer()
    out = profile_solve(prob, state, opt, timer, max_iters=2)
    assert np.isfinite(np.asarray(out.Xbar)).all()
    s = timer.summary()
    assert s["iterations"] == 2
    for k in ("time_partial_ms", "time_bws_ms", "time_fit_ms",
              "time_rollout_ms"):
        assert s[k] > 0.0, (k, s)
    timer.print_summary()
