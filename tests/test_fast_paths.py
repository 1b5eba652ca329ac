"""Equivalence tests for the TPU fast paths against the faithful versions:

- parallel (scan-free) hybrid rollout == sequential scan rollout
- sweep-operator inverse == cholesky-check + LU inverse (in backward sweep)
- full solve with parallel_rollout=True == solve with the scan rollout
"""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_solver import make_trot
from hkdmpc_tpu.solver import backward, ddp, lq as lq_mod, rollout as ro_mod


def _solved_state():
    pb, x0, opt = make_trot()
    prob, state = pb.build(x0)
    res = ddp.solve_jit(prob, state, opt)
    return pb, prob, res.state, opt


def _fresh_caches():
    """Bound per-process compiled-code volume INSIDE this module: the
    XLA:CPU JIT segfaults deterministically once a process accumulates too
    many compiled programs (see tests/conftest.py — the per-module clear
    is not enough for this module's many full-solve variants since the
    assoc-backward defaults grew the fused/classic programs). Clearing
    before each of the heaviest tests trades recompiles for staying under
    the crash threshold."""
    jax.clear_caches()


def test_parallel_rollout_matches_scan():
    pb, prob, state, opt = _solved_state()
    assert pb.all_shooting()
    # nonzero dU/K/dX: run one LQ + backward to populate a search direction
    ro = ro_mod.hybrid_rollout(prob, state, 0.0, True)
    lqd = lq_mod.lq_approximation(prob, ro.X, ro.U, state.constr, True, True)
    last = ro_mod.last_active_node(prob)
    dU, K, dv1, dv2, reg, ok, failed = backward.backward_sweep_regularized(
        prob, lqd, ro.defect, 0.0, 4.0, last)
    state = dataclasses.replace(state, dU=dU, K=K)
    dX, _, _ = ro_mod.linear_rollout(prob, state, lqd, ro.defect, 1.0)
    state = dataclasses.replace(state, dX=dX)

    for eps in [0.0, 0.1, 1.0]:
        a = ro_mod.hybrid_rollout(prob, state, eps, True)
        b = ro_mod.hybrid_rollout_parallel(prob, state, eps)
        np.testing.assert_allclose(a.X, b.X, atol=1e-12)
        np.testing.assert_allclose(a.U, b.U, atol=1e-12)
        np.testing.assert_allclose(a.defect, b.defect, atol=1e-12)
        assert bool(a.success) == bool(b.success)


def test_lq_tminor_matches_generic():
    pb, prob, state, opt = _solved_state()
    ro = ro_mod.hybrid_rollout(prob, state, 0.0, True)
    from hkdmpc_tpu.solver.model_api import hkd_model_spec, ModelSpec
    fast = hkd_model_spec()
    slow = ModelSpec(
        dynamics=fast.dynamics, dynamics_jacobians=fast.dynamics_jacobians,
        reset_map=fast.reset_map, reset_map_jacobian=fast.reset_map_jacobian,
        cost_terms=fast.cost_terms, path_constraints=fast.path_constraints,
        terminal_constraints=fast.terminal_constraints)
    assert fast.build_AB_tminor is not None and slow.build_AB_tminor is None
    a = lq_mod.lq_approximation(prob, ro.X, ro.U, state.constr, True, True,
                                fast)
    b = lq_mod.lq_approximation(prob, ro.X, ro.U, state.constr, True, True,
                                slow)
    for name in ("A", "B", "lx", "lu", "lxx", "luu", "lux", "phix", "phixx"):
        # lux may be elided as None (lux_is_zero) — that claims exact zeros,
        # so compare against the generic path with None treated as 0
        va, vb = getattr(a, name), getattr(b, name)
        if va is None:
            va = np.zeros_like(np.asarray(vb))
        np.testing.assert_allclose(va, vb, atol=1e-11, err_msg=name)


def test_aug_sweep_riccati_matches_explicit():
    pb, prob, state, opt = _solved_state()
    ro = ro_mod.hybrid_rollout(prob, state, 0.0, True)
    lqd = lq_mod.lq_approximation(prob, ro.X, ro.U, state.constr, True, True)
    last = ro_mod.last_active_node(prob)
    a = backward.backward_sweep(prob, lqd, ro.defect, 0.01, last,
                                aug_sweep=True)
    b = backward.backward_sweep(prob, lqd, ro.defect, 0.01, last,
                                aug_sweep=False)
    for x, y, name in [(a[0], b[0], "dU"), (a[1], b[1], "K"),
                       (a[4], b[4], "dV1"), (a[5], b[5], "dV2")]:
        np.testing.assert_allclose(x, y, atol=1e-7, rtol=1e-7, err_msg=name)
    assert bool(a[6]) == bool(b[6])


def test_tminor_cost_and_dynamics_match_generic():
    pb, prob, state, opt = _solved_state()
    from hkdmpc_tpu.ops import hkd_tminor
    from hkdmpc_tpu.models import hkd
    import jax

    ro = ro_mod.hybrid_rollout(prob, state, 0.0, True)
    X, U = ro.X, ro.U

    sim_a = hkd_tminor.dynamics_tbatch(X[:-1], U, prob.contact, prob.dt)
    sim_b = jax.vmap(hkd.dynamics, in_axes=(0, 0, 0, None))(
        X[:-1], U, prob.contact, prob.dt)
    np.testing.assert_allclose(sim_a, sim_b, atol=1e-12)

    rst_a = hkd_tminor.reset_tbatch(X[:-1], prob.contact, prob.contact_next)
    rst_b = jax.vmap(hkd.reset_map)(X[:-1], prob.contact, prob.contact_next)
    np.testing.assert_allclose(rst_a, rst_b, atol=1e-12)

    from hkdmpc_tpu.solver.model_api import hkd_model_spec, ModelSpec
    fast = hkd_model_spec()
    slow = ModelSpec(
        dynamics=fast.dynamics, dynamics_jacobians=fast.dynamics_jacobians,
        reset_map=fast.reset_map, reset_map_jacobian=fast.reset_map_jacobian,
        cost_terms=fast.cost_terms, path_constraints=fast.path_constraints,
        terminal_constraints=fast.terminal_constraints)
    ca, (ga, ha) = ro_mod.compute_cost(prob, X, U, state.constr, True, True,
                                       fast)
    cb, (gb, hb) = ro_mod.compute_cost(prob, X, U, state.constr, True, True,
                                       slow)
    assert abs(float(ca) - float(cb)) < 1e-9
    np.testing.assert_allclose(ga, gb, atol=1e-12)
    np.testing.assert_allclose(ha, hb, atol=1e-12)


def test_solve_parallel_rollout_equivalent():
    pb, x0, opt = make_trot()
    prob, state = pb.build(x0)
    res_a = ddp.solve_jit(prob, state, opt, False)
    res_b = ddp.solve_jit(prob, state, opt, True)
    assert abs(float(res_a.cost) - float(res_b.cost)) < 1e-6
    assert abs(float(res_a.dyn_feas) - float(res_b.dyn_feas)) < 1e-6
    np.testing.assert_allclose(res_a.state.Ubar, res_b.state.Ubar, atol=1e-6)


def test_pallas_backward_matches_scan_per_lane_reg():
    """The explicit-batch Pallas sweep (interpret mode on CPU) reproduces the
    per-scenario sweep, including heterogeneous per-lane regularization (the
    vmapped reg-retry loop batches reg after the first retry). f32 roundoff
    differs between the two orderings; the kernel's error vs the f64 oracle
    is bounded by the f32 scan's own roundoff scale."""
    from hkdmpc_tpu.ops.pallas_backward import backward_sweep_pallas

    pb, prob, state, opt = _solved_state()
    ro = ro_mod.hybrid_rollout(prob, state, 0.0, True)
    lqd = lq_mod.lq_approximation(prob, ro.X, ro.U, state.constr, True, True)
    last = ro_mod.last_active_node(prob)
    f32 = lambda x: None if x is None else jnp.asarray(x, jnp.float32)
    lq32 = jax.tree_util.tree_map(f32, lqd)
    d32 = f32(ro.defect)

    regs = jnp.asarray([0.0, 1e-3, 0.05, 2.0], jnp.float32)
    B = regs.shape[0]
    tile = lambda x: jnp.broadcast_to(x[None], (B,) + x.shape)
    dU, K, dv1, dv2, ok = backward_sweep_pallas(
        tile(prob.kind), tile(lq32.A), tile(lq32.B), tile(lq32.lxx),
        tile(lq32.luu), tile(lq32.lx), tile(lq32.lu), tile(d32),
        tile(lq32.phix), tile(lq32.phixx), regs,
        jnp.full((B,), last, jnp.int32), interpret=True)

    for i in range(B):
        # f64 oracle + f32 scan at this scenario's reg
        o = backward.backward_sweep(prob, lqd, ro.defect,
                                    jnp.float64(regs[i]), last,
                                    aug_sweep=True)
        s = backward.backward_sweep(prob, lq32, d32, regs[i], last,
                                    aug_sweep=True)
        for got, oracle, scan_f32, name in [
                (dU[i], o[0], s[0], "dU"), (K[i], o[1], s[1], "K"),
                (dv1[i], o[4], s[4], "dv1"), (dv2[i], o[5], s[5], "dv2")]:
            roundoff = float(jnp.max(jnp.abs(jnp.asarray(scan_f32, jnp.float64)
                                             - oracle)))
            np.testing.assert_allclose(
                np.asarray(got, np.float64), np.asarray(oracle),
                atol=4.0 * roundoff + 1e-6, rtol=0,
                err_msg=f"{name} reg={float(regs[i])}")
        assert bool(ok[i]) == bool(s[6])


@pytest.mark.slow
def test_solve_pallas_backward_equivalent_under_vmap():
    """vmap(solve, pallas_backward=True) == vmap(solve) (f32, runtime caps);
    exercises the custom_vmap dispatch end to end (interpret mode on CPU)."""
    from hkdmpc_tpu.parallel import perturb_scenarios, replicate_problem

    pb, x0, opt = make_trot()
    prob, state = pb.build(x0)
    f32 = lambda x: (jnp.asarray(x, jnp.float32)
                     if isinstance(x, jnp.ndarray) and
                     jnp.issubdtype(x.dtype, jnp.floating) else x)
    prob = jax.tree_util.tree_map(f32, prob)
    state = jax.tree_util.tree_map(f32, state)
    opt = opt.runtime()
    prob_b, state_b = replicate_problem(prob, state, 4)
    prob_b = dataclasses.replace(
        prob_b, x0=perturb_scenarios(prob_b, jax.random.PRNGKey(3)).x0)

    res_a = ddp.solve_batch(prob_b, state_b, opt, True, None, False, True,
                            False)
    res_b = ddp.solve_batch(prob_b, state_b, opt, True, None, False, True,
                            True)
    np.testing.assert_allclose(res_a.cost, res_b.cost, rtol=1e-4)
    np.testing.assert_allclose(res_a.dyn_feas, res_b.dyn_feas,
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(res_a.state.Ubar, res_b.state.Ubar,
                               rtol=1e-3, atol=2e-3)
    assert not bool(jnp.any(res_a.solve_failed))
    assert not bool(jnp.any(res_b.solve_failed))


@pytest.mark.slow
def test_fused_mpc_step_matches_classic():
    """Device-resident fused MPC step (mpc/fused.py) == faithful
    unflatten->update->build->solve path, step for step over a closed-loop
    trot segment crossing phase pops/appends."""
    _fresh_caches()
    from hkdmpc_tpu.mpc.solver import HKDMPCSolver, MPCConfig

    REF = "/root/reference/Reference/Data/trot/quad_reference.csv"
    SET = "/root/reference/HKDMPC/settings/ddp_setting.info"
    CPAR = "/root/reference/HKDMPC/settings/constraint_params.info"

    classic = HKDMPCSolver(REF, SET, CPAR, MPCConfig())
    fused = HKDMPCSolver(REF, SET, CPAR, MPCConfig(fused_step=True))
    c0 = classic.initialize()
    f0 = fused.initialize()
    np.testing.assert_allclose(f0.hkd_controls, c0.hkd_controls)

    rng = np.random.default_rng(3)
    for step in range(12):
        meas = dict(
            rpy=rng.normal(scale=0.01, size=3),
            p=np.array([0.0, 0.0, 0.25]) + rng.normal(scale=0.005, size=3),
            v=rng.normal(scale=0.02, size=3),
            omega=rng.normal(scale=0.02, size=3),
            qJ=np.tile([0.0, -0.8, 1.6], 4) + rng.normal(scale=0.01, size=12),
            mpc_time=step * 0.01)
        cc = classic.update(**meas)
        fc = fused.update(**meas)
        np.testing.assert_allclose(fc.hkd_controls, cc.hkd_controls,
                                   rtol=1e-9, atol=1e-10, err_msg=f"step {step}")
        np.testing.assert_allclose(fc.des_body_state, cc.des_body_state,
                                   rtol=1e-9, atol=1e-10, err_msg=f"step {step}")
        np.testing.assert_allclose(fc.feedback, cc.feedback,
                                   rtol=1e-8, atol=1e-8, err_msg=f"step {step}")
        np.testing.assert_array_equal(fc.contacts, cc.contacts)
        np.testing.assert_allclose(fc.status_times, cc.status_times)
        np.testing.assert_allclose(fc.foot_placement, cc.foot_placement,
                                   rtol=1e-9, atol=1e-10, err_msg=f"step {step}")
        # per-iteration traces identical -> same solve path taken
        ct_c = np.asarray(classic.last_result.cost_trace)
        ct_f = np.asarray(fused.last_result.cost_trace)
        np.testing.assert_allclose(
            ct_f[~np.isnan(ct_f)], ct_c[~np.isnan(ct_c)], rtol=1e-9,
            err_msg=f"step {step}")

    # materialize() refreshes host arrays to match the classic problem state
    fused.materialize()
    for a, b in zip(classic.problem.phases, fused.problem.phases):
        np.testing.assert_allclose(b.Xbar, a.Xbar, rtol=1e-9, atol=1e-10)
        np.testing.assert_allclose(b.Ubar, a.Ubar, rtol=1e-9, atol=1e-10)


@pytest.mark.slow
def test_checkpoint_resume_fused_matches_classic(tmp_path):
    """Checkpoint -> HKDMPCSolver.resume() re-arms the fused device-resident
    path: Phase.uid survives the checkpoint round trip, so the uid-keyed
    shift-descriptor gathers (problem.flat_offsets) stay valid and a resumed
    fused service matches a resumed classic service step for step."""
    _fresh_caches()
    from hkdmpc_tpu.mpc.solver import HKDMPCSolver, MPCConfig
    from hkdmpc_tpu.utils.checkpoint import save_problem

    REF = "/root/reference/Reference/Data/trot/quad_reference.csv"
    SET = "/root/reference/HKDMPC/settings/ddp_setting.info"
    CPAR = "/root/reference/HKDMPC/settings/constraint_params.info"
    cfg = dict(plan_duration=0.3)

    rng = np.random.default_rng(7)

    def meas(step):
        return dict(
            rpy=rng.normal(scale=0.01, size=3),
            p=np.array([0.0, 0.0, 0.25]) + rng.normal(scale=0.005, size=3),
            v=rng.normal(scale=0.02, size=3),
            omega=rng.normal(scale=0.02, size=3),
            qJ=np.tile([0.0, -0.8, 1.6], 4) + rng.normal(scale=0.01, size=12),
            mpc_time=step * 0.01)

    live = HKDMPCSolver(REF, SET, CPAR, MPCConfig(**cfg))
    live.initialize()
    for step in range(3):
        live.update(**meas(step))
    ckpt = str(tmp_path / "mpc_state.npz")
    save_problem(ckpt, live.problem)
    assert len({ph.uid for ph in live.problem.phases}) == \
        len(live.problem.phases), "phase uids must be distinct"

    classic = HKDMPCSolver(REF, SET, CPAR, MPCConfig(**cfg))
    fusedr = HKDMPCSolver(REF, SET, CPAR, MPCConfig(fused_step=True, **cfg))
    c0 = classic.resume(ckpt)
    f0 = fusedr.resume(ckpt)
    # restored uids are distinct (the r2 bug collapsed them all to -1)
    assert len({ph.uid for ph in fusedr.problem.phases}) == \
        len(fusedr.problem.phases)
    np.testing.assert_allclose(f0.hkd_controls, c0.hkd_controls)

    rng = np.random.default_rng(7)  # replay the same measurement stream
    for step in range(3):
        meas(step)
    saw_pop = False
    uids0 = {ph.uid for ph in classic.problem.phases}
    for step in range(3, 13):
        m = meas(step)
        cc = classic.update(**m)
        fc = fusedr.update(**m)
        saw_pop = saw_pop or {ph.uid for ph in classic.problem.phases} != uids0
        np.testing.assert_allclose(fc.hkd_controls, cc.hkd_controls,
                                   rtol=1e-9, atol=1e-10,
                                   err_msg=f"step {step}")
        np.testing.assert_allclose(fc.des_body_state, cc.des_body_state,
                                   rtol=1e-9, atol=1e-10,
                                   err_msg=f"step {step}")
        np.testing.assert_allclose(fc.feedback, cc.feedback,
                                   rtol=1e-8, atol=1e-8,
                                   err_msg=f"step {step}")
        np.testing.assert_allclose(fc.foot_placement, cc.foot_placement,
                                   rtol=1e-9, atol=1e-10,
                                   err_msg=f"step {step}")
    assert saw_pop, "test must cross a phase pop/append to exercise the " \
        "uid-keyed shift descriptor"


def test_batched_solve_has_no_default_precision_matmuls():
    """The whole batched solve must lower with ZERO dot_general ops: on TPU
    every jnp matmul/einsum runs on the MXU as bf16 passes at default
    precision, which measurably degrades final cost (exp_accuracy_oracle:
    max rel deviation 2.5e-2 vs the f64 oracle before ops/precise.py, 5e-6
    after). All small products must go through ops/precise.py (VPU f32)."""
    _fresh_caches()
    pb, x0, opt = make_trot()
    pb.dtype = jnp.float32
    prob, state = pb.build(x0)
    from hkdmpc_tpu.parallel import replicate_problem
    prob_b, state_b = replicate_problem(prob, state, 2)
    txt = jax.jit(lambda p, s: jax.vmap(
        lambda pp, ss: ddp.solve(pp, ss, opt.runtime(), True,
                                 pallas_backward=True))(p, s)
    ).lower(prob_b, state_b).as_text()
    assert txt.count("dot_general") == 0, (
        f"{txt.count('dot_general')} dot_general ops crept into the batched "
        "solve — route them through ops/precise.py")


@pytest.mark.slow
def test_f32_batch_final_cost_matches_f64_oracle():
    """f32 batched solves (the TPU production numerics, minus the MXU) must
    reproduce the f64 oracle's final costs to ~roundoff on a shared scenario
    set that includes hard high-cost cases."""
    _fresh_caches()
    from hkdmpc_tpu.parallel import perturb_scenarios, replicate_problem

    B = 16
    pb0, x00, _ = make_trot()
    prob0, state0 = pb0.build(x00)
    prob_b0, _ = replicate_problem(prob0, state0, B)
    x0_shared = np.asarray(perturb_scenarios(prob_b0,
                                             jax.random.PRNGKey(0)).x0)

    costs = {}
    for name, dtype in (("f64", jnp.float64), ("f32", jnp.float32)):
        pb, x0, opt = make_trot()
        pb.dtype = dtype
        prob, state = pb.build(x0)
        prob_b, state_b = replicate_problem(prob, state, B)
        prob_b = dataclasses.replace(
            prob_b, x0=jnp.asarray(x0_shared, dtype))
        r = ddp.solve_batch(prob_b, state_b, opt.runtime(),
                            parallel_rollout=True)
        assert not bool(jnp.any(r.solve_failed))
        costs[name] = np.asarray(r.cost, np.float64)

    rel = np.abs(costs["f32"] - costs["f64"]) / np.abs(costs["f64"])
    assert rel.max() < 1e-4, rel


def test_linear_rollout_jvp_matches_scan():
    """linear_rollout_jvp (closed-form jacobian-vector products via jax.jvp
    at the nominal trajectory, no materialized A/B) == linear_rollout (reads
    lq.A/B) up to float reassociation, including a full-solve equivalence."""
    import dataclasses

    pb, prob, state, opt = _solved_state()
    ro = ro_mod.hybrid_rollout(prob, state, 0.0, True)
    lqd = lq_mod.lq_approximation(prob, ro.X, ro.U, state.constr, True, True)
    last = ro_mod.last_active_node(prob)
    dU, K, *_ = backward.backward_sweep_regularized(
        prob, lqd, ro.defect, 0.0, 4.0, last)
    st = dataclasses.replace(state, dU=dU, K=K, Xbar=ro.X, Ubar=ro.U)

    dX_a, dv1_a, dv2_a = ro_mod.linear_rollout(prob, st, lqd, ro.defect, 1.0)
    dX_b, dv1_b, dv2_b = ro_mod.linear_rollout_jvp(
        prob, st, ro.X, ro.U, lqd, ro.defect, 1.0)
    np.testing.assert_allclose(dX_a, dX_b, atol=1e-9)
    assert abs(float(dv1_a) - float(dv1_b)) < 1e-9
    assert abs(float(dv2_a) - float(dv2_b)) < 1e-9

    # full solve: same final cost/state to solver-decision accuracy
    prob0, state0 = pb.build(jnp.asarray(prob.x0))
    ra = ddp.solve_jit(prob0, state0, opt, True)
    rb = ddp.solve_jit(prob0, state0, opt, True, jvp_linear=True)
    np.testing.assert_allclose(ra.cost, rb.cost, rtol=1e-8)
    np.testing.assert_allclose(ra.state.Ubar, rb.state.Ubar,
                               rtol=1e-6, atol=1e-8)


@pytest.mark.slow
def test_solve_kernel_jac_equivalent_under_vmap():
    """vmap(solve, kernel_jac=True) — jacobians rebuilt inside the Pallas
    kernel from (X, U), A/B never materialized, jvp linear rollout — matches
    the pallas_backward solve (f32, runtime caps; interpret mode on CPU)."""
    _fresh_caches()
    from hkdmpc_tpu.parallel import perturb_scenarios, replicate_problem

    pb, x0, opt = make_trot()
    prob, state = pb.build(x0)
    f32 = lambda x: (jnp.asarray(x, jnp.float32)
                     if isinstance(x, jnp.ndarray) and
                     jnp.issubdtype(x.dtype, jnp.floating) else x)
    prob = jax.tree_util.tree_map(f32, prob)
    state = jax.tree_util.tree_map(f32, state)
    opt = opt.runtime()
    prob_b, state_b = replicate_problem(prob, state, 4)
    prob_b = dataclasses.replace(
        prob_b, x0=perturb_scenarios(prob_b, jax.random.PRNGKey(3)).x0)

    res_a = ddp.solve_batch(prob_b, state_b, opt, True,
                            pallas_backward=True)
    res_b = ddp.solve_batch(prob_b, state_b, opt, True,
                            kernel_jac=True)
    np.testing.assert_allclose(res_a.cost, res_b.cost, rtol=1e-4)
    np.testing.assert_allclose(res_a.dyn_feas, res_b.dyn_feas,
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(res_a.state.Ubar, res_b.state.Ubar,
                               rtol=1e-3, atol=2e-3)
    assert not bool(jnp.any(res_a.solve_failed))
    assert not bool(jnp.any(res_b.solve_failed))


@pytest.mark.slow
@pytest.mark.parametrize("spb", [1, 2])
def test_kernel_jac_backward_matches_scan(spb):
    """riccati_backward_hkd batched rule (in-kernel jacobians + running AND
    terminal partials, interpret mode) vs the faithful scan with XLA-built
    A/B and materialized partials on the same inputs. spb=2 exercises the
    fused-multi-step grid variant (trailing PAD transition, substep loop
    — measured throughput-neutral on TPU but kept as a tested variant)."""
    _fresh_caches()
    from hkdmpc_tpu.ops.pallas_backward import backward_sweep_pallas_hkd

    pb, prob, state, opt = _solved_state()
    ro = ro_mod.hybrid_rollout(prob, state, 0.0, True)
    lqd = lq_mod.lq_approximation(prob, ro.X, ro.U, state.constr, True, True)
    last = ro_mod.last_active_node(prob)
    f32 = lambda x: None if x is None else jnp.asarray(x, jnp.float32)
    lq32 = jax.tree_util.tree_map(f32, lqd)
    X32, U32 = f32(ro.X), f32(ro.U)
    d32 = f32(ro.defect)

    B = 2
    tile = lambda x: jnp.broadcast_to(x[None], (B,) + x.shape)
    regs = jnp.asarray([0.0, 0.05], jnp.float32)
    dU, K, dv1, dv2, ok = backward_sweep_pallas_hkd(
        tile(prob.kind), tile(X32), tile(U32),
        tile(f32(prob.contact)), tile(f32(prob.contact_next)),
        tile(f32(prob.xr)), tile(f32(prob.ur)), tile(f32(prob.foot_r)),
        tile(f32(state.constr.reb_delta)), tile(f32(state.constr.reb_eps)),
        tile(f32(prob.term_contact)), tile(f32(prob.td_mask)),
        tile(f32(state.constr.al_sigma)), tile(f32(state.constr.al_lambda)),
        tile(f32(prob.term_mask)),
        tile(d32), regs,
        jnp.full((B,), last, jnp.int32),
        jnp.full((B,), jnp.float32(prob.dt)), interpret=True, spb=spb)

    for i in range(B):
        o = backward.backward_sweep(prob, lqd, ro.defect,
                                    jnp.float64(regs[i]), last,
                                    aug_sweep=True)
        s = backward.backward_sweep(prob, lq32, d32, regs[i], last,
                                    aug_sweep=True)
        for got, oracle, scan_f32, name in [
                (dU[i], o[0], s[0], "dU"), (K[i], o[1], s[1], "K"),
                (dv1[i], o[4], s[4], "dv1"), (dv2[i], o[5], s[5], "dv2")]:
            roundoff = float(jnp.max(jnp.abs(jnp.asarray(scan_f32, jnp.float64)
                                             - oracle)))
            err = float(jnp.max(jnp.abs(jnp.asarray(got, jnp.float64)
                                        - oracle)))
            assert err <= max(10.0 * roundoff, 1e-5), (name, err, roundoff)


@pytest.mark.slow
def test_unroll_caps_matches_while_loop():
    """solve(unroll_caps=True) — statically unrolled AL/DDP loops with
    masked discards replacing the lax.while_loops — is decision-identical
    to the while_loop solver (same iteration count, same trace, same
    accepted trials); values agree to XLA fusion-reassociation roundoff
    (the two program shapes fuse reductions differently, measured ~5e-16
    rel in f64)."""
    _fresh_caches()
    pb, x0, opt = make_trot()
    prob, state = pb.build(x0)
    optr = opt.runtime()
    ra = ddp.solve_jit(prob, state, optr, True, assoc_linear=True)
    rb = ddp.solve_jit(prob, state, optr, True, assoc_linear=True,
                       unroll_caps=True)
    np.testing.assert_allclose(np.asarray(ra.cost), np.asarray(rb.cost),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ra.state.Ubar),
                               np.asarray(rb.state.Ubar),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ra.state.K),
                               np.asarray(rb.state.K),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_array_equal(np.asarray(ra.n_iters),
                                  np.asarray(rb.n_iters))
    ct_a, ct_b = np.asarray(ra.cost_trace), np.asarray(rb.cost_trace)
    np.testing.assert_allclose(ct_a[~np.isnan(ct_a)],
                               ct_b[~np.isnan(ct_b)], rtol=1e-12)

    # and on the batched kernel_jac production path
    from hkdmpc_tpu.parallel import perturb_scenarios, replicate_problem
    f32 = lambda x: (jnp.asarray(x, jnp.float32)
                     if isinstance(x, jnp.ndarray) and
                     jnp.issubdtype(x.dtype, jnp.floating) else x)
    prob32 = jax.tree_util.tree_map(f32, prob)
    state32 = jax.tree_util.tree_map(f32, state)
    prob_b, state_b = replicate_problem(prob32, state32, 4)
    prob_b = dataclasses.replace(
        prob_b, x0=perturb_scenarios(prob_b, jax.random.PRNGKey(5)).x0)
    va = ddp.solve_batch(prob_b, state_b, optr, True, kernel_jac=True)
    vb = ddp.solve_batch(prob_b, state_b, optr, True, kernel_jac=True,
                         unroll_caps=True)
    np.testing.assert_allclose(np.asarray(va.cost), np.asarray(vb.cost),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(va.state.Ubar),
                               np.asarray(vb.state.Ubar),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(va.n_iters),
                                  np.asarray(vb.n_iters))


def test_linear_dv_closed_matches_lq():
    """Closed-form expected-cost quadform (ops/hkd_tminor.linear_dv_tbatch,
    no materialized partial arrays) == the lq-contraction dv terms, incl.
    the ReB cone and AL touchdown (GN forms with the reference quirks)."""
    import dataclasses

    pb, prob, state, opt = _solved_state()
    ro = ro_mod.hybrid_rollout(prob, state, 0.0, True)
    lqd = lq_mod.lq_approximation(prob, ro.X, ro.U, state.constr, True, True)
    last = ro_mod.last_active_node(prob)
    dU, K, *_ = backward.backward_sweep_regularized(
        prob, lqd, ro.defect, 0.0, 4.0, last)
    st = dataclasses.replace(state, dU=dU, K=K, Xbar=ro.X, Ubar=ro.U)

    dX_a, dv1_a, dv2_a = ro_mod.linear_rollout_jvp(
        prob, st, ro.X, ro.U, lqd, ro.defect, 1.0)
    dX_b, dv1_b, dv2_b = ro_mod.linear_rollout_jvp(
        prob, st, ro.X, ro.U, lqd, ro.defect, 1.0, use_closed_dv=True)
    np.testing.assert_allclose(dX_a, dX_b, atol=1e-12)
    assert abs(float(dv1_a) - float(dv1_b)) < 1e-8, (dv1_a, dv1_b)
    assert abs(float(dv2_a) - float(dv2_b)) < 1e-8, (dv2_a, dv2_b)
    # the AL part is actually exercised on this problem
    assert float(jnp.sum(prob.td_mask)) > 0


@pytest.mark.slow
def test_kernel_jac_mixed_schedule_batch():
    """Heterogeneous phase structures in ONE kernel batch block: 2 trot +
    2 flytrot scenarios (different contact schedules, reset positions and
    pad tails per lane) solved with kernel_jac must match each scenario's
    individual scan-backward solve. Exercises the per-kind pl.when
    predicates in the mixed-lane regime where no branch can be skipped —
    the replicated-schedule equivalence tests never hit this."""
    import pytest as _pytest

    _fresh_caches()
    from hkdmpc_tpu.config import load_constraint_params, load_ddp_setting
    from hkdmpc_tpu.models import hkd as hkd_mod
    from hkdmpc_tpu.reference import QuadReference
    from hkdmpc_tpu.solver.problem import HKDProblem
    from tests.test_solver import REF_CPARAMS, REF_SETTINGS

    FLY = "/root/reference/Reference/Data/flytrot/quad_reference.csv"
    pb1, x01, opt = make_trot()
    pb2 = HKDProblem(QuadReference.from_file(FLY), plan_duration=0.6,
                     cparams=load_constraint_params(REF_CPARAMS))
    pb2.initialization()
    body = np.zeros(12)
    body[5] = 0.2486
    qJ = np.tile([0.0, -0.8, 1.6], 4)
    qd = hkd_mod.compute_hkd_state(
        jnp.array(body[:3]), jnp.array(body[3:6]), jnp.array(qJ),
        jnp.array(pb2.phases[0].contact, dtype=float))
    x02 = np.concatenate([body, np.asarray(qd)])

    prob1, st1 = pb1.build(x01)
    prob2, st2 = pb2.build(x02)
    assert prob1.kind.shape == prob2.kind.shape
    # genuinely different schedules (different reset/pad placement per lane)
    assert not np.array_equal(np.asarray(prob1.kind), np.asarray(prob2.kind))

    f32 = lambda x: (jnp.asarray(x, jnp.float32)
                     if isinstance(x, jnp.ndarray) and
                     jnp.issubdtype(x.dtype, jnp.floating) else x)
    p1, s1 = (jax.tree_util.tree_map(f32, prob1),
              jax.tree_util.tree_map(f32, st1))
    p2, s2 = (jax.tree_util.tree_map(f32, prob2),
              jax.tree_util.tree_map(f32, st2))
    stack = lambda a, b: jax.tree_util.tree_map(
        lambda x, y: jnp.stack([x, x, y, y]), a, b)
    prob_b, st_b = stack(p1, p2), stack(s1, s2)

    optr = opt.runtime()
    res = ddp.solve_batch(prob_b, st_b, optr, True, kernel_jac=True)
    assert not bool(jnp.any(res.solve_failed))

    ref1 = ddp.solve_jit(p1, s1, optr, True)
    ref2 = ddp.solve_jit(p2, s2, optr, True)
    for i, ref in ((0, ref1), (1, ref1), (2, ref2), (3, ref2)):
        np.testing.assert_allclose(float(res.cost[i]), float(ref.cost),
                                   rtol=1e-4, err_msg=f"lane {i}")
        np.testing.assert_allclose(np.asarray(res.state.Ubar[i]),
                                   np.asarray(ref.state.Ubar),
                                   rtol=1e-3, atol=2e-3,
                                   err_msg=f"lane {i}")
