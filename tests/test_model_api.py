"""Model-API extensibility tests: custom specs, the optional swing-height
constraint, and a user-defined cost term."""
import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from tests.test_solver import make_trot
from hkdmpc_tpu.models import hkd
from hkdmpc_tpu.solver import ddp
from hkdmpc_tpu.solver.model_api import (CostTerm, ModelSpec, hkd_model_spec,
                                         HKDTrackingCost, HKDFootPlaceReg,
                                         GRFConstraint, TouchDownConstraint)
from hkdmpc_tpu.solver.problem import HKDProblem


def _worst_swing_dip(prob, res):
    X = np.asarray(res.state.Xbar)
    kinds = np.asarray(prob.kind)
    contact = np.asarray(prob.contact)
    worst = 0.0
    for t in np.flatnonzero(kinds == 1):
        for leg in range(4):
            if contact[t, leg] == 0:
                q = X[t, 12 + 3 * leg: 15 + 3 * leg]
                pf = hkd.foot_position(jnp.array(X[t, 3:6]),
                                       jnp.array(X[t, 0:3]), jnp.array(q), leg)
                worst = min(worst, float(pf[2]))
    return worst


@pytest.mark.slow
def test_swing_constraint_lifts_feet():
    """With the swing-height path constraint active, swing feet dip less
    below the ground than without it. (The reference's shipped Swing_ReB
    params — delta=1.0, eps=0.01 — are soft enough to be a no-op, consistent
    with the constraint being dead code there; use firm params here.)"""
    import dataclasses as dc
    from hkdmpc_tpu.config import REBParam
    pb, x0, opt = make_trot(plan_duration=0.4)
    prob0, state0 = pb.build(x0)
    res0 = ddp.solve_jit(prob0, state0, opt)
    dip_base = _worst_swing_dip(prob0, res0)

    spec = hkd_model_spec(swing_constraint=True)
    firm = dc.replace(pb.cparams,
                      swing_reb=REBParam(delta=0.01, delta_min=0.001, eps=1.0))
    pb2 = HKDProblem(pb.ref, plan_duration=0.4, cparams=firm, model=spec)
    pb2.initialization()
    prob, state = pb2.build(x0)
    assert state.constr.reb_delta.shape[-1] == 24  # 20 GRF + 4 swing rows
    res = ddp.solve_jit(prob, state, opt, False, spec)
    assert not bool(res.solve_failed)
    dip = _worst_swing_dip(prob, res)
    assert dip > dip_base + 1e-4, (dip, dip_base)


def _solve_bouncing_mass(xs, us):
    """A completely different hybrid system through the same solver: a
    point mass falling under gravity with an inelastic impact reset at the
    phase boundary, tracking a target height in the second phase. Exercises
    ModelSpec generality + hand-built ProblemData (no quadruped anywhere).
    Dimensions (xs, us) are free — the physics lives in x[0], x[1], u[0];
    any extra coordinates are inert (the reference solver is likewise
    templated over dims, SinglePhase.cpp:538-540)."""
    from hkdmpc_tpu.solver.structs import (DYN, PAD, RESET, ConstraintState,
                                           ProblemData, SolverState)
    from hkdmpc_tpu.config import HSDDPOption

    g = 9.81

    def dyn(x, u, contact, dt):
        # x[0] = height, x[1] = vertical velocity, u[0] = thrust (2nd phase)
        acc = -g + contact[0] * u[0]
        return x.at[0].add(dt * x[1]).at[1].add(dt * acc)

    def dyn_jac(x, u, contact, dt):
        A = jnp.eye(xs, dtype=x.dtype).at[0, 1].set(dt)
        B = jnp.zeros((xs, us), x.dtype).at[1, 0].set(dt * contact[0])
        return A, B

    def reset(x, c, cn):
        return x.at[1].multiply(-0.5)   # inelastic bounce

    def reset_jac(x, c, cn):
        return jnp.eye(xs, dtype=x.dtype).at[1, 1].set(-0.5)

    class HeightTracking(CostTerm):
        def running(self, x, u, ctx):
            dx0 = x[0] - ctx["xr"][0]
            return ctx["dt"] * (0.5 * dx0 * dx0
                                + 0.5e-4 * jnp.sum(u * u))

        def running_partials(self, x, u, ctx):
            dt, dtype = ctx["dt"], x.dtype
            dx0 = x[0] - ctx["xr"][0]
            lx = jnp.zeros(xs, dtype).at[0].set(dt * dx0)
            lu = dt * 1e-4 * u
            lxx = jnp.zeros((xs, xs), dtype).at[0, 0].set(dt)
            luu = jnp.eye(us, dtype=dtype) * (dt * 1e-4)
            return lx, lu, lxx, luu, jnp.zeros((us, xs), dtype)

        def terminal(self, x, ctx):
            dx0 = x[0] - ctx["xr"][0]
            return 10.0 * 0.5 * dx0 * dx0

        def terminal_partials(self, x, ctx):
            dtype = x.dtype
            dx0 = x[0] - ctx["xr"][0]
            return (jnp.zeros(xs, dtype).at[0].set(10.0 * dx0),
                    jnp.zeros((xs, xs), dtype).at[0, 0].set(10.0))

    spec = ModelSpec(dynamics=dyn, dynamics_jacobians=dyn_jac,
                     reset_map=reset, reset_map_jacobian=reset_jac,
                     cost_terms=[HeightTracking()], xs=xs, us=us)

    # two phases: 10 steps flight (contact 0), RESET, 10 steps thrust
    T = 21
    kind = np.zeros(T, np.int32)
    kind[:10] = DYN
    kind[10] = RESET
    kind[11:] = DYN
    contact = np.zeros((T, 4))
    contact[11:, 0] = 1.0
    xr = np.zeros((T + 1, xs))
    xr[:, 0] = 1.0    # track 1 m height
    prob = ProblemData(
        kind=jnp.asarray(kind), contact=jnp.asarray(contact),
        contact_next=jnp.asarray(np.where(np.arange(T)[:, None] >= 10,
                                          contact[-1], contact[0])),
        dt=jnp.asarray(0.02), xr=jnp.asarray(xr),
        ur=jnp.zeros((T + 1, us)), foot_r=jnp.zeros((T + 1, 12)),
        term_mask=jnp.zeros(T + 1).at[10].set(1.0).at[T].set(1.0),
        term_contact=jnp.asarray(np.vstack([contact, contact[-1:]])),
        td_mask=jnp.zeros((T + 1, 4)),
        ss_mask=jnp.ones(T + 1),
        start_mask=jnp.zeros(T + 1).at[0].set(1.0).at[11].set(1.0),
        x0=jnp.zeros(xs).at[0].set(2.0))
    constr = ConstraintState(
        reb_delta=jnp.zeros((T, 0)), reb_delta_min=jnp.zeros((T, 0)),
        reb_eps=jnp.zeros((T, 0)), al_lambda=jnp.zeros((T + 1, 0)),
        al_sigma=jnp.zeros((T + 1, 0)), al_sigma_max=jnp.zeros((T + 1, 0)))
    state = SolverState.init(prob, constr)

    opt = HSDDPOption(max_DDP_iter=12, max_AL_iter=1, AL_active=False,
                      ReB_active=False)
    return ddp.solve_jit(prob, state, opt, False, spec)


def test_custom_hybrid_model_bouncing_mass():
    res = _solve_bouncing_mass(24, 24)
    assert not bool(res.solve_failed)
    assert float(res.dyn_feas) < 1e-3
    # after the bounce, thrust drives the mass toward the 1 m target
    final_h = float(res.state.Xbar[-1, 0])
    assert abs(final_h - 1.0) < 0.3, final_h


def test_solver_is_dimension_generic():
    """The same problem at its native dims (xs=2, us=1) — no padding to the
    HKD sizes — solves identically (the reference solver's <12,12,0> /
    <36,12,12> template instantiations have a real equivalent here)."""
    res24 = _solve_bouncing_mass(24, 24)
    res2 = _solve_bouncing_mass(2, 1)
    assert not bool(res2.solve_failed)
    assert res2.state.Ubar.shape[-1] == 1 and res2.state.Xbar.shape[-1] == 2
    np.testing.assert_allclose(res2.state.Xbar[:, :2],
                               res24.state.Xbar[:, :2], atol=1e-8)
    np.testing.assert_allclose(res2.state.Ubar[:, 0],
                               res24.state.Ubar[:, 0], atol=1e-8)
    assert abs(float(res2.cost) - float(res24.cost)) < 1e-8


def test_custom_cost_term():
    """A user-defined control-smoothness cost plugs in and changes the
    solution in the expected direction (smaller GRF magnitudes)."""

    class GRFMagnitudeReg(CostTerm):
        name = "grf magnitude"
        w = 0.05

        def running(self, x, u, ctx):
            return ctx["dt"] * 0.5 * self.w * jnp.sum(u[:12] * u[:12])

        def running_partials(self, x, u, ctx):
            dtype = x.dtype
            lu = jnp.zeros(24, dtype).at[:12].set(ctx["dt"] * self.w * u[:12])
            luu = jnp.diag(jnp.concatenate(
                [jnp.full(12, ctx["dt"] * self.w, dtype),
                 jnp.zeros(12, dtype)]))
            z = jnp.zeros(24, dtype)
            Z = jnp.zeros((24, 24), dtype)
            return z, lu, Z, luu, Z

        def terminal(self, x, ctx):
            return jnp.zeros((), x.dtype)

        def terminal_partials(self, x, ctx):
            return jnp.zeros(24, x.dtype), jnp.zeros((24, 24), x.dtype)

    pb, x0, opt = make_trot(plan_duration=0.3)
    base = hkd_model_spec()
    spec = ModelSpec(
        dynamics=base.dynamics,
        dynamics_jacobians=base.dynamics_jacobians,
        reset_map=base.reset_map, reset_map_jacobian=base.reset_map_jacobian,
        cost_terms=[HKDTrackingCost(), HKDFootPlaceReg(), GRFMagnitudeReg()],
        path_constraints=[GRFConstraint()],
        terminal_constraints=[TouchDownConstraint()])

    prob, state = pb.build(x0)
    res_base = ddp.solve_jit(prob, state, opt)
    pb2 = HKDProblem(pb.ref, plan_duration=0.3, cparams=pb.cparams, model=spec)
    pb2.initialization()
    prob2, state2 = pb2.build(x0)
    res_reg = ddp.solve_jit(prob2, state2, opt, False, spec)

    g_base = float(jnp.sum(jnp.abs(res_base.state.Ubar[:, :12])))
    g_reg = float(jnp.sum(jnp.abs(res_reg.state.Ubar[:, :12])))
    assert not bool(res_reg.solve_failed)
    assert g_reg < g_base
