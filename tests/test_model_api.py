"""Model-API extensibility tests: custom specs, the optional swing-height
constraint, and a user-defined cost term."""
import dataclasses

import numpy as np
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
