"""LQ approximation along the nominal trajectory.

Parity: SinglePhase::LQ_approximation (SinglePhase.cpp:265-296) — per-step
dynamics jacobians + running-cost partials with the ReB barrier folded in,
plus per-terminal-node terminal-cost partials with AL folded in
(SinglePhase.cpp:402-426), plus reset-map jacobians at phase boundaries
(MultiPhaseDDP.cpp:205-212).

Everything is one vmap over transitions + one vmap over nodes — the
derivative stage has no sequential dependency at all (the reference's
biggest hot loop becomes embarrassingly parallel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from hkdmpc_tpu.models import hkd
from hkdmpc_tpu.solver import costs
from hkdmpc_tpu.solver.structs import DYN, RESET, LQData, ProblemData


def lq_approximation(prob: ProblemData, X, U, constr, reb_active: bool,
                     al_active: bool) -> LQData:
    dtype = X.dtype

    def per_transition(t):
        x, u = X[t], U[t]
        kind = prob.kind[t]

        def dyn_branch(_):
            A, B = hkd.dynamics_jacobians_analytic(x, u, prob.contact[t],
                                                   prob.dt)
            lx, lu, lxx, luu, lux = costs.running_cost_partials(
                x, u, prob.contact[t], prob.xr[t], prob.ur[t],
                prob.foot_r[t], prob.dt)
            if reb_active:
                lu_add, luu_add = costs.grf_reb_partials(
                    u, prob.contact[t], constr.reb_delta[t],
                    constr.reb_eps[t], prob.dt)
                lu = lu + lu_add
                luu = luu + luu_add
            return A, B, lx, lu, lxx, luu, lux

        def reset_branch(_):
            Px = hkd.reset_map_jacobian(x, prob.contact[t], prob.contact_next[t])
            z, Z = jnp.zeros(24, dtype), jnp.zeros((24, 24), dtype)
            return Px, Z, z, z, Z, Z, Z

        def pad_branch(_):
            z, Z = jnp.zeros(24, dtype), jnp.zeros((24, 24), dtype)
            return jnp.eye(24, dtype=dtype), Z, z, z, Z, Z, Z

        return lax.switch(kind, [pad_branch, dyn_branch, reset_branch], None)

    A, B, lx, lu, lxx, luu, lux = jax.vmap(per_transition)(jnp.arange(prob.T))

    def per_node(j):
        x = X[j]
        phix, phixx = costs.terminal_cost_partials(
            x, prob.term_contact[j], prob.xr[j], prob.foot_r[j])
        if al_active:
            h = costs.touchdown_violations(x, prob.td_mask[j])
            ax, axx = costs.al_partials(x, h, constr.al_lambda[j],
                                        constr.al_sigma[j], prob.td_mask[j])
            phix = phix + ax
            phixx = phixx + axx
        m = prob.term_mask[j]
        return m * phix, m * phixx

    phix, phixx = jax.vmap(per_node)(jnp.arange(prob.T + 1))
    return LQData(A=A, B=B, lx=lx, lu=lu, lxx=lxx, luu=luu, lux=lux,
                  phix=phix, phixx=phixx)
