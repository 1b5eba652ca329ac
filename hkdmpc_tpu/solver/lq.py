"""LQ approximation along the nominal trajectory.

Parity: SinglePhase::LQ_approximation (SinglePhase.cpp:265-296) — per-step
dynamics jacobians + running-cost partials with the ReB barrier folded in,
plus per-terminal-node terminal-cost partials with AL folded in
(SinglePhase.cpp:402-426), plus reset-map jacobians at phase boundaries
(MultiPhaseDDP.cpp:205-212).

Everything is one vmap over transitions + one vmap over nodes — the
derivative stage has no sequential dependency at all (the reference's
biggest hot loop becomes embarrassingly parallel). The cost/constraint terms
come from the ModelSpec, so user models plug in without touching this file.

Note the ReB Gauss-Newton Hessians intentionally omit the u-x cross term,
exactly as the reference does (ConstraintsBase.h:224-263 computes hess_u /
hess_x separately and never a hess_ux).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from hkdmpc_tpu.ops import precise
from hkdmpc_tpu.solver import costs
from hkdmpc_tpu.solver.rollout import _default_model, run_ctx, term_ctx
from hkdmpc_tpu.solver.structs import DYN, RESET, LQData, ProblemData


def lq_approximation(prob: ProblemData, X, U, constr, reb_active: bool,
                     al_active: bool, model=None,
                     skip_ab: bool = False,
                     skip_partials: bool = False) -> LQData:
    """skip_ab: don't build the (T, 24, 24) A/B jacobian tensors at all
    (LQData.A/B come back None) — for the in-kernel-jacobian backward path
    (ddp.solve(kernel_jac=True)), where the Pallas kernel rebuilds them
    per step from (X, U) and the linear rollout uses jvp. Only valid with
    a model that has the T-minor builder (the jacobians would otherwise be
    interleaved into the generic per-transition switch)."""
    model = model or _default_model()
    dtype = X.dtype

    fast_ab = getattr(model, "build_AB_tminor", None)
    if fast_ab is not None:
        return _lq_fast_ab(prob, X, U, constr, reb_active, al_active, model,
                           fast_ab, skip_ab, skip_partials)
    assert not (skip_ab or skip_partials), \
        "skip flags require a model with build_AB_tminor"

    def per_transition(t):
        x, u = X[t], U[t]
        kind = prob.kind[t]
        ctx = run_ctx(prob, t)

        def dyn_branch(_):
            A, B = model.dynamics_jacobians(x, u, prob.contact[t], prob.dt)
            lx, lu, lxx, luu, lux = model.running_cost_partials(x, u, ctx)
            if reb_active and model.n_path_rows:
                g, row_mask = model.path_violations(x, u, ctx)
                gx, gu = model.path_jacobians(x, u, ctx)
                d1, d2 = costs.reb_derivs(g, constr.reb_delta[t],
                                          constr.reb_eps[t])
                d1 = row_mask * d1
                d2 = row_mask * d2
                lx = lx + prob.dt * precise.vm(d1, gx)
                lu = lu + prob.dt * precise.vm(d1, gu)
                lxx = lxx + prob.dt * precise.xtwx(gx, d2)
                luu = luu + prob.dt * precise.xtwx(gu, d2)
            return A, B, lx, lu, lxx, luu, lux

        xs, us = model.xs, model.us
        zx, zu = jnp.zeros(xs, dtype), jnp.zeros(us, dtype)
        Zb = jnp.zeros((xs, us), dtype)
        Zxx, Zuu = jnp.zeros((xs, xs), dtype), jnp.zeros((us, us), dtype)
        Zux = jnp.zeros((us, xs), dtype)

        def reset_branch(_):
            Px = model.reset_map_jacobian(x, prob.contact[t],
                                          prob.contact_next[t])
            return Px, Zb, zx, zu, Zxx, Zuu, Zux

        def pad_branch(_):
            return jnp.eye(xs, dtype=dtype), Zb, zx, zu, Zxx, Zuu, Zux

        return lax.switch(kind, [pad_branch, dyn_branch, reset_branch], None)

    A, B, lx, lu, lxx, luu, lux = jax.vmap(per_transition)(jnp.arange(prob.T))

    def per_node(j):
        x = X[j]
        ctx = term_ctx(prob, j)
        phix, phixx = model.terminal_cost_partials(x, ctx)
        if al_active and model.n_terminal_rows:
            h, h_mask = model.terminal_violations(x, ctx)
            hx = model.terminal_jacobians(x, ctx)
            sig, lam = constr.al_sigma[j], constr.al_lambda[j]
            w1 = h_mask * (sig * h + lam)
            w2 = h_mask * (sig * (1.0 + h) + lam)
            phix = phix + precise.vm(w1, hx)
            phixx = phixx + precise.xtwx(hx, w2)
        m = prob.term_mask[j]
        return m * phix, m * phixx

    phix, phixx = jax.vmap(per_node)(jnp.arange(prob.T + 1))
    return LQData(A=A, B=B, lx=lx, lu=lu, lxx=lxx, luu=luu, lux=lux,
                  phix=phix, phixx=phixx)


def _lq_fast_ab(prob, X, U, constr, reb_active, al_active, model, fast_ab,
                skip_ab=False, skip_partials=False):
    """LQ with the model's T-minor A/B builder (ops/jac_tminor.py): the
    dynamics/reset jacobians assemble horizon-minor in one pass; the cost
    partial stages stay per-transition vmaps with masks instead of a switch
    (numerically identical to the generic path; tested)."""
    dtype = X.dtype
    A, B = (None, None) if skip_ab else fast_ab(prob, X, U)
    is_dyn = prob.is_dyn

    lux_zero = getattr(model, "lux_is_zero", False)

    run_fast = getattr(model, "running_partials_tbatch", None)
    term_fast = getattr(model, "terminal_partials_tbatch", None)
    if run_fast is not None and term_fast is not None:
        if skip_partials:
            # every cost partial (running AND terminal) is rebuilt inside
            # the backward kernel (ddp.solve(kernel_jac=True)); nothing is
            # materialized here at all
            return LQData(A=A, B=B, lx=None, lu=None, lxx=None, luu=None,
                          lux=None, phix=None, phixx=None)
        lx, lu, lxx, luu, lux = run_fast(prob, X, U, constr, reb_active)
        phix, phixx = term_fast(prob, X, constr, al_active)
        return LQData(A=A, B=B, lx=lx, lu=lu, lxx=lxx, luu=luu,
                      lux=None if lux_zero else lux,
                      phix=phix, phixx=phixx)

    def cost_partials(t):
        x, u = X[t], U[t]
        ctx = run_ctx(prob, t)
        lx, lu, lxx, luu, lux = model.running_cost_partials(x, u, ctx)
        if reb_active and model.n_path_rows:
            g, row_mask = model.path_violations(x, u, ctx)
            gx, gu = model.path_jacobians(x, u, ctx)
            d1, d2 = costs.reb_derivs(g, constr.reb_delta[t],
                                      constr.reb_eps[t])
            d1 = row_mask * d1
            d2 = row_mask * d2
            lx = lx + prob.dt * precise.vm(d1, gx)
            lu = lu + prob.dt * precise.vm(d1, gu)
            lxx = lxx + prob.dt * precise.xtwx(gx, d2)
            luu = luu + prob.dt * precise.xtwx(gu, d2)
        m = is_dyn[t]
        return m * lx, m * lu, m * lxx, m * luu, m * lux

    lx, lu, lxx, luu, lux = jax.vmap(cost_partials)(jnp.arange(prob.T))

    def per_node(j):
        x = X[j]
        ctx = term_ctx(prob, j)
        phix, phixx = model.terminal_cost_partials(x, ctx)
        if al_active and model.n_terminal_rows:
            h, h_mask = model.terminal_violations(x, ctx)
            hx = model.terminal_jacobians(x, ctx)
            sig, lam = constr.al_sigma[j], constr.al_lambda[j]
            w1 = h_mask * (sig * h + lam)
            w2 = h_mask * (sig * (1.0 + h) + lam)
            phix = phix + precise.vm(w1, hx)
            phixx = phixx + precise.xtwx(hx, w2)
        m = prob.term_mask[j]
        return m * phix, m * phixx

    phix, phixx = jax.vmap(per_node)(jnp.arange(prob.T + 1))
    return LQData(A=A, B=B, lx=lx, lu=lu, lxx=lxx, luu=luu,
                  lux=None if lux_zero else lux,
                  phix=phix, phixx=phixx)
