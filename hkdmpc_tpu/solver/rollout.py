"""Forward passes over the flattened transition graph.

- hybrid_rollout: nonlinear rollout with feedback policy + multiple-shooting
  node resets + reset maps at phase boundaries
  (parity: MultiPhaseDDP::hybrid_rollout, MultiPhaseDDP.cpp:57-95 +
   SinglePhase::hybrid_rollout, SinglePhase.cpp:182-233)
- linear_rollout: multiple-shooting search direction dX and expected cost
  change (parity: MultiPhaseDDP.cpp:20-50 + SinglePhase.cpp:145-178)
- compute_cost / constraint violations
  (parity: SinglePhase::compute_cost, SinglePhase.cpp:236-262)

All of these are single `lax.scan`s (or pure vmaps) over T transitions with
`lax.switch` on the transition kind — phase structure is data.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from hkdmpc_tpu.models import hkd
from hkdmpc_tpu.ops import precise
from hkdmpc_tpu.solver import costs
from hkdmpc_tpu.solver.structs import (DYN, PAD, RESET, LQData, ProblemData,
                                       Rollout, SolverState)

DIVERGE_NORM = 1e6  # reference: SinglePhase.cpp:205-208


def _default_model():
    from hkdmpc_tpu.solver.model_api import hkd_model_spec
    return hkd_model_spec()


def run_ctx(prob: ProblemData, t):
    """Per-transition context for cost/constraint terms (source node t)."""
    return {"contact": prob.contact[t], "xr": prob.xr[t], "ur": prob.ur[t],
            "foot_r": prob.foot_r[t], "dt": prob.dt,
            "term_contact": prob.term_contact[t], "td_mask": prob.td_mask[t]}


def term_ctx(prob: ProblemData, j):
    """Per-node context for terminal cost/constraint terms."""
    return {"contact": prob.term_contact[j], "xr": prob.xr[j],
            "ur": prob.ur[j], "foot_r": prob.foot_r[j], "dt": prob.dt,
            "term_contact": prob.term_contact[j], "td_mask": prob.td_mask[j]}


def hybrid_rollout(prob: ProblemData, state: SolverState, eps,
                   ms: bool = True, model=None) -> Rollout:
    """Roll the hybrid system forward at step size eps.

    carry = (x_node, xsim_node): the optimization node state and the pure
    simulation state (the latter chains through reset maps of *simulated*
    terminal states; MultiPhaseDDP.cpp:71-79).

    With multiple shooting off, only phase-*start* nodes shoot — an exact
    replication of the reference's asymmetric check (SinglePhase.cpp:187-220).
    """
    model = model or _default_model()
    T = prob.T
    dtype = prob.xr.dtype
    eps = jnp.asarray(eps, dtype)
    ss = prob.ss_mask if ms else prob.ss_mask * prob.start_mask

    x0 = prob.x0
    xsim0 = x0
    xnode0 = jnp.where(ss[0] > 0, state.Xbar[0] + eps * state.dX[0], x0)

    def step(carry, inp):
        x, xsim = carry
        t = inp["t"]
        kind = prob.kind[t]

        def dyn_branch(_):
            u = (state.Ubar[t] + eps * state.dU[t]
                 + precise.mv(state.K[t], x - state.Xbar[t]))
            xsim_next = model.dynamics(x, u, prob.contact[t], prob.dt)
            return xsim_next, xsim_next, u

        u_zero = jnp.zeros(state.Ubar.shape[-1], dtype)

        def reset_branch(_):
            xr_next = model.reset_map(x, prob.contact[t], prob.contact_next[t])
            xsim_next = model.reset_map(xsim, prob.contact[t],
                                        prob.contact_next[t])
            return xr_next, xsim_next, u_zero

        def pad_branch(_):
            return x, xsim, u_zero

        x_prop, xsim_next, u = lax.switch(
            kind, [pad_branch, dyn_branch, reset_branch], None)

        is_pad = (kind == PAD)
        shoot = jnp.logical_and(ss[t + 1] > 0, jnp.logical_not(is_pad))
        x_next = jnp.where(shoot, state.Xbar[t + 1] + eps * state.dX[t + 1], x_prop)
        ok = jnp.where(is_pad, True,
                       jnp.linalg.norm(xsim_next) <= DIVERGE_NORM)
        return (x_next, xsim_next), (x_next, xsim_next, u, ok)

    ts = {"t": jnp.arange(T)}
    (_, _), (X_rest, Xsim_rest, U, oks) = lax.scan(step, (xnode0, xsim0), ts)

    X = jnp.concatenate([xnode0[None], X_rest], axis=0)
    Xsim = jnp.concatenate([xsim0[None], Xsim_rest], axis=0)
    defect = Xsim - X
    # nodes past the active range contribute nothing
    node_active = node_active_mask(prob)
    defect = defect * node_active[:, None]
    success = jnp.all(oks)
    return Rollout(X=X, U=U, Xsim=Xsim, defect=defect, success=success)


def hybrid_rollout_parallel(prob: ProblemData, state: SolverState,
                            eps, model=None, du_eff=None) -> Rollout:
    """Scan-free hybrid rollout — valid when every active node is a shooting
    node (the default: update_SS_config makes all nodes shooting).

    Then X is fully determined up front (X = Xbar + eps dX), U follows
    elementwise (U = Ubar + eps (dU + K dX)), and every one-step simulation
    f(X[t], U[t]) is independent — the whole rollout collapses to one vmap
    over transitions plus a gather for reset boundaries (the Xsim source of a
    RESET transition is the simulated output of the preceding DYN
    transition). The horizon-sequential loop of the reference
    (SinglePhase.cpp:197-224) disappears entirely.

    du_eff: optional precomputed dU + K @ dX[:-1] (T, us). dX is fixed for
    every line-search trial, so the solver hoists this product out of the
    per-epsilon vmap — identical floats, but the (T, us, xs) K tensor is
    read once per iteration instead of once per trial.
    """
    model = model or _default_model()
    T = prob.T
    dtype = prob.xr.dtype
    eps = jnp.asarray(eps, dtype)

    X = state.Xbar + eps * state.dX                               # (T+1,24)
    if du_eff is None:
        du_eff = state.dU + precise.mv(state.K, state.dX[:-1])
    U = state.Ubar + eps * du_eff

    if getattr(model, "dynamics_tbatch", None) is not None:
        sim = model.dynamics_tbatch(X[:-1], U, prob.contact, prob.dt)
    else:
        sim = jax.vmap(model.dynamics, in_axes=(0, 0, 0, None))(
            X[:-1], U, prob.contact, prob.dt)                      # (T,24)

    # reset transitions: source sim state = sim output of transition t-1
    sim_prev = jnp.concatenate([prob.x0[None], sim[:-1]], axis=0)
    if getattr(model, "reset_tbatch", None) is not None:
        reset_out = model.reset_tbatch(sim_prev, prob.contact,
                                       prob.contact_next)
    else:
        reset_out = jax.vmap(model.reset_map)(sim_prev, prob.contact,
                                              prob.contact_next)

    is_dyn = (prob.kind == DYN)
    is_reset = (prob.kind == RESET)
    xsim_dest = jnp.where(is_dyn[:, None], sim,
                          jnp.where(is_reset[:, None], reset_out, X[1:]))
    Xsim = jnp.concatenate([prob.x0[None], xsim_dest], axis=0)

    node_active = node_active_mask(prob)
    defect = (Xsim - X) * node_active[:, None]

    norms = jnp.linalg.norm(xsim_dest, axis=-1)
    pad = (prob.kind == PAD)
    success = jnp.all(jnp.where(pad, True, norms <= DIVERGE_NORM))
    return Rollout(X=X, U=U, Xsim=Xsim, defect=defect, success=success)


def node_active_mask(prob: ProblemData):
    """(T+1,) 1.0 for node 0 and every dest node of an active transition."""
    act = (prob.kind != PAD).astype(prob.xr.dtype)
    return jnp.concatenate([jnp.ones(1, prob.xr.dtype), act])


def dynamics_feasibility(prob: ProblemData, defect, norm_id: int = 2):
    """Defect norm (parity: Trajectory::measure_dynamics_feasibility +
    MultiPhaseDDP.cpp:514-529). norm 2: sqrt of sum of squared norms."""
    if norm_id == 1:
        return jnp.sum(jnp.abs(defect))
    return jnp.sqrt(jnp.sum(defect * defect))


def compute_cost(prob: ProblemData, X, U, constr, reb_active: bool,
                 al_active: bool, model=None):
    """Total actual cost = running terms [+ ReB barrier] + terminal terms
    [+ AL penalty], aggregated over the model's cost/constraint terms.

    Returns (cost, (g_all (T, n_path), h_all (T+1, n_term))) — the
    constraint violations of this trajectory (masked rows read as satisfied).
    """
    model = model or _default_model()
    if getattr(model, "compute_cost_tbatch", None) is not None:
        return model.compute_cost_tbatch(prob, X, U, constr, reb_active,
                                         al_active)
    run_l, term_phi, g_all, h_all = cost_nodes(prob, X, U, constr, reb_active,
                                               al_active, model)
    total = (jnp.sum(prob.is_dyn * run_l)
             + jnp.sum(prob.term_mask * term_phi))
    return total, (g_all, h_all)


def cost_nodes(prob: ProblemData, X, U, constr, reb_active: bool,
               al_active: bool, model=None):
    """Per-node cost breakdown: (run_l (T,), term_phi (T+1,), g_all, h_all).

    run_l is the reference's rcostData[k].l (ReB barrier included when
    active, SinglePhase.cpp:240-250); term_phi is tcostData.Phi (AL penalty
    included when active, :253-260) — the series the reference's cost log
    files record (HSDDP_Utils.h:80-142)."""
    model = model or _default_model()

    def run_one(t):
        x, u = X[t], U[t]
        ctx = run_ctx(prob, t)
        l = model.running_cost(x, u, ctx)
        g, row_mask = model.path_violations(x, u, ctx)
        if reb_active and model.n_path_rows:
            l = l + prob.dt * jnp.sum(
                row_mask * costs.reb_value(g, constr.reb_delta[t],
                                           constr.reb_eps[t]))
        return l, g * row_mask + (1.0 - row_mask)

    run_l, g_all = jax.vmap(run_one)(jnp.arange(prob.T))

    def term_one(j):
        x = X[j]
        ctx = term_ctx(prob, j)
        phi = model.terminal_cost(x, ctx)
        h, h_mask = model.terminal_violations(x, ctx)
        if al_active and model.n_terminal_rows:
            phi = phi + jnp.sum(h_mask * (
                0.5 * constr.al_sigma[j] * h * h + constr.al_lambda[j] * h))
        return phi, h * h_mask

    term_phi, h_all = jax.vmap(term_one)(jnp.arange(prob.T + 1))
    return run_l, term_phi, g_all, h_all


def max_violations(prob: ProblemData, g_all, h_all):
    """(max_pconstr <= 0, max_tconstr >= 0) — parity with
    ConstraintContainer::get_max_pconstrs/get_max_tconstrs."""
    is_dyn = prob.is_dyn
    if g_all.shape[-1]:
        g_eff = jnp.where(is_dyn[:, None] > 0, g_all, 0.0)
        max_p = jnp.minimum(0.0, jnp.min(g_eff))
    else:
        max_p = jnp.zeros((), h_all.dtype)
    if h_all.shape[-1]:
        h_eff = jnp.abs(h_all) * prob.term_mask[:, None]
        max_t = jnp.maximum(0.0, jnp.max(h_eff))
    else:
        max_t = jnp.zeros((), g_all.dtype)
    return max_p, max_t


def linear_rollout(prob: ProblemData, state: SolverState, lq: LQData,
                   defect, eps) -> tuple:
    """Propagate the linearized dynamics along (dU, K) to get the
    multiple-shooting search direction dX and expected cost change.

    Returns (dX (T+1,24), dV_1, dV_2). (A batch-in-lanes Pallas variant was
    measured and deleted: it lost at saturating batch — 597 vs 376 ms at
    B=1024 v5e — and its unbatched custom_vmap rule meant it could never
    engage at batch 1, so no configuration existed where it won; the
    assoc-scan variant in ops/assoc.py remains the parallel-in-time option.)
    """
    last = last_active_node(prob)
    return _linear_rollout_impl(prob, state, lq, defect, eps, last)


def linear_rollout_jvp(prob: ProblemData, state: SolverState, X, U,
                       lq: LQData, defect, eps, model=None,
                       use_closed_dv: bool = False, reb_active: bool = True,
                       al_active: bool = True) -> tuple:
    """linear_rollout that propagates dx through exact closed-form
    jacobian-vector products (jax.jvp of the model dynamics / reset map at
    the nominal (X, U)) instead of reading the materialized (T, 24, 24)
    A/B tensors — A dx + B du for the forward-Euler step IS the jvp of the
    step function, so the result matches linear_rollout up to float
    reassociation. This removes the linear rollout's dependence on lq.A/B
    entirely (the Pallas backward is then their only consumer), trading
    ~350 MB/iter of HBM reads at batch 1024 for ~150 scalar FMAs per step.
    Expected-cost terms still come from the lq partials."""
    model = model or _default_model()
    last = last_active_node(prob)
    dtype = lq.lx.dtype if lq.lx is not None else X.dtype
    eps = jnp.asarray(eps, dtype)
    dx0 = eps * defect[0]

    dv_fast = getattr(model, "linear_dv_tbatch", None)
    if use_closed_dv and dv_fast is not None:
        # dX-only scan, then the expected-cost change as direct GN
        # contractions (no lx/lu/lxx/luu/phix/phixx arrays touched)
        def step_dx(carry, t):
            dx = carry
            kind = prob.kind[t]
            x, u = X[t], U[t]
            du = eps * state.dU[t] + precise.mv(state.K[t], dx)
            _, jd = jax.jvp(
                lambda xx, uu: model.dynamics(xx, uu, prob.contact[t],
                                              prob.dt), (x, u), (dx, du))
            _, jr = jax.jvp(
                lambda xx: model.reset_map(xx, prob.contact[t],
                                           prob.contact_next[t]),
                (x,), (dx,))
            dx_next = jnp.where(kind == DYN, jd + eps * defect[t + 1],
                                jnp.where(kind == RESET,
                                          jr + eps * defect[t + 1], dx))
            return dx_next, dx_next

        _, dX_rest = lax.scan(step_dx, dx0, jnp.arange(prob.T))
        dX = jnp.concatenate([dx0[None], dX_rest], axis=0)
        dU_full = eps * state.dU + precise.mv(state.K, dX[:-1])
        dv1, dv2 = dv_fast(prob, X, U, state.constr, dX, dU_full, last,
                           reb_active, al_active)
        return dX, dv1, dv2

    def step(carry, t):
        dx = carry
        kind = prob.kind[t]
        x, u = X[t], U[t]
        du = eps * state.dU[t] + precise.mv(state.K[t], dx)
        _, jvp_dyn = jax.jvp(
            lambda xx, uu: model.dynamics(xx, uu, prob.contact[t], prob.dt),
            (x, u), (dx, du))
        dx_dyn = jvp_dyn + eps * defect[t + 1]
        _, jvp_rst = jax.jvp(
            lambda xx: model.reset_map(xx, prob.contact[t],
                                       prob.contact_next[t]),
            (x,), (dx,))
        dx_rst = jvp_rst + eps * defect[t + 1]
        dv1_dyn = jnp.sum(lq.lx[t] * dx) + jnp.sum(lq.lu[t] * du)
        dv2_dyn = (precise.quad(dx, lq.lxx[t], dx)
                   + precise.quad(du, lq.luu[t], du))
        if lq.lux is not None:
            dv2_dyn = dv2_dyn + precise.quad(du, lq.lux[t], dx)
        dv1_rst = jnp.sum(lq.phix[t] * dx)
        dv2_rst = precise.quad(dx, lq.phixx[t], dx)
        is_dyn = (kind == DYN)
        is_rst = (kind == RESET)
        dx_next = jnp.where(is_dyn, dx_dyn, jnp.where(is_rst, dx_rst, dx))
        dv1 = jnp.where(is_dyn, dv1_dyn, jnp.where(is_rst, dv1_rst, 0.0))
        dv2 = jnp.where(is_dyn, dv2_dyn, jnp.where(is_rst, dv2_rst, 0.0))
        return dx_next, (dx_next, dv1, dv2)

    _, (dX_rest, dv1s, dv2s) = lax.scan(step, dx0, jnp.arange(prob.T))
    dX = jnp.concatenate([dx0[None], dX_rest], axis=0)
    dx_term = dX[last]
    dV_1 = jnp.sum(dv1s) + jnp.sum(lq.phix[last] * dx_term)
    dV_2 = jnp.sum(dv2s) + precise.quad(dx_term, lq.phixx[last], dx_term)
    return dX, dV_1, dV_2


def last_active_node(prob: ProblemData):
    """Index of the last active node (terminal node of the final phase)."""
    act = (prob.kind != PAD)
    return jnp.sum(act.astype(jnp.int32))  # nodes 0..n_active


def _linear_rollout_impl(prob, state, lq, defect, eps, last_node):
    """linear_rollout body with an explicit last_node (avoids re-deriving it
    from prob.kind so the array interface stays self-contained)."""
    dtype = lq.lx.dtype
    eps = jnp.asarray(eps, dtype)
    dx0 = eps * defect[0]

    def step(carry, t):
        dx = carry
        kind = prob.kind[t]
        du = eps * state.dU[t] + precise.mv(state.K[t], dx)
        dx_dyn = (precise.mv(lq.A[t], dx) + precise.mv(lq.B[t], du)
                  + eps * defect[t + 1])
        dv1_dyn = jnp.sum(lq.lx[t] * dx) + jnp.sum(lq.lu[t] * du)
        dv2_dyn = (precise.quad(dx, lq.lxx[t], dx)
                   + precise.quad(du, lq.luu[t], du))
        if lq.lux is not None:
            dv2_dyn = dv2_dyn + precise.quad(du, lq.lux[t], dx)
        dv1_rst = jnp.sum(lq.phix[t] * dx)
        dv2_rst = precise.quad(dx, lq.phixx[t], dx)
        dx_rst = precise.mv(lq.A[t], dx) + eps * defect[t + 1]
        is_dyn = (kind == DYN)
        is_rst = (kind == RESET)
        dx_next = jnp.where(is_dyn, dx_dyn, jnp.where(is_rst, dx_rst, dx))
        dv1 = jnp.where(is_dyn, dv1_dyn, jnp.where(is_rst, dv1_rst, 0.0))
        dv2 = jnp.where(is_dyn, dv2_dyn, jnp.where(is_rst, dv2_rst, 0.0))
        return dx_next, (dx_next, dv1, dv2)

    _, (dX_rest, dv1s, dv2s) = lax.scan(step, dx0, jnp.arange(prob.T))
    dX = jnp.concatenate([dx0[None], dX_rest], axis=0)
    dx_term = dX[last_node]
    dV_1 = jnp.sum(dv1s) + jnp.sum(lq.phix[last_node] * dx_term)
    dV_2 = jnp.sum(dv2s) + precise.quad(dx_term, lq.phixx[last_node], dx_term)
    return dX, dV_1, dV_2
