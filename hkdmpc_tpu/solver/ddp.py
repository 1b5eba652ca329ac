"""Multi-phase HS-DDP driver.

Parity target: MultiPhaseDDP::solve (HSDDPSolver/source/MultiPhaseDDP.cpp:232-428)
— AL outer loop, DDP inner loop with regularized backward sweep, multiple-
shooting linear rollout, merit-function line search, AL/ReB parameter updates,
and all of the reference's termination rules, replicated under `lax.while_loop`
with static shapes so the entire solve jits once and vmaps over scenarios.

TPU-first deviation: the reference's *sequential* line search (try eps, shrink,
retry — each trial a full rollout) is evaluated as a *parallel* line search:
all candidate step sizes roll out at once under vmap and the first
Armijo-satisfying candidate is selected. Because each trial is independent of
the others, this is bit-for-bit the same decision the sequential loop makes.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from hkdmpc_tpu.config import HSDDPOption
from hkdmpc_tpu.ops import precise
from hkdmpc_tpu.solver import backward, lq as lq_mod, rollout as ro_mod
from hkdmpc_tpu.solver.structs import (ConstraintState, ProblemData,
                                       SolveResult, SolverState)

TRACE_LEN = 64


def trace_len_for(opt: HSDDPOption) -> int:
    """Per-iteration trace-buffer capacity for a given option set: one seed
    entry plus at most one push per inner iteration, capped at TRACE_LEN.
    Sizing by the caps (runtime caps: 2x1 -> 3 entries instead of 64)
    shrinks the result-assembly movement and the fused bundle; the trace
    CONTENT is decision-identical — no push can exceed capacity, so the
    clamped cursor never overwrites."""
    return min(TRACE_LEN, 1 + int(opt.max_AL_iter) * int(opt.max_DDP_iter))


def _replace(obj, **kw):
    return dataclasses.replace(obj, **kw)


def update_al_params(constr: ConstraintState, h_all, term_mask,
                     tconstr_thresh, update_penalty) -> ConstraintState:
    """AL multiplier/penalty schedule (ConstraintsBase.h:349-365).
    h_all rows are already masked by the model's terminal-constraint masks."""
    h = h_all * term_mask[:, None]
    habs = jnp.abs(h)
    skip = habs < tconstr_thresh
    grow = jnp.logical_and(jnp.logical_not(skip), habs > 0.005)
    lag = jnp.logical_and(jnp.logical_not(skip), jnp.logical_not(grow))
    sigma = jnp.where(grow,
                      jnp.minimum(constr.al_sigma * update_penalty,
                                  constr.al_sigma_max),
                      constr.al_sigma)
    lam = jnp.where(lag, constr.al_lambda + h * constr.al_sigma,
                    constr.al_lambda)
    return _replace(constr, al_sigma=sigma, al_lambda=lam)


def update_reb_params(constr: ConstraintState, g_all, pconstr_thresh,
                      update_relax, update_ReB) -> ConstraintState:
    """ReB weight/relaxation schedule (ConstraintsBase.h:168-183). Only
    violated rows (g <= -thresh) update."""
    violated = g_all <= -pconstr_thresh
    eps = jnp.where(violated, constr.reb_eps * update_ReB, constr.reb_eps)
    delta = jnp.where(
        violated,
        jnp.maximum(constr.reb_delta * update_relax, constr.reb_delta_min),
        constr.reb_delta)
    return _replace(constr, reb_eps=eps, reb_delta=delta)


def solve(prob: ProblemData, state: SolverState, opt: HSDDPOption,
          parallel_rollout: bool = False, model=None,
          assoc_linear: bool = False, aug_sweep: bool = True,
          pallas_backward: bool = False,
          jvp_linear: bool = False,
          kernel_jac: bool = False,
          unroll_caps: bool = False,
          assoc_backward: bool = False) -> SolveResult:
    """Run one full HS-DDP solve. `opt` and `model` are static (python)
    configuration — iteration caps, thresholds, toggles, and the model's
    cost/constraint terms are baked into the compiled solver; use separate
    jit instances for cold-solve vs runtime caps.

    All flags are static. The production configurations:
    - batched throughput (bench.py): parallel_rollout + kernel_jac
      (in-kernel-everything Pallas backward; forces jvp_linear) +
      unroll_caps (statically unrolled AL/DDP loops, masked discards —
      decision-identical, pinned by test).
    - batch-1 MPC latency (mpc/): parallel_rollout + assoc_linear +
      assoc_backward (parallel-in-time log-depth recursions, ops/assoc.py).
    parallel_rollout is only valid when every active node is a shooting
    node (HKDProblem.all_shooting())."""
    from hkdmpc_tpu.solver.model_api import hkd_model_spec
    model = model or hkd_model_spec()
    if kernel_jac:
        # in-kernel jacobians: A/B are never materialized — the backward
        # rebuilds them from (X, U) inside the Pallas kernel (batched) or
        # via the same shared entry formulas (unbatched), and the linear
        # rollout must use jvp (assoc needs dense A/B)
        assert getattr(model, "build_AB_tminor", None) is not None, \
            "kernel_jac requires the HKD T-minor jacobian model"
        assert not assoc_linear, "kernel_jac is incompatible with assoc_linear"
        jvp_linear = True
    dtype = prob.xr.dtype
    ms, al_on, reb_on = bool(opt.MS), bool(opt.AL_active), bool(opt.ReB_active)
    eps_candidates = jnp.asarray(opt.line_search_epsilons, dtype)
    n_eps = eps_candidates.shape[0]
    last_node = ro_mod.last_active_node(prob)

    if parallel_rollout and ms:
        rollout_fn = lambda st, eps, du_eff=None: ro_mod.hybrid_rollout_parallel(
            prob, st, eps, model, du_eff=du_eff)
    else:
        rollout_fn = lambda st, eps, du_eff=None: ro_mod.hybrid_rollout(
            prob, st, eps, ms, model)

    def cost_of(X, U, constr):
        return ro_mod.compute_cost(prob, X, U, constr, reb_on, al_on, model)

    # ---- initial nominal rollout (MultiPhaseDDP.cpp:257-280) -------------
    ro = rollout_fn(state, 0.0)
    state = _replace(state, Xbar=ro.X, Ubar=ro.U, defect_bar=ro.defect)
    cost0, (g0, h0) = cost_of(ro.X, ro.U, state.constr)
    feas0 = ro_mod.dynamics_feasibility(prob, ro.defect)
    maxp0, maxt0 = ro_mod.max_violations(prob, g0, h0)

    trace_len = trace_len_for(opt)
    traces0 = {
        "cost": jnp.full(trace_len, jnp.nan, dtype).at[0].set(cost0),
        "feas": jnp.full(trace_len, jnp.nan, dtype).at[0].set(feas0),
        "eqn": jnp.full(trace_len, jnp.nan, dtype).at[0].set(maxt0),
        "ineq": jnp.full(trace_len, jnp.nan, dtype).at[0].set(maxp0),
        "n": jnp.array(1, jnp.int32),
    }

    carry0 = dict(
        state=state, X=ro.X, U=ro.U, defect=ro.defect, g=g0, h=h0,
        cost=cost0, feas=feas0, maxp=maxp0, maxt=maxt0,
        maxp_prev=maxp0, maxt_prev=maxt0,
        iter_ou=jnp.array(0, jnp.int32), it_total=jnp.array(0, jnp.int32),
        stop=jnp.array(False), failed=jnp.array(False), traces=traces0,
    )

    # ---- line search (parallel over candidates) --------------------------
    def line_search(c, dv1, dv2, merit_rho, merit_prev, feas_prev):
        # dX is fixed across trials: hoist dU + K dX out of the eps vmap
        # (identical floats; K is read once per iteration, not per trial)
        st_ls = c["state"]
        du_eff = (st_ls.dU + precise.mv(st_ls.K, st_ls.dX[:-1])
                  if (parallel_rollout and ms) else None)

        def trial(eps):
            ro_t = rollout_fn(c["state"], eps, du_eff)
            cost_t, (g_t, h_t) = cost_of(ro_t.X, ro_t.U, c["state"].constr)
            feas_t = ro_mod.dynamics_feasibility(prob, ro_t.defect)
            merit_t = cost_t + merit_rho * feas_t
            exp_cost = eps * dv1 + 0.5 * eps * eps * dv2
            exp_merit = exp_cost - eps * merit_rho * feas_prev
            ok = jnp.logical_and(
                merit_t <= merit_prev + opt.gamma * exp_merit, ro_t.success)
            return ok, merit_t, cost_t, feas_t, ro_t, g_t, h_t

        oks, merits, costs_, feass, ros, gs, hs = jax.vmap(trial)(eps_candidates)
        any_ok = jnp.any(oks)
        idx = jnp.where(any_ok, jnp.argmax(oks), n_eps - 1)
        pick = lambda tree: jax.tree_util.tree_map(lambda a: a[idx], tree)
        ro_sel = pick(ros)
        return (any_ok, ro_sel, pick(gs), pick(hs), costs_[idx], feass[idx],
                merits[idx])

    # ---- inner DDP loop (MultiPhaseDDP.cpp:304-382) ----------------------
    def inner_body(c, reg):
        st = c["state"]
        cost, (g, h) = cost_of(c["X"], c["U"], st.constr)
        feas = ro_mod.dynamics_feasibility(prob, c["defect"])

        lqd = lq_mod.lq_approximation(prob, c["X"], c["U"], st.constr,
                                      reb_on, al_on, model,
                                      skip_ab=kernel_jac,
                                      skip_partials=kernel_jac)
        if kernel_jac:
            rbe = (st.constr.reb_eps if reb_on
                   else jnp.zeros_like(st.constr.reb_eps))
            sig = (st.constr.al_sigma if al_on
                   else jnp.zeros_like(st.constr.al_sigma))
            lam = (st.constr.al_lambda if al_on
                   else jnp.zeros_like(st.constr.al_lambda))
            kj_ctx = (c["X"], c["U"], st.constr.reb_delta, rbe, sig, lam)
        else:
            kj_ctx = None
        dU, K, dv1, dv2, reg_new, ok_bw, bw_failed = \
            backward.backward_sweep_regularized(
                prob, lqd, c["defect"], reg, opt.update_regularization,
                last_node, aug_sweep, pallas_backward,
                kernel_jac_XU=kj_ctx, assoc_backward=assoc_backward)
        st = _replace(st, dU=dU, K=K)

        if ms:
            if assoc_linear:
                from hkdmpc_tpu.ops.assoc import linear_rollout_assoc
                dX, dv1, dv2 = linear_rollout_assoc(prob, st, lqd,
                                                    c["defect"], 1.0)
            elif jvp_linear:
                dX, dv1, dv2 = ro_mod.linear_rollout_jvp(
                    prob, st, c["X"], c["U"], lqd, c["defect"], 1.0, model,
                    use_closed_dv=kernel_jac, reb_active=reb_on,
                    al_active=al_on)
            else:
                dX, dv1, dv2 = ro_mod.linear_rollout(prob, st, lqd,
                                                     c["defect"], 1.0)
            st = _replace(st, dX=dX)

        dv_abs = jnp.abs(dv1 + 0.5 * dv2)
        merit_rho = jnp.where(
            feas > opt.dynamics_feas_thresh,
            dv_abs / ((1.0 - opt.merit_scale) * feas) + opt.merit_offset, 0.0)
        merit = cost + merit_rho * feas
        cost_prev, merit_prev = cost, merit

        early = jnp.logical_and(dv_abs < opt.cost_thresh,
                                feas <= opt.dynamics_feas_thresh)

        def do_line_search(c, st):
            ls_ok, ro_sel, g_sel, h_sel, cost_sel, feas_sel, merit_sel = \
                line_search(dict(c, state=st), dv1, dv2, merit_rho,
                            merit_prev, feas)
            st2 = jax.tree_util.tree_map(
                lambda a, b: jnp.where(ls_ok, a, b),
                _replace(st, Xbar=ro_sel.X, Ubar=ro_sel.U,
                         defect_bar=ro_sel.defect), st)
            cost_new = jnp.where(ls_ok, cost_sel, cost_prev)
            merit_new = jnp.where(ls_ok, merit_sel, merit_prev)
            return (st2, ro_sel.X, ro_sel.U, ro_sel.defect, g_sel, h_sel,
                    cost_new, feas_sel, merit_new)

        def skip_line_search(c, st):
            return (st, c["X"], c["U"], c["defect"], g, h, cost, feas, merit)

        run_ls = jnp.logical_and(jnp.logical_not(early),
                                 jnp.logical_not(bw_failed))
        st, X, U, defect, g2, h2, cost2, feas2, merit2 = lax.cond(
            run_ls, do_line_search, skip_line_search, c, st)

        late = jnp.logical_and(
            jnp.abs((cost_prev - cost2) / cost_prev) < opt.cost_thresh,
            feas2 <= opt.dynamics_feas_thresh)
        stop_inner = jnp.logical_or(early, jnp.logical_or(late, bw_failed))

        # trace buffering — skipped on the early exit (cpp:340-343) AND on
        # the late-convergence break, which fires before the buffer push
        # (cpp:358-371)
        maxp2, maxt2 = ro_mod.max_violations(prob, g2, h2)

        tr = c["traces"]
        do_trace = jnp.logical_and(
            jnp.logical_not(early),
            jnp.logical_and(jnp.logical_not(bw_failed),
                            jnp.logical_not(late)))
        n = tr["n"]
        tr = dict(
            cost=jnp.where(do_trace, tr["cost"].at[n].set(cost2), tr["cost"]),
            feas=jnp.where(do_trace, tr["feas"].at[n].set(feas2), tr["feas"]),
            eqn=jnp.where(do_trace, tr["eqn"].at[n].set(maxt2), tr["eqn"]),
            ineq=jnp.where(do_trace, tr["ineq"].at[n].set(maxp2), tr["ineq"]),
            n=jnp.where(do_trace, jnp.minimum(n + 1, trace_len - 1), n),
        )
        c2 = dict(c, state=st, X=X, U=U, defect=defect, g=g2, h=h2,
                  cost=cost2, feas=feas2, maxp=maxp2, maxt=maxt2, traces=tr,
                  failed=bw_failed, it_total=c["it_total"] + 1)
        return c2, reg_new, stop_inner

    def tree_where(pred, a, b):
        return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y),
                                      a, b)

    def outer_body(c):
        c = dict(c, maxt_prev=c["maxt"], maxp_prev=c["maxp"],
                 iter_ou=c["iter_ou"] + 1)

        def inner_cond(ic):
            cc, reg, stop_in, iter_in = ic
            return jnp.logical_and(iter_in < opt.max_DDP_iter,
                                   jnp.logical_not(stop_in))

        def inner_step(ic):
            cc, reg, stop_in, iter_in = ic
            cc2, reg2, stop2 = inner_body(cc, reg)
            return cc2, reg2, stop2, iter_in + 1

        ic0 = (c, jnp.zeros((), dtype), jnp.array(False),
               jnp.array(0, jnp.int32))
        if unroll_caps:
            # statically unrolled inner loop: every iteration's body is
            # computed and masked out where the while_loop would not have
            # run it — decision-identical, but XLA sees one straight-line
            # program (cross-iteration CSE of loop-invariant work, no
            # dynamic-trip-count scheduling barriers)
            ic = ic0
            for _ in range(int(opt.max_DDP_iter)):
                ic = tree_where(inner_cond(ic), inner_step(ic), ic)
            c = ic[0]
        else:
            c, _, _, _ = lax.while_loop(inner_cond, inner_step, ic0)

        # AL / ReB parameter updates (skipped entirely on bad solve)
        constr = c["state"].constr
        if al_on:
            constr_new = update_al_params(
                constr, c["h"], prob.term_mask,
                opt.tconstr_thresh, opt.update_penalty)
        else:
            constr_new = constr
        if reb_on:
            constr_new = update_reb_params(
                constr_new, c["g"], opt.pconstr_thresh, opt.update_relax,
                opt.update_ReB)
        constr = jax.tree_util.tree_map(
            lambda a, b: jnp.where(c["failed"], b, a), constr_new, constr)
        c = dict(c, state=_replace(c["state"], constr=constr))

        feas_ok = c["feas"] <= opt.dynamics_feas_thresh
        satisfied = jnp.logical_and(
            jnp.logical_and(c["maxt"] < opt.tconstr_thresh,
                            jnp.abs(c["maxp"]) < opt.pconstr_thresh), feas_ok)
        stalled = jnp.logical_and(
            jnp.logical_and(jnp.abs(c["maxt"] - c["maxt_prev"]) < 1e-4,
                            jnp.abs(c["maxp"] - c["maxp_prev"]) < 1e-4),
            feas_ok)
        stop = jnp.logical_or(satisfied, stalled)
        return dict(c, stop=jnp.logical_or(stop, c["failed"]))

    def outer_cond(c):
        return jnp.logical_and(c["iter_ou"] < opt.max_AL_iter,
                               jnp.logical_not(c["stop"]))

    if unroll_caps:
        c = carry0
        for _ in range(int(opt.max_AL_iter)):
            c = tree_where(outer_cond(c), outer_body(c), c)
    else:
        c = lax.while_loop(outer_cond, outer_body, carry0)

    return SolveResult(
        state=c["state"], cost=c["cost"], dyn_feas=c["feas"],
        max_tconstr=c["maxt"], max_pconstr=c["maxp"],
        n_iters=c["it_total"], solve_failed=c["failed"],
        cost_trace=c["traces"]["cost"], feas_trace=c["traces"]["feas"],
        eqn_trace=c["traces"]["eqn"], ineq_trace=c["traces"]["ineq"])


# jitted entry point: one compiled instance per (option set, problem shape)
solve_jit = jax.jit(
    solve,
    static_argnames=("opt", "parallel_rollout", "model", "assoc_linear",
                     "aug_sweep", "pallas_backward", "jvp_linear",
                     "kernel_jac", "unroll_caps", "assoc_backward"))

# batched solves: vmap over (ProblemData, SolverState) scenario axes.
# Only (prob, state) are vmapped; every flag is a keyword-defaulted static
# threaded through a closure, so adding a new solve flag can never strand a
# call site on a stale in_axes tuple again (round-1 regression).
def _solve_batch(prob, state, opt, parallel_rollout=False, model=None,
                 assoc_linear=False, aug_sweep=True, pallas_backward=False,
                 jvp_linear=False, kernel_jac=False, unroll_caps=False,
                 assoc_backward=False):
    fn = lambda p, s: solve(p, s, opt, parallel_rollout, model, assoc_linear,
                            aug_sweep, pallas_backward, jvp_linear,
                            kernel_jac, unroll_caps, assoc_backward)
    return jax.vmap(fn)(prob, state)


solve_batch = jax.jit(
    _solve_batch,
    static_argnames=("opt", "parallel_rollout", "model", "assoc_linear",
                     "aug_sweep", "pallas_backward", "jvp_linear",
                     "kernel_jac", "unroll_caps", "assoc_backward"))
