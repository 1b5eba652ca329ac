"""Per-stage solver timing — the analog of the reference's TIME_BENCHMARK
instrumentation (HSDDP_Utils.h:11-19, TIME_PER_ITERATION{n_bws, time_bws,
time_fit, time_partial}).

A fully-jitted solve cannot be timed stage-by-stage from the host, so the
profiled mode executes the solver stages as separate jitted calls: same math,
same results, with host-side wall-clock per stage. Use for performance work;
production uses the single fused solve.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class StageTimes:
    time_partial: float = 0.0   # LQ approximation (jacobians + cost partials)
    time_bws: float = 0.0       # backward sweep(s)
    time_fit: float = 0.0       # line-search rollouts + cost
    time_rollout: float = 0.0   # nominal rollout
    n_bws: int = 0
    ddp_iter: int = 0


class StageTimer:
    """Collects TIME_PER_ITERATION-style records."""

    def __init__(self):
        self.records: List[StageTimes] = []
        self._cur = StageTimes()

    def stage(self, name: str):
        timer = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *exc):
                dt = (time.perf_counter() - self.t0) * 1e3
                cur = timer._cur
                if name == "partial":
                    cur.time_partial += dt
                elif name == "backward":
                    cur.time_bws += dt
                    cur.n_bws += 1
                elif name == "fit":
                    cur.time_fit += dt
                elif name == "rollout":
                    cur.time_rollout += dt

        return _Ctx()

    def end_iteration(self):
        self._cur.ddp_iter = len(self.records) + 1
        self.records.append(self._cur)
        self._cur = StageTimes()

    def summary(self) -> Dict[str, float]:
        if not self.records:
            return {}
        tot = lambda f: sum(getattr(r, f) for r in self.records)
        return {
            "iterations": len(self.records),
            "time_partial_ms": tot("time_partial"),
            "time_bws_ms": tot("time_bws"),
            "time_fit_ms": tot("time_fit"),
            "time_rollout_ms": tot("time_rollout"),
        }

    def print_summary(self):
        s = self.summary()
        if s:
            print("Time total (ms): partial %.2f | backward %.2f | "
                  "line-search %.2f | rollout %.2f over %d iterations"
                  % (s["time_partial_ms"], s["time_bws_ms"], s["time_fit_ms"],
                     s["time_rollout_ms"], s["iterations"]))


def profile_solve(prob, state, opt, timer: StageTimer, max_iters: int = None):
    """Run DDP iterations stage-by-stage with timing (simplified driver:
    fixed iterations, accepts the best line-search candidate by merit —
    intended for perf analysis, not exact-parity solving)."""
    import dataclasses as dc

    from hkdmpc_tpu.solver import backward, lq as lq_mod, rollout as ro_mod

    ms = bool(opt.MS)
    iters = max_iters or opt.max_DDP_iter * opt.max_AL_iter
    block = lambda r: jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a, r)

    with timer.stage("rollout"):
        ro = block(ro_mod.hybrid_rollout(prob, state, 0.0, ms))
    state = dc.replace(state, Xbar=ro.X, Ubar=ro.U, defect_bar=ro.defect)
    reg = 0.0
    for _ in range(iters):
        with timer.stage("partial"):
            lqd = block(lq_mod.lq_approximation(prob, ro.X, ro.U, state.constr,
                                                opt.ReB_active, opt.AL_active))
        with timer.stage("backward"):
            last = ro_mod.last_active_node(prob)
            dU, K, dv1, dv2, reg, ok, failed = block(
                backward.backward_sweep_regularized(
                    prob, lqd, ro.defect, reg, opt.update_regularization, last))
        state = dc.replace(state, dU=dU, K=K)
        if ms:
            dX, dv1, dv2 = block(ro_mod.linear_rollout(prob, state, lqd,
                                                       ro.defect, 1.0))
            state = dc.replace(state, dX=dX)
        with timer.stage("fit"):
            best, best_merit = None, jnp.inf
            for eps in opt.line_search_epsilons:
                ro_t = block(ro_mod.hybrid_rollout(prob, state, eps, ms))
                cost_t, _ = ro_mod.compute_cost(prob, ro_t.X, ro_t.U,
                                                state.constr, opt.ReB_active,
                                                opt.AL_active)
                feas_t = ro_mod.dynamics_feasibility(prob, ro_t.defect)
                merit = float(cost_t) + 1e4 * float(feas_t)
                if merit < best_merit:
                    best, best_merit = ro_t, merit
            ro = best
        state = dc.replace(state, Xbar=ro.X, Ubar=ro.U, defect_bar=ro.defect)
        timer.end_iteration()
    return state
