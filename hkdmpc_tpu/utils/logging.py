"""Trajectory log files in the reference's text format.

Parity:
- log_trajectory_sequence (HSDDPSolver/common/HSDDP_Utils.h:80-142) —
  comma-separated rows, 5 significant digits, one row per step per phase with
  the terminal state/value-gradient/cost appended per phase and the last
  control row duplicated, so logs diff directly against the reference's
  (HKDMPC/log/{state,control,cost,value_grad}_log.txt).
- log_a_trajectory (HSDDP_Utils.h:144-222) — same four files for a single
  trajectory plus dynamics_partial_{A,B}.txt matrix dumps (one matrix per
  step, blank-line separated).

`solution_log_data` recomputes the full log payload (per-node running costs,
terminal costs, value gradients, A/B partials) from a solved problem in one
jitted diagnostic pass.
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp


def _fmt_row(v) -> str:
    return ",".join(f"{x:.5g}" for x in np.asarray(v).ravel())


def _fmt_mat(m) -> str:
    return "\n".join(" ".join(f"{x:.5g}" for x in row) for row in np.asarray(m))


def log_trajectory_sequence(folder: str, phases, value_grads=None,
                            run_costs=None, term_costs=None) -> None:
    """phases: iterable of objects with Xbar (h+1,24), Ubar (h,24), horizon.
    value_grads: optional list of per-phase (h+1, 24) arrays (G).
    run_costs: optional list of per-phase (h,) running-cost arrays.
    term_costs: optional per-phase terminal costs Phi."""
    os.makedirs(folder, exist_ok=True)
    with open(os.path.join(folder, "state_log.txt"), "w") as fs, \
         open(os.path.join(folder, "control_log.txt"), "w") as fc, \
         open(os.path.join(folder, "cost_log.txt"), "w") as fl, \
         open(os.path.join(folder, "value_grad_log.txt"), "w") as fg:
        for i, ph in enumerate(phases):
            h = ph.horizon
            G = value_grads[i] if value_grads is not None else np.zeros((h + 1, 24))
            l = run_costs[i] if run_costs is not None else np.zeros(h)
            phi = term_costs[i] if term_costs is not None else 0.0
            for k in range(h):
                fc.write(_fmt_row(ph.Ubar[k]) + "\n")
                fs.write(_fmt_row(ph.Xbar[k]) + "\n")
                fg.write(_fmt_row(G[k]) + "\n")
                fl.write(f"{l[k]:.5g}\n")
            fc.write(_fmt_row(ph.Ubar[h - 1]) + "\n")
            fs.write(_fmt_row(ph.Xbar[h]) + "\n")
            fg.write(_fmt_row(G[h]) + "\n")
            fl.write(f"{phi:.5g}\n")


def log_a_trajectory(folder: str, Xbar, Ubar, G=None, run_costs=None,
                     term_cost=0.0, A=None, B=None) -> None:
    """Single-trajectory dump incl. dynamics partials
    (HSDDP_Utils.h:144-222): Xbar (h+1,nx), Ubar (h,nu), G (h+1,nx),
    run_costs (h,), A/B (h,nx,nx)/(h,nx,nu)."""
    os.makedirs(folder, exist_ok=True)
    h = len(Ubar)
    G = np.zeros((h + 1, Xbar.shape[1])) if G is None else np.asarray(G)
    l = np.zeros(h) if run_costs is None else np.asarray(run_costs)
    with open(os.path.join(folder, "state_log.txt"), "w") as fs, \
         open(os.path.join(folder, "control_log.txt"), "w") as fc, \
         open(os.path.join(folder, "cost_log.txt"), "w") as fl, \
         open(os.path.join(folder, "value_grad_log.txt"), "w") as fg, \
         open(os.path.join(folder, "dynamics_partial_A.txt"), "w") as fa, \
         open(os.path.join(folder, "dynamics_partial_B.txt"), "w") as fb:
        for k in range(h):
            fc.write(_fmt_row(Ubar[k]) + "\n")
            fs.write(_fmt_row(Xbar[k]) + "\n")
            fg.write(_fmt_row(G[k]) + "\n")
            fl.write(f"{l[k]:.5g}\n")
            if A is not None:
                fa.write(_fmt_mat(A[k]) + "\n\n")
            if B is not None:
                fb.write(_fmt_mat(B[k]) + "\n\n")
        fc.write(_fmt_row(Ubar[h - 1]) + "\n")
        fs.write(_fmt_row(Xbar[h]) + "\n")
        fg.write(_fmt_row(G[h]) + "\n")
        fl.write(f"{term_cost:.5g}\n")


@functools.partial(jax.jit, static_argnames=("opt", "model"))
def _log_pass(prob, state, opt, model):
    from hkdmpc_tpu.solver import backward, lq as lq_mod, rollout as ro_mod
    from hkdmpc_tpu.solver.model_api import hkd_model_spec

    model = model or hkd_model_spec()
    X, U = state.Xbar, state.Ubar
    run_l, term_phi, _, _ = ro_mod.cost_nodes(
        prob, X, U, state.constr, opt.ReB_active, opt.AL_active, model)
    lqd = lq_mod.lq_approximation(prob, X, U, state.constr,
                                  opt.ReB_active, opt.AL_active, model)
    last = ro_mod.last_active_node(prob)
    out = backward.backward_sweep(prob, lqd, state.defect_bar,
                                  jnp.zeros((), state.Xbar.dtype), last,
                                  emit_G=True)
    Gs = out[-1]
    return run_l, term_phi, Gs, lqd.A, lqd.B


def solution_log_data(problem, prob, state, opt, model=None):
    """Per-phase log payload for a solved HKDProblem: returns
    (value_grads, run_costs, term_costs, A_list, B_list) keyed like
    problem.phases, computed in one jitted pass over the flat arrays."""
    run_l, term_phi, Gs, A, B = map(
        np.asarray, _log_pass(prob, state, opt, model))
    value_grads, run_costs, term_costs, A_list, B_list = [], [], [], [], []
    j = 0
    for ph in problem.phases:
        h = ph.horizon
        value_grads.append(Gs[j: j + h + 1])
        run_costs.append(run_l[j: j + h])
        term_costs.append(term_phi[j + h])
        A_list.append(A[j: j + h])
        B_list.append(B[j: j + h])
        j += h + 1  # skip the RESET transition between phases
    return value_grads, run_costs, term_costs, A_list, B_list


def log_solution(folder: str, problem, prob, state, opt, model=None) -> None:
    """Write the complete reference log-file set for a solved problem:
    the four sequence logs plus per-phase A/B partial dumps
    (dynamics_partial_{A,B}_phase{i}.txt)."""
    vg, rc, tc, A_list, B_list = solution_log_data(problem, prob, state, opt,
                                                   model)
    log_trajectory_sequence(folder, problem.phases, value_grads=vg,
                            run_costs=rc, term_costs=tc)
    os.makedirs(folder, exist_ok=True)
    with open(os.path.join(folder, "dynamics_partial_A.txt"), "w") as fa, \
         open(os.path.join(folder, "dynamics_partial_B.txt"), "w") as fb:
        for A, B in zip(A_list, B_list):
            for k in range(len(A)):
                fa.write(_fmt_mat(A[k]) + "\n\n")
                fb.write(_fmt_mat(B[k]) + "\n\n")


def load_log(path: str) -> np.ndarray:
    """Load a reference-format log file into an array (rows x dims)."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append([float(w) for w in line.split(",")])
    return np.asarray(rows)
