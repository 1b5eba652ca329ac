"""Solver data structures: flattened multi-phase problem + solver state.

TPU-first design: the reference represents a multi-phase problem as a deque of
per-phase objects with per-phase horizons (HSDDPSolver/header/MultiPhaseDDP.h,
HKDProblem.h) and mutates it structurally every MPC step. Here the whole
multi-phase trajectory is a *flattened transition graph* with static shapes:

  nodes 0..T, transitions 0..T-1.  Each transition is one of
    DYN   — a dynamics step (forward-Euler, running cost, path constraints)
    RESET — a phase boundary (reset map, terminal cost + AL constraints at the
            source node, impact-aware value sandwich in the backward sweep)
    PAD   — inactive padding (pass-through)

Phase structure, contact schedule, shooting-node sets, constraint activity are
all *data* (masks), so one compiled solver serves every gait and every
receding-horizon step with zero recompiles, and the whole solve vmaps over a
scenario axis.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# transition kinds
PAD, DYN, RESET = 0, 1, 2

N_GRF_ROWS = 20  # 5 friction-cone rows x 4 legs, swing rows masked


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_pytree_node(
        cls,
        lambda obj: ([getattr(obj, f) for f in fields], None),
        lambda aux, children: cls(*children),
    )
    return cls


@_pytree_dataclass
class ProblemData:
    """Per-solve problem description (device arrays, all static shapes).

    T transitions, T+1 nodes. Node j is the state before transition j;
    the reference-trajectory arrays are per node.
    """
    kind: jnp.ndarray          # (T,)   int32: PAD / DYN / RESET
    contact: jnp.ndarray       # (T,4)  f: contact during transition (RESET: c_cur)
    contact_next: jnp.ndarray  # (T,4)  f: RESET: c_next; DYN/PAD: == contact
    dt: jnp.ndarray            # ()     f: integration step
    xr: jnp.ndarray            # (T+1,24) state reference per node
    ur: jnp.ndarray            # (T+1,24) control reference per node
    foot_r: jnp.ndarray        # (T+1,12) reference foot placements per node
    term_mask: jnp.ndarray     # (T+1,) f: 1 at phase-terminal nodes
    term_contact: jnp.ndarray  # (T+1,4) f: contact of the phase owning the node
    td_mask: jnp.ndarray       # (T+1,4) f: touchdown legs at terminal nodes
    ss_mask: jnp.ndarray       # (T+1,) f: 1 if node is a shooting node
    start_mask: jnp.ndarray    # (T+1,) f: 1 at phase-start nodes (node 0 and
                               #         dest of every RESET transition); these
                               #         shoot even with MS off (SinglePhase.cpp:187-193)
    x0: jnp.ndarray            # (24,)  initial condition

    @property
    def T(self):
        return self.kind.shape[0]

    @property
    def is_dyn(self):
        return (self.kind == DYN).astype(self.xr.dtype)


@_pytree_dataclass
class ConstraintState:
    """AL / ReB parameters — mutable across outer iterations, warm-started
    across MPC solves (reference: ConstraintsBase.h:58-86)."""
    reb_delta: jnp.ndarray      # (T, 20)
    reb_delta_min: jnp.ndarray  # (T, 20)
    reb_eps: jnp.ndarray        # (T, 20)
    al_lambda: jnp.ndarray      # (T+1, 4)
    al_sigma: jnp.ndarray       # (T+1, 4)
    al_sigma_max: jnp.ndarray   # (T+1, 4)


@_pytree_dataclass
class SolverState:
    """Warm-startable solver state (nominal trajectory + gains + multipliers)."""
    Xbar: jnp.ndarray    # (T+1, 24) nominal node states
    Ubar: jnp.ndarray    # (T, 24)   nominal controls (DYN transitions)
    dU: jnp.ndarray      # (T, 24)   feedforward
    K: jnp.ndarray       # (T, 24, 24) feedback gains
    dX: jnp.ndarray      # (T+1, 24) multiple-shooting search direction
    defect_bar: jnp.ndarray  # (T+1, 24)
    constr: ConstraintState

    @classmethod
    def init(cls, prob: ProblemData, constr: ConstraintState) -> "SolverState":
        T = prob.T
        dtype = prob.xr.dtype
        xs, us = prob.xr.shape[-1], prob.ur.shape[-1]
        return cls(
            Xbar=prob.xr.astype(dtype),
            Ubar=jnp.zeros((T, us), dtype),
            dU=jnp.zeros((T, us), dtype),
            K=jnp.zeros((T, us, xs), dtype),
            dX=jnp.zeros((T + 1, xs), dtype),
            defect_bar=jnp.zeros((T + 1, xs), dtype),
            constr=constr,
        )


@_pytree_dataclass
class Rollout:
    """Result of a hybrid rollout at some step size eps."""
    X: jnp.ndarray        # (T+1, 24)
    U: jnp.ndarray        # (T, 24)
    Xsim: jnp.ndarray     # (T+1, 24)
    defect: jnp.ndarray   # (T+1, 24)
    success: jnp.ndarray  # () bool — divergence guard ||xsim|| <= 1e6


@_pytree_dataclass
class LQData:
    """LQ approximation along the nominal trajectory (per transition/node).

    For RESET transitions, A holds the reset-map jacobian Px and B is zero.
    Cost partials include the ReB barrier (running) and AL terms (terminal)
    exactly as the reference folds them in (SinglePhase.cpp:265-296, 370-426).
    """
    A: jnp.ndarray      # (T, 24, 24)
    B: jnp.ndarray      # (T, 24, 24)
    lx: jnp.ndarray     # (T, 24)
    lu: jnp.ndarray     # (T, 24)
    lxx: jnp.ndarray    # (T, 24, 24)
    luu: jnp.ndarray    # (T, 24, 24)
    lux: object         # (T, 24, 24) or None when the model has no u-x cross
                        # cost terms (the HKD model: lux is identically zero,
                        # SinglePhaseInterface.cpp lux.setZero)
    phix: jnp.ndarray   # (T+1, 24)   terminal gradient per node (masked)
    phixx: jnp.ndarray  # (T+1, 24, 24)


@_pytree_dataclass
class SolveResult:
    state: SolverState          # accepted nominal trajectory + gains
    cost: jnp.ndarray           # () actual cost
    dyn_feas: jnp.ndarray       # () dynamics feasibility (defect norm)
    max_tconstr: jnp.ndarray    # () max terminal-constraint violation
    max_pconstr: jnp.ndarray    # () max path-constraint violation (<= 0)
    n_iters: jnp.ndarray        # () total inner iterations executed
    solve_failed: jnp.ndarray   # () bool (regularization blow-up)
    cost_trace: jnp.ndarray     # (max_trace,) per-iteration cost (padded w/ nan)
    feas_trace: jnp.ndarray     # (max_trace,)
    eqn_trace: jnp.ndarray      # (max_trace,) max terminal violation per iter
                                # (reference eqn_feas_buffer, MultiPhaseDDP.cpp:370)
    ineq_trace: jnp.ndarray     # (max_trace,) max path violation per iter (<=0)
                                # (reference ineq_feas_buffer, MultiPhaseDDP.cpp:371)
