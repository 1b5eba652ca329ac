"""Pluggable model / cost / constraint API — the framework's extension
surface.

Parity role: the reference's abstraction layer —
  SinglePhaseBase + std::function dynamics/reset callbacks
    (HSDDPSolver/header/SinglePhase.h:40-50),
  CostBase / CostContainer (SinglePhaseInterface.h),
  PathConstraintBase / TerminalConstraintBase / ConstraintContainer
    (ConstraintsBase.h)
— redesigned for JAX: a ModelSpec is a *static* bundle of pure functions
(hashable, jit-static), so the solver compiles once per model and the term
lists unroll into the fused program. User-defined models, cost terms, and
constraints plug in without touching solver code.

Every term receives a `ctx` dict of per-node reference data gathered from
ProblemData: {contact, term_contact, xr, ur, foot_r, dt, td_mask}.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax.numpy as jnp

from hkdmpc_tpu.models import hkd
from hkdmpc_tpu.solver import costs as hkd_costs


class CostTerm:
    """Interface for additive cost terms (CostBase analog)."""
    name = "cost"

    def running(self, x, u, ctx):            # -> scalar (already * dt)
        return 0.0

    def running_partials(self, x, u, ctx):   # -> (lx, lu, lxx, luu, lux)
        z, Z = jnp.zeros(x.shape[0], x.dtype), None
        raise NotImplementedError

    def terminal(self, x, ctx):              # -> scalar
        return 0.0

    def terminal_partials(self, x, ctx):     # -> (phix, phixx)
        raise NotImplementedError


class PathConstraintTerm:
    """Inequality path constraints g(x, u) >= 0 handled by ReB
    (PathConstraintBase analog). `n_rows` is static; inactive rows are
    masked. Gauss-Newton: only first derivatives (gx, gu) are used, matching
    the reference's HKD constraints (gxx = guu = 0)."""
    name = "path"
    n_rows = 0

    def violation(self, x, u, ctx):          # -> (g (n_rows,), mask (n_rows,))
        raise NotImplementedError

    def jacobian(self, x, u, ctx):           # -> (gx (n,xs), gu (n,us))
        raise NotImplementedError


class TerminalConstraintTerm:
    """Equality terminal constraints h(x) = 0 handled by AL
    (TerminalConstraintBase analog)."""
    name = "terminal"
    n_rows = 0

    def violation(self, x, ctx):             # -> (h (n_rows,), mask)
        raise NotImplementedError

    def jacobian(self, x, ctx):              # -> hx (n_rows, xs)
        raise NotImplementedError


class ModelSpec:
    """Static bundle: dynamics + reset + cost terms + constraints.

    Hashable by identity so it can be a static jit argument (construct once,
    reuse — a new instance recompiles)."""

    xs = 24
    us = 24

    def __init__(self, dynamics, dynamics_jacobians, reset_map,
                 reset_map_jacobian, cost_terms: Sequence[CostTerm],
                 path_constraints: Sequence[PathConstraintTerm] = (),
                 terminal_constraints: Sequence[TerminalConstraintTerm] = (),
                 xs: int = 24, us: int = 24):
        self.dynamics = dynamics
        self.dynamics_jacobians = dynamics_jacobians
        self.reset_map = reset_map
        self.reset_map_jacobian = reset_map_jacobian
        self.cost_terms = tuple(cost_terms)
        self.path_constraints = tuple(path_constraints)
        self.terminal_constraints = tuple(terminal_constraints)
        self.xs = xs
        self.us = us
        # optional horizon-minor fast paths (ops/jac_tminor, ops/hkd_tminor)
        self.build_AB_tminor = None
        self.dynamics_tbatch = None
        self.reset_tbatch = None
        self.compute_cost_tbatch = None
        self.running_partials_tbatch = None
        self.terminal_partials_tbatch = None
        # models whose running cost has no u-x cross terms can set this to
        # skip materializing lux entirely
        self.lux_is_zero = False

    @property
    def n_path_rows(self) -> int:
        return sum(c.n_rows for c in self.path_constraints)

    @property
    def n_terminal_rows(self) -> int:
        return sum(c.n_rows for c in self.terminal_constraints)

    # --- aggregation over terms (Container analogs) -----------------------

    def running_cost(self, x, u, ctx):
        return sum(term.running(x, u, ctx) for term in self.cost_terms)

    def running_cost_partials(self, x, u, ctx):
        parts = [term.running_partials(x, u, ctx) for term in self.cost_terms]
        return tuple(sum(p[i] for p in parts) for i in range(5))

    def terminal_cost(self, x, ctx):
        return sum(term.terminal(x, ctx) for term in self.cost_terms)

    def terminal_cost_partials(self, x, ctx):
        parts = [term.terminal_partials(x, ctx) for term in self.cost_terms]
        return tuple(sum(p[i] for p in parts) for i in range(2))

    def path_violations(self, x, u, ctx):
        """Concatenated (g, mask) across path constraints."""
        gs, masks = [], []
        for c in self.path_constraints:
            g, m = c.violation(x, u, ctx)
            gs.append(g)
            masks.append(m)
        if not gs:
            z = jnp.zeros(0, x.dtype)
            return z, z
        return jnp.concatenate(gs), jnp.concatenate(masks)

    def path_jacobians(self, x, u, ctx):
        gxs, gus = [], []
        for c in self.path_constraints:
            gx, gu = c.jacobian(x, u, ctx)
            gxs.append(gx)
            gus.append(gu)
        if not gxs:
            return (jnp.zeros((0, self.xs), x.dtype),
                    jnp.zeros((0, self.us), x.dtype))
        return jnp.concatenate(gxs, 0), jnp.concatenate(gus, 0)

    def terminal_violations(self, x, ctx):
        hs, masks = [], []
        for c in self.terminal_constraints:
            h, m = c.violation(x, ctx)
            hs.append(h)
            masks.append(m)
        if not hs:
            z = jnp.zeros(0, x.dtype)
            return z, z
        return jnp.concatenate(hs), jnp.concatenate(masks)

    def terminal_jacobians(self, x, ctx):
        hxs = [c.jacobian(x, ctx) for c in self.terminal_constraints]
        if not hxs:
            return jnp.zeros((0, self.xs), x.dtype)
        return jnp.concatenate(hxs, 0)


# ---------------------------------------------------------------------------
# HKD default terms (parity with HKDCost.h / HKDConstraints.cpp)
# ---------------------------------------------------------------------------


class HKDTrackingCost(CostTerm):
    name = "HKD tracking"

    def running(self, x, u, ctx):
        dtype = x.dtype
        dx = x - ctx["xr"]
        du = u - ctx["ur"]
        l = 0.5 * jnp.sum(hkd_costs.q_diag(ctx["contact"], dtype) * dx * dx)
        l += 0.5 * jnp.sum(hkd_costs.r_diag(dtype) * du * du)
        return ctx["dt"] * l

    def running_partials(self, x, u, ctx):
        dtype = x.dtype
        dt = ctx["dt"]
        dx = x - ctx["xr"]
        du = u - ctx["ur"]
        Q = hkd_costs.q_diag(ctx["contact"], dtype)
        R = hkd_costs.r_diag(dtype)
        return (dt * Q * dx, dt * R * du, dt * jnp.diag(Q), dt * jnp.diag(R),
                jnp.zeros((24, 24), dtype))

    def terminal(self, x, ctx):
        dtype = x.dtype
        dx = x - ctx["xr"]
        return 0.5 * jnp.sum(hkd_costs.qf_diag(ctx["term_contact"], dtype)
                             * dx * dx)

    def terminal_partials(self, x, ctx):
        dtype = x.dtype
        dx = x - ctx["xr"]
        Qf = hkd_costs.qf_diag(ctx["term_contact"], dtype)
        return Qf * dx, jnp.diag(Qf)


class HKDFootPlaceReg(CostTerm):
    name = "Foot regularization"

    def running(self, x, u, ctx):
        d, qf, _ = hkd_costs._footreg_terms(x, ctx["contact"], ctx["xr"],
                                            ctx["foot_r"], x.dtype)
        return ctx["dt"] * 0.5 * jnp.sum(qf * d * d)

    def running_partials(self, x, u, ctx):
        dtype = x.dtype
        dt = ctx["dt"]
        d, qf, J = hkd_costs._footreg_terms(x, ctx["contact"], ctx["xr"],
                                            ctx["foot_r"], dtype)
        z24 = jnp.zeros(24, dtype)
        Z = jnp.zeros((24, 24), dtype)
        from hkdmpc_tpu.ops import precise
        lx = dt * precise.vm(qf * d, J)
        lxx = dt * jnp.sum(J[:, :, None] * (qf[:, None, None] * J[:, None, :]),
                           axis=0)
        return (lx, z24, lxx, Z, Z)

    def terminal(self, x, ctx):
        d, qf, _ = hkd_costs._footreg_terms(x, ctx["term_contact"], ctx["xr"],
                                            ctx["foot_r"], x.dtype)
        return 10.0 * jnp.sum(qf * d * d)

    def terminal_partials(self, x, ctx):
        d, qf, J = hkd_costs._footreg_terms(x, ctx["term_contact"], ctx["xr"],
                                            ctx["foot_r"], x.dtype)
        from hkdmpc_tpu.ops import precise
        return (20.0 * precise.vm(qf * d, J),
                20.0 * jnp.sum(J[:, :, None]
                               * (qf[:, None, None] * J[:, None, :]), axis=0))


class GRFConstraint(PathConstraintTerm):
    name = "GRF"
    n_rows = 20

    def violation(self, x, u, ctx):
        return hkd_costs.grf_constraints(u, ctx["contact"], x.dtype)

    def jacobian(self, x, u, ctx):
        return (jnp.zeros((20, 24), x.dtype),
                hkd_costs.grf_constraint_jac(x.dtype))


class SwingHeightConstraint(PathConstraintTerm):
    """Swing-foot ground clearance: pf_z(x) - ground >= 0 per swing leg.

    The reference *declares* this constraint but never implements or
    instantiates it (HKDConstraints.h:66-103 — abstract, dead code); here it
    is a working optional term."""
    name = "Swing"
    n_rows = 4

    def __init__(self, ground_height: float = 0.0):
        self.ground = ground_height

    def violation(self, x, u, ctx):
        pf = hkd.foot_positions(x[3:6], x[0:3], x[12:24])
        return pf[:, 2] - self.ground, 1.0 - ctx["contact"]

    def jacobian(self, x, u, ctx):
        gx = jnp.stack([hkd.foot_height_jacobian(x, leg) for leg in range(4)])
        return gx, jnp.zeros((4, 24), x.dtype)


class TouchDownConstraint(TerminalConstraintTerm):
    name = "TouchDown"
    n_rows = 4

    def __init__(self, ground_height: float = 0.0):
        self.ground = ground_height

    def violation(self, x, ctx):
        pf = hkd.foot_positions(x[3:6], x[0:3], x[12:24])
        return ctx["td_mask"] * (pf[:, 2] - self.ground), ctx["td_mask"]

    def jacobian(self, x, ctx):
        return jnp.stack([hkd.foot_height_jacobian(x, leg)
                          for leg in range(4)])


_DEFAULT = None


def hkd_model_spec(swing_constraint: bool = False) -> ModelSpec:
    """The default HKD model (matches the reference's problem setup)."""
    global _DEFAULT
    if not swing_constraint and _DEFAULT is not None:
        return _DEFAULT
    path = [GRFConstraint()]
    if swing_constraint:
        path.append(SwingHeightConstraint())
    from hkdmpc_tpu.ops.jac_tminor import build_AB_tminor
    spec = ModelSpec(
        dynamics=hkd.dynamics,
        dynamics_jacobians=hkd.dynamics_jacobians_analytic,
        reset_map=hkd.reset_map,
        reset_map_jacobian=hkd.reset_map_jacobian,
        cost_terms=[HKDTrackingCost(), HKDFootPlaceReg()],
        path_constraints=path,
        terminal_constraints=[TouchDownConstraint()],
    )
    # horizon-minor fast path for the LQ dynamics/reset jacobians
    spec.build_AB_tminor = build_AB_tminor
    spec.lux_is_zero = True
    from hkdmpc_tpu.ops import hkd_tminor
    spec.dynamics_tbatch = hkd_tminor.dynamics_tbatch
    spec.reset_tbatch = hkd_tminor.reset_tbatch
    if not swing_constraint:
        # the T-minor cost path hardcodes the default term/constraint set.
        # The T-minor *partials* are the default since the MXU-free rewrite:
        # they lost pre-ops/precise (401 vs 312 ms at batch 1024 on v5e,
        # worse layout into the backward scan) but WIN now that the backward
        # is the batch-in-lanes Pallas kernel (85.7 vs 111.6 ms end-to-end
        # at batch 1024, scripts/exp_shares2.py) — the entrywise assembly
        # fuses into the kernel's lane-major transposes.
        spec.compute_cost_tbatch = hkd_tminor.compute_cost_tbatch
        spec.running_partials_tbatch = hkd_tminor.running_partials_tbatch
        spec.terminal_partials_tbatch = hkd_tminor.terminal_partials_tbatch
        # expected-cost change as direct GN contractions (kernel_jac's
        # linear rollout — no materialized partial arrays)
        spec.linear_dv_tbatch = hkd_tminor.linear_dv_tbatch
    if not swing_constraint:
        _DEFAULT = spec
    return spec
