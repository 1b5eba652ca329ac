"""Costs and constraints for the HKD trajectory-optimization problem.

Parity targets:
- HKDTrackingCost / HKDFootPlaceReg        (HKDMPC/HKD-TrajOpt/HKDCost.{h,cpp})
- GRFConstraint / TouchDownConstraint      (HKDMPC/HKD-TrajOpt/HKDConstraints.cpp)
- Relaxed-barrier + AL machinery           (HSDDPSolver/header/ConstraintsBase.h)

Everything is a pure per-step function of (x, u, contact, reference, params),
mask-driven, with partials hand-derived exactly like the reference's
Gauss-Newton forms so constrained solves match step-for-step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hkdmpc_tpu.models import hkd

MU_FRICTION = 0.7  # reference: HKDConstraints.h:17


# --------------------------------------------------------------------------
# Tracking cost (reference: HKDCost.h:7-38)
# --------------------------------------------------------------------------

def q_diag(contact, dtype):
    """Running-state weight diagonal; qJ rows active only for swing legs."""
    q_body = jnp.array([1, 4, 5, 1, 1, 30, .2, .2, .2, 4, 1, .5], dtype=dtype)
    q_leg = 0.2 * (1.0 - contact)                     # (4,)
    q_qJ = jnp.repeat(q_leg, 3)
    return jnp.concatenate([q_body, q_qJ])


_QF_SCALE = np.array([1, 1, 2, 1, 1, 20, .3, .3, .3, 1, 3, 1] + [.01] * 12)


def qf_diag(contact, dtype):
    return 20.0 * jnp.asarray(_QF_SCALE, dtype=dtype) * q_diag(contact, dtype)


def r_diag(dtype):
    return jnp.concatenate([0.2 * jnp.ones(12, dtype), 0.1 * jnp.ones(12, dtype)])


# --------------------------------------------------------------------------
# Foot placement regularization (reference: HKDCost.h:41-99, HKDCost.cpp)
# --------------------------------------------------------------------------

def _footreg_terms(x, contact, xr, foot_r, dtype):
    """Returns (d_prel (12,), qfoot_diag (12,), dprel_dx (12,24))."""
    qfoot = 20.0 * jnp.stack(
        [3.0 * contact, contact, jnp.zeros_like(contact)], axis=1).reshape(12)
    pcom = x[3:6]
    pcom_r = xr[3:6]
    prel = x[12:24] - jnp.tile(pcom, 4)
    prel_r = foot_r - jnp.tile(pcom_r, 4)
    d_prel = prel - prel_r
    # dprel_dx: d(qdummy - tile(pcom))/dx, rows gated by contact
    c12 = jnp.repeat(contact, 3)                       # (12,)
    dprel_dx = jnp.zeros((12, 24), dtype)
    dprel_dx = dprel_dx.at[:, 12:24].set(jnp.diag(c12))
    dprel_dx = dprel_dx.at[:, 3:6].set(
        -jnp.tile(jnp.eye(3, dtype=dtype), (4, 1)) * c12[:, None])
    return d_prel, qfoot, dprel_dx


# --------------------------------------------------------------------------
# Running cost: value and partials per DYN transition
# --------------------------------------------------------------------------

def running_cost(x, u, contact, xr, ur, foot_r, dt):
    """l = dt * [0.5 dx'Q dx + 0.5 du'R du + 0.5 d_prel'Qfoot d_prel]."""
    dtype = x.dtype
    dx = x - xr
    du = u - ur
    l = 0.5 * jnp.sum(q_diag(contact, dtype) * dx * dx)
    l += 0.5 * jnp.sum(r_diag(dtype) * du * du)
    d_prel, qfoot, _ = _footreg_terms(x, contact, xr, foot_r, dtype)
    l += 0.5 * jnp.sum(qfoot * d_prel * d_prel)
    return dt * l


def running_cost_partials(x, u, contact, xr, ur, foot_r, dt):
    """(lx, lu, lxx, luu, lux) of the tracking + foot-reg running cost."""
    dtype = x.dtype
    dx = x - xr
    du = u - ur
    Q = q_diag(contact, dtype)
    R = r_diag(dtype)
    d_prel, qfoot, dprel_dx = _footreg_terms(x, contact, xr, foot_r, dtype)
    lx = dt * (Q * dx + dprel_dx.T @ (qfoot * d_prel))
    lu = dt * (R * du)
    lxx = dt * (jnp.diag(Q) + dprel_dx.T @ (qfoot[:, None] * dprel_dx))
    luu = dt * jnp.diag(R)
    lux = jnp.zeros((24, 24), dtype)
    return lx, lu, lxx, luu, lux


def terminal_cost(x, term_contact, xr, foot_r):
    """Phi = 0.5 dx'Qf dx + 10 d_prel'Qfoot d_prel (note: 10, not 5 — the
    reference's foot-reg terminal cost omits the 1/2; HKDCost.cpp:40-50)."""
    dtype = x.dtype
    dx = x - xr
    phi = 0.5 * jnp.sum(qf_diag(term_contact, dtype) * dx * dx)
    d_prel, qfoot, _ = _footreg_terms(x, term_contact, xr, foot_r, dtype)
    phi += 10.0 * jnp.sum(qfoot * d_prel * d_prel)
    return phi


def terminal_cost_partials(x, term_contact, xr, foot_r):
    dtype = x.dtype
    dx = x - xr
    Qf = qf_diag(term_contact, dtype)
    d_prel, qfoot, dprel_dx = _footreg_terms(x, term_contact, xr, foot_r, dtype)
    phix = Qf * dx + 20.0 * dprel_dx.T @ (qfoot * d_prel)
    phixx = jnp.diag(Qf) + 20.0 * dprel_dx.T @ (qfoot[:, None] * dprel_dx)
    return phix, phixx


# --------------------------------------------------------------------------
# GRF friction-cone path constraint (reference: HKDConstraints.cpp:6-66)
#   rows per stance leg: [fz, -fx+mu fz, fx+mu fz, -fy+mu fz, fy+mu fz] >= 0
# --------------------------------------------------------------------------

_A_LEG = np.array([
    [0, 0, 1],
    [-1, 0, MU_FRICTION],
    [1, 0, MU_FRICTION],
    [0, -1, MU_FRICTION],
    [0, 1, MU_FRICTION],
])
# (20, 24): block-diagonal over legs on the GRF half of u
_A_GRF = np.zeros((20, 24))
for _leg in range(4):
    _A_GRF[5 * _leg: 5 * _leg + 5, 3 * _leg: 3 * _leg + 3] = _A_LEG


def grf_constraints(u, contact, dtype=None):
    """(g (20,), row_mask (20,)). Rows of swing legs are masked."""
    dtype = dtype or u.dtype
    g = jnp.asarray(_A_GRF, dtype=dtype) @ u
    row_mask = jnp.repeat(contact, 5)
    return g, row_mask


def grf_constraint_jac(dtype):
    """gu rows (20, 24) — constant."""
    return jnp.asarray(_A_GRF, dtype=dtype)


# --------------------------------------------------------------------------
# Relaxed barrier (reference: ConstraintsBase.h:204-263)
# --------------------------------------------------------------------------

def reb_value(g, delta, eps):
    """eps * B_delta(g), elementwise. B(g) = -log g for g > delta, quadratic
    extension below."""
    g_safe = jnp.maximum(g, 1e-30)  # guard log of masked/negative rows
    quad = 0.5 * (((g - 2 * delta) / delta) ** 2 - 1.0) - jnp.log(delta)
    return eps * jnp.where(g > delta, -jnp.log(g_safe), quad)


def reb_derivs(g, delta, eps):
    """(eps*B', eps*B'') elementwise."""
    g_safe = jnp.where(g > delta, g, 1.0)
    d1 = jnp.where(g > delta, -1.0 / g_safe, (g - 2 * delta) / (delta * delta))
    d2 = jnp.where(g > delta, 1.0 / (g_safe * g_safe), 1.0 / (delta * delta))
    return eps * d1, eps * d2


def grf_reb_cost(u, contact, delta, eps, dt):
    """dt * sum_i eps_i B(g_i) over active rows (added to running cost;
    SinglePhase.cpp:370-379)."""
    g, row_mask = grf_constraints(u, contact)
    return dt * jnp.sum(row_mask * reb_value(g, delta, eps))


def grf_reb_partials(u, contact, delta, eps, dt):
    """(lu_add (24,), luu_add (24,24)) — Gauss-Newton, as the reference
    (ConstraintsBase.h:224-263; gu constant so guu = 0)."""
    g, row_mask = grf_constraints(u, contact)
    d1, d2 = reb_derivs(g, delta, eps)
    gu = grf_constraint_jac(u.dtype)                   # (20,24)
    lu_add = dt * gu.T @ (row_mask * d1)
    luu_add = dt * gu.T @ ((row_mask * d2)[:, None] * gu)
    return lu_add, luu_add


# --------------------------------------------------------------------------
# Touchdown terminal constraint + AL (reference: HKDConstraints.cpp:75-171,
# ConstraintsBase.h:374-399)
# --------------------------------------------------------------------------

def touchdown_violations(x, td_mask, ground_height=0.0):
    """h (4,) = foot_z - ground per touchdown leg (masked)."""
    pf = hkd.foot_positions(x[3:6], x[0:3], x[12:24])
    return td_mask * (pf[:, 2] - ground_height)


def al_cost(h, lam, sigma, td_mask):
    """sum 0.5 sigma h^2 + lambda h over touchdown legs."""
    return jnp.sum(td_mask * (0.5 * sigma * h * h + lam * h))


def al_partials(x, h, lam, sigma, td_mask):
    """(phix_add (24,), phixx_add (24,24)). Hessian uses the reference's
    exact (sigma*(1+h)+lambda) hx hx' form (ConstraintsBase.h:393-397)."""
    dtype = x.dtype
    phix = jnp.zeros(24, dtype)
    phixx = jnp.zeros((24, 24), dtype)
    for leg in range(4):
        hx = hkd.foot_height_jacobian(x, leg)
        w1 = td_mask[leg] * (sigma[leg] * h[leg] + lam[leg])
        w2 = td_mask[leg] * (sigma[leg] * (1.0 + h[leg]) + lam[leg])
        phix = phix + w1 * hx
        phixx = phixx + w2 * jnp.outer(hx, hx)
    return phix, phixx
