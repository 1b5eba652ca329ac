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
from hkdmpc_tpu.models import hkd_weights as W

MU_FRICTION = W.MU_FRICTION  # reference: HKDConstraints.h:17


# --------------------------------------------------------------------------
# Tracking cost (reference: HKDCost.h:7-38); weights from models/hkd_weights
# --------------------------------------------------------------------------

def q_diag(contact, dtype):
    """Running-state weight diagonal; qJ rows active only for swing legs."""
    q_body = jnp.array(W.Q_BODY, dtype=dtype)
    q_leg = W.Q_SWING_LEG * (1.0 - contact)           # (4,)
    q_qJ = jnp.repeat(q_leg, 3)
    return jnp.concatenate([q_body, q_qJ])


_QF_SCALE = np.array(list(W.QF_SCALE_BODY) + [W.QF_SCALE_LEG] * 12)


def qf_diag(contact, dtype):
    return (W.QF_MULT * jnp.asarray(_QF_SCALE, dtype=dtype)
            * q_diag(contact, dtype))


def r_diag(dtype):
    return jnp.concatenate([W.R_GRF * jnp.ones(12, dtype),
                            W.R_QJD * jnp.ones(12, dtype)])


# --------------------------------------------------------------------------
# Foot placement regularization (reference: HKDCost.h:41-99, HKDCost.cpp)
# --------------------------------------------------------------------------

def _footreg_terms(x, contact, xr, foot_r, dtype):
    """Returns (d_prel (12,), qfoot_diag (12,), dprel_dx (12,24))."""
    qfoot = W.FOOTREG_MULT * jnp.stack(
        [W.FOOTREG_AXIS[0] * contact, W.FOOTREG_AXIS[1] * contact,
         jnp.zeros_like(contact)], axis=1).reshape(12)
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
    """(g (20,), row_mask (20,)). Rows of swing legs are masked.
    VPU-exact matvec: cone rows feed the ReB barrier cost, so bf16 MXU
    rounding here would bias the objective (ops/precise.py)."""
    dtype = dtype or u.dtype
    from hkdmpc_tpu.ops import precise
    g = precise.mv(jnp.asarray(_A_GRF, dtype=dtype), u)
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
