"""Parallel-in-time affine recursions via associative scan.

The multiple-shooting linear rollout is the affine chain
dx_{t+1} = M_t dx_t + b_t (solver/rollout.linear_rollout — a 75-step
sequential scan). Affine maps compose associatively:
(M2, b2) o (M1, b1) = (M2 M1, M2 b1 + b2), so the whole prefix is a
`lax.associative_scan` of depth ~log2(T) — the horizon-parallel analog of
the sequence parallelism SURVEY §5 calls for. The expected-cost-change
accumulations follow vectorized once dX is known.

This trades ~T/log T more FLOPs (matmul-matmul instead of matmul-vector)
for parallel depth — a win whenever the sequential scan is latency-bound.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from hkdmpc_tpu.solver.structs import DYN, PAD, RESET, LQData


def affine_prefix(M, b, dx0):
    """dx_{t+1} = M_t dx_t + b_t for t = 0..T-1, all at once.

    M: (T, n, n), b: (T, n), dx0: (n,). Returns dX (T+1, n)."""
    def combine(e1, e2):
        M1, b1 = e1
        M2, b2 = e2
        return M2 @ M1, jnp.einsum("...ij,...j->...i", M2, b1) + b2

    # fold dx0 into the first element's offset so prefixes give dx directly
    b0 = b.at[0].add(M[0] @ dx0)
    Mp, bp = lax.associative_scan(combine, (M, b0))
    # prefix t gives dx_{t+1} = (prod M) dx0'... with dx0 folded in, bp IS dx
    return jnp.concatenate([dx0[None], bp], axis=0)


def linear_rollout_assoc(prob, state, lq: LQData, defect, eps):
    """Associative-scan version of solver.rollout.linear_rollout — same
    outputs (dX, dV_1, dV_2) up to float reassociation."""
    dtype = prob.xr.dtype
    eps = jnp.asarray(eps, dtype)
    T = prob.T

    is_dyn = (prob.kind == DYN)[:, None, None]
    is_rst = (prob.kind == RESET)[:, None, None]
    eye = jnp.broadcast_to(jnp.eye(24, dtype=dtype), (T, 24, 24))

    BK = jnp.einsum("tij,tjk->tik", lq.B, state.K)
    M = jnp.where(is_dyn, lq.A + BK, jnp.where(is_rst, lq.A, eye))
    b_dyn = (jnp.einsum("tij,tj->ti", lq.B, eps * state.dU)
             + eps * defect[1:])
    b = jnp.where(is_dyn[:, :, 0], b_dyn,
                  jnp.where(is_rst[:, :, 0], eps * defect[1:], 0.0))

    dx0 = eps * defect[0]
    dX = affine_prefix(M, b, dx0)

    # expected cost change, vectorized (matches rollout.linear_rollout)
    du = eps * state.dU + jnp.einsum("tij,tj->ti", state.K, dX[:-1])
    dyn_m = (prob.kind == DYN).astype(dtype)
    rst_m = (prob.kind == RESET).astype(dtype)
    dxs = dX[:-1]
    dv1 = jnp.sum(dyn_m * (jnp.einsum("ti,ti->t", lq.lx, dxs)
                           + jnp.einsum("ti,ti->t", lq.lu, du)))
    dv2 = jnp.sum(dyn_m * (
        jnp.einsum("ti,tij,tj->t", dxs, lq.lxx, dxs)
        + jnp.einsum("ti,tij,tj->t", du, lq.luu, du)))
    if lq.lux is not None:
        dv2 = dv2 + jnp.sum(dyn_m * jnp.einsum("ti,tij,tj->t", du, lq.lux,
                                               dxs))
    # terminal contributions at reset source nodes
    dv1 = dv1 + jnp.sum(rst_m * jnp.einsum("ti,ti->t", lq.phix[:-1], dxs))
    dv2 = dv2 + jnp.sum(rst_m * jnp.einsum("ti,tij,tj->t", dxs,
                                           lq.phixx[:-1], dxs))
    # final node
    from hkdmpc_tpu.solver.rollout import last_active_node
    last = last_active_node(prob)
    dxl = dX[last]
    dv1 = dv1 + lq.phix[last] @ dxl
    dv2 = dv2 + dxl @ lq.phixx[last] @ dxl
    return dX, dv1, dv2
