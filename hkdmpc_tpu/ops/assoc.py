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

All products go through ops/precise (VPU f32): the repo's no-MXU policy
(DESIGN.md §3c) applies here too — the log-depth composition squares the
condition of each link, so bf16 MXU rounding would compound worse than in
the sequential scan it replaces.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from hkdmpc_tpu.ops import precise
from hkdmpc_tpu.solver.structs import DYN, PAD, RESET, LQData


def affine_prefix(M, b, dx0):
    """dx_{t+1} = M_t dx_t + b_t for t = 0..T-1, all at once.

    M: (T, n, n), b: (T, n), dx0: (n,). Returns dX (T+1, n)."""
    def combine(e1, e2):
        M1, b1 = e1
        M2, b2 = e2
        return precise.mm(M2, M1), precise.mv(M2, b1) + b2

    # fold dx0 into the first element's offset so prefixes give dx directly
    b0 = b.at[0].add(precise.mv(M[0], dx0))
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

    BK = precise.mm(lq.B, state.K)
    M = jnp.where(is_dyn, lq.A + BK, jnp.where(is_rst, lq.A, eye))
    b_dyn = precise.mv(lq.B, eps * state.dU) + eps * defect[1:]
    b = jnp.where(is_dyn[:, :, 0], b_dyn,
                  jnp.where(is_rst[:, :, 0], eps * defect[1:], 0.0))

    dx0 = eps * defect[0]
    dX = affine_prefix(M, b, dx0)

    # expected cost change, vectorized (matches rollout.linear_rollout)
    du = eps * state.dU + precise.mv(state.K, dX[:-1])
    dyn_m = (prob.kind == DYN).astype(dtype)
    rst_m = (prob.kind == RESET).astype(dtype)
    dxs = dX[:-1]
    dv1 = jnp.sum(dyn_m * (jnp.sum(lq.lx * dxs, axis=-1)
                           + jnp.sum(lq.lu * du, axis=-1)))
    dv2 = jnp.sum(dyn_m * (precise.quad(dxs, lq.lxx, dxs)
                           + precise.quad(du, lq.luu, du)))
    if lq.lux is not None:
        dv2 = dv2 + jnp.sum(dyn_m * precise.quad(du, lq.lux, dxs))
    # terminal contributions at reset source nodes
    dv1 = dv1 + jnp.sum(rst_m * jnp.sum(lq.phix[:-1] * dxs, axis=-1))
    dv2 = dv2 + jnp.sum(rst_m * precise.quad(dxs, lq.phixx[:-1], dxs))
    # final node
    from hkdmpc_tpu.solver.rollout import last_active_node
    last = last_active_node(prob)
    dxl = dX[last]
    dv1 = dv1 + jnp.sum(lq.phix[last] * dxl)
    dv2 = dv2 + precise.quad(dxl, lq.phixx[last], dxl)
    return dX, dv1, dv2
