"""Pallas TPU kernel for the multiple-shooting linear rollout, batch-in-lanes.

The linear rollout (solver/rollout.py::linear_rollout, parity
MultiPhaseDDP.cpp:20-50 + SinglePhase.cpp:145-178) propagates the search
direction dx forward through the linearized dynamics and accumulates the
expected cost change (dV_1, dV_2). Under `vmap(solve)` it is a forward
`lax.scan` of (B, 24, 24) matvecs — the same padded-minor layout problem the
backward sweep had. Same cure: one pallas_call with

  grid = (batch_blocks, T)     # T innermost, forward order
  layout: every tensor (T, 24, 24, B) / (T, 24, B) — batch in the 128 lanes
  carry:  dx (24, BB) in VMEM scratch across grid steps
  math:   24-term unrolled FMA column slabs for K@dx, A@dx, B@du and the
          lxx/luu quadratic forms

Per-lane masks select DYN / RESET / PAD transition math and add the
terminal-node contribution phix[last]·dx + dx·phixx[last]·dx at each lane's
own last active node. f32 only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BB = 128  # batch lanes per block


def _mv(M, v):
    """out[i,:] = sum_j M[i,j,:] * v[j,:]   (M (24,24,BB), v (24,BB))."""
    out = M[:, 0, :] * v[0][None, :]
    for j in range(1, 24):
        out = out + M[:, j, :] * v[j][None, :]
    return out


def _kernel(A_ref, B_ref, K_ref, dU_ref, d0_ref, dnext_ref,
            lx_ref, lu_ref, lxx_ref, luu_ref,
            phix_t_ref, phixx_t_ref, phix_n_ref, phixx_n_ref,
            isdyn_ref, isrst_ref, islastn_ref, eps_ref,
            dX_ref, dv1_ref, dv2_ref,
            dx_s, dv1_s, dv2_s):
    ti = pl.program_id(1)
    eps = eps_ref[0]             # (BB,) — per-lane step size

    @pl.when(ti == 0)
    def _():
        # dx_init = eps * Defect[0]; the last active node is always >= 1 so
        # the terminal contribution never lands on node 0
        dx_s[...] = eps[None, :] * d0_ref[0]
        dv1_s[...] = jnp.zeros_like(dv1_s)
        dv2_s[...] = jnp.zeros_like(dv2_s)

    is_dyn = isdyn_ref[0, 0]     # (BB,)
    is_rst = isrst_ref[0, 0]
    is_last_n = islastn_ref[0, 0]  # dest node t+1 is the lane's last node

    dx = dx_s[...]               # (24, BB)
    A = A_ref[0]
    Bm = B_ref[0]
    K = K_ref[0]

    du = eps[None, :] * dU_ref[0] + _mv(K, dx)
    dxd = _mv(A, dx) + _mv(Bm, du) + eps[None, :] * dnext_ref[0]
    dv1_d = (jnp.sum(lx_ref[0] * dx, axis=0)
             + jnp.sum(lu_ref[0] * du, axis=0))
    dv2_d = (jnp.sum(dx * _mv(lxx_ref[0], dx), axis=0)
             + jnp.sum(du * _mv(luu_ref[0], du), axis=0))

    # reset transition: phase-terminal cost contribution, then dx through Px
    dv1_r = jnp.sum(phix_t_ref[0] * dx, axis=0)
    dv2_r = jnp.sum(dx * _mv(phixx_t_ref[0], dx), axis=0)
    dxr = _mv(A, dx) + eps[None, :] * dnext_ref[0]

    is_pad = 1.0 - is_dyn - is_rst
    dx_next = (is_dyn[None, :] * dxd + is_rst[None, :] * dxr
               + is_pad[None, :] * dx)

    # terminal contribution at each lane's last active node (node t+1)
    dv1_t = jnp.sum(phix_n_ref[0] * dx_next, axis=0)
    dv2_t = jnp.sum(dx_next * _mv(phixx_n_ref[0], dx_next), axis=0)

    dv1_s[...] = (dv1_s[...]
                  + (is_dyn * dv1_d + is_rst * dv1_r
                     + is_last_n * dv1_t)[None, :])
    dv2_s[...] = (dv2_s[...]
                  + (is_dyn * dv2_d + is_rst * dv2_r
                     + is_last_n * dv2_t)[None, :])
    dx_s[...] = dx_next

    dX_ref[0] = dx_next
    dv1_ref[0] = dv1_s[0]
    dv2_ref[0] = dv2_s[0]


def linear_rollout_pallas(kind_b, A, B, K, dU, defect, lx, lu, lxx, luu,
                          phix, phixx, eps, last_node_b, interpret=False):
    """Explicit-batch linear rollout (batch leading; f32).

    kind_b (Bt, T) int32; A/B/K/lxx/luu (Bt, T, 24, 24); dU/lx/lu (Bt, T, 24);
    defect/phix (Bt, T+1, 24); phixx (Bt, T+1, 24, 24); eps scalar or (Bt,);
    last_node_b (Bt,) int32 (>= 1 for any non-degenerate problem).

    Returns (dX (Bt, T+1, 24), dv1 (Bt,), dv2 (Bt,)).
    """
    Bt, T = kind_b.shape
    Bp = ((Bt + BB - 1) // BB) * BB
    pad = Bp - Bt

    def bm(x):
        x = jnp.pad(x.astype(jnp.float32), [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        perm = tuple(range(1, x.ndim)) + (0,)
        return jnp.transpose(x, perm)

    A_m, B_m, K_m = bm(A), bm(B), bm(K)
    dU_m = bm(dU)
    d_m = bm(defect)
    lx_m, lu_m = bm(lx), bm(lu)
    lxx_m, luu_m = bm(lxx), bm(luu)
    phix_m, phixx_m = bm(phix), bm(phixx)

    from hkdmpc_tpu.solver.structs import DYN, RESET
    is_dyn = bm((kind_b == DYN).astype(jnp.float32))[:, None, :]
    is_rst = bm((kind_b == RESET).astype(jnp.float32))[:, None, :]
    node_idx = jnp.arange(T + 1)[None, :]
    is_last = bm((node_idx == last_node_b[:, None]).astype(jnp.float32))
    is_last_n = is_last[1:][:, None, :]     # (T,1,Bp) — dest node t+1

    eps_m = jnp.pad(
        jnp.broadcast_to(jnp.asarray(eps, jnp.float32), (Bt,)),
        (0, pad))[None, :]                  # (1, Bp)

    nb = Bp // BB
    fwd4 = lambda bi, ti: (ti, 0, 0, bi)
    fwd3 = lambda bi, ti: (ti, 0, bi)
    nxt3 = lambda bi, ti: (ti + 1, 0, bi)
    nxt4 = lambda bi, ti: (ti + 1, 0, 0, bi)
    first3 = lambda bi, ti: (0, 0, bi)
    scal = lambda bi, ti: (0, bi)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nb, T),
        in_specs=[
            pl.BlockSpec((1, 24, 24, BB), fwd4, memory_space=pltpu.VMEM),  # A
            pl.BlockSpec((1, 24, 24, BB), fwd4, memory_space=pltpu.VMEM),  # B
            pl.BlockSpec((1, 24, 24, BB), fwd4, memory_space=pltpu.VMEM),  # K
            pl.BlockSpec((1, 24, BB), fwd3, memory_space=pltpu.VMEM),      # dU
            pl.BlockSpec((1, 24, BB), first3, memory_space=pltpu.VMEM),    # defect[0]
            pl.BlockSpec((1, 24, BB), nxt3, memory_space=pltpu.VMEM),      # defect[t+1]
            pl.BlockSpec((1, 24, BB), fwd3, memory_space=pltpu.VMEM),      # lx
            pl.BlockSpec((1, 24, BB), fwd3, memory_space=pltpu.VMEM),      # lu
            pl.BlockSpec((1, 24, 24, BB), fwd4, memory_space=pltpu.VMEM),  # lxx
            pl.BlockSpec((1, 24, 24, BB), fwd4, memory_space=pltpu.VMEM),  # luu
            pl.BlockSpec((1, 24, BB), fwd3, memory_space=pltpu.VMEM),      # phix[t]
            pl.BlockSpec((1, 24, 24, BB), fwd4, memory_space=pltpu.VMEM),  # phixx[t]
            pl.BlockSpec((1, 24, BB), nxt3, memory_space=pltpu.VMEM),      # phix[t+1]
            pl.BlockSpec((1, 24, 24, BB), nxt4, memory_space=pltpu.VMEM),  # phixx[t+1]
            pl.BlockSpec((1, 1, BB), fwd3, memory_space=pltpu.VMEM),       # is_dyn
            pl.BlockSpec((1, 1, BB), fwd3, memory_space=pltpu.VMEM),       # is_rst
            pl.BlockSpec((1, 1, BB), fwd3, memory_space=pltpu.VMEM),       # is_last[t+1]
            pl.BlockSpec((1, BB), scal, memory_space=pltpu.VMEM),          # eps
        ],
        out_specs=[
            pl.BlockSpec((1, 24, BB), fwd3, memory_space=pltpu.VMEM),      # dX[t+1]
            pl.BlockSpec((1, BB), scal, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB), scal, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((24, BB), jnp.float32),
            pltpu.VMEM((1, BB), jnp.float32),
            pltpu.VMEM((1, BB), jnp.float32),
        ],
    )

    dX_m, dv1_p, dv2_p = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, 24, Bp), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp), jnp.float32),
        ],
        interpret=interpret,
    )(A_m, B_m, K_m, dU_m, d_m, d_m, lx_m, lu_m, lxx_m, luu_m,
      phix_m, phixx_m, phix_m, phixx_m, is_dyn, is_rst, is_last_n, eps_m)

    eps_b = jnp.broadcast_to(jnp.asarray(eps, jnp.float32), (Bt,))
    dx0 = eps_b[:, None] * defect[:, 0].astype(jnp.float32)
    dX = jnp.concatenate(
        [dx0[:, None, :], jnp.transpose(dX_m, (2, 0, 1))[:Bt]], axis=1)
    return dX, dv1_p[0, :Bt], dv2_p[0, :Bt]
