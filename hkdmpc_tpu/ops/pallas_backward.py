"""Pallas TPU kernel for the Riccati backward sweep, batch-in-lanes.

The backward sweep is the solver's only remaining sequential stage. Under
`vmap(solve)` it runs as a lax.scan whose per-step tensors are (B, 24, 24)
— 24-wide minors that tile-pad 5.3x. This kernel runs the whole sweep as ONE
pallas_call:

  grid = (batch_blocks, T)   # T iterated innermost, reversed via index maps
  layout: every tensor (T, 24, 24, B) — batch in the 128-lane dimension
  carry:  G (24, BB), H (24, 24, BB) live in VMEM scratch across grid steps
  math:   unrolled 24-term FMA slabs over (24, 24, BB) + the fused
          augmented-sweep Riccati step on a (49, 49, BB) bordered matrix
          with statically-unrolled pivots

Transition kinds (DYN / RESET / PAD) and the value-function seeding at each
scenario's last active node are per-lane masks — scenarios in a batch may
have different phase structures. f32 only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BB = 128  # batch lanes per block
NS = 49   # bordered system size (24 u + 24 x + 1)


def _xtc(X, Y, n=24):
    """out[i,k,:] = sum_j X[j,i,:] * Y[j,k,:]  (X^T @ Y per lane).

    X (24, n_i, BB), Y (24, n_k, BB): unrolled FMA over j."""
    out = X[0][:, None, :] * Y[0][None, :, :]
    for j in range(1, 24):
        out = out + X[j][:, None, :] * Y[j][None, :, :]
    return out


def _mmc(X, Y):
    """out[i,k,:] = sum_j X[i,j,:] * Y[j,k,:]  (X @ Y per lane)."""
    out = X[:, 0, :][:, None, :] * Y[0][None, :, :]
    for j in range(1, 24):
        out = out + X[:, j, :][:, None, :] * Y[j][None, :, :]
    return out


def _kernel(A_ref, B_ref, lxx_ref, luu_ref, lx_ref, lu_ref,
            dnext_ref, phix_t_ref, phixx_t_ref, phix_n_ref, phixx_n_ref,
            isdyn_ref, isrst_ref, islast_ref, reg_ref,
            K_ref, dU_ref, dv1_ref, dv2_ref, ok_ref,
            G_s, H_s, dv1_s, dv2_s, ok_s, W_s):
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _():
        G_s[...] = jnp.zeros_like(G_s)
        H_s[...] = jnp.zeros_like(H_s)
        dv1_s[...] = jnp.zeros_like(dv1_s)
        dv2_s[...] = jnp.zeros_like(dv2_s)
        ok_s[...] = jnp.ones_like(ok_s)

    is_dyn = isdyn_ref[0, 0]     # (BB,)
    is_rst = isrst_ref[0, 0]
    is_last = islast_ref[0, 0]
    reg = reg_ref[0]             # (BB,) per-lane regularization

    A = A_ref[0]                 # (24,24,BB): A[j,i,b] = jacobian row j col i
    Bm = B_ref[0]
    H = H_s[...] + is_last[None, None, :] * phixx_n_ref[0]
    G = G_s[...] + is_last[None, :] * phix_n_ref[0]

    dnext = dnext_ref[0]         # (24,BB)
    Gn = G + jnp.sum(H * dnext[None, :, :], axis=1)

    M1 = _mmc(H, A)              # H @ A
    AtHA = _xtc(A, M1)
    BtHA = _xtc(Bm, M1)
    M2 = _mmc(H, Bm)
    BtHB = _xtc(Bm, M2)
    AtGn = jnp.sum(A * Gn[:, None, :], axis=0)       # (24,BB)
    BtGn = jnp.sum(Bm * Gn[:, None, :], axis=0)

    ii = jax.lax.broadcasted_iota(jnp.int32, (24, 24), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (24, 24), 1)
    eye24 = (ii == jj).astype(jnp.float32)[:, :, None]

    Qx = lx_ref[0] + AtGn
    Qu = lu_ref[0] + BtGn
    Qxx = lxx_ref[0] + AtHA + reg[None, None, :] * eye24
    Qxx = 0.5 * (Qxx + Qxx.transpose(1, 0, 2))
    Quu = luu_ref[0] + BtHB + reg[None, None, :] * eye24
    Qux = BtHA

    # ---- bordered 49x49 sweep (first 24 pivots) per lane ----------------
    W_s[...] = jnp.zeros_like(W_s)
    W_s[0:24, 0:24, :] = Quu
    W_s[0:24, 24:48, :] = Qux
    W_s[24:48, 0:24, :] = Qux.transpose(1, 0, 2)
    W_s[24:48, 24:48, :] = Qxx
    W_s[0:24, 48, :] = Qu
    W_s[48, 0:24, :] = Qu
    W_s[24:48, 48, :] = Qx
    W_s[48, 24:48, :] = Qx

    ok = jnp.ones((BB,), jnp.float32)
    for k in range(24):          # statically unrolled pivots
        W = W_s[...]
        row = W[k]               # (49,BB) — static index
        col = W[:, k]
        d = row[k]               # (BB,)
        ok = ok * (d > 1e-9).astype(jnp.float32)
        d_safe = jnp.where(jnp.abs(d) > 1e-30, d, 1.0)
        ek = (jax.lax.broadcasted_iota(jnp.int32, (NS, 1), 0) == k
              ).astype(jnp.float32)
        cme = col - ek           # (49,BB)
        rme = (row - ek) / d_safe[None, :]
        W_s[...] = (W - cme[:, None, :] * rme[None, :, :]
                    - 2.0 * (ek[:, None, :] * ek[None, :, :]))

    W = W_s[...]
    Kd = -W[0:24, 24:48, :]
    dUd = -W[0:24, 48, :]
    Hd = W[24:48, 24:48, :]
    Hd = 0.5 * (Hd + Hd.transpose(1, 0, 2))
    Gd = W[24:48, 48, :]
    dv = -W[48, 48, :]

    # ---- reset path (A holds Px) ----------------------------------------
    Gr = phix_t_ref[0] + AtGn
    Hr = phixx_t_ref[0] + AtHA

    is_pad = 1.0 - is_dyn - is_rst
    G_s[...] = (is_dyn[None, :] * Gd + is_rst[None, :] * Gr
                + is_pad[None, :] * G)
    H_s[...] = (is_dyn[None, None, :] * Hd + is_rst[None, None, :] * Hr
                + is_pad[None, None, :] * H)

    K_ref[0] = is_dyn[None, None, :] * Kd
    dU_ref[0] = is_dyn[None, :] * dUd
    dv1_s[...] = dv1_s[...] - is_dyn[None, :] * dv[None, :]
    dv2_s[...] = dv2_s[...] + is_dyn[None, :] * dv[None, :]
    ok_s[...] = ok_s[...] * jnp.where(is_dyn[None, :] > 0, ok[None, :], 1.0)

    dv1_ref[0] = dv1_s[0]
    dv2_ref[0] = dv2_s[0]
    ok_ref[0] = ok_s[0]


def backward_sweep_pallas(kind_b, A, B, lxx, luu, lx, lu, defect,
                          phix, phixx, reg, last_node_b, interpret=False):
    """Explicit-batch backward sweep (batch leading; f32).

    kind_b (Bt, T) int32; A/B/lxx/luu (Bt, T, 24, 24); lx/lu (Bt, T, 24);
    defect/phix (Bt, T+1, 24); phixx (Bt, T+1, 24, 24); reg scalar or (Bt,)
    per-scenario (the vmapped regularization-retry loop batches it);
    last_node_b (Bt,) int32.

    Returns (dU (Bt,T,24), K (Bt,T,24,24), dv1 (Bt,), dv2 (Bt,), ok (Bt,) bool).
    """
    Bt, T = kind_b.shape
    Bp = ((Bt + BB - 1) // BB) * BB
    pad = Bp - Bt

    def bm(x):
        x = jnp.pad(x.astype(jnp.float32), [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        perm = tuple(range(1, x.ndim)) + (0,)
        return jnp.transpose(x, perm)

    A_m, B_m = bm(A), bm(B)
    lxx_m, luu_m = bm(lxx), bm(luu)
    lx_m, lu_m = bm(lx), bm(lu)
    d_m = bm(defect)
    phix_m = bm(phix)
    phixx_m = bm(phixx)

    from hkdmpc_tpu.solver.structs import DYN, RESET
    is_dyn = bm((kind_b == DYN).astype(jnp.float32))[:, None, :]
    is_rst = bm((kind_b == RESET).astype(jnp.float32))[:, None, :]
    node_idx = jnp.arange(T + 1)[None, :]
    is_last = bm((node_idx == last_node_b[:, None]).astype(jnp.float32))
    is_last_t = is_last[1:][:, None, :]

    reg_m = jnp.pad(
        jnp.broadcast_to(jnp.asarray(reg, jnp.float32), (Bt,)),
        (0, pad))[None, :]                        # (1, Bp) per-lane reg

    nb = Bp // BB
    rev4 = lambda bi, ti: (T - 1 - ti, 0, 0, bi)
    rev3 = lambda bi, ti: (T - 1 - ti, 0, bi)
    nxt3 = lambda bi, ti: (T - ti, 0, bi)
    nxt4 = lambda bi, ti: (T - ti, 0, 0, bi)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nb, T),
        in_specs=[
            pl.BlockSpec((1, 24, 24, BB), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 24, 24, BB), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 24, 24, BB), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 24, 24, BB), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 24, BB), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 24, BB), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 24, BB), nxt3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 24, BB), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 24, 24, BB), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 24, BB), nxt3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 24, 24, BB), nxt4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BB), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BB), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BB), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB), lambda bi, ti: (0, bi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 24, 24, BB), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 24, BB), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB), lambda bi, ti: (0, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB), lambda bi, ti: (0, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB), lambda bi, ti: (0, bi),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((24, BB), jnp.float32),
            pltpu.VMEM((24, 24, BB), jnp.float32),
            pltpu.VMEM((1, BB), jnp.float32),
            pltpu.VMEM((1, BB), jnp.float32),
            pltpu.VMEM((1, BB), jnp.float32),
            pltpu.VMEM((NS, NS, BB), jnp.float32),
        ],
    )

    K_m, dU_m, dv1_p, dv2_p, ok_p = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, 24, 24, Bp), jnp.float32),
            jax.ShapeDtypeStruct((T, 24, Bp), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp), jnp.float32),
        ],
        interpret=interpret,
    )(A_m, B_m, lxx_m, luu_m, lx_m, lu_m, d_m, phix_m, phixx_m,
      phix_m, phixx_m, is_dyn, is_rst, is_last_t, reg_m)

    K = jnp.transpose(K_m, (3, 0, 1, 2))[:Bt]
    dU = jnp.transpose(dU_m, (2, 0, 1))[:Bt]
    return dU, K, dv1_p[0, :Bt], dv2_p[0, :Bt], ok_p[0, :Bt] > 0.5
