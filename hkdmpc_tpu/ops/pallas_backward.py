"""Pallas TPU kernel for the Riccati backward sweep, batch-in-lanes.

The backward sweep is the solver's only remaining sequential stage. Under
`vmap(solve)` it runs as a lax.scan whose per-step tensors are (B, 24, 24)
— 24-wide minors that tile-pad 5.3x. This kernel runs the whole sweep as ONE
pallas_call:

  grid = (batch_blocks, T)   # T iterated innermost, reversed via index maps
  layout: every tensor (T, 24, 24, B) — batch in the 128-lane dimension
  carry:  G (24, BB), H (24, 24, BB) live in VMEM scratch across grid steps
  math:   unrolled 24-term FMA slabs over (24, 24, BB) + the split-sweep
          Riccati step: statically-unrolled pivots on a (24, 49, BB)
          tableau [Quu | Qux | Qu], Schur complement via FMA slabs

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

# batch lanes per block: 256 blows the 16 MB VMEM scoped limit (24.03 MB
# needed for the double-buffered input slabs at (…, 256)); 128 fits
BB = 128
NS = 49   # split-sweep tableau columns (24 Quu | 24 Qux | 1 Qu)

# diagnostic stage-ablation switch (see exp_kernel_parts.py): "" = off
import os as _os_diag

DIAG = _os_diag.environ.get("HKD_KERNEL_DIAG", "")


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

    # ---- split sweep: pivot the (24, 49) tableau [Quu | Qux | Qu] --------
    # Restricting the rank-1 updates to the top 24 rows reproduces the full
    # bordered sweep's first block-row bit-exactly (the update of rows 0..23
    # only reads those rows), so K/dU and the PSD pivots are identical; the
    # Schur complement (H', G', dv) is then formed with independent FMA
    # slabs instead of 25 more swept rows — half the serially-dependent work
    # per Riccati step and no 49->56 sublane padding on the pivot tableau.
    # Measured 17% end-to-end vs the 49x49 bordered sweep it replaced
    # (81.4 vs 97.6 ms, batch 1024 v5e; DESIGN.md §3b).
    W_s[...] = jnp.zeros_like(W_s)
    W_s[:, 0:24, :] = Quu
    W_s[:, 24:48, :] = Qux
    W_s[:, 48, :] = Qu

    ok = jnp.ones((BB,), jnp.float32)
    e24_all = jax.lax.broadcasted_iota(jnp.int32, (24, 1), 0)
    e49_all = jax.lax.broadcasted_iota(jnp.int32, (NS, 1), 0)
    for k in range(24):          # statically unrolled pivots
        W = W_s[...]
        row = W[k]               # (49,BB) — static index
        col = W[:, k]            # (24,BB)
        d = row[k]               # (BB,)
        ok = ok * (d > 1e-9).astype(jnp.float32)
        d_safe = jnp.where(jnp.abs(d) > 1e-30, d, 1.0)
        e24 = (e24_all == k).astype(jnp.float32)
        e49 = (e49_all == k).astype(jnp.float32)
        cme = col - e24          # (24,BB)
        rme = (row - e49) / d_safe[None, :]
        W_s[...] = (W - cme[:, None, :] * rme[None, :, :]
                    - 2.0 * (e24[:, None, :] * e49[None, :, :]))

    W = W_s[...]
    S = W[:, 24:48, :]           # Quu^-1 Qux
    sv = W[:, 48, :]             # Quu^-1 Qu
    Kd = -S
    dUd = -sv
    Hd = Qxx - _xtc(Qux, S)      # Qxx - Qux' Quu^-1 Qux
    Hd = 0.5 * (Hd + Hd.transpose(1, 0, 2))
    Gd = Qx - jnp.sum(Qux * sv[:, None, :], axis=0)
    dv = jnp.sum(Qu * sv, axis=0)

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
            pltpu.VMEM((24, NS, BB), jnp.float32),
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


# ---------------------------------------------------------------------------
# HKD-specific kernel: jacobians computed IN-KERNEL from (X, U) with
# sparsity-aware products.
#
# A = I + dt*DA has only ~70 nonzero DA entries (B ~60, the reset-map
# deviation S ~70) out of 576, and the entry formulas are shared with the
# XLA builder (ops/jac_tminor.dyn_jac_entries / reset_jac_entries — single
# definition site). Exploiting that sparsity turns the five dense 24-term
# FMA slab products (~8.6k vector-register ops per grid step) into ~1k
# entry-scaled row/column FMAs, and removes the (B, T, 24, 24) A/B
# materialization entirely: the kernel reads the (24,)-wide X/U slabs
# instead of two 24x24 slabs per step. lq then skips building A/B
# (skip_ab), and the linear rollout uses the jvp path — nothing in the
# batched solve touches a dense jacobian tensor anymore.
# ---------------------------------------------------------------------------

def _sparse_post(M, ed):
    """M @ D for sparse D = {(i, j): d}: out[:, j, :] = sum_i M[:, i, :]*d."""
    cols = [None] * 24
    for (i, j), d in ed.items():
        v = M[:, i, :] * d[None, :]
        cols[j] = v if cols[j] is None else cols[j] + v
    zero = jnp.zeros_like(M[:, 0, :])
    return jnp.stack([cv if cv is not None else zero for cv in cols], axis=1)


def _sparse_pre(M, ed):
    """D^T @ M: out[i, ...] = sum_j D[j, i] * M[j, ...]."""
    rows = [None] * 24
    for (j, i), d in ed.items():
        v = d[None, :] * M[j]
        rows[i] = v if rows[i] is None else rows[i] + v
    zero = jnp.zeros_like(M[0])
    return jnp.stack([rv if rv is not None else zero for rv in rows], axis=0)


def _sparse_pre_vec(g, ed):
    """D^T @ g for g (24, BB): out[i] = sum_j D[j, i] * g[j]."""
    rows = [None] * 24
    for (j, i), d in ed.items():
        v = d * g[j]
        rows[i] = v if rows[i] is None else rows[i] + v
    zero = jnp.zeros_like(g[0])
    return jnp.stack([rv if rv is not None else zero for rv in rows], axis=0)


def _entries_add(M, entries):
    """M (24, 24, BB) + sparse entries {(i, j): (BB,)} via row accumulation."""
    rows = [M[i] for i in range(24)]
    for (i, j), v in entries.items():
        e = (jax.lax.broadcasted_iota(jnp.int32, (24, 1), 0) == j
             ).astype(jnp.float32)
        rows[i] = rows[i] + e * v
    return jnp.stack(rows, axis=0)


def _vec_from_entries(entries, like):
    """(24, BB) vector from sparse entries {i: (BB,)}."""
    zero = jnp.zeros_like(like)
    return jnp.stack([entries.get(i, zero) for i in range(24)], axis=0)


def _mat_from_entries(entries, like):
    """(24, 24, BB) dense matrix from sparse entries {(i, j): (BB,)}."""
    zero = jnp.zeros_like(like)
    return jnp.stack(
        [jnp.stack([entries.get((i, j), zero) for j in range(24)], axis=0)
         for i in range(24)], axis=0)


def _phi_dense(xcols, xr_cols, fr_cols, tctx, z, one, rot=None):
    """Dense (phix (24, BB), phixx (24, 24, BB)) terminal partials at one
    node from its packed terminal context slab tctx (17, BB):
    rows 0:4 term_contact, 4:8 td_mask, 8:12 al_sigma, 12:16 al_lambda,
    16 term_mask. Entry formulas shared with the XLA builder
    (ops/hkd_tminor.terminal_partial_entries — single definition site)."""
    from hkdmpc_tpu.ops.hkd_tminor import terminal_partial_entries

    tc = [tctx[l] for l in range(4)]
    td = [tctx[4 + l] for l in range(4)]
    sig = [tctx[8 + l] for l in range(4)]
    lam = [tctx[12 + l] for l in range(4)]
    tm = tctx[16]
    phix_e, phixx_e = terminal_partial_entries(
        xcols, xr_cols, fr_cols, tc, tm, td, sig, lam, one, rot=rot)
    return _vec_from_entries(phix_e, z), _mat_from_entries(phixx_e, z)


def _kernel_hkd(X_ref, U_ref, c_ref, cn_ref, xr_ref, ur_ref, fr_ref,
                tctx_ref, rbd_ref, rbe_ref, dnext_ref,
                XT_ref, xrT_ref, frT_ref, tctxT_ref,
                isdyn_ref, isrst_ref, islast_ref, islastc_ref,
                reg_ref, dt_ref,
                K_ref, dU_ref, dv1_ref, dv2_ref, ok_ref,
                G_s, H_s, dv1_s, dv2_s, ok_s, W_s, Px_s, Pxx_s,
                spb=1):
    """spb = time steps fused per grid invocation: the per-step input
    slabs carry a leading (spb,) block dim and the body below runs spb
    times (later transition first). spb>1 halves/quarters the number of
    grid steps — the structural lever against the serial wall (fewer
    grid-loop boundaries, fatter DMA slabs); the Riccati dependency chain
    itself is unchanged."""
    from hkdmpc_tpu.ops.hkd_tminor import _MU, running_partial_entries
    from hkdmpc_tpu.ops.jac_tminor import dyn_jac_entries, reset_jac_entries
    from hkdmpc_tpu.solver.costs import reb_derivs

    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _():
        G_s[...] = jnp.zeros_like(G_s)
        H_s[...] = jnp.zeros_like(H_s)
        dv1_s[...] = jnp.zeros_like(dv1_s)
        dv2_s[...] = jnp.zeros_like(dv2_s)
        ok_s[...] = jnp.ones_like(ok_s)
        # terminal partials at node T (the only node no grid step owns as a
        # source): seeds the phi stash that the is_last seeding below reads.
        xT = XT_ref[0]
        xTc = [xT[i] for i in range(24)]
        zT = jnp.zeros_like(xTc[0])
        oT = jnp.ones_like(xTc[0])
        pxT, pxxT = _phi_dense(
            xTc, [xrT_ref[0][i] for i in range(24)],
            [frT_ref[0][i] for i in range(12)], tctxT_ref[0], zT, oT)
        Px_s[...] = pxT
        Pxx_s[...] = pxxT

    reg = reg_ref[0]
    dtv = dt_ref[0]

    for sj in range(spb - 1, -1, -1):   # later transition first
        _kernel_hkd_substep(
            sj, X_ref, U_ref, c_ref, cn_ref, xr_ref, ur_ref, fr_ref,
            tctx_ref, rbd_ref, rbe_ref, dnext_ref, isdyn_ref, isrst_ref,
            islast_ref, islastc_ref, reg, dtv,
            K_ref, dU_ref, G_s, H_s, dv1_s, dv2_s, ok_s, W_s, Px_s, Pxx_s,
            _MU, running_partial_entries, dyn_jac_entries,
            reset_jac_entries, reb_derivs)

    dv1_ref[0] = dv1_s[0]
    dv2_ref[0] = dv2_s[0]
    ok_ref[0] = ok_s[0]


def _kernel_hkd_substep(sj, X_ref, U_ref, c_ref, cn_ref, xr_ref, ur_ref,
                        fr_ref, tctx_ref, rbd_ref, rbe_ref, dnext_ref,
                        isdyn_ref, isrst_ref, islast_ref, islastc_ref,
                        reg, dtv,
                        K_ref, dU_ref, G_s, H_s, dv1_s, dv2_s, ok_s, W_s,
                        Px_s, Pxx_s,
                        _MU, running_partial_entries, dyn_jac_entries,
                        reset_jac_entries, reb_derivs):
    """One backward transition on the slab row sj of the invocation's
    per-step blocks (sj is a static python index)."""
    is_dyn = isdyn_ref[sj, 0]    # (BB,)
    is_rst = isrst_ref[sj, 0]
    is_last = islast_ref[sj, 0]      # is_last[t+1]: this step's seed mask
    is_last_c = islastc_ref[sj, 0]   # is_last[t]: next step needs phi(t)

    # per-kind block predicates: a grid step only pays for the transition
    # kinds actually present in its 128 lanes. Uniform-schedule fleets
    # (replicated gait, perturbed x0 — the bench workload) skip the whole
    # Riccati sweep on pad/reset steps and the phi/FK block on the ~90% of
    # steps that neither reset nor seed; mixed batches degrade gracefully
    # to computing every branch. Round 3 measured this skip DMA-neutral;
    # after the slab diet the steps are compute-bound and it pays.
    any_dyn = jnp.max(is_dyn) > 0.0
    any_rst = jnp.max(is_rst) > 0.0
    any_phi = jnp.logical_or(any_rst, jnp.max(is_last_c) > 0.0)

    x = X_ref[sj]                # (24, BB) source-node state
    u = U_ref[sj]
    c4 = c_ref[sj]               # (4, BB)
    cn4 = cn_ref[sj]

    xcols = [x[i] for i in range(24)]
    ucols = [u[i] for i in range(24)]
    cc = [c4[l] for l in range(4)]
    ccn = [cn4[l] for l in range(4)]
    z = jnp.zeros_like(xcols[0])
    one = jnp.ones_like(xcols[0])

    from hkdmpc_tpu.ops.jac_tminor import _rot_entries
    rot = _rot_entries((xcols[0], xcols[1], xcols[2]))

    xr = xr_ref[sj]              # (24, BB) reference at the source node
    fr = fr_ref[sj]              # (12, BB)
    xr_cols = [xr[i] for i in range(24)]
    fr_cols = [fr[i] for i in range(12)]

    # seed reads the stash BEFORE this step's phi overwrites it
    H = H_s[...] + is_last[None, None, :] * Pxx_s[...]
    G = G_s[...] + is_last[None, :] * Px_s[...]
    dnext = dnext_ref[sj]
    Gn = G + jnp.sum(H * dnext[None, :, :], axis=1)

    # ---- terminal partials at the source node, in-kernel (was: the two
    # (T+1, 24, 24) phixx + (T+1, 24) phix input slabs). phi(t) feeds this
    # step's RESET seed and the NEXT grid step's is_last seed via the
    # stash (ti==0 stashes phi(T)); computed only when some lane resets
    # here or has node t as its last active node. -------------------------
    @pl.when(any_phi)
    def _():
        phix_t, phixx_t = _phi_dense(xcols, xr_cols, fr_cols, tctx_ref[sj],
                                     z, one, rot=rot)
        Px_s[...] = phix_t
        Pxx_s[...] = phixx_t

    # ---- DYN branch: jacobian entries + running partials + quadratic
    # expansion + split-sweep Riccati step --------------------------------
    @pl.when(any_dyn)
    def _():
        dynA, dynB = dyn_jac_entries(xcols, ucols, cc, z, one, rot=rot)
        edA = {k: dtv * v for k, v in dynA.items()}
        edB = {k: dtv * v for k, v in dynB.items()}

        # running cost partials, in-kernel (was: lxx/luu/lx/lu slabs)
        ur = ur_ref[sj]
        rbd = rbd_ref[sj]            # (20, BB) ReB delta rows
        rbe = rbe_ref[sj]            # (20, BB) ReB eps rows (zeros = off)
        mdt = is_dyn * dtv
        d1c, d2c = [], []
        for l in range(4):
            fx, fy, fz = ucols[3 * l], ucols[3 * l + 1], ucols[3 * l + 2]
            grows = [fz, -fx + _MU * fz, fx + _MU * fz, -fy + _MU * fz,
                     fy + _MU * fz]
            for k in range(5):
                r = 5 * l + k
                a1, a2 = reb_derivs(grows[k], rbd[r], rbe[r])
                d1c.append(cc[l] * a1)
                d2c.append(cc[l] * a2)
        lx_e, lu_e, lxx_e, luu_e = running_partial_entries(
            xcols, ucols, xr_cols, [ur[i] for i in range(24)], fr_cols,
            cc, mdt, d1c, d2c)

        HA = H + _sparse_post(H, edA)            # H @ (I + dt DA)
        AtHA = HA + _sparse_pre(HA, edA)
        Qux = _sparse_pre(HA, edB)               # B^T H A
        HB = _sparse_post(H, edB)
        BtHB = _sparse_pre(HB, edB)
        AtGn = Gn + _sparse_pre_vec(Gn, edA)
        BtGn = _sparse_pre_vec(Gn, edB)

        ii = jax.lax.broadcasted_iota(jnp.int32, (24, 24), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (24, 24), 1)
        eye24 = (ii == jj).astype(jnp.float32)[:, :, None]

        Qx = _vec_from_entries(lx_e, z) + AtGn
        Qu = _vec_from_entries(lu_e, z) + BtGn
        Qxx = _entries_add(AtHA, lxx_e) + reg[None, None, :] * eye24
        Qxx = 0.5 * (Qxx + Qxx.transpose(1, 0, 2))
        Quu = _entries_add(BtHB, luu_e) + reg[None, None, :] * eye24

        if DIAG == "nopiv":
            # DIAGNOSTIC ONLY (HKD_KERNEL_DIAG=nopiv): replace the whole
            # serially-dependent elimination + back-substitution with a
            # shape-preserving fake so its marginal cost can be read off a
            # full-solve timing delta. Results are numerically WRONG; the
            # program structure (iterations, retry exit, line search) is
            # unchanged because ok stays all-pass and caps are static.
            Sw = 0.01 * Qux
            sv = 0.01 * Qu
            ok = jnp.ones_like(reg)
        else:
            # forward elimination + back-substitution on [Quu | Qux | Qu]:
            # Gaussian elimination touches only the rows BELOW each pivot
            # (the Gauss-Jordan sweep it replaced updated all 24 every
            # time), and the 25 RHS columns are recovered by
            # back-substitution — about half the serially-dependent work.
            # Pivot values (and thus the PSD gate) are identical to the
            # Jordan sweep up to per-op rounding: both apply the same
            # row-k update from each earlier pivot, but the update orders
            # differ at the ulp level, so the d>1e-9 PSD gate can in
            # principle flip on borderline pivots between the two kernels
            # — do not rely on bit-exact gate agreement across kernels.
            W_s[...] = jnp.zeros_like(W_s)
            W_s[:, 0:24, :] = Quu
            W_s[:, 24:48, :] = Qux
            W_s[:, 48, :] = Qu

            ok = jnp.ones_like(reg)
            for k in range(24):
                row = W_s[k]                  # (49, BB)
                d = row[k]
                ok = ok * (d > 1e-9).astype(jnp.float32)
                d_safe = jnp.where(jnp.abs(d) > 1e-30, d, 1.0)
                if k < 23:
                    below = W_s[k + 1:24]     # (23-k, 49, BB)
                    fac = below[:, k, :] / d_safe[None, :]
                    W_s[k + 1:24] = below - fac[:, None, :] * row[None, :, :]

            W = W_s[...]
            S_rows = [None] * 24
            for i in range(23, -1, -1):
                acc = W[i, 24:49, :]          # (25, BB) transformed RHS row
                for j in range(i + 1, 24):
                    acc = acc - W[i, j][None, :] * S_rows[j]
                di = W[i, i]
                di_safe = jnp.where(jnp.abs(di) > 1e-30, di, 1.0)
                S_rows[i] = acc / di_safe[None, :]
            Sfull = jnp.stack(S_rows, axis=0)  # (24,25,BB) = Quu^-1 [Qux|Qu]
            Sw = Sfull[:, 0:24, :]
            sv = Sfull[:, 24, :]
        Hd = Qxx - _xtc(Qux, Sw)
        Hd = 0.5 * (Hd + Hd.transpose(1, 0, 2))
        Gd = Qx - jnp.sum(Qux * sv[:, None, :], axis=0)
        dv = jnp.sum(Qu * sv, axis=0)

        K_ref[sj] = is_dyn[None, None, :] * (-Sw)
        dU_ref[sj] = is_dyn[None, :] * (-sv)
        G_s[...] = is_dyn[None, :] * Gd + (1.0 - is_dyn[None, :]) * G
        H_s[...] = (is_dyn[None, None, :] * Hd
                    + (1.0 - is_dyn[None, None, :]) * H)
        dv1_s[...] = dv1_s[...] - is_dyn[None, :] * dv[None, :]
        dv2_s[...] = dv2_s[...] + is_dyn[None, :] * dv[None, :]
        ok_s[...] = ok_s[...] * jnp.where(is_dyn[None, :] > 0,
                                          ok[None, :], 1.0)

    @pl.when(jnp.logical_not(any_dyn))
    def _():
        K_ref[sj] = jnp.zeros_like(K_ref[sj])
        dU_ref[sj] = jnp.zeros_like(dU_ref[sj])
        # pad-only lanes carry (G, H) through; the seeded H == carry here
        # because a lane's seed step is always its last ACTIVE transition
        G_s[...] = G
        H_s[...] = H

    # ---- RESET branch: Px = I + S, sparse sandwich + phi(t) seed --------
    @pl.when(any_rst)
    def _():
        S = reset_jac_entries(xcols, cc, ccn, z, one, rot=rot)
        HS = _sparse_post(H, S)
        M = H + HS
        Hr = Pxx_s[...] + M + _sparse_pre(M, S)
        Gr = Px_s[...] + Gn + _sparse_pre_vec(Gn, S)
        G_s[...] = is_rst[None, :] * Gr + (1.0 - is_rst[None, :]) * G_s[...]
        H_s[...] = (is_rst[None, None, :] * Hr
                    + (1.0 - is_rst[None, None, :]) * H_s[...])


# time steps fused per grid invocation (structural lever vs the serial
# wall). Overridable per call; env var for experiments.
import functools as _functools
import os as _os

SPB = int(_os.environ.get("HKD_KERNEL_SPB", "1"))


def backward_sweep_pallas_hkd(kind_b, X, U, contact, contact_next,
                              xr, ur, foot_r, reb_delta, reb_eps,
                              term_contact, td_mask, al_sigma, al_lambda,
                              term_mask, defect,
                              reg, last_node_b, dt, interpret=False,
                              bb=None, spb=None):
    """Explicit-batch backward sweep with IN-KERNEL HKD jacobians,
    running-cost partials AND terminal partials (tracking + foot reg + AL
    touchdown) — no phix/phixx slabs cross HBM at all.

    kind_b (Bt, T) int32; X/xr (Bt, T+1, 24); U/ur (Bt, T(+1), 24);
    contact / contact_next (Bt, T, 4); foot_r (Bt, T+1, 12); reb rows
    (Bt, T, 20) — pass reb_eps = zeros to disable the ReB barrier;
    term_contact/td_mask/al_sigma/al_lambda (Bt, T+1, 4) and term_mask
    (Bt, T+1) — pass al_sigma = al_lambda = zeros to disable AL;
    dt scalar or (Bt,). Returns (dU, K, dv1, dv2, ok).

    spb: time steps fused per grid invocation (grid = (nb, T_pad/spb));
    every per-step input is transition-indexed and padded to T_pad with
    PAD steps processed (and masked out) first."""
    bb = bb or BB
    spb = spb or SPB
    Bt, T = kind_b.shape
    Bp = ((Bt + bb - 1) // bb) * bb
    pad = Bp - Bt
    T_pad = ((T + spb - 1) // spb) * spb
    tp = T_pad - T               # trailing PAD transitions (masked)

    def bm(x):
        x = jnp.pad(x.astype(jnp.float32), [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        perm = tuple(range(1, x.ndim)) + (0,)
        return jnp.transpose(x, perm)

    def tpad(x_m, rows):
        """Ensure a transition-indexed array covers T_pad rows. Longer
        arrays pass through unsliced (the index maps never reach the
        extra rows), avoiding copies on the spb=1 default."""
        if rows >= T_pad:
            return x_m
        return jnp.pad(x_m, [(0, T_pad - rows)] + [(0, 0)] * (x_m.ndim - 1))

    # packed per-node terminal context (T+1, 17): 0:4 term_contact,
    # 4:8 td_mask, 8:12 al_sigma, 12:16 al_lambda, 16 term_mask
    tctx = jnp.concatenate(
        [term_contact, td_mask, al_sigma, al_lambda, term_mask[..., None]],
        axis=-1)

    X_m = bm(X)                  # full (T+1) nodes for the node-T views
    xr_m = bm(xr)
    fr_m = bm(foot_r)
    tctx_m = bm(tctx)
    # transition-indexed per-step views (source node t at row t), T_pad rows
    X_s = tpad(X_m, T + 1)
    xr_s = tpad(xr_m, T + 1)
    fr_s = tpad(fr_m, T + 1)
    tctx_s = tpad(tctx_m, T + 1)
    U_s = tpad(bm(U), U.shape[1])
    c_s = tpad(bm(contact), T)
    cn_s = tpad(bm(contact_next), T)
    ur_s = tpad(bm(ur), ur.shape[1])
    rbd_s = tpad(bm(reb_delta), T)
    rbe_s = tpad(bm(reb_eps), T)
    d_m = bm(defect)
    dnext_s = tpad(d_m[1:], T)   # defect at the dest node of transition t

    from hkdmpc_tpu.solver.structs import DYN, RESET
    is_dyn = tpad(bm((kind_b == DYN).astype(jnp.float32)), T)[:, None, :]
    is_rst = tpad(bm((kind_b == RESET).astype(jnp.float32)), T)[:, None, :]
    node_idx = jnp.arange(T + 1)[None, :]
    is_last = bm((node_idx == last_node_b[:, None]).astype(jnp.float32))
    is_last_t = tpad(is_last[1:], T)[:, None, :]   # is_last[t+1] at step t
    is_last_c = tpad(is_last[:-1], T)[:, None, :]  # is_last[t] at step t

    reg_m = jnp.pad(
        jnp.broadcast_to(jnp.asarray(reg, jnp.float32), (Bt,)),
        (0, pad))[None, :]
    dt_m = jnp.pad(
        jnp.broadcast_to(jnp.asarray(dt, jnp.float32), (Bt,)),
        (0, pad))[None, :]

    nb = Bp // bb
    npairs = T_pad // spb
    revS4 = lambda bi, ti: (npairs - 1 - ti, 0, 0, bi)
    revS = lambda bi, ti: (npairs - 1 - ti, 0, bi)
    lastn = lambda bi, ti: (T, 0, bi)   # constant: fetched once per block
    fix2 = lambda bi, ti: (0, bi)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nb, npairs),
        in_specs=[
            pl.BlockSpec((spb, 24, bb), revS, memory_space=pltpu.VMEM),  # X
            pl.BlockSpec((spb, 24, bb), revS, memory_space=pltpu.VMEM),  # U
            pl.BlockSpec((spb, 4, bb), revS, memory_space=pltpu.VMEM),   # c
            pl.BlockSpec((spb, 4, bb), revS, memory_space=pltpu.VMEM),   # cn
            pl.BlockSpec((spb, 24, bb), revS, memory_space=pltpu.VMEM),  # xr
            pl.BlockSpec((spb, 24, bb), revS, memory_space=pltpu.VMEM),  # ur
            pl.BlockSpec((spb, 12, bb), revS, memory_space=pltpu.VMEM),  # fr
            pl.BlockSpec((spb, 17, bb), revS, memory_space=pltpu.VMEM),  # tctx
            pl.BlockSpec((spb, 20, bb), revS, memory_space=pltpu.VMEM),  # rbd
            pl.BlockSpec((spb, 20, bb), revS, memory_space=pltpu.VMEM),  # rbe
            pl.BlockSpec((spb, 24, bb), revS, memory_space=pltpu.VMEM),  # dnext
            pl.BlockSpec((1, 24, bb), lastn, memory_space=pltpu.VMEM),   # X_T
            pl.BlockSpec((1, 24, bb), lastn, memory_space=pltpu.VMEM),   # xr_T
            pl.BlockSpec((1, 12, bb), lastn, memory_space=pltpu.VMEM),   # fr_T
            pl.BlockSpec((1, 17, bb), lastn, memory_space=pltpu.VMEM),   # tctx_T
            pl.BlockSpec((spb, 1, bb), revS, memory_space=pltpu.VMEM),
            pl.BlockSpec((spb, 1, bb), revS, memory_space=pltpu.VMEM),
            pl.BlockSpec((spb, 1, bb), revS, memory_space=pltpu.VMEM),
            pl.BlockSpec((spb, 1, bb), revS, memory_space=pltpu.VMEM),   # lastc
            pl.BlockSpec((1, bb), fix2, memory_space=pltpu.VMEM),        # reg
            pl.BlockSpec((1, bb), fix2, memory_space=pltpu.VMEM),        # dt
        ],
        out_specs=[
            pl.BlockSpec((spb, 24, 24, bb), revS4, memory_space=pltpu.VMEM),
            pl.BlockSpec((spb, 24, bb), revS, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bb), fix2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bb), fix2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bb), fix2, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((24, bb), jnp.float32),
            pltpu.VMEM((24, 24, bb), jnp.float32),
            pltpu.VMEM((1, bb), jnp.float32),
            pltpu.VMEM((1, bb), jnp.float32),
            pltpu.VMEM((1, bb), jnp.float32),
            pltpu.VMEM((24, NS, bb), jnp.float32),
            pltpu.VMEM((24, bb), jnp.float32),       # phi stash: Px_s
            pltpu.VMEM((24, 24, bb), jnp.float32),   # phi stash: Pxx_s
        ],
    )

    K_m, dU_m, dv1_p, dv2_p, ok_p = pl.pallas_call(
        _functools.partial(_kernel_hkd, spb=spb),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, 24, 24, Bp), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, 24, Bp), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp), jnp.float32),
        ],
        interpret=interpret,
    )(X_s, U_s, c_s, cn_s, xr_s, ur_s, fr_s, tctx_s, rbd_s, rbe_s, dnext_s,
      X_m, xr_m, fr_m, tctx_m, is_dyn, is_rst, is_last_t, is_last_c,
      reg_m, dt_m)

    K = jnp.transpose(K_m, (3, 0, 1, 2))[:Bt, :T]
    dU = jnp.transpose(dU_m, (2, 0, 1))[:Bt, :T]
    return dU, K, dv1_p[0, :Bt], dv2_p[0, :Bt], ok_p[0, :Bt] > 0.5
