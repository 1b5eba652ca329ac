"""Parallel-in-time recursions via associative scan.

1. Linear rollout: the multiple-shooting search direction is the affine
   chain dx_{t+1} = M_t dx_t + b_t (solver/rollout.linear_rollout — a
   75-step sequential scan). Affine maps compose associatively:
   (M2, b2) o (M1, b1) = (M2 M1, M2 b1 + b2), so the whole prefix is a
   `lax.associative_scan` of depth ~log2(T).

2. Riccati backward sweep (`riccati_backward_assoc`): the value recursion
   (G, H) -> (G', H') of the backward sweep is an affine-quadratic (LFT)
   map; such maps ALSO compose associatively when parameterized as the
   5-tuple element (A, b, C, eta, J) meaning

     H_src = J + A' H' (I + C H')^-1 A
     G_src = eta + A' (I + H' C)^-1 (G' + H' b)

   (the parallel-in-time LQR factorization of Sarkka & Garcia-Fernandez,
   IEEE TAC 2021, adapted to this solver's defect-corrected, regularized,
   multi-phase sweep; elements carry a trailing pivot-health ok flag ANDed
   through compositions). A suffix associative scan over the per-transition
   elements yields the value function at EVERY node in ~log2(T) depth;
   the gains/PSD-gate/dv extraction then runs as one vectorized pass over
   transitions using the SAME per-step formulas as the sequential sweep
   (solver/backward.backward_sweep dyn_branch), so decisions match up to
   float reassociation. This is the horizon-parallel analog SURVEY §5
   calls for, on the backward half.

Both trade ~T/log T more FLOPs for parallel depth — a win whenever the
sequential scan is latency-bound (the batch-1 MPC step), never at
saturating batch (the chip is already full of scenarios).

All products go through ops/precise (VPU f32): the repo's no-MXU policy
(DESIGN.md §3c) applies here too — the log-depth composition squares the
condition of each link, so bf16 MXU rounding would compound worse than in
the sequential scan it replaces.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from hkdmpc_tpu.ops import precise
from hkdmpc_tpu.ops.linalg import sweep_inverse
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


# ---------------------------------------------------------------------------
# parallel-in-time Riccati backward sweep
# ---------------------------------------------------------------------------


_PIVOT_TINY = 1e-30


def _gauss_solve(M, R):
    """Solve M X = R for general (non-symmetric) M (..., n, n),
    R (..., n, m): pivot-free Gaussian elimination + back substitution,
    statically unrolled over n. The combine's M = I + C J (C, J PSD) is a
    product of PSDs shifted by I — well-conditioned without pivoting, the
    same no-pivot discipline as the Riccati sweeps.

    Returns (X, ok) with ok (batch-shaped bool) False wherever a pivot had
    to be substituted: a violated well-conditioning assumption is signalled
    to the caller instead of silently producing garbage (the combine folds
    it into the element's ok flag, forcing the regularization retry)."""
    n = M.shape[-1]
    W = jnp.concatenate([M, R], axis=-1)
    rows = [W[..., i, :] for i in range(n)]
    ok = jnp.ones(M.shape[:-2], bool)
    for k in range(n):
        piv = rows[k][..., k]
        ok = jnp.logical_and(ok, jnp.abs(piv) > _PIVOT_TINY)
        piv = jnp.where(jnp.abs(piv) > _PIVOT_TINY, piv, 1.0)
        rk = rows[k] / piv[..., None]
        rows[k] = rk
        for i in range(k + 1, n):
            rows[i] = rows[i] - rows[i][..., k][..., None] * rk
    X = [None] * n
    for i in range(n - 1, -1, -1):
        acc = rows[i][..., n:]
        for j in range(i + 1, n):
            acc = acc - rows[i][..., j][..., None] * X[j]
        X[i] = acc
    return jnp.stack(X, axis=-2), ok


def _mT(M):
    return jnp.swapaxes(M, -1, -2)


def combine_value_maps(e1, e2):
    """Compose two backward value-map elements: e = e1 o e2 with e2 CLOSER
    TO THE TERMINAL (applied first). Element (A, b, C, eta, J, ok) as in
    the module docstring; ok carries the pivot-health flag of every solve
    that produced the element (ANDed through compositions). Uses
    (I + J2 C1) = (I + C1 J2)' for symmetric C/J, so one factorization
    serves both halves."""
    A1, b1, C1, h1, J1, ok1 = e1
    A2, b2, C2, h2, J2, ok2 = e2
    n = A1.shape[-1]
    eye = jnp.eye(n, dtype=A1.dtype)
    M = eye + precise.mm(C1, J2)
    # sign note: with V(x) = 0.5 x'Hx + G'x (G = -eta of the Sarkka paper
    # convention), the offset combine picks up b1 MINUS C1 h2
    rhs = jnp.concatenate(
        [A1, C1, (b1 - precise.mv(C1, h2))[..., None]], axis=-1)
    X, ok_solve = _gauss_solve(M, rhs)
    ZA1 = X[..., :n]
    ZC1 = X[..., n:2 * n]
    Zb = X[..., 2 * n]
    A = precise.mm(A2, ZA1)
    b = b2 + precise.mv(A2, Zb)
    C = C2 + precise.mm(A2, precise.mm(ZC1, _mT(A2)))
    C = 0.5 * (C + _mT(C))
    J = J1 + precise.mm(_mT(ZA1), precise.mm(J2, A1))
    J = 0.5 * (J + _mT(J))
    h = h1 + precise.mv(_mT(ZA1), h2 + precise.mv(J2, b1))
    ok = jnp.logical_and(jnp.logical_and(ok1, ok2), ok_solve)
    return A, b, C, h, J, ok


def apply_value_map(e, G, H):
    """Apply an element to value params (G, H) at its far end — reference
    semantics for tests (and the definition the combine must satisfy).
    Accepts 5- or 6-tuple elements (the trailing ok flag is ignored)."""
    A, b, C, h, J = e[:5]
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    # H(I+CH)^{-1}A: solve (I + C H) X = A, then H X
    X, _ = _gauss_solve(eye + precise.mm(C, H), A)
    Hs = J + precise.mm(_mT(A), precise.mm(H, X))
    Y, _ = _gauss_solve(eye + precise.mm(H, C),
                        (G + precise.mv(H, b))[..., None])
    Gs = h + precise.mv(_mT(A), Y[..., 0])
    return Gs, 0.5 * (Hs + _mT(Hs))


def riccati_backward_assoc(prob, lq: LQData, defect, reg, last_node):
    """Parallel-in-time backward sweep: same interface/semantics as the
    sequential riccati_backward (dU, K, dv1, dv2, ok) — defect-corrected,
    regularized, with the reference's PSD gate — but the value recursion
    runs as a log-depth associative scan over LFT elements, and the
    gain/dv/PSD extraction as one vectorized pass reusing the sequential
    step's formulas. Requires materialized LQData (A/B + partials) and a
    positive-definite luu + reg*I (true for the HKD costs: R diag > 0).

    Latency path only: at saturating batch the extra FLOPs lose; the
    Pallas kernel owns that regime."""
    dtype = defect.dtype
    T = prob.T
    nx = lq.phix.shape[-1]
    nu = lq.lu.shape[-1]
    eye_x = jnp.eye(nx, dtype=dtype)
    eye_u = jnp.eye(nu, dtype=dtype)

    is_dyn = (prob.kind == DYN)
    is_rst = (prob.kind == RESET)
    dyn_f = is_dyn.astype(dtype)[:, None]

    # ---- leaf elements per transition -----------------------------------
    R = lq.luu + reg * eye_u                      # (T, nu, nu)
    Rinv, _ = jax.vmap(sweep_inverse)(R)
    Rinv = 0.5 * (Rinv + _mT(Rinv))
    BRi = precise.mm(lq.B, Rinv)                  # (T, nx, nu)
    C_dyn = precise.mm(BRi, _mT(lq.B))
    b_dyn = defect[1:] - precise.mv(BRi, lq.lu)
    if lq.lux is not None:
        # cross term: eliminate u at the leaf by completing the square,
        # du = v - R^-1 (lu + lux dx). The stage becomes cross-free in
        # (dx, v) with A <- A - B R^-1 lux, h <- lx - lux' R^-1 lu,
        # J <- lxx - lux' R^-1 lux (b already carries -B R^-1 lu); exact
        # algebra, so the propagated value matches the sequential sweep
        # (which adds lux to Qux at extraction) for lux != 0 too.
        LxTRi = precise.mm(_mT(lq.lux), Rinv)     # (T, nx, nu)
        A_dyn = lq.A - precise.mm(BRi, lq.lux)
        h_dyn = lq.lx - precise.mv(LxTRi, lq.lu)
        J_x = lq.lxx + reg * eye_x - precise.mm(LxTRi, lq.lux)
        J_dyn = 0.5 * (J_x + _mT(J_x))
    else:
        A_dyn = lq.A
        h_dyn = lq.lx
        J_dyn = lq.lxx + reg * eye_x

    zmat = jnp.zeros((T, nx, nx), dtype)
    zvec = jnp.zeros((T, nx), dtype)
    eye_b = jnp.broadcast_to(eye_x, (T, nx, nx))

    dyn_m = is_dyn[:, None, None]
    rst_m = is_rst[:, None, None]
    A_e = jnp.where(dyn_m, A_dyn, jnp.where(rst_m, lq.A, eye_b))
    b_e = jnp.where(dyn_m[:, :, 0], b_dyn,
                    jnp.where(rst_m[:, :, 0], defect[1:], zvec))
    C_e = jnp.where(dyn_m, C_dyn, zmat)
    h_e = jnp.where(dyn_m[:, :, 0], h_dyn,
                    jnp.where(rst_m[:, :, 0], lq.phix[:T], zvec))
    J_e = jnp.where(dyn_m, J_dyn, jnp.where(rst_m, lq.phixx[:T], zmat))
    ok_e = jnp.ones(T, bool)

    # fold the last-node terminal seed into the owning leaf: element t
    # composes with the pure-quadratic seed S_{t+1} = (I, 0, 0, phi_x m,
    # phi_xx m) exactly where the sequential sweep adds it (is_last[t+1])
    node_idx = jnp.arange(T + 1)
    is_last_n = (node_idx == last_node).astype(dtype)
    m_next = is_last_n[1:]                        # (T,)
    seed = (eye_b, zvec, zmat,
            m_next[:, None] * lq.phix[1:],
            m_next[:, None, None] * lq.phixx[1:],
            jnp.ones(T, bool))
    leaves = combine_value_maps((A_e, b_e, C_e, h_e, J_e, ok_e), seed)

    # ---- suffix scan: out[t] = V_t = (M_t o ... o M_{T-1})(0). With
    # reverse=True the scan presents the LATER transition as the left
    # operand, so flip into combine's (earlier, later) convention ---------
    out = lax.associative_scan(lambda a, b: combine_value_maps(b, a),
                               leaves, reverse=True)
    _, _, _, eta_all, J_all, ok_all = out
    # a substituted pivot in ANY combine that fed ANY output invalidates
    # the sweep: fold into the returned ok so the regularization retry
    # fires explicitly instead of garbage reaching the Quu gate
    ok_scan = jnp.all(ok_all)

    # value at the DEST node of each transition (V_{t+1}; V_T = 0), plus
    # the seed that leaf t folded for itself (out[t+1] does not carry it)
    Gn_ = jnp.concatenate([eta_all[1:], jnp.zeros((1, nx), dtype)], axis=0)
    Hn = jnp.concatenate([J_all[1:], jnp.zeros((1, nx, nx), dtype)], axis=0)
    Gn_ = Gn_ + m_next[:, None] * lq.phix[1:]
    Hn = Hn + m_next[:, None, None] * lq.phixx[1:]

    # ---- vectorized gain/dv/PSD extraction (sequential step formulas) ---
    Gn = Gn_ + precise.mv(Hn, defect[1:])
    Qu = lq.lu + precise.mv(_mT(lq.B), Gn)
    HB = precise.mm(Hn, lq.B)
    HA = precise.mm(Hn, lq.A)
    Quu = lq.luu + precise.mm(_mT(lq.B), HB) + reg * eye_u
    Qux = precise.mm(_mT(lq.B), HA)
    if lq.lux is not None:
        Qux = Qux + lq.lux
    Quu = 0.5 * (Quu + _mT(Quu))
    Quu_inv, psd = jax.vmap(lambda M: sweep_inverse(M, 1e-9))(Quu)
    Quu_inv = 0.5 * (Quu_inv + _mT(Quu_inv))
    dU = -precise.mv(Quu_inv, Qu)
    K = -precise.mm(Quu_inv, Qux)
    dv_k = -jnp.sum(Qu * dU, axis=-1)

    dU = dyn_f * dU
    K = dyn_f[:, :, None] * K
    dv1 = -jnp.sum(is_dyn.astype(dtype) * dv_k)
    dv2 = jnp.sum(is_dyn.astype(dtype) * dv_k)
    ok = jnp.logical_and(jnp.all(jnp.where(is_dyn, psd, True)), ok_scan)
    return dU, K, dv1, dv2, ok
