"""Riccati backward sweep over the flattened transition graph.

Parity: SinglePhase::backward_sweep (SinglePhase.cpp:299-367) for dynamics
transitions, MultiPhaseDDP::impact_aware_step (MultiPhaseDDP.cpp:480-484) +
terminal-cost seeding at reset transitions, with per-node defect corrections
(multiple shooting), wrapped in the regularization retry schedule of
MultiPhaseDDP::backward_sweep_regularized (MultiPhaseDDP.cpp:141-181).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from hkdmpc_tpu.ops import precise
from hkdmpc_tpu.ops.linalg import sweep_inverse
from hkdmpc_tpu.solver.structs import DYN, PAD, RESET, LQData, ProblemData

REG_MIN_STEP = 1e-3   # reference: MultiPhaseDDP.cpp:157
REG_MAX = 1e2         # reference: MultiPhaseDDP.cpp:160
CHOL_SHIFT = 1e-9     # reference: SinglePhase.cpp:337

# lax.scan unroll factor for the sequential backward sweep. Only the
# batch-1 MPC latency path runs this scan (batched solves dispatch the
# Pallas kernel); unrolling amortizes per-step loop overhead there.
SCAN_UNROLL = 1


def _riccati_step_aug_sweep(Qx, Qu, Qxx, Quu, Qux, dtype):
    """Fused Riccati step via the augmented sweep operator.

    Sweeping the Quu block of the symmetric bordered matrix
        [[Quu,  Qux,  Qu],
         [Qux', Qxx,  Qx],
         [Qu',  Qx',  0 ]]
    yields in one pass: K = -Quu^-1 Qux, dU = -Quu^-1 Qu,
    H' = Qxx - Qux' Quu^-1 Qux, G' = Qx - Qux' Quu^-1 Qu, and
    dV = -Qu' Quu^-1 Qu in the corner — replacing the explicit inverse plus
    four matmuls. Pivots double as the PSD gate (same criterion as
    sweep_inverse). Algebraically identical to the reference's expansion
    (SinglePhase.cpp:342-358); float rounding differs slightly.
    """
    nu, nx = Quu.shape[0], Qxx.shape[0]
    n = nu + nx + 1
    M = jnp.zeros((n, n), dtype)
    M = M.at[0:nu, 0:nu].set(Quu)
    M = M.at[0:nu, nu:nu + nx].set(Qux)
    M = M.at[nu:nu + nx, 0:nu].set(Qux.T)
    M = M.at[nu:nu + nx, nu:nu + nx].set(Qxx)
    M = M.at[0:nu, n - 1].set(Qu)
    M = M.at[n - 1, 0:nu].set(Qu)
    M = M.at[nu:nu + nx, n - 1].set(Qx)
    M = M.at[n - 1, nu:nu + nx].set(Qx)

    eye = jnp.eye(n, dtype=dtype)

    def body(k, carry):
        W, ok = carry
        e = eye[k]
        row = W[k]
        col = W[:, k]
        d = row[k]
        ok = jnp.logical_and(ok, d > CHOL_SHIFT)
        d_safe = jnp.where(jnp.abs(d) > 1e-30, d, jnp.asarray(1.0, dtype))
        W = (W - jnp.outer(col - e, row - e) / d_safe
             - 2.0 * jnp.outer(e, e))
        return W, ok

    W, ok = lax.fori_loop(0, nu, body, (M, jnp.array(True)))
    K_t = -W[0:nu, nu:nu + nx]
    dU_t = -W[0:nu, n - 1]
    H_new = W[nu:nu + nx, nu:nu + nx]
    H_new = 0.5 * (H_new + H_new.T)
    G_new = W[nu:nu + nx, n - 1]
    dv_k = -W[n - 1, n - 1]
    return dU_t, K_t, G_new, H_new, dv_k, ok


def backward_sweep(prob: ProblemData, lq: LQData, defect, regularization,
                   last_node, aug_sweep: bool = True, emit_G: bool = False):
    # controlled comparison at batch 1024 / v5e: aug sweep 312 ms vs 376 ms
    # end-to-end solve — the fused bordered-matrix step wins.
    """One full backward sweep at a given regularization.

    Returns (dU, K, G0, H0, dV_1, dV_2, success); with emit_G=True appends
    Gs (T+1, nx) — the value gradient at every node, the series the
    reference's value_grad log records (HSDDP_Utils.h traj->G[k]).
    carry = (G, H, dV_1, dV_2, ok) — value approx at the dest node of the
    transition being processed. aug_sweep selects the fused augmented-sweep
    Riccati step (default) vs the explicit-inverse formulation.
    """
    T = prob.T
    dtype = lq.A.dtype
    nx, nu = lq.lx.shape[-1], lq.lu.shape[-1]
    eye_x = jnp.eye(nx, dtype=dtype)
    eye_u = jnp.eye(nu, dtype=dtype)

    # seed at the last active node: G = Phix, H = Phixx (no Gprime beyond)
    G_seed = lq.phix[last_node]
    H_seed = lq.phixx[last_node]

    def step(carry, t):
        G, H, dv1, dv2, ok = carry
        kind = prob.kind[t]

        def dyn_branch(_):
            # defect correction of the dest node (SinglePhase.cpp:319-321)
            Gn = G + precise.mv(H, defect[t + 1])
            HA = precise.mm(H, lq.A[t])
            HB = precise.mm(H, lq.B[t])
            Qx = lq.lx[t] + precise.mv(lq.A[t].T, Gn)
            Qu = lq.lu[t] + precise.mv(lq.B[t].T, Gn)
            Qxx = lq.lxx[t] + precise.mm(lq.A[t].T, HA)
            Quu = lq.luu[t] + precise.mm(lq.B[t].T, HB)
            Qux = precise.mm(lq.B[t].T, HA)
            if lq.lux is not None:
                Qux = Qux + lq.lux[t]
            Qxx = Qxx + regularization * eye_x
            Quu = Quu + regularization * eye_u
            if aug_sweep:
                dU_t, K_t, G_new, H_new, dv_k, psd = _riccati_step_aug_sweep(
                    Qx, Qu, 0.5 * (Qxx + Qxx.T), Quu, Qux, dtype)
            else:
                Quu_inv, psd = sweep_inverse(Quu, CHOL_SHIFT)
                Quu_inv = jnp.where(psd, Quu_inv, eye_u)
                Quu_inv = 0.5 * (Quu_inv + Quu_inv.T)
                Qxx_s = 0.5 * (Qxx + Qxx.T)
                dU_t = -precise.mv(Quu_inv, Qu)
                K_t = -precise.mm(Quu_inv, Qux)
                G_new = Qx + precise.mv(Qux.T, dU_t)
                H_new = Qxx_s + precise.mm(Qux.T, K_t)
                dv_k = -jnp.sum(Qu * dU_t)
            return (G_new, H_new, dv1 - dv_k, dv2 + dv_k,
                    jnp.logical_and(ok, psd), dU_t, K_t)

        def reset_branch(_):
            # phase-start defect correction (SinglePhase.cpp:363-365), then
            # impact-aware sandwich, then terminal cost/AL seed of source node
            Gn = G + precise.mv(H, defect[t + 1])
            Px = lq.A[t]
            G_new = lq.phix[t] + precise.mv(Px.T, Gn)
            H_new = lq.phixx[t] + precise.mm(Px.T, precise.mm(H, Px))
            return (G_new, H_new, dv1, dv2, ok,
                    jnp.zeros(nu, dtype), jnp.zeros((nu, nx), dtype))

        def pad_branch(_):
            return (G, H, dv1, dv2, ok,
                    jnp.zeros(nu, dtype), jnp.zeros((nu, nx), dtype))

        G2, H2, dv1_2, dv2_2, ok2, dU_t, K_t = lax.switch(
            kind, [pad_branch, dyn_branch, reset_branch], None)
        return (G2, H2, dv1_2, dv2_2, ok2), (dU_t, K_t, G2)

    init = (G_seed, H_seed, jnp.zeros((), dtype), jnp.zeros((), dtype),
            jnp.array(True))
    (G0, H0, dV_1, dV_2, success), (dU_rev, K_rev, G_rev) = lax.scan(
        step, init, jnp.arange(T - 1, -1, -1), unroll=SCAN_UNROLL)
    # scan emitted in reverse transition order — flip back
    dU = dU_rev[::-1]
    K = K_rev[::-1]
    if emit_G:
        # node j's gradient = the G produced at its outgoing transition;
        # the last active node carries the sweep seed (terminal phix)
        Gs = jnp.zeros((T + 1, nx), dtype).at[:T].set(G_rev[::-1])
        Gs = Gs.at[last_node].set(G_seed)
        return dU, K, G0, H0, dV_1, dV_2, success, Gs
    return dU, K, G0, H0, dV_1, dV_2, success


# ---------------------------------------------------------------------------
# custom_vmap dispatch: under vmap(solve), the batched rule runs the whole
# sweep as one Pallas kernel (ops/pallas_backward.py) with batch in the TPU
# lane dimension; unbatched calls keep the faithful scan. Enabled with
# ddp.solve(pallas_backward=True) (f32 only).
# ---------------------------------------------------------------------------

from jax.custom_batching import custom_vmap as _custom_vmap


@_custom_vmap
def riccati_backward(kind, A, B, lxx, luu, lx, lu, defect, phix, phixx,
                     reg, last_node):
    """Array-interface backward sweep: returns (dU, K, dv1, dv2, ok)."""
    lq = LQData(A=A, B=B, lx=lx, lu=lu, lxx=lxx, luu=luu, lux=None,
                phix=phix, phixx=phixx)

    class _P:  # minimal prob view for backward_sweep
        pass
    p = _P()
    p.kind = kind
    p.T = kind.shape[0]
    dU, K, G0, H0, dv1, dv2, ok = backward_sweep(p, lq, defect, reg,
                                                 last_node, aug_sweep=True)
    return dU, K, dv1, dv2, ok


@riccati_backward.def_vmap
def _riccati_backward_batched(axis_size, in_batched, kind, A, B, lxx, luu,
                              lx, lu, defect, phix, phixx, reg, last_node):
    from hkdmpc_tpu.ops.pallas_backward import backward_sweep_pallas

    # the kernel is 24-dim f32 only and TPU-specific (pltpu memory spaces;
    # interpret mode covers cpu): other models/dtypes/backends fall back to
    # the plainly-vmapped scan
    backend = jax.default_backend()
    if (A.shape[-2:] != (24, 24) or A.dtype != jnp.float32
            or backend not in ("tpu", "cpu")):
        def unbatched(*args):
            return riccati_backward.fun(*args)
        in_axes = tuple(0 if b else None for b in in_batched)
        out = jax.vmap(unbatched, in_axes=in_axes)(
            kind, A, B, lxx, luu, lx, lu, defect, phix, phixx, reg,
            last_node)
        return out, (True, True, True, True, True)

    def bc(x, b):
        return x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)

    args = [bc(a, b) for a, b in zip(
        (kind, A, B, lxx, luu, lx, lu, defect, phix, phixx, last_node),
        (in_batched[0], in_batched[1], in_batched[2], in_batched[3],
         in_batched[4], in_batched[5], in_batched[6], in_batched[7],
         in_batched[8], in_batched[9], in_batched[11]))]
    # the regularization-retry while_loop batches reg per scenario after the
    # first retry (jnp.where(ok, reg, reg_next)); the kernel takes it per-lane
    reg_v = reg if in_batched[10] else jnp.broadcast_to(reg, (axis_size,))
    interpret = backend == "cpu"  # TPU pallas native; interpret on CPU
    out = backward_sweep_pallas(args[0], args[1], args[2], args[3], args[4],
                                args[5], args[6], args[7], args[8], args[9],
                                reg_v, args[10], interpret=interpret)
    return out, (True, True, True, True, True)


class _ProbView:
    """Minimal ProblemData view for backward_sweep / build_AB_tminor."""
    pass


@_custom_vmap
def riccati_backward_hkd(kind, X, U, contact, contact_next, xr, ur, foot_r,
                         reb_delta, reb_eps, term_contact, td_mask,
                         al_sigma, al_lambda, term_mask, defect, reg,
                         last_node, dt):
    """Array-interface backward sweep for the default HKD model with the
    jacobians, running-cost partials AND terminal partials built from
    (X, U, references, constraint params) instead of passed in: the batched
    rule runs the in-kernel Pallas kernel (ops/pallas_backward._kernel_hkd);
    the unbatched rule builds A/B and every partial via the SAME entry
    formulas (ops/jac_tminor + ops/hkd_tminor) and runs the faithful scan.
    Pass reb_eps = zeros to disable the ReB barrier terms and
    al_sigma = al_lambda = zeros to disable the AL terms.
    Returns (dU, K, dv1, dv2, ok)."""
    from hkdmpc_tpu.ops.hkd_tminor import (running_partials_tbatch,
                                           terminal_partials_tbatch)
    from hkdmpc_tpu.ops.jac_tminor import build_AB_tminor

    p = _ProbView()
    p.kind = kind
    p.T = kind.shape[0]
    p.contact = contact
    p.contact_next = contact_next
    p.dt = dt
    p.is_dyn = (kind == DYN).astype(X.dtype)
    p.xr = xr
    p.ur = ur
    p.foot_r = foot_r
    p.term_contact = term_contact
    p.td_mask = td_mask
    p.term_mask = term_mask
    A, B = build_AB_tminor(p, X, U)

    class _C:
        pass
    c = _C()
    c.reb_delta = reb_delta
    c.reb_eps = reb_eps
    c.al_sigma = al_sigma
    c.al_lambda = al_lambda
    lx, lu, lxx, luu, _ = running_partials_tbatch(p, X, U, c,
                                                  reb_active=True)
    phix, phixx = terminal_partials_tbatch(p, X, c, al_active=True)
    lq = LQData(A=A, B=B, lx=lx, lu=lu, lxx=lxx, luu=luu, lux=None,
                phix=phix, phixx=phixx)
    dU, K, G0, H0, dv1, dv2, ok = backward_sweep(p, lq, defect, reg,
                                                 last_node, aug_sweep=True)
    return dU, K, dv1, dv2, ok


@riccati_backward_hkd.def_vmap
def _riccati_backward_hkd_batched(axis_size, in_batched, kind, X, U, contact,
                                  contact_next, xr, ur, foot_r, reb_delta,
                                  reb_eps, term_contact, td_mask, al_sigma,
                                  al_lambda, term_mask, defect, reg,
                                  last_node, dt):
    from hkdmpc_tpu.ops.pallas_backward import backward_sweep_pallas_hkd

    backend = jax.default_backend()
    if (X.shape[-1] != 24 or X.dtype != jnp.float32
            or backend not in ("tpu", "cpu")):
        def unbatched(*args):
            return riccati_backward_hkd.fun(*args)
        in_axes = tuple(0 if b else None for b in in_batched)
        out = jax.vmap(unbatched, in_axes=in_axes)(
            kind, X, U, contact, contact_next, xr, ur, foot_r, reb_delta,
            reb_eps, term_contact, td_mask, al_sigma, al_lambda, term_mask,
            defect, reg, last_node, dt)
        return out, (True, True, True, True, True)

    def bc(x, b):
        return x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)

    names = (kind, X, U, contact, contact_next, xr, ur, foot_r, reb_delta,
             reb_eps, term_contact, td_mask, al_sigma, al_lambda, term_mask,
             defect, last_node)
    bflags = tuple(in_batched[i] for i in
                   (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
                    17))
    args = [bc(a, b) for a, b in zip(names, bflags)]
    reg_v = reg if in_batched[16] else jnp.broadcast_to(reg, (axis_size,))
    dt_v = dt if in_batched[18] else jnp.broadcast_to(dt, (axis_size,))
    interpret = backend == "cpu"
    out = backward_sweep_pallas_hkd(
        args[0], args[1], args[2], args[3], args[4], args[5], args[6],
        args[7], args[8], args[9], args[10], args[11], args[12], args[13],
        args[14], args[15], reg_v, args[16], dt_v, interpret=interpret)
    return out, (True, True, True, True, True)


def backward_sweep_regularized(prob: ProblemData, lq: LQData, defect,
                               regularization, update_regularization,
                               last_node, aug_sweep: bool = True,
                               use_pallas: bool = False,
                               kernel_jac_XU=None,
                               assoc_backward: bool = False):
    """Retry the sweep with growing regularization until Quu is PSD everywhere
    or the regularization exceeds REG_MAX (then the solve fails).

    Returns (dU, K, dV_1, dV_2, reg_out, success, solve_failed).
    reg_out is the post-success relaxation reg/20 (zeroed below 1e-6),
    parity: MultiPhaseDDP.cpp:141-181.

    kernel_jac_XU: optional (X, U, reb_delta, reb_eps, al_sigma, al_lambda)
    — when given (and the model is the default 24-dim HKD), the jacobians
    AND all cost partials (running + terminal) are built INSIDE the sweep
    via riccati_backward_hkd; lq is never read (every field may be None;
    see lq_approximation skip flags). reb_eps zeros disables the barrier;
    al_sigma/al_lambda zeros disable the AL terms."""
    dtype = defect.dtype

    def cond(carry):
        reg, out, ok, failed = carry
        return jnp.logical_and(jnp.logical_not(ok), jnp.logical_not(failed))

    def body(carry):
        reg, out, ok, failed = carry
        if kernel_jac_XU is not None:
            X, U, rbd, rbe, sig, lam = kernel_jac_XU
            dU, K, dv1, dv2, ok_new = riccati_backward_hkd(
                prob.kind, X, U, prob.contact, prob.contact_next,
                prob.xr, prob.ur, prob.foot_r, rbd, rbe,
                prob.term_contact, prob.td_mask, sig, lam, prob.term_mask,
                defect, reg, last_node, prob.dt)
        elif assoc_backward:
            from hkdmpc_tpu.ops.assoc import riccati_backward_assoc
            dU, K, dv1, dv2, ok_new = riccati_backward_assoc(
                prob, lq, defect, reg, last_node)
        elif use_pallas:
            dU, K, dv1, dv2, ok_new = riccati_backward(
                prob.kind, lq.A, lq.B, lq.lxx, lq.luu, lq.lx, lq.lu,
                defect, lq.phix, lq.phixx, reg, last_node)
        else:
            dU, K, G0, H0, dv1, dv2, ok_new = backward_sweep(
                prob, lq, defect, reg, last_node, aug_sweep)
        reg_next = jnp.maximum(reg * update_regularization, REG_MIN_STEP)
        failed_new = jnp.logical_and(jnp.logical_not(ok_new), reg_next > REG_MAX)
        reg_new = jnp.where(ok_new, reg, reg_next)
        return reg_new, (dU, K, dv1, dv2), ok_new, failed_new

    T = prob.T
    nx = defect.shape[-1]
    nu = lq.lu.shape[-1] if lq.lu is not None else nx
    dummy = (jnp.zeros((T, nu), dtype), jnp.zeros((T, nu, nx), dtype),
             jnp.zeros((), dtype), jnp.zeros((), dtype))
    carry = (jnp.asarray(regularization, dtype), dummy, jnp.array(False),
             jnp.array(False))
    reg, (dU, K, dv1, dv2), ok, failed = lax.while_loop(cond, body, carry)

    reg_out = reg / 20.0
    reg_out = jnp.where(reg_out < 1e-6, 0.0, reg_out)
    return dU, K, dv1, dv2, reg_out, ok, failed
