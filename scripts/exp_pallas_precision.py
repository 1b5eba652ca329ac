"""Which backward path is numerically right on TPU: Pallas f32 FMA kernel or
the scan whose 24x24 jnp matmuls hit the MXU at default (bf16-ish) precision?

Compares both against the scan re-run under highest matmul precision and an
f64 numpy oracle of one Riccati recursion.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def np_oracle(kind, A, B, lxx, luu, lx, lu, defect, phix, phixx, reg, last):
    """f64 numpy backward sweep (aug-sweep algebra, explicit form)."""
    T = kind.shape[0]
    A, B = A.astype(np.float64), B.astype(np.float64)
    lxx, luu = lxx.astype(np.float64), luu.astype(np.float64)
    lx, lu = lx.astype(np.float64), lu.astype(np.float64)
    defect = defect.astype(np.float64)
    phix, phixx = phix.astype(np.float64), phixx.astype(np.float64)
    G, H = phix[last].copy(), phixx[last].copy()
    K = np.zeros((T, 24, 24))
    dU = np.zeros((T, 24))
    eye = np.eye(24)
    for t in range(T - 1, -1, -1):
        if kind[t] == 0:
            continue
        Gn = G + H @ defect[t + 1]
        if kind[t] == 2:  # reset
            Px = A[t]
            G = phix[t] + Px.T @ Gn
            H = phixx[t] + Px.T @ H @ Px
            continue
        Qx = lx[t] + A[t].T @ Gn
        Qu = lu[t] + B[t].T @ Gn
        Qxx = lxx[t] + A[t].T @ H @ A[t] + reg * eye
        Quu = luu[t] + B[t].T @ H @ B[t] + reg * eye
        Qux = B[t].T @ H @ A[t]
        Qxx = 0.5 * (Qxx + Qxx.T)
        Qi = np.linalg.inv(Quu)
        K[t] = -Qi @ Qux
        dU[t] = -Qi @ Qu
        G = Qx - Qux.T @ Qi @ Qu
        Hn = Qxx - Qux.T @ Qi @ Qux
        H = 0.5 * (Hn + Hn.T)
    return dU, K


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from hkdmpc_tpu.ops.pallas_backward import backward_sweep_pallas
    from hkdmpc_tpu.solver import backward, lq as lq_mod, rollout as ro_mod

    _, prob, state, opt = ge._trot_problem(dtype=jnp.float32)

    @jax.jit
    def lq_point(prob, state):
        ro = ro_mod.hybrid_rollout(prob, state, 0.0, True)
        lqd = lq_mod.lq_approximation(prob, ro.X, ro.U, state.constr,
                                      True, True)
        return lqd, ro.defect

    lqd, defect = lq_point(prob, state)
    last = int(ro_mod.last_active_node(prob))

    o_dU, o_K = np_oracle(
        np.asarray(prob.kind), np.asarray(lqd.A), np.asarray(lqd.B),
        np.asarray(lqd.lxx), np.asarray(lqd.luu), np.asarray(lqd.lx),
        np.asarray(lqd.lu), np.asarray(defect), np.asarray(lqd.phix),
        np.asarray(lqd.phixx), 0.0, last)

    scan = jax.jit(lambda: backward.backward_sweep(
        prob, lqd, defect, jnp.float32(0.0), last, aug_sweep=True))
    s = scan()

    with jax.default_matmul_precision("highest"):
        scan_hi = jax.jit(lambda: backward.backward_sweep(
            prob, lqd, defect, jnp.float32(0.0), last, aug_sweep=True))
        sh = scan_hi()

    B = 128
    tile = lambda x: jnp.broadcast_to(x[None], (B,) + x.shape)
    kdU, kK, _, _, kok = jax.jit(
        lambda *a: backward_sweep_pallas(*a, interpret=False))(
        tile(prob.kind), tile(lqd.A), tile(lqd.B), tile(lqd.lxx),
        tile(lqd.luu), tile(lqd.lx), tile(lqd.lu), tile(defect),
        tile(lqd.phix), tile(lqd.phixx), jnp.zeros((B,), jnp.float32),
        jnp.full((B,), last, jnp.int32))

    def rep(name, dU, K):
        eU = np.max(np.abs(np.asarray(dU, np.float64) - o_dU))
        eK = np.max(np.abs(np.asarray(K, np.float64) - o_K))
        print(f"{name:28s} vs f64 oracle: maxerr dU={eU:.3e} K={eK:.3e}")

    rep("scan (default precision)", s[0], s[1])
    rep("scan (highest precision)", sh[0], sh[1])
    rep("pallas kernel", kdU[0], kK[0])


if __name__ == "__main__":
    main()
