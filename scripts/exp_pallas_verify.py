"""TPU verification of the Mosaic-compiled backward-sweep kernel.

1. Direct kernel-vs-scan comparison on identical LQ inputs (f32, real TPU).
2. Per-scenario cost-deviation distribution of full vmapped solves
   (pallas vs scan backward) — decision flips in the line search can amplify
   tiny roundoff into large per-scenario cost differences; quantify.
"""

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from hkdmpc_tpu.ops.pallas_backward import backward_sweep_pallas
    from hkdmpc_tpu.parallel import perturb_scenarios, replicate_problem
    from hkdmpc_tpu.solver import backward, ddp, lq as lq_mod, rollout as ro_mod

    _, prob, state, opt = ge._trot_problem(dtype=jnp.float32)

    # ---- 1. direct kernel vs scan on the same inputs --------------------
    @jax.jit
    def lq_point(prob, state):
        ro = ro_mod.hybrid_rollout(prob, state, 0.0, True)
        lqd = lq_mod.lq_approximation(prob, ro.X, ro.U, state.constr,
                                      True, True)
        return lqd, ro.defect

    lqd, defect = lq_point(prob, state)
    last = ro_mod.last_active_node(prob)
    B = 256
    tile = lambda x: jnp.broadcast_to(x[None], (B,) + x.shape)
    regs = jnp.zeros((B,), jnp.float32).at[1].set(1e-3).at[2].set(0.05)

    kernel = jax.jit(lambda *a: backward_sweep_pallas(*a, interpret=False))
    dU, K, dv1, dv2, ok = kernel(
        tile(prob.kind), tile(lqd.A), tile(lqd.B), tile(lqd.lxx),
        tile(lqd.luu), tile(lqd.lx), tile(lqd.lu), tile(defect),
        tile(lqd.phix), tile(lqd.phixx), regs,
        jnp.full((B,), last, jnp.int32))

    scan = jax.jit(lambda reg: backward.backward_sweep(
        prob, lqd, defect, reg, last, aug_sweep=True))
    for i in (0, 1, 2, 128):
        s = scan(regs[i])
        errK = float(jnp.max(jnp.abs(K[i] - s[1])))
        errU = float(jnp.max(jnp.abs(dU[i] - s[0])))
        print(f"lane {i} reg={float(regs[i]):g}: maxerr K={errK:.3e} "
              f"dU={errU:.3e} ok={bool(ok[i])}=={bool(s[6])}", flush=True)

    # ---- 2. per-scenario cost deviation over full solves -----------------
    chunk = 1024
    opt_rt = opt.runtime()
    prob_b, state_b = replicate_problem(prob, state, chunk)
    prob_b, state_b = jax.device_put((prob_b, state_b))
    prob_b = dataclasses.replace(
        prob_b, x0=perturb_scenarios(prob_b, jax.random.PRNGKey(0)).x0)

    r0 = ddp.solve_batch(prob_b, state_b, opt_rt, parallel_rollout=True,
                         pallas_backward=False)
    r1 = ddp.solve_batch(prob_b, state_b, opt_rt, parallel_rollout=True,
                         pallas_backward=True)
    c0, c1 = np.asarray(r0.cost), np.asarray(r1.cost)
    rel = np.abs(c1 - c0) / (np.abs(c0) + 1e-9)
    q = np.percentile(rel, [50, 90, 99, 100])
    print(f"cost rel dev: p50={q[0]:.2e} p90={q[1]:.2e} p99={q[2]:.2e} "
          f"max={q[3]:.2e}; >1%: {int(np.sum(rel > 0.01))}/{chunk}")
    worst = int(np.argmax(rel))
    print(f"worst scenario {worst}: cost scan={c0[worst]:.4f} "
          f"pallas={c1[worst]:.4f} failed={bool(np.asarray(r0.solve_failed)[worst])}"
          f"/{bool(np.asarray(r1.solve_failed)[worst])} "
          f"iters={int(np.asarray(r0.n_iters)[worst])}/"
          f"{int(np.asarray(r1.n_iters)[worst])}")
    # same comparison scan-vs-scan with a tiny x0 jiggle = chaos yardstick
    x0j = prob_b.x0 + 1e-6 * jax.random.normal(jax.random.PRNGKey(9),
                                               prob_b.x0.shape)
    r2 = solve(dataclasses.replace(prob_b, x0=x0j), state_b, opt_rt, True,
               None, False, True, False)
    c2 = np.asarray(r2.cost)
    rel2 = np.abs(c2 - c0) / (np.abs(c0) + 1e-9)
    q2 = np.percentile(rel2, [50, 90, 99, 100])
    print(f"chaos yardstick (1e-6 x0 jiggle, scan-vs-scan): p50={q2[0]:.2e} "
          f"p90={q2[1]:.2e} p99={q2[2]:.2e} max={q2[3]:.2e}")


if __name__ == "__main__":
    main()
