"""Attribute ~100% of the REAL batched solve program's ON-CHIP time.

The round-4 ledger left roughly half of the 55.8 ms batch-1024 program
unattributed and CLAUDE.md/DESIGN disagreed (~11 vs ~27 ms fixed pool).
Both numbers were protocol artifacts: scripts/exp_pipe_probe.py shows the
remote-TPU tunnel (a) streams queued dispatches for free but (b) charges a
~24 ms RPC round trip for EVERY block_until_ready/sync — per *leaf*. The
old single-call ledger numbers therefore carry ~24-50 ms of pure RPC.

This experiment uses the slope protocol, which cancels all of that:
measure total wall for K1 and K2 queued calls blocking on ONE scalar leaf
(execution is in-order, so the last program's cost implies all finished);
true per-call exec = (W(K2) - W(K1)) / (K2 - K1).

Stages, each a REAL ddp.solve_batch production stack (kernel_jac +
unroll_caps + parallel_rollout, runtime caps) with max_AL_iter truncated
to k = 0, 1, 2: k=0 runs initial rollout + cost + trace seed + result
assembly only; T(k) - T(k-1) are whole outer iterations; T(2) is the full
program, so rows sum to 100% of on-chip time by construction.

Within-iteration stage marginals (backward 8.8, line search 2.0, linear
rollout 1.2 ms/iter, exp_prod_decomp_kjac.py) remain valid: duplication
deltas between identically-synced dispatches cancel the RPC cost."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from hkdmpc_tpu.parallel import perturb_scenarios, replicate_problem
    from hkdmpc_tpu.solver import ddp

    B = int(os.environ.get("B", "1024"))
    K1 = int(os.environ.get("K1", "4"))
    K2 = int(os.environ.get("K2", "16"))
    _, prob, state, opt = ge._trot_problem(dtype=jnp.float32)
    optr = opt.runtime()

    prob_b, state_b = replicate_problem(prob, state, B)
    prob_b = dataclasses.replace(
        prob_b, x0=perturb_scenarios(prob_b, jax.random.PRNGKey(0)).x0)
    prob_b, state_b = jax.device_put((prob_b, state_b))

    def slope(fn, one_leaf, label):
        one_leaf(fn()).block_until_ready()  # compile

        def wall(K):
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                out = None
                for _ in range(K):
                    out = fn()
                one_leaf(out).block_until_ready()
                ts.append(time.perf_counter() - t0)
            return min(ts)

        w1, w2 = wall(K1), wall(K2)
        exec_ms = (w2 - w1) / (K2 - K1) * 1e3
        print(f"{label:26s} exec {exec_ms:7.2f} ms/call  "
              f"(W{K1}={w1*1e3:.0f} W{K2}={w2*1e3:.0f}, sync+RTT "
              f"{w1*1e3 - K1*exec_ms:.0f} ms)", flush=True)
        return exec_ms

    # identity floor: touch every SolverState leaf (read + write HBM)
    @jax.jit
    def ident(s):
        return jax.tree_util.tree_map(lambda x: x + 1, s)

    floor = slope(lambda: ident(state_b), lambda s: s.Xbar,
                  "floor (state passthrough)")

    results = {}
    for k in (0, 1, 2):
        ok = dataclasses.replace(optr, max_AL_iter=k)

        def run(ok=ok):
            return ddp.solve_batch(prob_b, state_b, ok,
                                   parallel_rollout=True, kernel_jac=True,
                                   unroll_caps=True)
        results[k] = slope(run, lambda r: r.cost, f"solve max_AL_iter={k}")

    print("\n-- on-chip attribution (slope protocol, sums to T2) --")
    print(f"init+assembly   (T0)      {results[0]:8.2f} ms "
          f"(state passthrough alone: {floor:.2f})")
    print(f"outer iter 1    (T1-T0)   {results[1]-results[0]:8.2f} ms")
    print(f"outer iter 2    (T2-T1)   {results[2]-results[1]:8.2f} ms")
    print(f"full program    (T2)      {results[2]:8.2f} ms "
          f"-> {B / results[2] * 1e3:.0f} solves/s on-chip")


if __name__ == "__main__":
    main()
