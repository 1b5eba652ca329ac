"""Attribute ~100% of the REAL batched solve program's time.

The round-4 ledger left roughly half of the 55.8 ms batch-1024 program
unattributed and CLAUDE.md/DESIGN disagreed (~11 vs ~27 ms fixed pool).
This experiment settles it with real programs, not emulations:

- T(k): the ACTUAL ddp.solve_batch production stack (kernel_jac +
  unroll_caps + parallel_rollout, runtime caps) with max_AL_iter
  truncated to k = 0, 1, 2. k=0 runs the initial rollout + cost +
  trace seed + result assembly only; deltas T(k) - T(k-1) are whole
  outer iterations. By construction T(2) is the full program, so the
  rows sum to 100%.
- floor: an identity-plus-one passthrough of the same SolverState batch
  (dispatch + HBM read/write of the state, no solve).
- every timing is PIPELINED (K calls queued back-to-back, block at the
  end): single dispatches include the ~25-30 ms remote-TPU tunnel RTT,
  which is exactly the bias that produced the 11-vs-27 contradiction
  (the 51.1/55.8 ms single-call ledger numbers carry the floor; the
  bench's chunked fleet pipelines it away).

Within-iteration stage marginals (backward 8.8, line search 2.0, linear
rollout 1.2 ms/iter) come from the duplication-delta protocol
(exp_prod_decomp_kjac.py) and are floor-free by construction (deltas of
same-shaped dispatches).
"""

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
    K = int(os.environ.get("K", "10"))
    _, prob, state, opt = ge._trot_problem(dtype=jnp.float32)
    optr = opt.runtime()

    prob_b, state_b = replicate_problem(prob, state, B)
    prob_b = dataclasses.replace(
        prob_b, x0=perturb_scenarios(prob_b, jax.random.PRNGKey(0)).x0)
    prob_b, state_b = jax.device_put((prob_b, state_b))

    def timed(fn, label):
        out = fn()
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
            else x, out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            outs = [fn() for _ in range(K)]
            jax.tree_util.tree_map(
                lambda x: x.block_until_ready()
                if hasattr(x, "block_until_ready") else x, outs[-1])
            ts.append((time.perf_counter() - t0) / K)
        best = min(ts) * 1e3
        print(f"{label:26s} {best:8.2f} ms/call (pipelined x{K}, best of 5)",
              flush=True)
        return best

    # identity floor: touch every SolverState leaf (read + write HBM)
    @jax.jit
    def ident(s):
        return jax.tree_util.tree_map(lambda x: x + 1, s)

    floor = timed(lambda: ident(state_b), "floor (state passthrough)")

    results = {}
    for k in (0, 1, 2):
        ok = dataclasses.replace(optr, max_AL_iter=k)

        def run(ok=ok):
            return ddp.solve_batch(prob_b, state_b, ok,
                                   parallel_rollout=True, kernel_jac=True,
                                   unroll_caps=True)
        results[k] = timed(run, f"solve max_AL_iter={k}")

    # single-dispatch reference for the full program (the old ledger's
    # protocol) to expose the tunnel-floor bias explicitly
    def run_full():
        return ddp.solve_batch(prob_b, state_b, optr, parallel_rollout=True,
                               kernel_jac=True, unroll_caps=True)
    run_full()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        r = run_full()
        r.cost.block_until_ready()
        ts.append(time.perf_counter() - t0)
    single = min(ts) * 1e3
    print(f"{'solve full, single-call':26s} {single:8.2f} ms (old ledger "
          f"protocol)", flush=True)

    print("\n-- attribution (pipelined, sums to the full program) --")
    print(f"init+assembly   (T0)      {results[0]:8.2f} ms "
          f"(of which ~{floor:.1f} state-passthrough floor)")
    print(f"outer iter 1    (T1-T0)   {results[1]-results[0]:8.2f} ms")
    print(f"outer iter 2    (T2-T1)   {results[2]-results[1]:8.2f} ms")
    print(f"full program    (T2)      {results[2]:8.2f} ms")
    print(f"single-call bias          {single - results[2]:8.2f} ms "
          f"(tunnel RTT hidden in old single-dispatch ledger numbers)")


if __name__ == "__main__":
    main()
