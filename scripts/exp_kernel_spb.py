"""Structural serial-wall experiment: time steps fused per kernel
invocation (round-5 verdict #3, option b).

The in-kernel-jacobian backward kernel executes grid (8 blocks x 75
steps) = 600 sequential invocations per sweep; each invocation carries
fixed overhead (grid-loop bookkeeping, DMA issue/wait, per-kind branch
dispatch) around a ~24-deep pivot chain. HKD_KERNEL_SPB=s fuses s
consecutive transitions into one invocation (grid 600/s steps, fatter
slabs, unchanged math — the substep loop preserves the exact sequential
semantics).

Measures the full production solve_batch (kernel_jac + unroll_caps,
runtime caps, B=1024) with the slope protocol for spb in {1, 2, 4} (for
the 5 -> 3 fused-steps trade of T=75: spb=5 divides exactly; included).
SPB is read at trace time, so each variant clears the jit caches."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from hkdmpc_tpu.ops import pallas_backward as pk
    from hkdmpc_tpu.parallel import perturb_scenarios, replicate_problem
    from hkdmpc_tpu.solver import ddp

    B = int(os.environ.get("B", "1024"))
    K1, K2 = 4, 16
    _, prob, state, opt = ge._trot_problem(dtype=jnp.float32)
    optr = opt.runtime()

    prob_b, state_b = replicate_problem(prob, state, B)
    prob_b = dataclasses.replace(
        prob_b, x0=perturb_scenarios(prob_b, jax.random.PRNGKey(0)).x0)
    prob_b, state_b = jax.device_put((prob_b, state_b))

    def run():
        return ddp.solve_batch(prob_b, state_b, optr, parallel_rollout=True,
                               kernel_jac=True, unroll_caps=True)

    ref_cost = None
    for spb in (1, 2, 4, 5):
        pk.SPB = spb
        ddp.solve_batch.clear_cache()
        jax.clear_caches()
        t0 = time.time()
        r = run()
        r.cost.block_until_ready()
        comp = time.time() - t0
        cost = jax.device_get(r.cost)
        nfail = int(jax.device_get(r.solve_failed).sum())
        if ref_cost is None:
            ref_cost = cost
        import numpy as np
        dev = float(np.max(np.abs(cost - ref_cost)
                           / (np.abs(ref_cost) + 1e-9)))

        def wall(K):
            out = None
            t0 = time.perf_counter()
            for _ in range(K):
                out = run()
            out.cost.block_until_ready()
            return time.perf_counter() - t0

        execs = []
        for _ in range(4):
            w1, w2 = wall(K1), wall(K2)
            execs.append((w2 - w1) / (K2 - K1) * 1e3)
        es = sorted(execs)
        print(f"spb={spb} exec min={es[0]:6.2f} med={es[len(es)//2]:6.2f} "
              f"ms/call (compile {comp:.0f}s, failed={nfail}, "
              f"max cost dev vs spb1 {dev:.2e})", flush=True)
    pk.SPB = 1


if __name__ == "__main__":
    main()
