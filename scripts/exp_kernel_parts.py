"""Size the kernel's serially-dependent elimination chain (diagnostic).

Runs the full production solve_batch (kernel_jac + unroll_caps, runtime
caps, B=1024) with HKD_KERNEL_DIAG as set in the environment ("" = real
kernel, "nopiv" = elimination+back-substitution replaced by a
shape-preserving fake; numerically wrong, structurally identical) and
prints the slope-protocol exec. The delta between the two runs is the
pivot chain's marginal cost — the ceiling for any blocked/recursive
factorization rewrite.

Run:  python scripts/exp_kernel_parts.py
      HKD_KERNEL_DIAG=nopiv python scripts/exp_kernel_parts.py
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
    K1, K2 = 4, 16
    diag = os.environ.get("HKD_KERNEL_DIAG", "")
    _, prob, state, opt = ge._trot_problem(dtype=jnp.float32)
    optr = opt.runtime()

    prob_b, state_b = replicate_problem(prob, state, B)
    prob_b = dataclasses.replace(
        prob_b, x0=perturb_scenarios(prob_b, jax.random.PRNGKey(0)).x0)
    prob_b, state_b = jax.device_put((prob_b, state_b))

    def run():
        return ddp.solve_batch(prob_b, state_b, optr, parallel_rollout=True,
                               kernel_jac=True, unroll_caps=True)

    run().cost.block_until_ready()

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
    print(f"diag={diag or 'off':6s} exec min={es[0]:6.2f} "
          f"med={es[len(es)//2]:6.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
