"""Speed/quality cost of f32 (highest) matmul precision solver-wide on TPU.

Four configs at batch 1024, trot runtime workload:
  A scan   + default precision   (old default)
  B pallas + default precision
  C pallas + highest precision   (rollout/linear-rollout matvecs also f32)
  D scan   + highest precision
Reports best wall time and mean final cost (lower = better convergence per
capped iteration budget).
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from hkdmpc_tpu.parallel import perturb_scenarios, replicate_problem
    from hkdmpc_tpu.solver import ddp

    chunk = 1024
    _, prob, state, opt = ge._trot_problem(dtype=jnp.float32)
    opt = opt.runtime()
    prob_b, state_b = replicate_problem(prob, state, chunk)
    prob_b, state_b = jax.device_put((prob_b, state_b))
    prob_b = dataclasses.replace(
        prob_b, x0=perturb_scenarios(prob_b, jax.random.PRNGKey(0)).x0)

    def bench(use_pallas, precision):
        with jax.default_matmul_precision(precision):
            solve = jax.jit(lambda p, s: jax.vmap(
                lambda pp, ss: ddp.solve(pp, ss, opt, True,
                                         pallas_backward=use_pallas))(p, s))
            r = solve(prob_b, state_b)
            r.cost.block_until_ready()
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                r = solve(prob_b, state_b)
                r.cost.block_until_ready()
                times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"pallas={int(use_pallas)} prec={precision:8s}: "
              f"best={best*1e3:.1f}ms ({chunk/best:.0f}/s) "
              f"mean_cost={float(jnp.mean(r.cost)):.4f} "
              f"p99_cost={float(jnp.percentile(r.cost, 99)):.2f} "
              f"failed={int(jnp.sum(r.solve_failed))}", flush=True)

    bench(False, "default")
    bench(True, "default")
    bench(True, "highest")
    bench(False, "highest")


if __name__ == "__main__":
    main()
