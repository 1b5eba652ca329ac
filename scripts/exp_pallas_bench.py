"""Controlled TPU experiment: backward sweep via Pallas kernel vs XLA scan.

Runs the trot MPC workload (runtime caps, batch=chunk scenarios) twice in one
process — pallas_backward False then True — and reports best-of-3 wall time
plus max |cost| deviation between the two variants (should be ~f32 noise).
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

    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

    _, prob, state, opt = ge._trot_problem(dtype=jnp.float32)
    opt = opt.runtime()
    prob_b, state_b = replicate_problem(prob, state, chunk)
    prob_b, state_b = jax.device_put((prob_b, state_b))
    x0 = perturb_scenarios(prob_b, jax.random.PRNGKey(0)).x0
    prob_b = dataclasses.replace(prob_b, x0=x0)

    solve = lambda p, s, o, pr, up: ddp.solve_batch(
        p, s, o, parallel_rollout=pr, pallas_backward=up)

    results = {}
    for use_pallas in (False, True):
        t0 = time.perf_counter()
        r = solve(prob_b, state_b, opt, True, use_pallas)
        r.cost.block_until_ready()
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = solve(prob_b, state_b, opt, True, None, False, True,
                      use_pallas)
            r.cost.block_until_ready()
            times.append(time.perf_counter() - t0)
        best = min(times)
        results[use_pallas] = (best, np.asarray(r.cost),
                               int(jnp.sum(r.solve_failed)))
        print(f"pallas={use_pallas}: best={best*1e3:.1f}ms "
              f"times={[round(t*1e3,1) for t in times]} "
              f"compile={compile_s:.0f}s failed={results[use_pallas][2]} "
              f"({chunk/best:.0f} solves/s)", flush=True)

    c0, c1 = results[False][1], results[True][1]
    rel = np.max(np.abs(c1 - c0) / (np.abs(c0) + 1e-9))
    print(f"max rel cost deviation pallas-vs-scan: {rel:.3e}")
    print(f"speedup: {results[False][0]/results[True][0]:.3f}x")


if __name__ == "__main__":
    main()
