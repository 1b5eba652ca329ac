"""Long-horizon TPU bench point (SURVEY §5 long-horizon scaling).

Solves the 2.0 s trot plan (T=250 flat transitions, ~16 phases) batched on
the real TPU: confirms the flattened graph, Pallas backward grid and VMEM
scratch behave at ~3.3x the MPC horizon, and reports throughput + compile
time + XLA peak-memory against the T=75 default.

Usage: python scripts/exp_longT_bench.py [batch]
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

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    for plan in (0.6, 2.0):
        _, prob, state, opt = ge._trot_problem(plan_duration=plan,
                                               dtype=jnp.float32)
        opt_rt = opt.runtime()
        prob_b, state_b = replicate_problem(prob, state, batch)
        prob_b = dataclasses.replace(
            prob_b, x0=perturb_scenarios(prob_b, jax.random.PRNGKey(0)).x0)
        prob_b, state_b = jax.device_put((prob_b, state_b))

        fn = jax.jit(lambda p, s: jax.vmap(
            lambda pp, ss: ddp.solve(pp, ss, opt_rt, True,
                                     kernel_jac=True))(p, s))
        t0 = time.time()
        lowered = fn.lower(prob_b, state_b)
        compiled = lowered.compile()
        compile_s = time.time() - t0
        mem = compiled.memory_analysis()
        peak = (getattr(mem, "temp_size_in_bytes", 0)
                + getattr(mem, "argument_size_in_bytes", 0)
                + getattr(mem, "output_size_in_bytes", 0))

        out = compiled(prob_b, state_b)
        jax.block_until_ready(out.cost)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = compiled(prob_b, state_b)
            jax.block_until_ready(out.cost)
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        n_failed = int(jnp.sum(out.solve_failed))
        print(f"plan={plan}s T={prob.kind.shape[0]} batch={batch}: "
              f"{t*1e3:.1f} ms -> {batch/t:.0f} solves/s, compile "
              f"{compile_s:.0f}s, peak HBM {peak/1e9:.2f} GB, "
              f"failed {n_failed}/{batch}, mean cost "
              f"{float(jnp.mean(out.cost)):.2f}", flush=True)


if __name__ == "__main__":
    main()
