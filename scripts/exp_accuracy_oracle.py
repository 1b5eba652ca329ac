"""Which f32 backward variant is *closer to the truth*? Two-stage harness.

Stage "tpu": run the trot runtime workload (batch N scenarios) with the scan
backward and the Pallas backward, dump per-scenario final costs to an npz.
Stage "cpu": re-run the same scenarios in f64 on CPU (the oracle) and report
each variant's deviation distribution from the oracle.

Usage:  python scripts/exp_accuracy_oracle.py tpu [N]
        python scripts/exp_accuracy_oracle.py cpu
"""

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
NPZ = "/tmp/acc_oracle.npz"


def stage_tpu(n):
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from hkdmpc_tpu.parallel import perturb_scenarios, replicate_problem
    from hkdmpc_tpu.solver import ddp

    _, prob, state, opt = ge._trot_problem(dtype=jnp.float32)
    opt = opt.runtime()
    prob_b, state_b = replicate_problem(prob, state, n)
    prob_b, state_b = jax.device_put((prob_b, state_b))
    x0 = perturb_scenarios(prob_b, jax.random.PRNGKey(0)).x0
    prob_b = dataclasses.replace(prob_b, x0=x0)

    import time

    out = {}
    variants = (("scan", False, None), ("pallas", True, None),
                ("pallas_hp", True, "highest"), ("scan_hp", False, "highest"))
    for name, use_pallas, precision in variants:
        def run():
            if precision is None:
                return ddp.solve_batch(prob_b, state_b, opt,
                                       parallel_rollout=True,
                                       pallas_backward=use_pallas)
            with jax.default_matmul_precision(precision):
                return jax.jit(lambda p, s: jax.vmap(
                    lambda pp, ss: ddp.solve(pp, ss, opt, True,
                                             pallas_backward=use_pallas))(
                    p, s))(prob_b, state_b)
        r = run()
        jax.block_until_ready(r.cost)
        t0 = time.perf_counter()
        r = run()
        jax.block_until_ready(r.cost)
        dt = time.perf_counter() - t0
        out[name] = np.asarray(r.cost)
        out[name + "_failed"] = np.asarray(r.solve_failed)
        print(f"{name}: mean={out[name].mean():.4f} "
              f"max={out[name].max():.4f} "
              f"failed={out[name + '_failed'].sum()} "
              f"time={dt*1e3:.1f}ms", flush=True)
    np.savez(NPZ, x0=np.asarray(x0), **out)
    print(f"wrote {NPZ}")


def stage_cpu():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from hkdmpc_tpu.parallel import replicate_problem
    from hkdmpc_tpu.solver import ddp

    d = np.load(NPZ)
    x0 = d["x0"]
    n = x0.shape[0]

    _, prob, state, opt = ge._trot_problem(dtype=jnp.float64)
    opt = opt.runtime()
    prob_b, state_b = replicate_problem(prob, state, n)
    prob_b = dataclasses.replace(prob_b, x0=jnp.asarray(x0, jnp.float64))

    r = ddp.solve_batch(prob_b, state_b, opt, parallel_rollout=True)
    oracle = np.asarray(r.cost)
    print(f"oracle(f64): mean={oracle.mean():.4f} max={oracle.max():.4f} "
          f"failed={int(np.asarray(r.solve_failed).sum())}")

    for name in ("scan", "pallas", "pallas_hp", "scan_hp"):
        if name not in d:
            continue
        c = d[name]
        rel = np.abs(c - oracle) / (np.abs(oracle) + 1e-9)
        worst = np.argsort(rel)[::-1][:5]
        print(f"{name:6s}: rel-dev vs oracle  p50={np.median(rel):.2e} "
              f"p99={np.percentile(rel, 99):.2e} max={rel.max():.2e} "
              f"n>1%={int((rel > 1e-2).sum())}/{n}")
        for i in worst:
            print(f"   worst s{i}: {name}={c[i]:.4f} oracle={oracle[i]:.4f}")


if __name__ == "__main__":
    if sys.argv[1] == "tpu":
        stage_tpu(int(sys.argv[2]) if len(sys.argv) > 2 else 256)
    else:
        stage_cpu()
