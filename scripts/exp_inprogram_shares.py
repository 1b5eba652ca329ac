"""In-program cost shares by differential timing.

The per-stage numbers from exp_stage_timing.py run each stage as its own jit
and lose cross-stage fusion, so they do not reflect where the fused solve
program actually spends time. This measures the real shares by compiling
solve variants that each remove/shrink one piece and comparing end-to-end
times at batch 1024 (v5e, f32, runtime caps):

  base     alpha=0.1 -> 3 line-search eps, parallel rollout, pallas backward
  eps1     alpha=1e-4 -> single eps trial   (isolates 2 extra LS rollouts+costs)
  al1      max_AL_iter=1                    (isolates one whole outer iter)
  scanbw   pallas_backward=False            (pallas kernel vs vmapped scan)
  seqroll  parallel_rollout=False           (scan rollout vs shooting-parallel)
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
    _, prob, state, opt = ge._trot_problem(dtype=jnp.float32)
    opt_rt = opt.runtime()

    prob_b, state_b = replicate_problem(prob, state, B)
    prob_b = dataclasses.replace(
        prob_b, x0=perturb_scenarios(prob_b, jax.random.PRNGKey(0)).x0)
    prob_b, state_b = jax.device_put((prob_b, state_b))

    variants = {
        "base": (opt_rt, dict(parallel_rollout=True, pallas_backward=True)),
        "eps1": (dataclasses.replace(opt_rt, alpha=1e-4),
                 dict(parallel_rollout=True, pallas_backward=True)),
        "al1": (dataclasses.replace(opt_rt, max_AL_iter=1),
                dict(parallel_rollout=True, pallas_backward=True)),
        "scanbw": (opt_rt, dict(parallel_rollout=True, pallas_backward=False)),
        "seqroll": (opt_rt, dict(parallel_rollout=False, pallas_backward=True)),
    }

    results = {}
    for name, (o, kw) in variants.items():
        t0 = time.time()
        out = ddp.solve_batch(prob_b, state_b, o, **kw)
        out.cost.block_until_ready()
        compile_s = time.time() - t0
        ts = []
        for _ in range(5):
            t0 = time.time()
            out = ddp.solve_batch(prob_b, state_b, o, **kw)
            out.cost.block_until_ready()
            ts.append(time.time() - t0)
        results[name] = min(ts)
        print(f"{name:8s} {min(ts)*1e3:8.1f} ms  (compile {compile_s:.0f}s, "
              f"mean cost {float(jnp.mean(out.cost)):.6g})", flush=True)

    b = results["base"]
    print("\n-- deltas vs base --")
    if "eps1" in results:
        d = b - results["eps1"]
        print(f"2 extra LS trials (x2 outer iters = 4 rollouts+costs): "
              f"{d*1e3:.1f} ms -> per rollout+cost ~{d/4*1e3:.1f} ms")
    if "al1" in results:
        print(f"one whole outer iter (LQ+bw+lin+LS): "
              f"{(b - results['al1'])*1e3:.1f} ms")
    if "scanbw" in results:
        print(f"pallas backward saves: {(results['scanbw'] - b)*1e3:.1f} ms")
    if "seqroll" in results:
        print(f"parallel rollout saves: {(results['seqroll'] - b)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
