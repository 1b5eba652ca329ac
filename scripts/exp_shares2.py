"""In-program shares, round 2 (after the du_eff line-search hoist).

  base     current defaults (du_eff hoist active)
  al0      max_AL_iter=0 -> initial rollout+cost+result assembly only:
           isolates the fixed program overhead (was ~27.6 ms unexplained)
  assoc    assoc-scan linear rollout instead of the sequential scan
  tminor   T-minor cost partials attached (re-measure: the 401-vs-312 ms
           loss predates ops/precise and the Pallas backward's transposes)
"""

import copy
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
    from hkdmpc_tpu.solver.model_api import hkd_model_spec
    from hkdmpc_tpu.ops import hkd_tminor

    B = int(os.environ.get("B", "1024"))
    _, prob, state, opt = ge._trot_problem(dtype=jnp.float32)
    opt_rt = opt.runtime()

    prob_b, state_b = replicate_problem(prob, state, B)
    prob_b = dataclasses.replace(
        prob_b, x0=perturb_scenarios(prob_b, jax.random.PRNGKey(0)).x0)
    prob_b, state_b = jax.device_put((prob_b, state_b))

    # the default model now carries the T-minor cost partials, so 'base'
    # must explicitly detach them for the tminor-vs-base pair to measure
    # partials on vs off (and not noise)
    spec_base = copy.copy(hkd_model_spec())
    spec_base.running_partials_tbatch = None
    spec_base.terminal_partials_tbatch = None
    spec_tm = copy.copy(hkd_model_spec())
    spec_tm.running_partials_tbatch = hkd_tminor.running_partials_tbatch
    spec_tm.terminal_partials_tbatch = hkd_tminor.terminal_partials_tbatch

    variants = {
        "base": (opt_rt, dict(parallel_rollout=True, pallas_backward=True,
                              model=spec_base)),
        "al0": (dataclasses.replace(opt_rt, max_AL_iter=0),
                dict(parallel_rollout=True, pallas_backward=True)),
        "assoc": (opt_rt, dict(parallel_rollout=True, pallas_backward=True,
                               assoc_linear=True)),
        "tminor": (opt_rt, dict(parallel_rollout=True, pallas_backward=True,
                                model=spec_tm)),
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
    print("\n-- deltas --")
    print(f"fixed overhead (al0): {results['al0']*1e3:.1f} ms")
    print(f"per-outer-iter content: {(b - results['al0'])/2*1e3:.1f} ms")
    print(f"assoc linear delta: {(results['assoc'] - b)*1e3:+.1f} ms")
    print(f"tminor partials delta: {(results['tminor'] - b)*1e3:+.1f} ms")


if __name__ == "__main__":
    main()
