"""Decide ops/assoc.py (parallel-in-time linear rollout) like pallas_linear:
measure it in the only regimes log-depth parallelism can win —

  1. batch-1 on-chip latency (the fused MPC step's regime: the chip is NOT
     saturated with scenarios, so sequential-scan depth may bound latency);
  2. a long-horizon solve (plan 2.0 s, T=215: the scan is ~3x deeper).

Timing protocol (CLAUDE.md): every dispatch pays the ~30 ms tunnel round
trip, so each measurement runs K back-to-back dispatches (pipelined) and
compares variants by deltas of the per-solve time.

Keep assoc_linear only if it wins one of these; otherwise delete it
(DESIGN.md gets the measurement either way).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(prob, state, opt, reps=5, k=20, **kw):
    import dataclasses

    import jax
    from hkdmpc_tpu.solver import ddp

    def run():
        out = None
        for i in range(k):
            out = ddp.solve_jit(prob, state, opt, **kw)
        out.cost.block_until_ready()
        return out

    t0 = time.time()
    out = run()
    compile_s = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    per_solve_ms = min(ts) / k * 1e3
    return per_solve_ms, compile_s, float(out.cost)


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    for plan, label in [(0.6, "T=75 (MPC horizon)"),
                        (2.0, "T=215 (long horizon)")]:
        _, prob, state, opt = ge._trot_problem(plan_duration=plan,
                                               dtype=jnp.float32)
        opt_rt = opt.runtime()
        print(f"--- plan={plan}s {label} T={prob.kind.shape[0]}", flush=True)
        for name, kw in [
            ("seq-scan linear", dict(parallel_rollout=True,
                                     pallas_backward=True)),
            ("assoc linear", dict(parallel_rollout=True, pallas_backward=True,
                                  assoc_linear=True)),
        ]:
            ms, comp, cost = bench(prob, state, opt_rt, **kw)
            print(f"{name:18s} per-solve {ms:7.2f} ms  compile {comp:5.1f}s "
                  f"cost {cost:.4f}", flush=True)


if __name__ == "__main__":
    main()
