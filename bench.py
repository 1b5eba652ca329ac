"""Benchmark: batched HS-DDP solves/s/chip on the trot MPC workload.

Workload = BASELINE.json config 5: perturbed-initial-state MPC scenarios,
runtime iteration caps (max_AL_iter=2, max_DDP_iter=1 — the reference's MPC
hot path, HKDMPC.cpp:102-103), full 0.6 s / 60-step multi-phase horizon,
float32 on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline: reference target is >10k solves/s on a v5p-16 slice
(BASELINE.md) = 1250 solves/s/chip; vs_baseline = value / 1250.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    # per-call chunk: (B, T, 24, 24) HLO temps tile-pad 5.3x on TPU; 1024
    # scenarios/call fits v5e HBM comfortably and already saturates the chip.
    chunk = min(batch, int(os.environ.get("BENCH_CHUNK", "1024")))

    import __graft_entry__ as ge
    from hkdmpc_tpu.parallel import perturb_scenarios, replicate_problem
    from hkdmpc_tpu.solver import ddp

    _, prob, state, opt = ge._trot_problem(dtype=jnp.float32)
    opt = opt.runtime()

    import dataclasses
    prob_b, state_b = replicate_problem(prob, state, chunk)
    prob_b, state_b = jax.device_put((prob_b, state_b))
    x0s = [perturb_scenarios(prob_b, jax.random.PRNGKey(i)).x0
           for i in range(batch // chunk)]

    # Pallas backward sweep: measured 1.34x end-to-end on v5e (224 vs 302 ms
    # at batch 1024) and *more* accurate than the scan at default matmul
    # precision (the scan's bf16 MXU passes cost ~2% mean final cost; the
    # kernel's explicit f32 FMAs match the precision="highest" result to 1e-7
    # — scripts/exp_precision_bench.py). TPU f32 only.
    use_pallas = (jax.default_backend() != "cpu"
                  and os.environ.get("BENCH_PALLAS", "1") == "1")
    solve = jax.jit(
        jax.vmap(ddp.solve, in_axes=(0, 0, None, None, None, None, None, None)),
        static_argnames=("opt", "parallel_rollout", "model", "assoc_linear",
                         "aug_sweep", "pallas_backward"))

    def run_all():
        out = [solve(dataclasses.replace(prob_b, x0=x0), state_b, opt, True,
                     None, False, True, use_pallas)
               for x0 in x0s]
        out[-1].cost.block_until_ready()
        return out

    # warmup / compile
    results = run_all()
    n_failed = sum(int(jnp.sum(r.solve_failed)) for r in results)
    mean_cost = float(np.mean([float(jnp.mean(r.cost)) for r in results]))

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        results = run_all()
        times.append(time.perf_counter() - t0)

    best = min(times)
    solves_per_s = batch / best
    out = {
        "metric": "hsddp_solves_per_s_per_chip",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 1250.0, 3),
    }
    print(json.dumps(out))
    print(f"# batch={batch} best={best*1e3:.1f}ms times_ms="
          f"{[round(t*1e3,1) for t in times]} mean_cost={mean_cost:.2f} "
          f"failed={n_failed} device={jax.devices()[0].device_kind}",
          file=sys.stderr)

    if os.environ.get("BENCH_LATENCY"):
        # single-scenario MPC re-solve latency (p50) — the reference's
        # real-time budget is 10 ms per re-solve (HKDMPC.cpp:26-29)
        from hkdmpc_tpu.solver.ddp import solve_jit
        prob1 = jax.tree_util.tree_map(lambda a: a[0], prob_b)
        state1 = jax.tree_util.tree_map(lambda a: a[0], state_b)
        r = solve_jit(prob1, state1, opt, True)
        r.cost.block_until_ready()
        lats = []
        for _ in range(50):
            t0 = time.perf_counter()
            r = solve_jit(prob1, state1, opt, True)
            r.cost.block_until_ready()
            lats.append(time.perf_counter() - t0)
        lats.sort()
        print(f"# single-solve latency p50={lats[25]*1e3:.2f}ms "
              f"p90={lats[45]*1e3:.2f}ms", file=sys.stderr)


if __name__ == "__main__":
    main()
