"""Batch-1 on-chip latency decomposition (round-4 verdict #3).

BENCH_r03: fused-step p50 33.9 ms minus dispatch floor 24.3 ms ~ 9.6 ms
on-chip+host against the 10 ms budget (HKDMPC.cpp:26-29) — and the docs
said ~7 ms. This measures where the batch-1 solve's time actually goes,
with the pipelined-dispatch protocol (K back-to-back solves amortize the
~30 ms tunnel; compare variants by per-solve deltas):

  assoc      solve_jit, assoc_linear backward+linear (the MPC default)
  scan       solve_jit, sequential scan everywhere (no assoc)
  kjac_b1    solve_batch at B=1: engages the Pallas kernel via the
             custom_vmap batched rule (one 128-lane block, grid (1,T))
  al1        assoc with max_AL_iter=1 (splits fixed vs per-iteration work)
  al0        max_AL_iter=0 (initial rollout + cost + assembly floor)
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(run, reps=5, k=20):
    import jax

    t0 = time.time()
    out = run()
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        ts.append(time.perf_counter() - t0)
    return min(ts) / k * 1e3, compile_s


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from hkdmpc_tpu.parallel import replicate_problem
    from hkdmpc_tpu.solver import ddp

    k = int(os.environ.get("K", "20"))
    _, prob, state, opt = ge._trot_problem(dtype=jnp.float32)
    optr = opt.runtime()
    prob, state = jax.device_put((prob, state))
    prob_b, state_b = jax.device_put(replicate_problem(prob, state, 1))

    def loop(fn):
        def run():
            out = None
            for _ in range(k):
                out = fn()
            return out.cost
        return run

    variants = {
        "assoc": loop(lambda: ddp.solve_jit(prob, state, optr, True,
                                            assoc_linear=True)),
        # + parallel-in-time Riccati backward (the MPC default on TPU):
        # 10.2 -> 8.9 ms at T=75, 30.7 -> 10.6 at T=215 (round 4)
        "assoc_bw": loop(lambda: ddp.solve_jit(prob, state, optr, True,
                                               assoc_linear=True,
                                               assoc_backward=True)),
        "scan": loop(lambda: ddp.solve_jit(prob, state, optr, True)),
        "kjac_b1": loop(lambda: ddp.solve_batch(prob_b, state_b, optr, True,
                                                kernel_jac=True)),
    }
    opt1 = dataclasses.replace(optr, max_AL_iter=1)
    opt0 = dataclasses.replace(optr, max_AL_iter=0)
    variants["al1"] = loop(lambda: ddp.solve_jit(prob, state, opt1, True,
                                                 assoc_linear=True))
    variants["al0"] = loop(lambda: ddp.solve_jit(prob, state, opt0, True,
                                                 assoc_linear=True))

    for name, run in variants.items():
        ms, comp = bench(run, k=k)
        print(f"{name:8s} {ms:7.2f} ms/solve (compile {comp:.0f}s)",
              flush=True)

    # backward-scan unroll variants (amortize per-step scan overhead):
    # monkeypatching SCAN_UNROLL changes the traced program, so clear the
    # jit cache once per variant to force a retrace
    from hkdmpc_tpu.solver import backward as bw_mod

    run_assoc = loop(lambda: ddp.solve_jit(prob, state, optr, True,
                                           assoc_linear=True))
    for n in (2, 5):
        bw_mod.SCAN_UNROLL = n
        ddp.solve_jit.clear_cache()
        ms, comp = bench(run_assoc, k=k)
        print(f"assoc_u{n} {ms:7.2f} ms/solve (compile {comp:.0f}s)",
              flush=True)
    bw_mod.SCAN_UNROLL = 1


if __name__ == "__main__":
    main()
