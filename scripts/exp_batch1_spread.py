"""Batch-1 MPC-latency margin with run-to-run spread (round-5 verdict #4).

The round-4 claim — bare solve 8.88 ms on-chip vs the 10 ms budget
(HKDMPC.cpp:26-29) — was single-sourced. This re-measures the MPC default
stack (assoc_linear + assoc_backward, runtime caps, f32) with the
pipelined-dispatch protocol (K=20 back-to-back solves amortize the ~30 ms
tunnel) and reports EVERY repetition, so the margin carries a variance
bound; plus the al0/al1 truncations to re-split fixed vs per-iteration
work after the trace-buffer right-sizing (ddp.trace_len_for)."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from hkdmpc_tpu.solver import ddp

    k = int(os.environ.get("K", "20"))
    reps = int(os.environ.get("REPS", "8"))
    _, prob, state, opt = ge._trot_problem(dtype=jnp.float32)
    optr = opt.runtime()
    prob, state = jax.device_put((prob, state))

    def loop(fn):
        def run():
            out = None
            for _ in range(k):
                out = fn()
            return out.cost
        return run

    variants = {
        "default(assoc_bw)": loop(lambda: ddp.solve_jit(
            prob, state, optr, True, assoc_linear=True, assoc_backward=True)),
        "al1": loop(lambda: ddp.solve_jit(
            prob, state, dataclasses.replace(optr, max_AL_iter=1), True,
            assoc_linear=True, assoc_backward=True)),
        "al0": loop(lambda: ddp.solve_jit(
            prob, state, dataclasses.replace(optr, max_AL_iter=0), True,
            assoc_linear=True, assoc_backward=True)),
    }

    for name, run in variants.items():
        t0 = time.time()
        jax.block_until_ready(run())
        comp = time.time() - t0
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(run())
            ts.append((time.perf_counter() - t0) / k * 1e3)
        ts_s = sorted(ts)
        print(f"{name:18s} min={ts_s[0]:6.2f} med={ts_s[len(ts)//2]:6.2f} "
              f"max={ts_s[-1]:6.2f} ms/solve (compile {comp:.0f}s) "
              f"all={[round(t, 2) for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
