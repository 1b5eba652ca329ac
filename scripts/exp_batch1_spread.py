"""Batch-1 MPC-latency margin with run-to-run spread (round-5 verdict #4).

The round-4 claim — bare solve 8.88 ms on-chip vs the 10 ms budget
(HKDMPC.cpp:26-29) — was single-sourced AND carried protocol bias: the
K=20 pipeline still pays flush+sync RPC (~48 ms, exp_pipe_probe.py) =
~2.4 ms/solve inside the old number. This re-measures the MPC default
stack (assoc_linear + assoc_backward, runtime caps, f32) with the SLOPE
protocol (exec = (W(K2)-W(K1))/(K2-K1), one-leaf sync — cancels all RPC)
and reports EVERY repetition of the slope, so the margin carries a
variance bound; plus the al0/al1 truncations to re-split fixed vs
per-iteration work after the trace-buffer right-sizing
(ddp.trace_len_for)."""

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

    k1 = int(os.environ.get("K1", "8"))
    k2 = int(os.environ.get("K2", "40"))
    reps = int(os.environ.get("REPS", "8"))
    _, prob, state, opt = ge._trot_problem(dtype=jnp.float32)
    optr = opt.runtime()
    prob, state = jax.device_put((prob, state))

    def make(fn):
        def wall(K):
            out = None
            t0 = time.perf_counter()
            for _ in range(K):
                out = fn()
            out.cost.block_until_ready()
            return time.perf_counter() - t0
        return wall

    variants = {
        "default(assoc_bw)": make(lambda: ddp.solve_jit(
            prob, state, optr, True, assoc_linear=True, assoc_backward=True)),
        "al1": make(lambda: ddp.solve_jit(
            prob, state, dataclasses.replace(optr, max_AL_iter=1), True,
            assoc_linear=True, assoc_backward=True)),
        "al0": make(lambda: ddp.solve_jit(
            prob, state, dataclasses.replace(optr, max_AL_iter=0), True,
            assoc_linear=True, assoc_backward=True)),
    }

    for name, wall in variants.items():
        t0 = time.time()
        wall(1)  # compile
        comp = time.time() - t0
        execs = []
        for _ in range(reps):
            w1 = wall(k1)
            w2 = wall(k2)
            execs.append((w2 - w1) / (k2 - k1) * 1e3)
        es = sorted(execs)
        print(f"{name:18s} exec min={es[0]:6.2f} med={es[len(es)//2]:6.2f} "
              f"max={es[-1]:6.2f} ms/solve (compile {comp:.0f}s) "
              f"all={[round(t, 2) for t in execs]}", flush=True)


if __name__ == "__main__":
    main()
