"""Probe the remote-TPU tunnel's dispatch pipelining behavior.

exp_prod_attrib round-5 measured: identity passthrough 27 ms/call even
pipelined x10, and the full solve at 80 ms/call pipelined x10 vs 53.8 ms
single-call — pipelining apparently HURTING, which contradicts both the
round-4 model (queued dispatches amortize the RTT) and bench.py's chunked
fleet (4 x 1024 in 148 ms = 37 ms/call). This sweeps queue depth K and
retain-vs-discard of the results to expose the actual dispatch model."""

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
    optr = opt.runtime()

    prob_b, state_b = replicate_problem(prob, state, B)
    prob_b = dataclasses.replace(
        prob_b, x0=perturb_scenarios(prob_b, jax.random.PRNGKey(0)).x0)
    prob_b, state_b = jax.device_put((prob_b, state_b))

    @jax.jit
    def ident(s):
        return jax.tree_util.tree_map(lambda x: x + 1, s)

    def solve():
        return ddp.solve_batch(prob_b, state_b, optr, parallel_rollout=True,
                               kernel_jac=True, unroll_caps=True)

    # tiny identity: 8 floats, measures pure dispatch RTT
    null = jax.jit(lambda x: x + 1)
    z8 = jax.device_put(jnp.zeros(8, jnp.float32))

    def block(o):
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready()
            if hasattr(x, "block_until_ready") else x, o)

    for name, fn in (("null8", lambda: null(z8)), ("ident", lambda: ident(state_b)),
                     ("solve", solve)):
        block(fn())  # compile
        for K in (1, 2, 4, 8, 16):
            for retain in (True, False):
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    if retain:
                        outs = [fn() for _ in range(K)]
                        block(outs[-1])
                    else:
                        out = None
                        for _ in range(K):
                            out = fn()
                        block(out)
                    ts.append((time.perf_counter() - t0) / K * 1e3)
                tag = "retain" if retain else "discard"
                print(f"{name:6s} K={K:2d} {tag:7s} {min(ts):7.2f} ms/call",
                      flush=True)


if __name__ == "__main__":
    main()
