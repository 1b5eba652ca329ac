"""Host-dispatch overhead: jit-wrapper calls vs AOT-compiled calls.

The round-5 roofline (AOT `fn.lower().compile()`, called directly)
measured 24.9 ms/call where the identical workload through the
`ddp.solve_batch` jit wrapper measures ~31 ms (slope protocol both) —
implying ~6 ms/call of host-side dispatch work (pytree flatten, kwargs
static hashing, jit cache lookup) that queued streaming does NOT hide
through this tunnel. This measures both paths on the same inputs in one
process, plus the same comparison for the fleet step."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope(run, leaf, reps=4, k1=4, k2=16):
    leaf(run()).block_until_ready()

    def wall(K):
        out = None
        t0 = time.perf_counter()
        for _ in range(K):
            out = run()
        leaf(out).block_until_ready()
        return time.perf_counter() - t0

    es = []
    for _ in range(reps):
        w1, w2 = wall(k1), wall(k2)
        es.append((w2 - w1) / (k2 - k1) * 1e3)
    return sorted(es)


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

    # 1. the production jit-wrapper path (kwargs + static hashing per call)
    def run_wrapper():
        return ddp.solve_batch(prob_b, state_b, optr, parallel_rollout=True,
                               kernel_jac=True, unroll_caps=True)

    es = slope(run_wrapper, lambda r: r.cost)
    print(f"jit wrapper : min={es[0]:6.2f} med={es[len(es)//2]:6.2f} "
          f"ms/call {['%.2f' % e for e in es]}", flush=True)

    # 2. AOT: same function, lowered+compiled once, called directly
    fn = jax.jit(lambda p, s: jax.vmap(
        lambda pp, ss: ddp.solve(pp, ss, optr, True, kernel_jac=True,
                                 unroll_caps=True))(p, s))
    compiled = fn.lower(prob_b, state_b).compile()

    def run_aot():
        return compiled(prob_b, state_b)

    es = slope(run_aot, lambda r: r.cost)
    print(f"AOT compiled: min={es[0]:6.2f} med={es[len(es)//2]:6.2f} "
          f"ms/call {['%.2f' % e for e in es]}", flush=True)

    # 3. positional jit wrapper without kwargs (isolates kwarg cost)
    jit_pos = jax.jit(lambda p, s: jax.vmap(
        lambda pp, ss: ddp.solve(pp, ss, optr, True, kernel_jac=True,
                                 unroll_caps=True))(p, s))

    def run_pos():
        return jit_pos(prob_b, state_b)

    es = slope(run_pos, lambda r: r.cost)
    print(f"jit no-kwarg: min={es[0]:6.2f} med={es[len(es)//2]:6.2f} "
          f"ms/call {['%.2f' % e for e in es]}", flush=True)


if __name__ == "__main__":
    main()
