"""Quantify the batched solve's fixed (non-iteration) cost.

In-program decomposition: base (2 outer iters) 86.5 ms, one iter 30.4 ms
-> ~25 ms is NOT iteration work. This measures what that floor is made of:

  al0      max_AL_iter=0: initial rollout + cost + result assembly only
  ident    jit identity on (prob_b, state_b): pure buffer-touch floor
  rollout1 initial parallel rollout + cost alone (no solve scaffolding)

Usage: python scripts/exp_fixed_floor.py [batch]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args):
    out = fn(*args)
    import jax
    jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from hkdmpc_tpu.parallel import perturb_scenarios, replicate_problem
    from hkdmpc_tpu.solver import ddp, rollout as ro_mod

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    _, prob, state, opt = ge._trot_problem(dtype=jnp.float32)
    opt_rt = opt.runtime()
    prob_b, state_b = replicate_problem(prob, state, batch)
    prob_b = dataclasses.replace(
        prob_b, x0=perturb_scenarios(prob_b, jax.random.PRNGKey(0)).x0)
    prob_b, state_b = jax.device_put((prob_b, state_b))

    base = lambda: ddp.solve_batch(prob_b, state_b, opt_rt, True,
                                   kernel_jac=True)
    al0 = lambda: ddp.solve_batch(
        prob_b, state_b, dataclasses.replace(opt_rt, max_AL_iter=0), True,
        kernel_jac=True)
    ident = jax.jit(lambda p, s: jax.tree_util.tree_map(lambda a: a + 0.0,
                                                        (p, s)))

    def ro1(p, s):
        def one(pp, ss):
            ro = ro_mod.hybrid_rollout_parallel(pp, ss, 0.0)
            c, (g, h) = ro_mod.compute_cost(pp, ro.X, ro.U, ss.constr,
                                            True, True)
            return c, ro.defect
        return jax.vmap(one)(p, s)

    ro1_j = jax.jit(ro1)

    print(f"base (2 iters): {timeit(base):8.1f} ms")
    print(f"al0  (0 iters): {timeit(al0):8.1f} ms")
    print(f"identity copy : {timeit(lambda: ident(prob_b, state_b)):8.1f} ms")
    print(f"rollout+cost  : {timeit(lambda: ro1_j(prob_b, state_b)):8.1f} ms")


if __name__ == "__main__":
    main()
