"""Per-stage wall times of the batched solve at the current TPU default.

Times each solver stage as its own jitted program (batch = chunk, trot
runtime workload): parallel hybrid rollout, cost eval, LQ approximation,
backward sweep (pallas and scan), linear rollout. Separate jits lose
cross-stage fusion, so treat these as magnitudes, not an exact decomposition
of bench.py's end-to-end number.
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax_block(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax_block(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def jax_block(out):
    import jax
    for leaf in jax.tree_util.tree_leaves(out):
        leaf.block_until_ready()


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from hkdmpc_tpu.parallel import perturb_scenarios, replicate_problem
    from hkdmpc_tpu.solver import backward, ddp, lq as lq_mod, rollout as ro_mod
    from hkdmpc_tpu.solver.model_api import hkd_model_spec

    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    model = hkd_model_spec()

    _, prob, state, opt = ge._trot_problem(dtype=jnp.float32)
    opt = opt.runtime()
    prob_b, state_b = replicate_problem(prob, state, chunk)
    prob_b, state_b = jax.device_put((prob_b, state_b))
    prob_b = dataclasses.replace(
        prob_b, x0=perturb_scenarios(prob_b, jax.random.PRNGKey(0)).x0)

    # representative mid-solve state: take the real solve's output state
    solve = lambda: ddp.solve_batch(prob_b, state_b, opt,
                                    parallel_rollout=True,
                                    pallas_backward=True)
    res = solve()
    st_b = res.state
    jax_block(st_b)
    t_solve = timeit(solve)
    print(f"end-to-end solve           : {t_solve*1e3:7.1f} ms", flush=True)

    eps0 = jnp.zeros((), jnp.float32)

    roll = jax.jit(jax.vmap(
        lambda p, s: ro_mod.hybrid_rollout_parallel(p, s, eps0, model)))
    ro = roll(prob_b, st_b)
    t = timeit(roll, prob_b, st_b)
    print(f"parallel hybrid rollout    : {t*1e3:7.1f} ms  (x7/solve: initial + 2 LS x 3 eps)", flush=True)

    cost = jax.jit(jax.vmap(
        lambda p, X, U, c: ro_mod.compute_cost(p, X, U, c, True, True, model)))
    t = timeit(cost, prob_b, ro.X, ro.U, st_b.constr)
    print(f"cost eval                  : {t*1e3:7.1f} ms  (x9/solve)", flush=True)

    lqf = jax.jit(jax.vmap(
        lambda p, X, U, c: lq_mod.lq_approximation(p, X, U, c, True, True,
                                                   model)))
    lqd = lqf(prob_b, ro.X, ro.U, st_b.constr)
    t = timeit(lqf, prob_b, ro.X, ro.U, st_b.constr)
    print(f"LQ approximation           : {t*1e3:7.1f} ms  (x2/solve)", flush=True)

    last_node = jax.vmap(ro_mod.last_active_node)(prob_b)
    reg = jnp.zeros((chunk,), jnp.float32)

    from hkdmpc_tpu.ops.pallas_backward import backward_sweep_pallas
    bwp = jax.jit(lambda lq, d, r, ln: backward_sweep_pallas(
        prob_b.kind, lq.A, lq.B, lq.lxx, lq.luu, lq.lx, lq.lu, d,
        lq.phix, lq.phixx, r, ln))
    t = timeit(bwp, lqd, ro.defect, reg, last_node)
    print(f"backward sweep (pallas)    : {t*1e3:7.1f} ms  (x2/solve)", flush=True)

    bws = jax.jit(jax.vmap(
        lambda p, lq, d, r, ln: backward.backward_sweep(p, lq, d, r, ln, True)))
    t = timeit(bws, prob_b, lqd, ro.defect, reg, last_node)
    print(f"backward sweep (scan)      : {t*1e3:7.1f} ms", flush=True)

    dU, K, dv1, dv2, ok = bwp(lqd, ro.defect, reg, last_node)
    st2 = dataclasses.replace(st_b, dU=dU, K=K)
    lin = jax.jit(jax.vmap(
        lambda p, s, lq, d: ro_mod.linear_rollout(p, s, lq, d, 1.0)))
    t = timeit(lin, prob_b, st2, lqd, ro.defect)
    print(f"linear rollout (scan)      : {t*1e3:7.1f} ms  (x2/solve)", flush=True)


if __name__ == "__main__":
    main()
