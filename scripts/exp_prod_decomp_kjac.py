"""Production-program stage decomposition for the kernel_jac default stack.

Same duplication-delta method as exp_prod_decomp.py (duplicate one stage
with a runtime-zero input perturbation so XLA cannot CSE it, average the
outputs — a runtime no-op — and read the marginal cost off the wall clock),
but emulating the CURRENT default inner iteration: in-kernel-jacobian
Pallas backward (riccati_backward_hkd — lq materializes nothing), jvp
linear rollout with the closed-form dv quadform, parallel line search.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from hkdmpc_tpu.ops import precise
    from hkdmpc_tpu.parallel import perturb_scenarios, replicate_problem
    from hkdmpc_tpu.solver import backward, lq as lq_mod, rollout as ro_mod
    from hkdmpc_tpu.solver.model_api import hkd_model_spec

    B = int(os.environ.get("B", "1024"))
    N_ITERS = 2  # runtime caps: max_AL_iter=2, max_DDP_iter=1
    _, prob, state, opt = ge._trot_problem(dtype=jnp.float32)
    model = hkd_model_spec()

    prob_b, state_b = replicate_problem(prob, state, B)
    prob_b = dataclasses.replace(
        prob_b, x0=perturb_scenarios(prob_b, jax.random.PRNGKey(0)).x0)
    prob_b, state_b = jax.device_put((prob_b, state_b))
    eps_ls = jnp.asarray(opt.line_search_epsilons, jnp.float32)

    def emulated_solve(prob, state, z, dup):
        import dataclasses as dc
        last_node = ro_mod.last_active_node(prob)

        def avg(a, b):
            return jax.tree_util.tree_map(lambda x, y: 0.5 * (x + y), a, b)

        ro = ro_mod.hybrid_rollout_parallel(prob, state, 0.0, model)
        state = dc.replace(state, Xbar=ro.X, Ubar=ro.U, defect_bar=ro.defect)
        X, U, defect = ro.X, ro.U, ro.defect
        cost = jnp.zeros((), jnp.float32)
        for _ in range(N_ITERS):
            cost, (g, h) = ro_mod.compute_cost(prob, X, U, state.constr,
                                               True, True, model)
            if dup == "cost":
                cost2, _ = ro_mod.compute_cost(prob, X + z, U + z,
                                               state.constr, True, True,
                                               model)
                cost = 0.5 * (cost + cost2)
            lqd = lq_mod.lq_approximation(prob, X, U, state.constr, True,
                                          True, model, skip_ab=True,
                                          skip_partials=True)
            kj = (X, U, state.constr.reb_delta, state.constr.reb_eps,
                  state.constr.al_sigma, state.constr.al_lambda)
            bw = backward.backward_sweep_regularized(
                prob, lqd, defect, 0.0, opt.update_regularization,
                last_node, True, False, kernel_jac_XU=kj)
            if dup == "bw":
                bw2 = backward.backward_sweep_regularized(
                    prob, lqd, defect + z, 0.0, opt.update_regularization,
                    last_node, True, False, kernel_jac_XU=kj)
                bw = avg(bw[:5], bw2[:5]) + bw[5:]
            dU, K = bw[0], bw[1]
            state = dc.replace(state, dU=dU, K=K)
            dX, dv1, dv2 = ro_mod.linear_rollout_jvp(
                prob, state, X, U, lqd, defect, 1.0, model,
                use_closed_dv=True)
            if dup == "lin":
                dX2, dv1b, dv2b = ro_mod.linear_rollout_jvp(
                    prob, state, X, U, lqd, defect + z, 1.0, model,
                    use_closed_dv=True)
                dX = 0.5 * (dX + dX2)
            state = dc.replace(state, dX=dX)

            du_eff = state.dU + precise.mv(state.K, state.dX[:-1])

            def trial(eps):
                ro_t = ro_mod.hybrid_rollout_parallel(prob, state, eps, model,
                                                      du_eff=du_eff)
                cost_t, _ = ro_mod.compute_cost(
                    prob, ro_t.X, ro_t.U, state.constr, True, True, model)
                return cost_t, ro_t

            costs_t, ros = jax.vmap(trial)(eps_ls)
            if dup == "ls":
                costs_t2, _ = jax.vmap(trial)(eps_ls + z)
                costs_t = 0.5 * (costs_t + costs_t2)
            idx = jnp.argmin(costs_t)
            ro_sel = jax.tree_util.tree_map(lambda a: a[idx], ros)
            X, U, defect = ro_sel.X, ro_sel.U, ro_sel.defect
            state = dc.replace(state, Xbar=X, Ubar=U, defect_bar=defect)
            cost = costs_t[idx]
        return cost

    fn = jax.jit(jax.vmap(emulated_solve, in_axes=(0, 0, None, None)),
                 static_argnames=("dup",))
    z = jnp.zeros((), jnp.float32)

    results = {}
    for dup in (None, "cost", "bw", "lin", "ls"):
        t0 = time.time()
        out = fn(prob_b, state_b, z, dup)
        out.block_until_ready()
        comp = time.time() - t0
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn(prob_b, state_b, z, dup).block_until_ready()
            ts.append(time.perf_counter() - t0)
        results[dup] = min(ts)
        print(f"dup={str(dup):5s} {min(ts)*1e3:8.1f} ms (compile {comp:.0f}s, "
              f"mean cost {float(jnp.mean(out)):.6g})", flush=True)

    base = results[None]
    print(f"\n-- marginal in-program cost per stage (x{N_ITERS} iters) --")
    for dup in ("cost", "bw", "lin", "ls"):
        d = (results[dup] - base) * 1e3
        print(f"{dup:4s}: {d:6.1f} ms total, {d/N_ITERS:6.1f} ms/iter",
              flush=True)


if __name__ == "__main__":
    main()
