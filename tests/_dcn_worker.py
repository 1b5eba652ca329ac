"""Worker process for the two-process DCN test (tests/test_parallel.py).

Each process owns 4 virtual CPU devices, joins a jax.distributed cluster,
forms the globally-sharded scenario batch from its local slice, runs
solve_sharded over the global 8-device mesh, and prints the replicated
aggregates as one JSON line. DCN (the coordination service) carries only
the collective scalars — the same layout a real multi-host TPU run uses.

Usage: python tests/_dcn_worker.py <process_id> <num_processes> <port>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hkdmpc_tpu.parallel import (make_mesh, perturb_scenarios,
                                     replicate_problem, solve_sharded)
    from tests.test_solver import make_trot

    assert len(jax.devices()) == 4 * nproc
    pb, x0, opt = make_trot(plan_duration=0.3)
    prob, state = pb.build(x0)

    B = 8
    prob_b, state_b = replicate_problem(prob, state, B)
    prob_b = perturb_scenarios(prob_b, jax.random.PRNGKey(0))

    mesh = make_mesh()
    sharding = NamedSharding(mesh, P("scenario"))
    lo, hi = pid * (B // nproc), (pid + 1) * (B // nproc)

    def to_global(a):
        a = np.asarray(a)
        return jax.make_array_from_process_local_data(
            sharding, np.ascontiguousarray(a[lo:hi]), a.shape)

    prob_g = jax.tree_util.tree_map(to_global, prob_b)
    state_g = jax.tree_util.tree_map(to_global, state_b)

    res, agg = solve_sharded(prob_g, state_g, opt.runtime(), mesh)
    out = {k: float(v) for k, v in agg.items()}
    # local shard of the per-scenario costs, for a stronger cross-check
    out["local_costs"] = [
        float(s.data.sum()) for s in res.cost.addressable_shards]
    out["pid"] = pid
    print("DCN_RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
