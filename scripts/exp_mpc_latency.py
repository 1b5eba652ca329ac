"""Batch-1 MPC latency decomposition on the current backend.

Times each stage of one HKDMPCSolver.update() against the 10 ms real-time
budget implied by the reference's 100 Hz loop (HKDMPC.cpp:26-29):

  update    : host receding-horizon bookkeeping (numpy)
  build     : flatten to ProblemData/SolverState (host loop + H2D transfers)
  solve     : jitted DDP dispatch + block_until_ready
  unflatten : D2H transfer + scatter back into per-phase arrays
  command   : make_command packing
  null-jit  : round-trip of a trivial jitted program (dispatch floor)

Run on TPU:  python scripts/exp_mpc_latency.py
Run on CPU:  python scripts/exp_mpc_latency.py cpu
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_DATA = "/root/reference/Reference/Data/trot/quad_reference.csv"
REF_SETTINGS = "/root/reference/HKDMPC/settings/ddp_setting.info"
REF_CPARAMS = "/root/reference/HKDMPC/settings/constraint_params.info"


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        dtype_arg = {}
    else:
        dtype_arg = {}
    import jax
    import jax.numpy as jnp

    on_cpu = jax.default_backend() == "cpu"
    dtype = jnp.float64 if on_cpu else jnp.float32
    print(f"backend={jax.default_backend()} dtype={dtype.__name__}", flush=True)

    from hkdmpc_tpu.mpc.solver import HKDMPCSolver, MPCConfig
    from hkdmpc_tpu.solver import ddp

    solver = HKDMPCSolver(REF_DATA, REF_SETTINGS, REF_CPARAMS, MPCConfig(),
                          dtype=dtype)
    solver.initialize()

    # trivial jit round trip = dispatch floor
    null = jax.jit(lambda x: x + 1)
    null(jnp.zeros(8, dtype)).block_until_ready()

    # one warm update to compile the runtime-caps program
    meas = dict(rpy=np.zeros(3), p=np.array([0.0, 0.0, 0.25]),
                v=np.zeros(3), omega=np.zeros(3),
                qJ=np.tile([0.0, -0.8, 1.6], 4))
    solver.update(mpc_time=0.0, **meas)

    stages = {k: [] for k in ("update", "build", "solve", "unflatten",
                              "command", "null", "total")}
    n_steps = 30
    for step in range(n_steps):
        t_all0 = time.perf_counter()
        t0 = time.perf_counter()
        solver.problem.update(solver.cfg.nsteps_between_mpc)
        stages["update"].append(time.perf_counter() - t0)

        contact = solver.problem.phases[0].contact
        x0 = solver.hkd_state_from_measurements(contact=contact, **meas)
        t0 = time.perf_counter()
        prob, state = solver.problem.build(x0)
        jax.block_until_ready((prob, state))
        stages["build"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        res = ddp.solve_jit(prob, state, solver.opt.runtime(),
                            solver.problem.all_shooting())
        jax.block_until_ready(res)
        stages["solve"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        solver.problem.unflatten(res.state)
        stages["unflatten"].append(time.perf_counter() - t0)
        solver.last_result = res

        t0 = time.perf_counter()
        solver.update_foot_placement()
        cmd = solver.make_command()
        stages["command"].append(time.perf_counter() - t0)
        stages["total"].append(time.perf_counter() - t_all0)

        t0 = time.perf_counter()
        null(jnp.zeros(8, dtype)).block_until_ready()
        stages["null"].append(time.perf_counter() - t0)

    print(f"{'stage':<10} {'p50 ms':>8} {'p90 ms':>8} {'min ms':>8}")
    for k, v in stages.items():
        a = np.asarray(v) * 1e3
        print(f"{k:<10} {np.percentile(a, 50):8.2f} "
              f"{np.percentile(a, 90):8.2f} {a.min():8.2f}", flush=True)

    # ---- device-resident fused path (mpc/fused.py) -------------------------
    fsolver = HKDMPCSolver(REF_DATA, REF_SETTINGS, REF_CPARAMS,
                           MPCConfig(fused_step=True), dtype=dtype)
    fsolver.initialize()
    fsolver.update(mpc_time=0.0, **meas)  # compile
    fstages = {k: [] for k in ("host_prep", "total")}
    for step in range(n_steps):
        t_all0 = time.perf_counter()
        cmd = fsolver.update(mpc_time=(step + 1) * 0.01, **meas)
        fstages["total"].append(time.perf_counter() - t_all0)
        fstages["host_prep"].append(
            (time.perf_counter() - t_all0) - fsolver.solve_time * 1e-3)
    print("\nfused device-resident step:")
    print(f"{'stage':<10} {'p50 ms':>8} {'p90 ms':>8} {'min ms':>8}")
    for k, v in fstages.items():
        a = np.asarray(v) * 1e3
        print(f"{k:<10} {np.percentile(a, 50):8.2f} "
              f"{np.percentile(a, 90):8.2f} {a.min():8.2f}", flush=True)
    tot = np.asarray(fstages["total"]) * 1e3
    nul = np.asarray(stages["null"]) * 1e3
    print(f"\nfused p50 {np.percentile(tot, 50):.2f} ms vs dispatch floor "
          f"{np.percentile(nul, 50):.2f} ms (classic p50 "
          f"{np.percentile(np.asarray(stages['total']) * 1e3, 50):.2f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
