"""Closed-loop FLEET MPC demo: N robots, each with its own perturbed
state, driven through a trot by mpc/fleet.py — every receding-horizon
step is ONE compiled program for the whole fleet, warm starts resident
on device.

Usage: python examples/fleet_demo.py [--robots 4] [--steps 30]
       [--backend cpu|tpu]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--robots", type=int, default=4)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--backend", default="cpu",
                    help="cpu (default; f64 host loop) or tpu")
    args = ap.parse_args()

    import jax
    if args.backend == "cpu":
        # env vars can't override the sandbox's forced axon platform;
        # only the config call can (see CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from hkdmpc_tpu.models import hkd
    from hkdmpc_tpu.mpc.fleet import FleetConfig, FleetMPC
    from hkdmpc_tpu.mpc.solver import HKDMPCSolver

    N = args.robots
    dtype = jnp.float64 if args.backend == "cpu" else jnp.float32
    fleet = FleetMPC(
        "/root/reference/Reference/Data/trot/quad_reference.csv", N,
        "/root/reference/HKDMPC/settings/ddp_setting.info",
        "/root/reference/HKDMPC/settings/constraint_params.info",
        FleetConfig(), dtype=dtype)

    rng = np.random.default_rng(0)
    # per-robot initial states: the stand pose, nudged
    fleet.problem.initialization()
    base = HKDMPCSolver.default_stand_state(fleet.problem.phases[0].contact)
    x_b = np.tile(base, (N, 1))
    x_b[:, 3:6] += rng.normal(scale=0.01, size=(N, 3))
    stats = fleet.initialize(x_b)
    print(f"fleet cold solve: N={N} mean_cost={stats['mean_cost']:.3f} "
          f"failed={stats['n_failed']} ({stats['solve_ms']:.0f} ms incl. "
          f"compile)")

    dt = fleet.cfg.timestep
    out = None
    heights = [[] for _ in range(N)]
    solve_ms = []
    for step in range(args.steps):
        contact = fleet.problem.phases[0].contact.astype(float)
        if out is not None:
            k = 1
            for i in range(N):
                u = out["controls"][i][k].copy()
                u[:12] += out["gains"][i][k] @ (x_b[i, :12]
                                                - out["body"][i][k])
                x_b[i] = np.asarray(hkd.dynamics(
                    jnp.asarray(x_b[i]), jnp.asarray(u),
                    jnp.asarray(contact), dt))
                heights[i].append(x_b[i][5])
        qJ_b = np.tile([0.0, -0.8, 1.6], (N, 4))
        for i in range(N):
            qd = x_b[i, 12:24].reshape(4, 3)
            for leg in range(4):
                if contact[leg] == 0:
                    qJ_b[i, 3 * leg:3 * leg + 3] = qd[leg]
        out = fleet.step(
            rpy_b=x_b[:, [2, 1, 0]], p_b=x_b[:, 3:6], v_b=x_b[:, 9:12],
            omega_b=x_b[:, 6:9], qJ_b=qJ_b, mpc_time=step * dt)
        solve_ms.append(out["solve_time"])
        if step % 10 == 0:
            zs = " ".join(f"{x_b[i][5]:.3f}" for i in range(min(N, 6)))
            print(f"step {step:3d}: z=[{zs}] fleet_step="
                  f"{out['solve_time']:6.1f} ms failed="
                  f"{int(np.sum(out['scalars'][:, 5] > 0))}/{N}")

    for i in range(min(N, 6)):
        print(f"robot {i}: height range [{min(heights[i]):.3f}, "
              f"{max(heights[i]):.3f}] m")
    print(f"median fleet step {np.median(solve_ms):.1f} ms "
          f"({N} robots/program)")


if __name__ == "__main__":
    main()
