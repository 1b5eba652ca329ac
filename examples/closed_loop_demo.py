"""Closed-loop MPC demo: the controller drives the HKD model through a trot
(the analog of the reference's demo GIFs / PyBullet replay), producing a
solution plot and reference-format trajectory logs.

Usage: python examples/closed_loop_demo.py [--steps 60] [--gait trot]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--gait", default="trot",
                    choices=["trot", "flytrot", "barrelroll", "hop"])
    ap.add_argument("--out", default="/tmp/hkdmpc_demo")
    ap.add_argument("--backend", default="cpu",
                    help="cpu (default; fast f64 host loop) or tpu")
    args = ap.parse_args()

    import jax
    if args.backend == "cpu":
        # env vars can't override the sandbox's forced axon platform;
        # only the config call can (see CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from hkdmpc_tpu.models import hkd
    from hkdmpc_tpu.mpc.solver import HKDMPCSolver, MPCConfig
    from hkdmpc_tpu.utils.logging import log_solution
    from hkdmpc_tpu.utils.visualize import plot_solution

    ref_root = "/root/reference/Reference/Data"
    if args.gait == "hop":
        from hkdmpc_tpu.reference.refgen import GaitSynthesizer
        ref_file = GaitSynthesizer().write("/tmp/hop_demo.csv",
                                           [("hop", 2.0, 0.2)])
    else:
        ref_file = f"{ref_root}/{args.gait}/quad_reference.csv"

    solver = HKDMPCSolver(
        ref_file, "/root/reference/HKDMPC/settings/ddp_setting.info",
        "/root/reference/HKDMPC/settings/constraint_params.info", MPCConfig())
    cmd = solver.initialize()
    print(f"cold solve: cost={float(solver.last_result.cost):.3f} "
          f"feas={float(solver.last_result.dyn_feas):.2e} "
          f"({solver.solve_time:.0f} ms incl. compile)")

    x = HKDMPCSolver.default_stand_state(solver.problem.phases[0].contact)
    dt = solver.cfg.timestep
    cmds = [cmd]
    heights = []
    for step in range(args.steps):
        contact = solver.problem.phases[0].contact.astype(float)
        use = cmds[step]
        k = 0 if step == 0 else 1
        u = use.hkd_controls[k].copy()
        u[:12] += use.feedback[k] @ (x[:12] - use.des_body_state[k])
        x = np.asarray(hkd.dynamics(jnp.asarray(x), jnp.asarray(u),
                                    jnp.asarray(contact), dt))
        heights.append(x[5])
        qJ = np.tile([0.0, -0.8, 1.6], 4)
        qd = x[12:24].reshape(4, 3)
        for leg in range(4):
            if contact[leg] == 0:
                qJ[3 * leg:3 * leg + 3] = qd[leg]
        cmds.append(solver.update(
            rpy=[x[2], x[1], x[0]], p=x[3:6], v=x[9:12], omega=x[6:9],
            qJ=qJ, mpc_time=step * dt))
        if step % 10 == 0:
            print(f"step {step:3d}: z={x[5]:.3f} "
                  f"solve={solver.solve_time:5.1f} ms "
                  f"feas={float(solver.last_result.dyn_feas):.1e}")

    os.makedirs(args.out, exist_ok=True)
    prob, state = solver.problem.build(
        solver.problem.phases[0].Xbar[0])
    log_solution(args.out, solver.problem, prob, state, solver.opt)
    png = plot_solution(solver.problem.phases,
                        os.path.join(args.out, "solution.png"),
                        title=f"HKD-MPC {args.gait} (closed loop)")
    print(f"height range: [{min(heights):.3f}, {max(heights):.3f}] m")
    print(f"logs + plot written to {args.out} ({png})")


if __name__ == "__main__":
    main()
