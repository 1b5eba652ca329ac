"""Trajectory log files in the reference's text format.

Parity: log_trajectory_sequence (HSDDPSolver/common/HSDDP_Utils.h:80-142) —
comma-separated rows, 5 significant digits, one row per step per phase with
the terminal state/value-gradient appended per phase and the last control
row duplicated, so logs diff directly against the reference's
(HKDMPC/log/{state,control,cost,value_grad}_log.txt).
"""

from __future__ import annotations

import os

import numpy as np


def _fmt_row(v) -> str:
    return ",".join(f"{x:.5g}" for x in np.asarray(v).ravel())


def log_trajectory_sequence(folder: str, phases, value_grads=None) -> None:
    """phases: iterable of objects with Xbar (h+1,24), Ubar (h,24), horizon.
    value_grads: optional list of per-phase (h+1, 24) arrays (G)."""
    os.makedirs(folder, exist_ok=True)
    with open(os.path.join(folder, "state_log.txt"), "w") as fs, \
         open(os.path.join(folder, "control_log.txt"), "w") as fc, \
         open(os.path.join(folder, "value_grad_log.txt"), "w") as fg:
        for i, ph in enumerate(phases):
            h = ph.horizon
            G = value_grads[i] if value_grads is not None else np.zeros((h + 1, 24))
            for k in range(h):
                fc.write(_fmt_row(ph.Ubar[k]) + "\n")
                fs.write(_fmt_row(ph.Xbar[k]) + "\n")
                fg.write(_fmt_row(G[k]) + "\n")
            fc.write(_fmt_row(ph.Ubar[h - 1]) + "\n")
            fs.write(_fmt_row(ph.Xbar[h]) + "\n")
            fg.write(_fmt_row(G[h]) + "\n")


def load_log(path: str) -> np.ndarray:
    """Load a reference-format log file into an array (rows x dims)."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append([float(w) for w in line.split(",")])
    return np.asarray(rows)
