"""Generate golden test fixtures from the reference's CasADi kernels.

The reference kernels (HKDMPC/HKD-TrajOpt/CasadiGen/source/*.cpp) are compiled
as a shared library under /tmp/oracle (see repo docs) and evaluated at random
probe points; results are stored as .npz fixtures so the test suite is
hermetic (does not need the reference tree or a compiler at test time).

Usage:  python tests/make_golden.py
"""
import os
import subprocess
import sys

import numpy as np

ORACLE_DIR = "/tmp/oracle"
REF_SRC = "/root/reference/HKDMPC/HKD-TrajOpt/CasadiGen/source"
HERE = os.path.dirname(os.path.abspath(__file__))


def build_oracle():
    os.makedirs(ORACLE_DIR, exist_ok=True)
    lib = os.path.join(ORACLE_DIR, "liboracle.so")
    if not os.path.exists(lib):
        srcs = [os.path.join(REF_SRC, f) for f in os.listdir(REF_SRC)]
        subprocess.check_call(
            ["g++", "-O2", "-fPIC", "-shared", "-x", "c++", *srcs, "-o", lib])
    sys.path.insert(0, ORACLE_DIR)


def main():
    build_oracle()
    import oracle  # noqa: E402  (lives in /tmp/oracle)

    rng = np.random.default_rng(20240817)
    n = 64

    xs = rng.normal(size=(n, 24)) * 0.6
    xs[:, 5] = np.abs(xs[:, 5]) + 0.1        # keep body above ground
    us = rng.normal(size=(n, 24)) * 15.0
    dts = np.full(n, 0.01)
    dts[n // 2:] = 0.011
    contacts = (rng.random((n, 4)) > 0.5).astype(np.float64)

    xnext = np.stack([oracle.hkinodyn(xs[i], us[i], dts[i], contacts[i])
                      for i in range(n)])
    A = np.zeros((n, 24, 24))
    B = np.zeros((n, 24, 24))
    for i in range(n):
        A[i], B[i] = oracle.hkinodyn_par(xs[i], us[i], dts[i], contacts[i])

    poss = rng.normal(size=(n, 3))
    euls = rng.normal(size=(n, 3)) * 0.8
    qlegs = rng.normal(size=(n, 3)) * 1.2
    pf = np.zeros((n, 4, 3))
    Jf = np.zeros((n, 4, 3, 18))
    for i in range(n):
        for leg in range(4):
            pf[i, leg] = oracle.foot_pos(poss[i], euls[i], qlegs[i], leg + 1)
            Jf[i, leg] = oracle.foot_jacob(poss[i], euls[i], qlegs[i], leg + 1)

    out = os.path.join(HERE, "golden", "hkd_model.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out, x=xs, u=us, dt=dts, contact=contacts, xnext=xnext, A=A, B=B,
        pos=poss, eul=euls, qleg=qlegs, pf=pf, Jf=Jf)
    print("wrote", out)


if __name__ == "__main__":
    main()
