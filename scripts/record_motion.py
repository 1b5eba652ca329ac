"""TOWR-trajectory recorder: LCM subscriber -> PreProcessedData CSVs.

Parity: scripts/PyBullet/record_motion.py — subscribes to the "TOWR" channel
(mc_towr_data_t), converts each trajectory into the preprocessed CSV set
(time/body_state/jnt/ee_pos/contact) that the reference's
generate_reference.m — and this repo's `refgen.from_preprocessed` — turn
into quad_reference.csv. Joint angles come from the closed-form leg IK
(refgen.foot_ik) instead of PyBullet's numerical IK; the euler-rate ->
angular-rate map is the reference's exact T(eul) (record_motion.py:52-60).

Usage: python scripts/record_motion.py [--out data/] [--url udpm://...]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOWR_LCM = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "lcmtypes")
REF_TOWR_LCM = "/root/reference/scripts/PyBullet/lcmtypes"


def eulrate2angrate(eul, eulrate):
    """Body angular rate from (roll-pitch-yaw? reference passes eul as-is)
    euler rates — exact port of record_motion.py:52-60."""
    b, r = eul[1], eul[2]
    T = np.array([
        [-np.sin(b), 0.0, 1.0],
        [np.cos(b) * np.sin(r), np.cos(r), 0.0],
        [np.cos(b) * np.cos(r), -np.sin(r), 0.0],
    ])
    return T @ np.asarray(eulrate)


def towr_msg_to_traj(msg: dict):
    """Decode one mc_towr_data_t dict into (time, body_state, jnt, ee_pos,
    contact) arrays in the PreProcessedData layout."""
    from hkdmpc_tpu.reference.refgen import foot_ik

    n = int(msg["len"])
    time = np.asarray(msg["microtime"][:n], np.float64) / 1e6
    body, jnt, ee, ct = [], [], [], []
    for k in range(n):
        eul = np.asarray(msg["eul"][k], np.float64)
        pos = np.asarray(msg["base_pos"][k], np.float64)
        ee_k = np.asarray(msg["ee_pos"][k], np.float64)
        # closed-form IK per leg (reference uses pybullet IK here);
        # foot_ik expects (yaw, pitch, roll) — towr euler is (r, p, y)
        eul_zyx = eul[::-1]
        qJ = np.concatenate([
            foot_ik(pos, eul_zyx, ee_k[3 * leg: 3 * leg + 3], leg)
            for leg in range(4)])
        angrate = eulrate2angrate(eul, np.asarray(msg["eulrate"][k]))
        vel = np.asarray(msg["base_vel"][k], np.float64)
        body.append(np.concatenate([eul, pos, angrate, vel]))
        jnt.append(qJ)
        ee.append(ee_k)
        ct.append(np.asarray(msg["contact"][k], int))
    return (time, np.asarray(body), np.asarray(jnt), np.asarray(ee),
            np.asarray(ct))


def write_traj_to_file(out_dir, time, body, jnt, ee, contact):
    """record_motion.py:45-50 CSV layout (consumed by from_preprocessed)."""
    os.makedirs(out_dir, exist_ok=True)
    np.savetxt(os.path.join(out_dir, "time.csv"), time, delimiter=",",
               fmt="%8.4f")
    np.savetxt(os.path.join(out_dir, "body_state.csv"), body, delimiter=",",
               fmt="%8.4f")
    np.savetxt(os.path.join(out_dir, "ee_pos.csv"), ee, delimiter=",",
               fmt="%8.4f")
    np.savetxt(os.path.join(out_dir, "jnt.csv"), jnt, delimiter=",",
               fmt="%8.4f")
    np.savetxt(os.path.join(out_dir, "contact.csv"), contact, delimiter=",",
               fmt="%u")


def main():
    from hkdmpc_tpu.comm import LCMTransport
    from hkdmpc_tpu.comm.lcm_types import load_reference_types

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data")
    ap.add_argument("--url", default="udpm://239.255.76.67:7667?ttl=0")
    args = ap.parse_args()

    towr_t = load_reference_types(REF_TOWR_LCM)["mc_towr_data_t"]
    tx = LCMTransport(args.url)
    tx.subscribe("TOWR")
    print("recording TOWR trajectories ...")
    while True:
        got = tx.receive(timeout_ms=500)
        if got is None:
            continue
        chan, buf = got
        traj = towr_msg_to_traj(towr_t.decode(buf))
        write_traj_to_file(args.out, *traj)
        print(f"wrote {len(traj[0])}-step trajectory to {args.out}/")


if __name__ == "__main__":
    main()
