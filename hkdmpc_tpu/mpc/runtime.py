"""Robot-facing MPC runtime: LCM-wire-compatible service loop.

Parity target: HKDMPC/mpc_main.cpp + the LCM handler in HKDMPC.cpp:168-200 —
subscribe "mpc_data", re-solve on each request (honoring reset_mpc / MS
flags), publish "mpc_command" and "solver_info" on the same UDP-multicast
bus, byte-compatible with the reference's low-level controller.

Run:  python -m hkdmpc_tpu.mpc.runtime --reference <quad_reference.csv>
"""

from __future__ import annotations

import argparse
import dataclasses

import numpy as np

from hkdmpc_tpu.comm import LCMTransport
from hkdmpc_tpu.comm.lcm_types import load_reference_types
from hkdmpc_tpu.mpc.solver import HKDMPCSolver, MPCConfig

DEFAULT_LCMTYPES = "/root/reference/lcmtypes"


class MPCService:
    def __init__(self, solver: HKDMPCSolver, transport: LCMTransport,
                 lcmtypes_dir: str = DEFAULT_LCMTYPES):
        self.solver = solver
        self.tx = transport
        types = load_reference_types(lcmtypes_dir)
        self.data_t = types["hkd_data_lcmt"]
        self.cmd_t = types["hkd_command_lcmt"]
        self.info_t = types["solver_info_lcmt"]
        self.tx.subscribe("mpc_data")

    def publish_command(self, cmd):
        self.tx.publish("mpc_command", self.cmd_t.encode(cmd.to_lcm_dict()))

    def publish_solver_info(self):
        """All four per-iteration buffers, as the reference ships them
        (MultiPhaseDDP.cpp:532-541 get_solver_info -> HKDMPC.cpp:324-329)."""
        res = self.solver.last_result
        if res is None:
            return
        ct = np.asarray(res.cost_trace)
        ct = ct[~np.isnan(ct)]
        ft = np.asarray(res.feas_trace)[: len(ct)]
        et = np.asarray(res.eqn_trace)[: len(ct)]
        it = np.asarray(res.ineq_trace)[: len(ct)]
        msg = {"n_iter": len(ct), "cost": ct, "dyn_feas": ft,
               "eqn_feas": et, "ineq_feas": it}
        self.tx.publish("solver_info", self.info_t.encode(msg))

    def publish_trajectory(self):
        """Stream the solver's current trajectory over `intermediate_ddp_traj`
        (parity: MultiPhaseDDP.h:76-88 publish_trajectory — defined but never
        invoked in the reference; exposed here the same way, as an explicit
        call emitting solver_intermtraj_lcmt)."""
        if hasattr(self.solver, "materialize"):
            self.solver.materialize()  # fused path: refresh host arrays
        traj_t = load_reference_types(DEFAULT_LCMTYPES)["solver_intermtraj_lcmt"]
        # per-phase k in [0, horizon) only, no terminal node
        # (SinglePhase.cpp:504-517 get_trajectory)
        x_tau, u_tau = [], []
        for ph in self.solver.problem.phases:
            for k in range(ph.horizon):
                x_tau.append(ph.Xbar[k])
                u_tau.append(ph.Ubar[k])
        x = np.asarray(x_tau, dtype=np.float32)
        u = np.asarray(u_tau, dtype=np.float32)
        msg = {"tau_sz": len(x), "x_sz": x.shape[1], "u_sz": u.shape[1],
               "x_tau": x, "u_tau": u}
        self.tx.publish("intermediate_ddp_traj", traj_t.encode(msg))

    def publish_debugfoot(self):
        """qdummy + contact sequence over the horizon (parity:
        HKDMPCSolver::publish_debugfoot, HKDMPC.cpp:300-322)."""
        if hasattr(self.solver, "materialize"):
            self.solver.materialize()  # fused path: refresh host arrays
        from hkdmpc_tpu.comm.lcm_types import load_reference_types
        opt_t = load_reference_types(DEFAULT_LCMTYPES)["opt_sol_lcmt"]
        qd, ct = [], []
        for ph in self.solver.problem.phases:
            for k in range(ph.horizon):
                qd.append(ph.Xbar[k, 12:24])
                ct.append(ph.contact)
        msg = {"N": len(qd), "qdummy": np.asarray(qd, dtype=np.float32),
               "contacts": np.asarray(ct, dtype=np.int32)}
        self.tx.publish("debug_foot", opt_t.encode(msg))

    def handle(self, msg: dict):
        if msg["reset_mpc"]:
            opt = dataclasses.replace(self.solver.opt, MS=bool(msg["MS"]))
            self.solver.opt = opt
            cmd = self.solver.initialize()
        else:
            cmd = self.solver.update(
                rpy=np.asarray(msg["rpy"]), p=np.asarray(msg["p"]),
                v=np.asarray(msg["vWorld"]), omega=np.asarray(msg["omegaBody"]),
                qJ=np.asarray(msg["qJ"]), mpc_time=float(msg["mpctime"]))
        self.publish_command(cmd)
        self.publish_solver_info()

    def run(self, max_messages=None):
        n = 0
        while max_messages is None or n < max_messages:
            got = self.tx.receive(timeout_ms=100)
            if got is None:
                continue
            chan, buf = got
            if chan != "mpc_data":
                continue
            self.handle(self.data_t.decode(buf))
            n += 1

    def run_async(self, max_messages=None, duration_s=None):
        """Overlapped service loop (fused solver required): the solve runs on
        device while this loop keeps draining the socket, so a 100 Hz+
        request stream never backs up into the transport's drop path.

        The reference overlaps solving with LCM handling via a detached
        thread per message serialized by a mutex (HKDMPC.cpp:168-200) — a
        flood piles up threads that each eventually solve a stale request.
        Here the policy is newest-wins with full accounting: while a solve
        is in flight, newer requests supersede the waiting one (counted in
        `stats["superseded"]`), and the next dispatch always uses the
        freshest measurements — bounded staleness of one solve latency.

        Stops after `max_messages` received or `duration_s` elapsed (either
        may be None). Fills self.stats, incl. the native transport's drop
        counters when available. mpc_data received past the max_messages
        cap (and any non-mpc_data traffic) is not served but IS counted in
        `stats["ignored"]`; a hung in-flight solve at exit is bounded by a
        drain grace period and counted in `stats["abandoned"]`."""
        import time as _time

        assert self.solver.cfg.fused_step, "run_async requires fused_step"
        n_recv = n_solved = n_superseded = n_reset = n_ignored = 0
        pending_msg = None
        busy = False
        deadline = (None if duration_s is None
                    else _time.perf_counter() + duration_s)
        while True:
            if max_messages is not None and n_recv >= max_messages \
                    and pending_msg is None and not busy:
                break
            if deadline is not None and _time.perf_counter() > deadline:
                break
            # short poll while work is in flight; longer when idle
            got = self.tx.receive(timeout_ms=1 if (busy or pending_msg)
                                  else 20)
            if got is not None:
                if got[0] == "mpc_data" and (
                        max_messages is None or n_recv < max_messages):
                    n_recv += 1
                    if pending_msg is not None:
                        n_superseded += 1
                    pending_msg = self.data_t.decode(got[1])
                else:
                    n_ignored += 1  # post-cap mpc_data or foreign channel
            if busy and self.solver.fused_ready():
                cmd = self.solver.update_fused_complete()
                self.publish_command(cmd)
                self.publish_solver_info()
                busy = False
                n_solved += 1
            if not busy and pending_msg is not None:
                msg = pending_msg
                pending_msg = None
                if msg["reset_mpc"]:
                    self.handle(msg)  # cold re-init stays synchronous
                    n_reset += 1
                else:
                    self.solver.update_async(
                        rpy=np.asarray(msg["rpy"]), p=np.asarray(msg["p"]),
                        v=np.asarray(msg["vWorld"]),
                        omega=np.asarray(msg["omegaBody"]),
                        qJ=np.asarray(msg["qJ"]),
                        mpc_time=float(msg["mpctime"]))
                    busy = True
        n_abandoned = 0
        if busy:
            # drain the in-flight solve, but bounded by a small CONSTANT
            # grace: if the device/tunnel hung, an unconditional
            # update_fused_complete() would block forever, and a grace
            # proportional to duration_s would still let total wall time
            # balloon to ~2x the requested deadline
            grace = _time.perf_counter() + 5.0
            while not self.solver.fused_ready() and \
                    _time.perf_counter() < grace:
                _time.sleep(0.001)
            if self.solver.fused_ready():
                cmd = self.solver.update_fused_complete()
                self.publish_command(cmd)
                self.publish_solver_info()
                n_solved += 1
            else:
                self.solver._pending = None  # discard the hung dispatch
                n_abandoned = 1
        self.stats = {"received": n_recv, "solved": n_solved,
                      "superseded": n_superseded, "resets": n_reset,
                      "ignored": n_ignored, "abandoned": n_abandoned,
                      "unserved": 0 if pending_msg is None else 1}
        if hasattr(self.tx, "stats"):
            self.stats.update(self.tx.stats())
        return self.stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", required=True)
    ap.add_argument("--ddp-settings", default=None)
    ap.add_argument("--constraint-params", default=None)
    ap.add_argument("--url", default="udpm://239.255.76.67:7667?ttl=255")
    args = ap.parse_args()

    solver = HKDMPCSolver(args.reference, args.ddp_settings,
                          args.constraint_params, MPCConfig())
    solver.initialize()
    svc = MPCService(solver, LCMTransport(args.url))
    print("MPC service listening on mpc_data ...")
    svc.run()


if __name__ == "__main__":
    main()
