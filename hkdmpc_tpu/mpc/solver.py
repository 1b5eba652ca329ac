"""Receding-horizon MPC orchestrator.

Parity target: HKDMPCSolver (HKDMPC/HKDMPC.{h,cpp}) — cold initialize,
per-request re-solve with runtime iteration caps, next-foot-placement
extraction, and the exact mpc_command output contract
(controls, nominal body states, 12x12 feedback gains, contacts, status
durations, foot placements, solve time — lcmtypes/hkd_command_lcmt.lcm).

Architecture difference (TPU-first): instead of a detached solver thread per
LCM request guarded by a mutex (HKDMPC.cpp:168-200), the solve is one jitted
XLA call; the host loop stays single-threaded and async dispatch comes from
XLA's own execution stream. Structure changes (phase pops/appends) never
recompile — the problem is masked data.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import numpy as np
import jax.numpy as jnp

from hkdmpc_tpu.config import (ConstraintParams, HSDDPOption,
                               load_constraint_params, load_ddp_setting)
from hkdmpc_tpu.models import hkd
from hkdmpc_tpu.reference import QuadReference
from hkdmpc_tpu.solver import ddp
from hkdmpc_tpu.solver.problem import HKDProblem


@dataclasses.dataclass
class MPCConfig:
    # parity: HKDMPC.cpp:26-29
    plan_duration: float = 0.6
    nsteps_between_mpc: int = 1
    timestep: float = 0.01
    n_cmd_extra: int = 7   # publish nsteps+7 controls to mask latency (HKDMPC.cpp:245)
    fused_step: bool = False  # device-resident fused update (mpc/fused.py):
                              # one jitted program + packed I/O per step;
                              # equivalence pinned in tests/test_fast_paths.py
    assoc_linear: bool = True  # parallel-in-time linear rollout for the
                               # batch-1 MPC regime: measured 11% faster per
                               # solve on v5e at T=75 AND T=215 (10.04 vs
                               # 11.32 ms; scripts/exp_assoc_latency.py).
                               # Loses at saturating batch — solve_batch
                               # keeps the sequential scan.
    assoc_backward: Optional[bool] = None
                                 # parallel-in-time Riccati backward sweep
                                 # (ops/assoc.riccati_backward_assoc): the
                                 # log-depth value scan cuts the batch-1
                                 # solve 10.2 -> 8.9 ms on v5e (round 4) —
                                 # on-chip MPC step now clears the 10 ms
                                 # budget (HKDMPC.cpp:26-29) with margin.
                                 # None = auto: True on TPU, False on CPU —
                                 # the log-depth scan's unrolled combines
                                 # make XLA:CPU compiles minutes-long for
                                 # zero production value (CPU is the
                                 # f64-parity/dev backend; its latency is
                                 # not the product), and a mid-stream
                                 # recompile once blew run_async's
                                 # real-time deadline in CI.


@dataclasses.dataclass
class MPCCommand:
    """Contents of hkd_command_lcmt (the solver's output contract)."""
    N_mpcsteps: int
    mpc_times: np.ndarray        # (N,)
    hkd_controls: np.ndarray     # (N, 24)
    des_body_state: np.ndarray   # (N, 12)
    contacts: np.ndarray         # (N, 4) int
    status_times: np.ndarray     # (N, 4)
    feedback: np.ndarray         # (N, 12, 12)
    foot_placement: np.ndarray   # (12,)
    solve_time: float

    def to_lcm_dict(self, n_slots: int = 10) -> dict:
        """Pad to the fixed-size LCM wire layout (hkd_command_lcmt.lcm)."""
        n = min(self.N_mpcsteps, n_slots)
        pad = lambda a, shape: np.concatenate(
            [a[:n], np.zeros((n_slots - n,) + shape, a.dtype)], axis=0)
        return {
            "N_mpcsteps": n,
            "mpc_times": pad(self.mpc_times, ()),
            "hkd_controls": pad(self.hkd_controls, (24,)),
            "des_body_state": pad(self.des_body_state, (12,)),
            "contacts": pad(self.contacts, (4,)),
            "statusTimes": pad(self.status_times, (4,)),
            "foot_placement": self.foot_placement,
            "feedback": pad(self.feedback, (12, 12)),
            "solve_time": self.solve_time,
        }


class HKDMPCSolver:
    def __init__(self, reference_file: str,
                 ddp_settings: Optional[str] = None,
                 constraint_params: Optional[str] = None,
                 config: Optional[MPCConfig] = None,
                 dtype=jnp.float64):
        self.cfg = config or MPCConfig()
        self.opt = (load_ddp_setting(ddp_settings) if ddp_settings
                    else HSDDPOption())
        self.cparams = (load_constraint_params(constraint_params)
                        if constraint_params else ConstraintParams())
        self.ref = QuadReference.from_file(reference_file)
        self.problem = HKDProblem(
            self.ref, plan_duration=self.cfg.plan_duration,
            dt_sim=self.cfg.timestep, dt_mpc=self.cfg.timestep,
            cparams=self.cparams, dtype=dtype)
        self.dtype = dtype
        import jax
        self._assoc_bw = (self.cfg.assoc_backward
                          if self.cfg.assoc_backward is not None
                          else jax.default_backend() == "tpu")
        self.mpc_iter = 0
        self.mpc_time = 0.0
        self.solve_time = 0.0
        self.pf = np.zeros((4, 3))
        self.last_result = None
        self._pending = None  # in-flight fused dispatch (async service)

    # ------------------------------------------------------------------

    @staticmethod
    def default_stand_state(contact) -> np.ndarray:
        """Hard-coded stand pose initial condition (HKDMPC.cpp:44-54)."""
        body = np.zeros(12)
        body[5] = 0.2486
        qJ = np.tile([0.0, -0.8, 1.6], 4)
        return HKDMPCSolver.hkd_state_from_measurements(
            rpy=np.zeros(3), p=body[3:6], v=np.zeros(3), omega=np.zeros(3),
            qJ=qJ, contact=contact)

    @staticmethod
    def hkd_state_from_measurements(rpy, p, v, omega, qJ, contact):
        """Build the 24-dim HKD state from robot measurements. NOTE the
        reference receives rpy as (roll, pitch, yaw) and flips it into
        (yaw, pitch, roll) (HKDMPC.cpp:118)."""
        eul = np.asarray([rpy[2], rpy[1], rpy[0]])
        qd = hkd.compute_hkd_state(
            jnp.asarray(eul, jnp.float64), jnp.asarray(p, jnp.float64),
            jnp.asarray(qJ, jnp.float64),
            jnp.asarray(contact, jnp.float64))
        return np.concatenate([eul, p, omega, v, np.asarray(qd)])

    def initialize(self, x0=None) -> MPCCommand:
        """Cold solve. x0 defaults to the reference's hard-coded stand pose
        (HKDMPC.cpp:44-54); pass a 24-dim HKD state to start mid-gait."""
        self.problem.initialization()
        if x0 is None:
            x0 = self.default_stand_state(self.problem.phases[0].contact)
        prob, state = self.problem.build(x0)
        t0 = time.perf_counter()
        res = ddp.solve_jit(prob, state, self.opt,
                            self.problem.all_shooting(),
                            assoc_linear=self.cfg.assoc_linear,
                            assoc_backward=self._assoc_bw)
        res.cost.block_until_ready()
        self.solve_time = (time.perf_counter() - t0) * 1e3
        self.problem.unflatten(res.state)
        self.last_result = res
        self.mpc_iter = 0
        self.update_foot_placement()
        if self.cfg.fused_step:
            from hkdmpc_tpu.mpc import fused
            self._tables = fused.make_tables(self.problem, self.dtype)
            self._state_dev = res.state
            self._offsets = self.problem.flat_offsets()
            self._host_stale = False
        return self.make_command()

    def resume(self, ckpt_path: str) -> MPCCommand:
        """Warm restart from a checkpoint written by
        utils.checkpoint.save_problem: restores the phase structure, warm
        starts, AL/ReB multipliers and reference window, then re-arms the
        fused device-resident path (uids survive the round trip, so the
        shift-descriptor gathers stay valid). No solve is performed — the
        next update() continues exactly where the saved service left off."""
        from hkdmpc_tpu.utils.checkpoint import load_problem

        load_problem(ckpt_path, self.problem)
        # discard any in-flight pre-restore dispatch: its bundle was computed
        # against the discarded pre-checkpoint state, so completing it after
        # resume would publish a stale command
        self._pending = None
        self.mpc_iter = 0
        self.solve_time = 0.0
        self.update_foot_placement()
        if self.cfg.fused_step:
            from hkdmpc_tpu.mpc import fused
            # rebuild the device-resident SolverState from the restored host
            # warm-start arrays (the x0 argument only affects ProblemData)
            _, state = self.problem.build(np.zeros(24))
            self._tables = fused.make_tables(self.problem, self.dtype)
            self._state_dev = state
            self._offsets = self.problem.flat_offsets()
            self._host_stale = False
        return self.make_command()

    def update(self, rpy, p, v, omega, qJ, mpc_time: float = 0.0) -> MPCCommand:
        """One MPC re-solve from measured robot state (HKDMPC.cpp:96-166)."""
        self.mpc_iter += 1
        self.mpc_time = mpc_time
        if self.cfg.fused_step:
            return self._update_fused(rpy, p, v, omega, qJ)
        self.problem.update(self.cfg.nsteps_between_mpc)
        contact = self.problem.phases[0].contact
        x0 = self.hkd_state_from_measurements(rpy, p, v, omega, qJ, contact)
        prob, state = self.problem.build(x0)
        t0 = time.perf_counter()
        res = ddp.solve_jit(prob, state, self.opt.runtime(),
                            self.problem.all_shooting(),
                            assoc_linear=self.cfg.assoc_linear,
                            assoc_backward=self._assoc_bw)
        res.cost.block_until_ready()
        self.solve_time = (time.perf_counter() - t0) * 1e3
        self.problem.unflatten(res.state)
        self.last_result = res
        self.update_foot_placement()
        return self.make_command()

    # ------------------------------------------------------------------
    # device-resident fused path (mpc/fused.py)
    # ------------------------------------------------------------------

    def _update_fused(self, rpy, p, v, omega, qJ) -> MPCCommand:
        self.update_fused_dispatch(rpy, p, v, omega, qJ)
        return self.update_fused_complete()

    def update_async(self, rpy, p, v, omega, qJ,
                     mpc_time: float = 0.0) -> None:
        """Non-blocking MPC update (fused path only): dispatches the solve
        and returns immediately. Poll fused_ready(), then call
        update_fused_complete() for the command."""
        assert self.cfg.fused_step, "update_async requires fused_step=True"
        self.mpc_iter += 1
        self.mpc_time = mpc_time
        self.update_fused_dispatch(rpy, p, v, omega, qJ)

    def update_fused_dispatch(self, rpy, p, v, omega, qJ) -> None:
        """Async half 1: run the host-side bookkeeping and dispatch the fused
        device program WITHOUT blocking on its result. The service loop can
        keep draining the socket while the solve runs (the reference overlaps
        LCM handling with solving via a detached thread + mutex,
        HKDMPC.cpp:168-200; here the overlap comes from XLA's async dispatch).
        Follow with fused_ready()/update_fused_complete()."""
        from hkdmpc_tpu.mpc import fused

        # a prior dispatch that was never completed would be silently
        # dropped here, desynchronizing mpc_iter/solve_time accounting from
        # actually-served commands (run_async serializes via its busy flag;
        # direct API users must drain before re-dispatching). RuntimeError,
        # not assert: this API contract must survive python -O
        if self._pending is not None:
            raise RuntimeError(
                "update_fused_dispatch with an in-flight dispatch pending — "
                "call update_fused_complete() (or discard it) first")

        pb = self.problem
        n = self.cfg.nsteps_between_mpc + self.cfg.n_cmd_extra
        np_dtype = np.float64 if self.dtype == jnp.float64 else np.float32
        ints, floats, self._offsets, aux = fused.host_step(
            pb, self._offsets, self.cfg.nsteps_between_mpc, n,
            self.mpc_time, self.cfg.timestep, np_dtype)
        eul = np.asarray([rpy[2], rpy[1], rpy[0]])  # HKDMPC.cpp:118 flip
        meas = fused.pack_meas(np_dtype, eul=eul, p=p, omega=omega, v=v,
                               qJ=qJ, front_contact=pb.phases[0].contact)

        t0 = time.perf_counter()
        self._state_dev, bundle = fused.fused_step(
            self._tables, self._state_dev, ints, floats, meas,
            self.opt.runtime(), pb.all_shooting(), n,
            assoc_linear=self.cfg.assoc_linear,
            assoc_backward=self._assoc_bw)
        self._host_stale = True
        self._pending = dict(bundle=bundle, n=n, t0=t0, times=aux["times"],
                             contacts=aux["contacts"], status=aux["status"],
                             found=aux["found"])

    def fused_ready(self) -> bool:
        """True when the dispatched fused step's result is available (the
        completion fetch will not block)."""
        return self._pending is not None and self._pending["bundle"].is_ready()

    def update_fused_complete(self) -> MPCCommand:
        """Async half 2: fetch the bundle (blocks if not ready) and build
        the MPCCommand."""
        import types

        import jax

        from hkdmpc_tpu.mpc import fused

        pend = self._pending
        self._pending = None
        n, times, contacts, status, found = (
            pend["n"], pend["times"], pend["contacts"], pend["status"],
            pend["found"])
        out = fused.unpack_bundle(jax.device_get(pend["bundle"]), n,
                                  ddp.trace_len_for(self.opt.runtime()))
        self.solve_time = (time.perf_counter() - pend["t0"]) * 1e3

        cost, feas, maxt, maxp, n_iters, failed = out["scalars"]
        self.last_result = types.SimpleNamespace(
            state=None, cost=cost, dyn_feas=feas, max_tconstr=maxt,
            max_pconstr=maxp, n_iters=int(n_iters),
            solve_failed=bool(failed), cost_trace=out["cost_trace"],
            feas_trace=out["feas_trace"], eqn_trace=out["eqn_trace"],
            ineq_trace=out["ineq_trace"])
        for leg in range(4):
            if found[leg]:
                self.pf[leg] = out["pf"][leg]
        return MPCCommand(
            N_mpcsteps=n, mpc_times=times, hkd_controls=out["controls"],
            des_body_state=out["body"], contacts=contacts,
            status_times=status, feedback=out["gains"],
            foot_placement=self.pf.reshape(12).copy(),
            solve_time=self.solve_time)

    def materialize(self):
        """Fused path: pull the device-resident state back into the host
        per-phase warm-start arrays (for logging / trajectory publishers)."""
        if getattr(self, "_host_stale", False):
            self.problem.unflatten(self._state_dev)
            self.update_foot_placement()
            self._host_stale = False

    # ------------------------------------------------------------------

    def update_foot_placement(self):
        """Scan the phase sequence for the next swing->stance transition per
        leg; its foot placement is the next phase's initial qdummy
        (HKDMPC.cpp:206-240, incl. the reference's break after 4 phases)."""
        phases = self.problem.phases
        found = [False] * 4
        for i in range(len(phases) - 1):
            c, cn = phases[i].contact, phases[i + 1].contact
            for leg in range(4):
                if not found[leg] and c[leg] == 0 and cn[leg] == 1:
                    self.pf[leg] = phases[i + 1].Xbar[0, 12 + 3 * leg:
                                                      15 + 3 * leg]
                    found[leg] = True
            if i >= 4:
                break

    def make_command(self) -> MPCCommand:
        """Pack the command message (HKDMPC.cpp:242-298): walk the phase
        sequence step-by-step collecting controls / nominal states / gains."""
        n = self.cfg.nsteps_between_mpc + self.cfg.n_cmd_extra
        controls = np.zeros((n, 24))
        body = np.zeros((n, 12))
        gains = np.zeros((n, 12, 12))
        contacts = np.zeros((n, 4), int)
        status = np.zeros((n, 4))
        times = np.zeros(n)
        k = i = s = 0
        phases = self.problem.phases
        while k < n:
            if s >= phases[i].horizon:
                s = 0
                i += 1
                if i >= len(phases):
                    break
            ph = phases[i]
            controls[k] = ph.Ubar[s]
            body[k] = ph.Xbar[s, :12]
            gains[k] = ph.K[s, :12, :12]
            contacts[k] = ph.contact
            status[k] = ph.contact_duration
            times[k] = self.mpc_time + k * self.cfg.timestep
            s += 1
            k += 1
        return MPCCommand(
            N_mpcsteps=n, mpc_times=times, hkd_controls=controls,
            des_body_state=body, contacts=contacts, status_times=status,
            feedback=gains, foot_placement=self.pf.reshape(12).copy(),
            solve_time=self.solve_time)
