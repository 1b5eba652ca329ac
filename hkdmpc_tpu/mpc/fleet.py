"""Batched fleet MPC: N warm-started robots stepping receding horizons
device-resident, one jitted program per fleet step.

This composes the repo's two flagship halves: the batched throughput stack
(`ddp.solve_batch` with the in-kernel-jacobian Pallas backward) and the
device-resident fused receding-horizon step (`mpc/fused.py`). A uniform-gait
fleet advances ONE schedule: the host computes the warm-start shift
descriptor / problem arrays / command-walk indices once per step
(`fused.host_step`), and the device program vmaps the fused core over
(per-robot SolverState, per-robot 28-float measurement vector). Per-robot
host->device traffic is 28 floats; everything else stays resident.

Reference analog, per robot: HKDMPC/HKDMPC.cpp:96-166 (the re-solve loop)
+ HKD-TrajOpt/HKDProblem.cpp:116-222 (the receding-horizon update), batched
across a fleet the reference runs one robot at a time.

Equivalence vs N independent fused solvers (warm starts included, through a
front-pop and an append) is pinned by tests/test_fleet.py.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from hkdmpc_tpu.config import (ConstraintParams, HSDDPOption,
                               load_constraint_params, load_ddp_setting)
from hkdmpc_tpu.mpc import fused
from hkdmpc_tpu.mpc.solver import HKDMPCSolver, MPCCommand
from hkdmpc_tpu.reference import QuadReference
from hkdmpc_tpu.solver import ddp
from hkdmpc_tpu.solver.problem import HKDProblem


@dataclasses.dataclass
class FleetConfig:
    # schedule parameters (parity: HKDMPC.cpp:26-29, per robot)
    plan_duration: float = 0.6
    nsteps_between_mpc: int = 1
    timestep: float = 0.01
    n_cmd_extra: int = 7
    # solve stack. Defaults are the batched-throughput production stack
    # (bench.py): in-kernel-jacobian Pallas backward + statically unrolled
    # runtime caps. kernel_jac=None resolves to True on TPU f32 (the Pallas
    # kernel's regime), False elsewhere (CPU f64 parity / testing).
    kernel_jac: Optional[bool] = None
    unroll_caps: bool = True
    assoc_linear: bool = False   # latency-regime option; loses at batch
    assoc_backward: bool = False


def _make_sharded_fleet_step(mesh, axis: str):
    """fused.fleet_step wrapped in shard_map over the robot axis: tables
    and the shared schedule vectors replicated, per-robot SolverState and
    measurements sharded. Per-robot solves are independent, so the body
    needs no collectives — the sharding exists to scale robots/chip x
    chips with zero cross-chip hot-path traffic (SURVEY §5 distributed
    backend, applied to the fleet receding-horizon step)."""
    from functools import partial as _p

    from jax.sharding import PartitionSpec as P

    from hkdmpc_tpu.parallel.batch import get_shard_map

    smap = get_shard_map()

    @_p(jax.jit, donate_argnums=(1,), static_argnames=fused._FUSED_STATICS)
    def fleet_step_sharded(tables, state_b, ints, floats, meas_b, opt,
                           parallel_rollout, n_cmd, model=None,
                           assoc_linear=False, assoc_backward=False,
                           kernel_jac=False, unroll_caps=False):
        @_p(smap, mesh=mesh,
            in_specs=(P(), P(axis), P(), P(), P(axis)),
            out_specs=(P(axis), P(axis)))
        def _shard(tables_r, state_shard, ints_r, floats_r, meas_shard):
            return jax.vmap(
                lambda s, m: fused._fused_core(
                    tables_r, s, ints_r, floats_r, m, opt,
                    parallel_rollout, n_cmd, model, assoc_linear,
                    assoc_backward, kernel_jac, unroll_caps)
            )(state_shard, meas_shard)

        return _shard(tables, state_b, ints, floats, meas_b)

    return fleet_step_sharded


def unpack_bundle_batch(arr: np.ndarray, n_cmd: int,
                        trace_len: int = fused.TRACE_LEN) -> dict:
    """Batched analog of fused.unpack_bundle: arr (N, L) -> dict of
    (N, ...) arrays."""
    out, off = {}, 0
    arr = np.asarray(arr)
    N = arr.shape[0]
    for name, ln in fused.bundle_layout(n_cmd, trace_len):
        out[name] = arr[:, off: off + ln]
        off += ln
    out["controls"] = out["controls"].reshape(N, n_cmd, 24)
    out["body"] = out["body"].reshape(N, n_cmd, 12)
    out["gains"] = out["gains"].reshape(N, n_cmd, 12, 12)
    out["pf"] = out["pf"].reshape(N, 4, 3)
    return out


class FleetMPC:
    """N-robot uniform-gait fleet MPC (device-resident warm starts).

    All robots track the same gait schedule (one QuadReference window, one
    HKDProblem doing the host bookkeeping); each robot has its own
    measurements, warm-started trajectories, gains and multipliers on
    device. A mixed-gait fleet is G of these, one per gait group — the
    schedule bookkeeping is per-gait by construction."""

    def __init__(self, reference_file: str, n_robots: int,
                 ddp_settings: Optional[str] = None,
                 constraint_params: Optional[str] = None,
                 config: Optional[FleetConfig] = None,
                 dtype=jnp.float32, mesh=None, mesh_axis: str = "scenario"):
        self.cfg = config or FleetConfig()
        self.n = int(n_robots)
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
        self._np_dtype = np.float64 if dtype == jnp.float64 else np.float32
        kj = self.cfg.kernel_jac
        if kj is None:
            kj = (jax.default_backend() == "tpu" and dtype == jnp.float32)
        if kj and self.cfg.assoc_linear:
            raise ValueError("kernel_jac is incompatible with assoc_linear")
        self._kernel_jac = bool(kj)
        # multi-chip: robots shard over the mesh axis (pure data
        # parallelism — per-robot solves are independent, so the step has
        # zero cross-chip traffic; shardings ride ICI by mesh layout)
        self.mesh = mesh
        self._axis = mesh_axis
        if mesh is not None:
            assert self.n % mesh.devices.size == 0, \
                "the mesh size must divide n_robots"
            self._step_fn = _make_sharded_fleet_step(mesh, mesh_axis)
        else:
            self._step_fn = fused.fleet_step
        self.mpc_iter = 0
        self.solve_time = 0.0
        self._pending = None
        self._last = None
        self._pf = np.zeros((self.n, 4, 3))

    # ------------------------------------------------------------------

    def initialize(self, x0_b: Optional[np.ndarray] = None) -> dict:
        """Cold-solve the whole fleet. x0_b: (N, 24) per-robot HKD states
        (defaults to the reference's hard-coded stand pose for every robot,
        HKDMPC.cpp:44-54). Returns aggregate stats."""
        from hkdmpc_tpu.parallel import replicate_problem

        pb = self.problem
        pb.initialization()
        if x0_b is None:
            x0 = HKDMPCSolver.default_stand_state(pb.phases[0].contact)
            x0_b = np.tile(x0, (self.n, 1))
        x0_b = np.asarray(x0_b, self._np_dtype)
        assert x0_b.shape == (self.n, 24)

        prob, state = pb.build(x0_b[0])
        prob_b, state_b = replicate_problem(prob, state, self.n)
        prob_b = dataclasses.replace(prob_b, x0=jnp.asarray(x0_b, self.dtype))
        t0 = time.perf_counter()
        if self.mesh is not None:
            from hkdmpc_tpu.parallel import solve_sharded
            res, _ = solve_sharded(
                prob_b, state_b, self.opt, self.mesh, axis=self._axis,
                parallel_rollout=pb.all_shooting(),
                kernel_jac=self._kernel_jac,
                assoc_linear=self.cfg.assoc_linear,
                unroll_caps=False,  # cold solve: see the unsharded branch
                assoc_backward=self.cfg.assoc_backward)
        else:
            # cold solve: never unroll — unroll_caps pays for the 2x1
            # runtime caps, but the cold caps (e.g. the reference's 5x10)
            # would unroll into a 50-iteration straight-line program with
            # a compile time to match; the while_loop solver is the right
            # shape here and the step path keeps the unrolled one
            res = ddp.solve_batch(
                prob_b, state_b, self.opt,
                parallel_rollout=pb.all_shooting(),
                kernel_jac=self._kernel_jac,
                unroll_caps=False,
                assoc_linear=self.cfg.assoc_linear,
                assoc_backward=self.cfg.assoc_backward)
        res.cost.block_until_ready()
        self.solve_time = (time.perf_counter() - t0) * 1e3
        self._state_dev = res.state
        self._tables = fused.make_tables(pb, self.dtype)
        self._offsets = pb.flat_offsets()
        self.mpc_iter = 0
        return {
            "mean_cost": float(jnp.mean(res.cost)),
            "max_feas": float(jnp.max(res.dyn_feas)),
            "n_failed": int(jnp.sum(res.solve_failed)),
            "solve_ms": self.solve_time,
        }

    # ------------------------------------------------------------------

    def _meas_batch(self, rpy_b, p_b, v_b, omega_b, qJ_b) -> np.ndarray:
        """(N, 28) measurement pack; rpy arrives (roll, pitch, yaw) and is
        flipped to (yaw, pitch, roll) exactly as HKDMPC.cpp:118."""
        rpy_b = np.asarray(rpy_b, self._np_dtype).reshape(self.n, 3)
        eul_b = rpy_b[:, ::-1]
        fc = np.tile(np.asarray(self.problem.phases[0].contact,
                                self._np_dtype), (self.n, 1))
        return np.concatenate([
            eul_b,
            np.asarray(p_b, self._np_dtype).reshape(self.n, 3),
            np.asarray(omega_b, self._np_dtype).reshape(self.n, 3),
            np.asarray(v_b, self._np_dtype).reshape(self.n, 3),
            np.asarray(qJ_b, self._np_dtype).reshape(self.n, 12),
            fc,
        ], axis=1)

    def step_async(self, rpy_b, p_b, v_b, omega_b, qJ_b,
                   mpc_time: float = 0.0) -> None:
        """Dispatch one fleet receding-horizon step (non-blocking).
        host_step runs before the measurement pack so x0 is built from the
        POST-update front-phase contact, exactly like the single-robot
        path (the reference updates the problem before building x0,
        HKDMPC.cpp:96-130)."""
        if self._pending is not None:
            raise RuntimeError(
                "fleet step_async with an in-flight step pending — call "
                "complete() first")
        pb = self.problem
        n_cmd = self.cfg.nsteps_between_mpc + self.cfg.n_cmd_extra
        ints, floats, self._offsets, aux = fused.host_step(
            pb, self._offsets, self.cfg.nsteps_between_mpc, n_cmd,
            mpc_time, self.cfg.timestep, self._np_dtype)
        meas_b = self._meas_batch(rpy_b, p_b, v_b, omega_b, qJ_b)
        t0 = time.perf_counter()
        self._state_dev, bundle_b = self._step_fn(
            self._tables, self._state_dev, ints, floats,
            jnp.asarray(meas_b), self.opt.runtime(), pb.all_shooting(),
            n_cmd, assoc_linear=self.cfg.assoc_linear,
            assoc_backward=self.cfg.assoc_backward,
            kernel_jac=self._kernel_jac,
            unroll_caps=self.cfg.unroll_caps)
        self.mpc_iter += 1
        self._pending = dict(bundle=bundle_b, n=n_cmd, t0=t0, aux=aux)

    def ready(self) -> bool:
        return self._pending is not None and self._pending["bundle"].is_ready()

    def complete(self) -> dict:
        """Fetch the dispatched step. Returns batched command arrays:
        controls (N, n_cmd, 24), body (N, n_cmd, 12), gains
        (N, n_cmd, 12, 12), pf (N, 4, 3), scalars (N, 6), the four
        (N, TRACE_LEN) traces, plus the shared times/contacts/status."""
        pend = self._pending
        self._pending = None
        out = self.unpack(jax.device_get(pend["bundle"]))
        self.solve_time = (time.perf_counter() - pend["t0"]) * 1e3
        found = pend["aux"]["found"]
        for leg in range(4):
            if found[leg]:
                self._pf[:, leg] = out["pf"][:, leg]
        out["foot_placement"] = self._pf.copy()
        out["times"] = pend["aux"]["times"]
        out["contacts"] = pend["aux"]["contacts"]
        out["status"] = pend["aux"]["status"]
        out["solve_time"] = self.solve_time
        self._last = out
        return out

    def step(self, rpy_b, p_b, v_b, omega_b, qJ_b,
             mpc_time: float = 0.0) -> dict:
        self.step_async(rpy_b, p_b, v_b, omega_b, qJ_b, mpc_time)
        return self.complete()

    def rollout_steps(self, n_steps: int, meas_fn, mpc_time0: float = 0.0,
                      keep_bundles: bool = False):
        """Dispatch n_steps fleet steps back-to-back without fetching
        between them — the device chains step k+1's warm-start shift onto
        step k's donated state while the host runs ahead on schedule
        bookkeeping, so consecutive dispatches pipeline (the regime
        bench.py's fleet axis measures; real deployments consume bundles
        asynchronously the same way). Blocks on the final bundle. Returns
        the last bundle (device array), or all of them when
        keep_bundles=True."""
        if self._pending is not None:
            raise RuntimeError("rollout_steps with an in-flight step "
                               "pending — call complete() first")
        pb = self.problem
        n_cmd = self.cfg.nsteps_between_mpc + self.cfg.n_cmd_extra
        bundles = []
        for k in range(n_steps):
            ints, floats, self._offsets, _ = fused.host_step(
                pb, self._offsets, self.cfg.nsteps_between_mpc, n_cmd,
                mpc_time0 + k * self.cfg.timestep, self.cfg.timestep,
                self._np_dtype)
            m = meas_fn(k)
            meas_b = self._meas_batch(m["rpy"], m["p"], m["v"], m["omega"],
                                      m["qJ"])
            self._state_dev, bundle_b = self._step_fn(
                self._tables, self._state_dev, ints, floats,
                jnp.asarray(meas_b), self.opt.runtime(), pb.all_shooting(),
                n_cmd, assoc_linear=self.cfg.assoc_linear,
                assoc_backward=self.cfg.assoc_backward,
                kernel_jac=self._kernel_jac,
                unroll_caps=self.cfg.unroll_caps)
            self.mpc_iter += 1
            if keep_bundles:
                bundles.append(bundle_b)
        bundle_b.block_until_ready()
        return bundles if keep_bundles else bundle_b

    # ------------------------------------------------------------------

    def save(self, path: str) -> None:
        """Checkpoint the fleet: shared schedule (uid-keyed) + every
        robot's device-resident warm-start state
        (utils.checkpoint.save_fleet)."""
        from hkdmpc_tpu.utils.checkpoint import save_fleet
        if self._pending is not None:
            raise RuntimeError("save with an in-flight step pending — "
                               "call complete() first")
        save_fleet(path, self)

    def resume(self, path: str) -> None:
        """Restore from save(): re-arms the device-resident step path; no
        solve is performed — the next step() continues exactly where the
        saved fleet left off (the fleet analog of HKDMPCSolver.resume)."""
        from hkdmpc_tpu.utils.checkpoint import load_fleet
        load_fleet(path, self)

    def unpack(self, bundle_b) -> dict:
        """Unpack a (N, L) fleet bundle with this fleet's command width and
        trace length (runtime caps -> ddp.trace_len_for)."""
        n_cmd = self.cfg.nsteps_between_mpc + self.cfg.n_cmd_extra
        return unpack_bundle_batch(np.asarray(bundle_b), n_cmd,
                                   ddp.trace_len_for(self.opt.runtime()))

    def command(self, i: int) -> MPCCommand:
        """Robot i's MPCCommand from the last completed fleet step — the
        same output contract as HKDMPCSolver (hkd_command_lcmt)."""
        out = self._last
        assert out is not None, "no completed fleet step"
        n = out["controls"].shape[1]
        return MPCCommand(
            N_mpcsteps=n, mpc_times=out["times"],
            hkd_controls=out["controls"][i],
            des_body_state=out["body"][i], contacts=out["contacts"],
            status_times=out["status"], feedback=out["gains"][i],
            foot_placement=out["foot_placement"][i].reshape(12).copy(),
            solve_time=out["solve_time"])


class MixedFleetMPC:
    """Mixed-gait fleet: G gait groups, each a uniform FleetMPC.

    A fleet step dispatches all groups back-to-back (the per-group
    programs pipeline on device — one group's solve overlaps the next
    group's dispatch) and completes them together. Grouping by gait is
    the natural decomposition: the warm-start shift descriptor, problem
    arrays and command walk are per-schedule host bookkeeping, identical
    within a group and meaningless across gaits. The per-group batched
    programs compile once each (G programs total, same shapes ->
    identical executables when the groups share T).

    A single-program alternative (per-robot schedule vectors as batched
    data + padded per-gait reference-table stacks indexed by a robot's
    group id) was considered and deliberately not taken: it tiles ~5 KB
    of schedule vectors per robot per step across the wire and pads every
    gait's reference table to the longest, for the sole benefit of
    merging G<=handful dispatches that already pipeline."""

    def __init__(self, groups, **kw):
        """groups: sequence of (reference_file, n_robots). Remaining
        kwargs are forwarded to each FleetMPC."""
        self.fleets = [FleetMPC(ref, n, **kw) for ref, n in groups]
        self.n = sum(f.n for f in self.fleets)

    def initialize(self, x0_bs=None) -> list:
        return [f.initialize(None if x0_bs is None else x0_bs[i])
                for i, f in enumerate(self.fleets)]

    def step(self, meas_list, mpc_time: float = 0.0) -> list:
        """meas_list: per-group dicts of batched measurement arrays
        (rpy/p/v/omega/qJ). Dispatches every group, then completes every
        group — G pipelined device programs per fleet step."""
        for f, m in zip(self.fleets, meas_list):
            f.step_async(m["rpy"], m["p"], m["v"], m["omega"], m["qJ"],
                         mpc_time)
        return [f.complete() for f in self.fleets]
