"""Checkpoint / resume of MPC warm-start state.

The reference has no checkpointing; its analog is the in-memory warm start
living inside HKDProblemData across MPC iterations (SURVEY §5). For a
production service, that state (phase structure + nominal trajectories +
gains + AL/ReB multipliers + reference window position) is exactly what must
survive a restart — this module persists and restores it via a single .npz.
"""

from __future__ import annotations

import io
import json

import numpy as np

_PHASE_ARRAYS = ("Xbar", "Ubar", "dU", "K", "dX", "defect_bar", "reb_delta",
                 "reb_eps", "al_lambda", "al_sigma", "td_mask")
_PHASE_SCALARS = ("start_time", "end_time", "horizon", "reach_end",
                  "has_tconstr")


def _problem_payload(pb) -> tuple:
    arrays = {}
    meta = {"n_phases": len(pb.phases), "k_cur": pb.ref.k_cur,
            "plan_duration": pb.plan_duration, "dt_sim": pb.dt_sim,
            "dt_mpc": pb.dt_mpc, "T": pb.T,
            "uid_counter": pb._uid_counter,
            "phases": []}
    for i, ph in enumerate(pb.phases):
        meta["phases"].append({
            "start_time": ph.start_time, "end_time": ph.end_time,
            "horizon": ph.horizon, "reach_end": bool(ph.reach_end),
            "has_tconstr": bool(ph.has_tconstr), "uid": ph.uid})
        for name in _PHASE_ARRAYS:
            arrays[f"p{i}_{name}"] = np.asarray(getattr(ph, name))
        arrays[f"p{i}_contact"] = np.asarray(ph.contact)
        arrays[f"p{i}_next_contact"] = np.asarray(ph.next_contact)
        arrays[f"p{i}_contact_duration"] = np.asarray(ph.contact_duration)
    return arrays, meta


def save_problem(path: str, pb) -> None:
    arrays, meta = _problem_payload(pb)
    arrays["_meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_problem(path: str, pb) -> None:
    """Restore phase structure + warm-start state into an HKDProblem built
    against the same reference file."""
    from hkdmpc_tpu.solver.problem import Phase

    data = np.load(path)
    meta = json.loads(bytes(data["_meta"]).decode())
    pb.ref.initialize(meta["plan_duration"])
    pb.ref.k_cur = meta["k_cur"]
    pb.plan_duration = meta["plan_duration"]
    pb.T = meta["T"]
    pb.phases = []
    # Phase.uid must survive the round trip: flat_offsets()/shift_descriptor
    # (the fused-path warm-start gather) key phases by uid, so a restore
    # that re-numbered them would gather garbage warm starts.
    pb._uid_counter = meta.get("uid_counter", 0)
    for i, pm in enumerate(meta["phases"]):
        ph = Phase(start_time=pm["start_time"], end_time=pm["end_time"],
                   horizon=pm["horizon"],
                   contact=data[f"p{i}_contact"],
                   contact_duration=data[f"p{i}_contact_duration"])
        ph.reach_end = pm["reach_end"]
        ph.has_tconstr = pm["has_tconstr"]
        if "uid" in pm:
            ph.uid = pm["uid"]
        else:  # legacy checkpoint without uids: assign fresh, distinct ids
            ph.uid = pb._new_uid()
        ph.next_contact = data[f"p{i}_next_contact"]
        for name in _PHASE_ARRAYS:
            setattr(ph, name, data[f"p{i}_{name}"].copy())
        pb.phases.append(ph)
    pb._uid_counter = max([pb._uid_counter] + [p.uid for p in pb.phases])


# ---------------------------------------------------------------------------
# fleet checkpoints: one schedule (uid-keyed, as above) + the batched
# device-resident SolverState of every robot
# ---------------------------------------------------------------------------

_STATE_FIELDS = ("Xbar", "Ubar", "dU", "K", "dX", "defect_bar")
_CONSTR_FIELDS = ("reb_delta", "reb_delta_min", "reb_eps", "al_lambda",
                  "al_sigma", "al_sigma_max")


def save_fleet(path: str, fleet) -> None:
    """Persist a FleetMPC: the shared schedule (phase structure + uids,
    so the shift-descriptor gathers stay valid after resume) and the
    (N, ...) batched warm-start state pulled from device."""
    import jax

    arrays, meta = _problem_payload(fleet.problem)
    meta["fleet_n"] = fleet.n
    st = jax.device_get(fleet._state_dev)
    for name in _STATE_FIELDS:
        arrays[f"fs_{name}"] = np.asarray(getattr(st, name))
    for name in _CONSTR_FIELDS:
        arrays[f"fc_{name}"] = np.asarray(getattr(st.constr, name))
    arrays["fs__pf"] = np.asarray(fleet._pf)
    arrays["_meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_fleet(path: str, fleet) -> None:
    """Restore into a FleetMPC built with the same reference file and
    n_robots. Re-arms the device-resident step path; no solve performed —
    the next step() continues where the saved fleet left off."""
    import jax.numpy as jnp

    from hkdmpc_tpu.mpc import fused
    from hkdmpc_tpu.solver.structs import ConstraintState, SolverState

    data = np.load(path)
    meta = json.loads(bytes(data["_meta"]).decode())
    if meta.get("fleet_n") != fleet.n:
        # API-contract check, not an assert: must survive python -O
        raise ValueError(f"fleet checkpoint holds {meta.get('fleet_n')} "
                         f"robots, fleet has {fleet.n}")
    load_problem(path, fleet.problem)
    dt = fleet.dtype
    constr = ConstraintState(
        **{n: jnp.asarray(data[f"fc_{n}"], dt) for n in _CONSTR_FIELDS})
    fleet._state_dev = SolverState(
        constr=constr,
        **{n: jnp.asarray(data[f"fs_{n}"], dt) for n in _STATE_FIELDS})
    fleet._tables = fused.make_tables(fleet.problem, dt)
    fleet._offsets = fleet.problem.flat_offsets()
    if "fs__pf" in data:
        fleet._pf = np.asarray(data["fs__pf"]).copy()
    fleet._pending = None
    fleet._last = None
