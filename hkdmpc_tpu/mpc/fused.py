"""Device-resident fused MPC step.

The classic per-update path (HKDProblem.unflatten -> update -> build ->
solve -> unflatten) moves every big array host<->device twice per MPC step;
through this sandbox's remote-TPU tunnel each transfer pays a ~30 ms round
trip (scripts/exp_mpc_latency.py: unflatten alone p50 274 ms at batch 1).

This path keeps the SolverState resident on device and expresses the whole
receding-horizon update as ONE jitted program per step:

  1. warm-start shift  — the update()-equivalent as pure gathers over the
     previous flat state (HKDProblem.shift_descriptor), incl. the
     reference's quirks (front Ubar[0] zeroed, zero warm-start appends,
     push_back dup-last / copy-constraint-params, AL re-init);
  2. problem rebuild   — reference tensors gathered from device-resident
     dense tables by host-computed indices;
  3. x0 from raw measurements (HKDMPC.cpp:118 rpy flip done host-side);
  4. the DDP solve (ddp.solve);
  5. command extraction — the first-N-steps controls/body/gains walk of
     HKDMPCSolver::make_command as device gathers.

Host I/O per step: one packed int32 vector + one packed schedule-float
vector + one 28-float measurement vector in, one packed float bundle out
(command + traces + scalars). The previous state buffer is donated. The
schedule vectors are measurement-independent, so a uniform-gait fleet
shares them and `fleet_step` vmaps the core over (state, measurements) —
see mpc/fleet.py.

Equivalence vs the faithful path is pinned by
tests/test_fast_paths.py::test_fused_mpc_step_matches_classic; fleet-vs-
independent-solvers equivalence by tests/test_fleet.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from hkdmpc_tpu.models import hkd
from hkdmpc_tpu.solver import ddp
from hkdmpc_tpu.solver.structs import ConstraintState, ProblemData, SolverState

TRACE_LEN = ddp.TRACE_LEN


# ---------------------------------------------------------------------------
# wire format
# ---------------------------------------------------------------------------

def _int_layout(T: int, n_cmd: int):
    """(name, length) slices of the packed int32 vector."""
    return [
        ("kind", T), ("ridx", T + 1),
        ("gidx_node", T + 1), ("node_new", T + 1),
        ("gidx_u", T), ("gidx_reb", T),
        ("al_init", T + 1), ("node_active", T + 1),
        ("cmd_idx", n_cmd), ("foot_idx", 4),
    ]


def _float_layout(T: int):
    """Schedule-side float vector: shared by every robot of a uniform-gait
    fleet (the per-robot measurements live in the separate meas vector)."""
    return [
        ("contact", T * 4), ("contact_next", T * 4),
        ("td_mask", (T + 1) * 4), ("term_contact", (T + 1) * 4),
        ("term_mask", T + 1), ("ss_mask", T + 1), ("start_mask", T + 1),
    ]


def _meas_layout():
    """Per-robot measurement vector (28 floats): the only per-robot
    host->device traffic of a fleet step."""
    return [
        ("eul", 3), ("p", 3), ("omega", 3), ("v", 3), ("qJ", 12),
        ("front_contact", 4),
    ]


def _unpack(vec, layout):
    out, off = {}, 0
    for name, ln in layout:
        out[name] = vec[off: off + ln]
        off += ln
    return out


def pack_ints(T, n_cmd, **kw) -> np.ndarray:
    parts = []
    for name, ln in _int_layout(T, n_cmd):
        a = np.asarray(kw[name], np.int32).ravel()
        assert a.size == ln, (name, a.size, ln)
        parts.append(a)
    return np.concatenate(parts)


def pack_floats(T, dtype, **kw) -> np.ndarray:
    parts = []
    for name, ln in _float_layout(T):
        a = np.asarray(kw[name], dtype).ravel()
        assert a.size == ln, (name, a.size, ln)
        parts.append(a)
    return np.concatenate(parts)


def pack_meas(dtype, **kw) -> np.ndarray:
    parts = []
    for name, ln in _meas_layout():
        a = np.asarray(kw[name], dtype).ravel()
        assert a.size == ln, (name, a.size, ln)
        parts.append(a)
    return np.concatenate(parts)


def make_tables(problem, dtype) -> dict:
    """Device-resident constants: dense reference tables + constraint
    parameter rows (pushed once at initialize)."""
    ref = problem.ref
    deltas, delta_mins, epss = problem._reb_row_params()
    n_tr = problem.n_term_rows
    return dict(
        state_table=jnp.asarray(ref.hkd_state_table(), dtype),
        control_table=jnp.asarray(ref.hkd_control_table(), dtype),
        foot_table=jnp.asarray(ref.foot_placements, dtype),
        reb_delta_row=jnp.asarray(deltas, dtype),
        reb_delta_min=jnp.asarray(
            np.tile(delta_mins, (problem.T, 1)), dtype),
        reb_eps_row=jnp.asarray(epss, dtype),
        al_lambda_init=jnp.full(n_tr, problem.cparams.td_al.lambda_, dtype),
        al_sigma_init=jnp.full(n_tr, problem.cparams.td_al.sigma, dtype),
        al_sigma_max=jnp.full((problem.T + 1, n_tr),
                              problem.cparams.td_al.sigma_max, dtype),
        dt=jnp.asarray(problem.dt_sim, dtype),
    )


# host-side bundle layout (mirrors the jnp.concatenate in _fused_core).
# trace_len must match the solve's opt via ddp.trace_len_for (the MPC paths
# run runtime caps -> 3 entries, not TRACE_LEN=64)
def bundle_layout(n_cmd: int, trace_len: int = TRACE_LEN):
    return [
        ("scalars", 6),              # cost, feas, maxt, maxp, n_iters, failed
        ("cost_trace", trace_len), ("feas_trace", trace_len),
        ("eqn_trace", trace_len), ("ineq_trace", trace_len),
        ("controls", n_cmd * 24), ("body", n_cmd * 12),
        ("gains", n_cmd * 144), ("pf", 12),
    ]


def unpack_bundle(vec: np.ndarray, n_cmd: int,
                  trace_len: int = TRACE_LEN) -> dict:
    out = _unpack(np.asarray(vec), bundle_layout(n_cmd, trace_len))
    out["controls"] = out["controls"].reshape(n_cmd, 24)
    out["body"] = out["body"].reshape(n_cmd, 12)
    out["gains"] = out["gains"].reshape(n_cmd, 12, 12)
    out["pf"] = out["pf"].reshape(4, 3)
    return out


# ---------------------------------------------------------------------------
# host half of a receding-horizon step (shared single-robot / fleet)
# ---------------------------------------------------------------------------

def host_step(pb, old_offsets, nsteps, n_cmd, mpc_time, timestep, np_dtype):
    """Advance the schedule one MPC step and build the shared device-step
    vectors: problem.update() + shift descriptor + problem arrays + the
    host halves of the make_command walk (HKDMPC.cpp:242-298) and the
    foot-placement scan (HKDMPC.cpp:206-240). Measurement-independent —
    one call serves every robot of a uniform-gait fleet.

    Returns (ints, floats, new_offsets, aux) with aux carrying the
    command-side host metadata (times/contacts/status/found)."""
    from hkdmpc_tpu.solver.structs import DYN

    old = old_offsets
    pb.update(nsteps)
    desc = pb.shift_descriptor(old)
    new_offsets = pb.flat_offsets()
    pa = pb.problem_arrays()
    pb._node_map = pa["node_map"]

    # command walk (host half): DYN transition indices + phase scalars
    dyn_idx = np.flatnonzero(pa["kind"] == DYN)[:n_cmd]
    cmd_idx = np.full(n_cmd, -1, np.int32)
    cmd_idx[: len(dyn_idx)] = dyn_idx
    contacts = np.zeros((n_cmd, 4), int)
    status = np.zeros((n_cmd, 4))
    times = np.zeros(n_cmd)
    k = i = s = 0
    while k < n_cmd:
        if s >= pb.phases[i].horizon:
            s = 0
            i += 1
            if i >= len(pb.phases):
                break
        contacts[k] = pb.phases[i].contact
        status[k] = pb.phases[i].contact_duration
        times[k] = mpc_time + k * timestep
        s += 1
        k += 1

    # foot-placement plan (HKDMPC.cpp:206-240 walk, host half)
    foot_idx = np.full(4, -1, np.int32)
    found = [False] * 4
    node_off = {ph.uid: new_offsets[ph.uid][0] for ph in pb.phases}
    for i in range(len(pb.phases) - 1):
        c, cn = pb.phases[i].contact, pb.phases[i + 1].contact
        for leg in range(4):
            if not found[leg] and c[leg] == 0 and cn[leg] == 1:
                foot_idx[leg] = node_off[pb.phases[i + 1].uid]
                found[leg] = True
        if i >= 4:
            break

    ints = pack_ints(
        pb.T, n_cmd, kind=pa["kind"], ridx=pa["ridx"],
        gidx_node=desc["gidx_node"], node_new=desc["node_new"],
        gidx_u=desc["gidx_u"], gidx_reb=desc["gidx_reb"],
        al_init=desc["al_init"], node_active=pa["node_active"],
        cmd_idx=cmd_idx, foot_idx=foot_idx)
    floats = pack_floats(
        pb.T, np_dtype, contact=pa["contact"],
        contact_next=pa["contact_next"], td_mask=pa["td_mask"],
        term_contact=pa["term_contact"], term_mask=pa["term_mask"],
        ss_mask=pa["ss_mask"], start_mask=pa["start_mask"])
    aux = dict(times=times, contacts=contacts, status=status, found=found)
    return ints, floats, new_offsets, aux


# ---------------------------------------------------------------------------
# the fused program
# ---------------------------------------------------------------------------

def _fused_core(tables, state, ints, floats, meas, opt, parallel_rollout,
                n_cmd, model=None, assoc_linear=False, assoc_backward=False,
                kernel_jac=False, unroll_caps=False):
    """The fused receding-horizon step as a pure function of device arrays.

    jit'd directly as `fused_step` (batch-1 latency path) and vmapped over
    (state, meas) as `fleet_step` (device-resident batched fleet MPC:
    schedule vectors shared across robots, only the 28-float measurement
    vector is per-robot)."""
    T = state.Ubar.shape[0]
    dtype = state.Xbar.dtype
    iv = _unpack(ints, _int_layout(T, n_cmd))
    fv = _unpack(floats, _float_layout(T))
    mv_ = _unpack(meas, _meas_layout())

    # ---- 1. warm-start shift (gathers over the previous flat state) ------
    gn = iv["gidx_node"]
    gn_c = jnp.maximum(gn, 0)
    node_ok = (gn >= 0).astype(dtype)[:, None]
    not_new = 1.0 - iv["node_new"].astype(dtype)[:, None]
    gu = iv["gidx_u"]
    gu_c = jnp.maximum(gu, 0)
    u_ok = (gu >= 0).astype(dtype)[:, None]
    gr = iv["gidx_reb"]
    gr_c = jnp.maximum(gr, 0)
    r_ok = (gr >= 0).astype(dtype)[:, None]

    Xbar = state.Xbar[gn_c] * node_ok
    dX = state.dX[gn_c] * node_ok * not_new
    defect = state.defect_bar[gn_c] * node_ok * not_new
    Ubar = (state.Ubar[gu_c] * u_ok).at[0].set(0.0)  # HKDProblem.cpp:219
    dU = state.dU[gu_c] * u_ok
    K = state.K[gu_c] * u_ok[:, :, None]

    c = state.constr
    reb_delta = jnp.where(r_ok > 0, c.reb_delta[gr_c],
                          tables["reb_delta_row"][None, :])
    reb_eps = jnp.where(r_ok > 0, c.reb_eps[gr_c],
                        tables["reb_eps_row"][None, :])
    term_mask = fv["term_mask"]
    al_init = iv["al_init"].astype(dtype)[:, None]
    # gathered AL rows are masked to terminal nodes (build() leaves interior
    # rows zero); al_init overrides with the fresh cparams values
    al_lambda = (c.al_lambda[gn_c] * node_ok * term_mask[:, None]
                 * (1.0 - al_init) + al_init * tables["al_lambda_init"])
    al_sigma = (c.al_sigma[gn_c] * node_ok * term_mask[:, None]
                * (1.0 - al_init) + al_init * tables["al_sigma_init"])
    constr = ConstraintState(
        reb_delta=reb_delta, reb_delta_min=tables["reb_delta_min"],
        reb_eps=reb_eps, al_lambda=al_lambda, al_sigma=al_sigma,
        al_sigma_max=tables["al_sigma_max"])

    # ---- 2./3. problem rebuild + x0 ---------------------------------------
    act = iv["node_active"].astype(dtype)[:, None]
    ridx = iv["ridx"]
    xr = tables["state_table"][ridx] * act
    ur = tables["control_table"][ridx] * act
    foot_r = tables["foot_table"][ridx] * act

    eul, p, omega, v = mv_["eul"], mv_["p"], mv_["omega"], mv_["v"]
    qd = hkd.compute_hkd_state(eul, p, mv_["qJ"], mv_["front_contact"])
    x0 = jnp.concatenate([eul, p, omega, v, qd])

    prob = ProblemData(
        kind=iv["kind"],
        contact=fv["contact"].reshape(T, 4),
        contact_next=fv["contact_next"].reshape(T, 4),
        dt=tables["dt"],
        xr=xr, ur=ur, foot_r=foot_r,
        term_mask=term_mask,
        term_contact=fv["term_contact"].reshape(T + 1, 4),
        td_mask=fv["td_mask"].reshape(T + 1, 4),
        ss_mask=fv["ss_mask"], start_mask=fv["start_mask"],
        x0=x0,
    )
    new_state = SolverState(Xbar=Xbar, Ubar=Ubar, dU=dU, K=K, dX=dX,
                            defect_bar=defect, constr=constr)

    # ---- 4. solve ----------------------------------------------------------
    res = ddp.solve(prob, new_state, opt, parallel_rollout, model,
                    assoc_linear, assoc_backward=assoc_backward,
                    kernel_jac=kernel_jac, unroll_caps=unroll_caps)

    # ---- 5. command extraction (make_command walk, HKDMPC.cpp:242-298) ----
    ci = iv["cmd_idx"]
    ci_c = jnp.maximum(ci, 0)
    cmask = (ci >= 0).astype(dtype)
    controls = res.state.Ubar[ci_c] * cmask[:, None]
    body = res.state.Xbar[ci_c][:, :12] * cmask[:, None]
    gains = res.state.K[ci_c][:, :12, :12] * cmask[:, None, None]

    fi = iv["foot_idx"]
    fi_c = jnp.maximum(fi, 0)
    fmask = (fi >= 0).astype(dtype)
    qd_rows = res.state.Xbar[fi_c][:, 12:24]        # (4, 12)
    pf = jnp.stack([qd_rows[l, 3 * l: 3 * l + 3] for l in range(4)]) \
        * fmask[:, None]

    scalars = jnp.stack([
        res.cost, res.dyn_feas, res.max_tconstr, res.max_pconstr,
        res.n_iters.astype(dtype), res.solve_failed.astype(dtype)])
    bundle = jnp.concatenate([
        scalars, res.cost_trace, res.feas_trace, res.eqn_trace,
        res.ineq_trace, controls.ravel(), body.ravel(), gains.ravel(),
        pf.ravel()])
    return res.state, bundle


_FUSED_STATICS = ("opt", "parallel_rollout", "n_cmd", "model",
                  "assoc_linear", "assoc_backward", "kernel_jac",
                  "unroll_caps")

# batch-1 latency path: one robot, previous state donated
fused_step = partial(jax.jit, donate_argnums=(1,),
                     static_argnames=_FUSED_STATICS)(_fused_core)


@partial(jax.jit, donate_argnums=(1,), static_argnames=_FUSED_STATICS)
def fleet_step(tables, state_b, ints, floats, meas_b, opt, parallel_rollout,
               n_cmd, model=None, assoc_linear=False, assoc_backward=False,
               kernel_jac=False, unroll_caps=False):
    """Device-resident batched fleet MPC step: the whole receding-horizon
    update for N warm-started robots as ONE program.

    state_b is the batched SolverState (leading robot axis, donated);
    meas_b is (N, 28) per-robot measurements; tables and the schedule
    vectors (ints/floats) are shared — a uniform-gait fleet advances one
    schedule, so the warm-start shift gathers and problem rebuild indices
    are identical across robots (reference analog, per robot:
    HKDMPC/HKDMPC.cpp:96-166 + HKD-TrajOpt/HKDProblem.cpp:116-222).
    Returns (state_b', bundle_b (N, bundle_len))."""
    return jax.vmap(
        lambda s, m: _fused_core(
            tables, s, ints, floats, m, opt, parallel_rollout, n_cmd,
            model, assoc_linear, assoc_backward, kernel_jac, unroll_caps)
    )(state_b, meas_b)
