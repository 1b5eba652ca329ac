"""Host-side problem construction: contact-schedule segmentation, receding-
horizon updates, and flattening to the static-shape device arrays.

Parity targets:
- HKDProblem::initialization  (HKDMPC/HKD-TrajOpt/HKDProblem.cpp:14-111)
- HKDProblem::update          (HKDProblem.cpp:116-222) — per-MPC-step shrink
  of the front phase / growth or append of the back phase, shooting-set
  refresh, and the reference's warm-start quirks (front Ubar[0] zeroed, new
  phases warm-started at zero).
- create_problem_one_phase / add_tconstr_one_phase (HKDProblem.cpp:224-310)

Everything here is cheap numpy bookkeeping; the flattened ProblemData /
SolverState handed to the jitted solver have *fixed* shapes (T transitions),
so receding-horizon structure changes never trigger recompiles.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from hkdmpc_tpu.config import ConstraintParams
from hkdmpc_tpu.reference.quad_reference import QuadReference
from hkdmpc_tpu.solver.structs import (DYN, PAD, RESET, ConstraintState,
                                       ProblemData, SolverState)

_EPS_T = 1e-6


@dataclasses.dataclass
class Phase:
    start_time: float
    end_time: float
    horizon: int
    contact: np.ndarray              # (4,) int
    contact_duration: np.ndarray     # (4,)
    reach_end: bool = False
    has_tconstr: bool = False
    td_mask: np.ndarray = None       # (4,) float, set when tconstr added
    next_contact: np.ndarray = None  # (4,) int, bound when tconstr added
    # warm-startable per-phase trajectory (nodes = horizon + 1)
    Xbar: np.ndarray = None          # (h+1, 24)
    Ubar: np.ndarray = None          # (h, 24)
    dU: np.ndarray = None
    K: np.ndarray = None             # (h, 24, 24)
    dX: np.ndarray = None            # (h+1, 24)
    defect_bar: np.ndarray = None    # (h+1, 24)
    reb_delta: np.ndarray = None     # (h, 20)
    reb_eps: np.ndarray = None       # (h, 20)
    al_lambda: np.ndarray = None     # (4,)
    al_sigma: np.ndarray = None      # (4,)
    uid: int = -1                    # stable identity across receding updates

    def alloc(self, pb: "HKDProblem"):
        self.uid = pb._new_uid()
        h = self.horizon
        self.Xbar = np.zeros((h + 1, 24))
        self.Ubar = np.zeros((h, 24))
        self.dU = np.zeros((h, 24))
        self.K = np.zeros((h, 24, 24))
        self.dX = np.zeros((h + 1, 24))
        self.defect_bar = np.zeros((h + 1, 24))
        deltas, _, epss = pb._reb_row_params()
        self.reb_delta = np.tile(deltas, (h, 1))
        self.reb_eps = np.tile(epss, (h, 1))
        self.al_lambda = np.zeros(pb.n_term_rows)
        self.al_sigma = np.zeros(pb.n_term_rows)
        self.td_mask = np.zeros(4)
        self.next_contact = self.contact.copy()


class HKDProblem:
    """Multi-phase HKD trajectory-optimization problem with receding-horizon
    updates, flattening to ProblemData/SolverState of static size T."""

    def __init__(self, quad_ref: QuadReference, plan_duration: float = 0.6,
                 dt_sim: float = 0.01, dt_mpc: float = 0.01,
                 cparams: Optional[ConstraintParams] = None,
                 T: Optional[int] = None, dtype=jnp.float64, model=None):
        from hkdmpc_tpu.solver.model_api import hkd_model_spec
        self.model = model or hkd_model_spec()
        self.ref = quad_ref
        self.plan_duration = plan_duration
        self.dt_sim = dt_sim
        self.dt_mpc = dt_mpc
        self.cparams = cparams or ConstraintParams()
        self.dtype = dtype
        self.phases: List[Phase] = []
        n_steps = int(round(plan_duration / dt_sim))
        # margin for phase-boundary (reset) transitions. The densest shipped
        # gait phase-switches every ~8 steps, so long plans need margin
        # proportional to the horizon; the default 0.6 s MPC window keeps
        # its historical T=75 (bench/test shapes unchanged).
        self.T = (T if T is not None
                  else n_steps + 15 + max(0, (n_steps - 60) // 4))
        self._uid_counter = 0
        self._al_reinit_uids = set()  # phases whose AL params were re-inited
                                      # by _add_tconstr during the last update()

    def _new_uid(self) -> int:
        self._uid_counter += 1
        return self._uid_counter

    # per-row ReB/AL parameter vectors from the model's constraint terms,
    # keyed by term name (HKDProblem::loadConstrintParameters analog)
    def _reb_row_params(self):
        deltas, delta_mins, epss = [], [], []
        for c in self.model.path_constraints:
            p = {"GRF": self.cparams.grf_reb,
                 "Swing": self.cparams.swing_reb}.get(c.name)
            d, dm, e = ((p.delta, p.delta_min, p.eps) if p
                        else (0.01, 0.001, 1.0))
            deltas += [d] * c.n_rows
            delta_mins += [dm] * c.n_rows
            epss += [e] * c.n_rows
        return (np.asarray(deltas), np.asarray(delta_mins), np.asarray(epss))

    @property
    def n_path_rows(self):
        return self.model.n_path_rows

    @property
    def n_term_rows(self):
        return self.model.n_terminal_rows

    # ------------------------------------------------------------------
    # initialization (parity: HKDProblem.cpp:14-111)
    # ------------------------------------------------------------------

    def initialization(self):
        ref = self.ref
        ref.initialize(self.plan_duration)
        self.phases = []

        contact_prev = ref.contact_at_t(0.0).copy()
        contact_dur = ref.contact_duration_at_t(0.0).copy()
        phase_start = 0.0
        t = 0.0
        while t <= self.plan_duration + _EPS_T:
            contact_cur = ref.contact_at_t(t)
            if (contact_cur != contact_prev).any() or t >= self.plan_duration - _EPS_T:
                horizon = int(round((t - phase_start) / self.dt_sim))
                ph = Phase(start_time=phase_start, end_time=t, horizon=horizon,
                           contact=contact_prev.astype(int).copy(),
                           contact_duration=contact_dur.copy())
                ph.alloc(self)
                self.phases.append(ph)
                contact_prev = contact_cur.copy()
                contact_dur = ref.contact_duration_at_t(t).copy()
                phase_start = t
            t += self.dt_sim

        # warm-start nominal state trajectory from the reference
        for ph in self.phases:
            for k in range(ph.horizon + 1):
                ph.Xbar[k] = self._xr_at(ph.start_time + k * self.dt_sim)

        # terminal machinery for every phase (HKDProblem.cpp:103 at init)
        for i in range(len(self.phases)):
            self._add_tconstr(i)

    def _window_index(self, t_rel: float) -> int:
        """Window-relative time -> absolute top-level index (reference's
        half-step rounding)."""
        return self.ref._index(t_rel)

    def _xr_at(self, t_rel: float) -> np.ndarray:
        return self.ref.hkd_state_at(self._window_index(t_rel))

    def _ur_at(self, t_rel: float) -> np.ndarray:
        return self.ref.hkd_control_at(self._window_index(t_rel))

    def _add_tconstr(self, idx: int):
        """Bind reset-map contacts + touchdown constraint for phase idx
        (parity: add_tconstr_one_phase, HKDProblem.cpp:267-310)."""
        ph = self.phases[idx]
        if idx < len(self.phases) - 1:
            contact_next = self.phases[idx + 1].contact
        else:
            contact_next = self.ref.contact_at_t(
                self.plan_duration + self.dt_mpc).astype(int)
        ph.next_contact = np.asarray(contact_next, dtype=int).copy()
        td = ((ph.contact == 0) & (ph.next_contact == 1)).astype(float)
        ph.td_mask = td
        ph.has_tconstr = True
        if td.any():
            ph.al_lambda = np.full(self.n_term_rows, self.cparams.td_al.lambda_)
            ph.al_sigma = np.full(self.n_term_rows, self.cparams.td_al.sigma)
            self._al_reinit_uids.add(ph.uid)

    # ------------------------------------------------------------------
    # receding-horizon update (parity: HKDProblem.cpp:116-222)
    # ------------------------------------------------------------------

    def update(self, nsteps: Optional[int] = None):
        ref = self.ref
        self._al_reinit_uids = set()
        for _ in range(nsteps or int(round(self.dt_mpc / self.dt_sim))):
            ref.step(self.dt_sim)
            new_start = ref.start_time
            new_end = ref.end_time

            # --- front end: shrink or pop the first phase
            front = self.phases[0]
            front.start_time += self.dt_sim
            if front.end_time <= new_start + _EPS_T:
                self.phases.pop(0)
            else:
                self._pop_front_step(front)
                front.start_time = new_start

            # --- back end: grow last phase or append a new one
            back = self.phases[-1]
            new_contact = ref.contact_at_t(new_end - new_start).astype(int)
            contact_change = (new_contact != back.contact).any()

            if contact_change and back.reach_end:
                h_new = int(round((new_end - back.end_time) / self.dt_sim))
                ph = Phase(start_time=back.end_time, end_time=new_end,
                           horizon=h_new, contact=new_contact.copy(),
                           contact_duration=ref.contact_duration_at_t(
                               new_end - new_start).copy())
                ph.alloc(self)  # new phases warm-start at zero
                self.phases.append(ph)
            else:
                back.end_time = new_end
                back.horizon += 1
                if contact_change:
                    back.reach_end = True
                self._push_back_step(back)

            if self.phases[-1].reach_end:
                self._add_tconstr(len(self.phases) - 1)

        # warm-start quirk: first control of the horizon zeroed every update
        # (HKDProblem.cpp:219)
        if self.phases[0].horizon > 0:
            self.phases[0].Ubar[0] = 0.0

    @staticmethod
    def _pop_front_step(ph: Phase):
        ph.horizon -= 1
        for name in ("Xbar", "dX", "defect_bar"):
            setattr(ph, name, getattr(ph, name)[1:].copy())
        for name in ("Ubar", "dU", "K", "reb_delta", "reb_eps"):
            setattr(ph, name, getattr(ph, name)[1:].copy())

    def _push_back_step(self, ph: Phase):
        """push_back_default: duplicate the last state, zero controls, copy
        the last constraint params (TrajectoryManagement.cpp:181-207,
        ConstraintsBase.h push_back)."""
        ph.Xbar = np.vstack([ph.Xbar, ph.Xbar[-1:]])
        ph.dX = np.vstack([ph.dX, np.zeros((1, 24))])
        ph.defect_bar = np.vstack([ph.defect_bar, np.zeros((1, 24))])
        ph.Ubar = np.vstack([ph.Ubar, np.zeros((1, 24))])
        ph.dU = np.vstack([ph.dU, np.zeros((1, 24))])
        ph.K = np.concatenate([ph.K, np.zeros((1, 24, 24))], axis=0)
        if len(ph.reb_delta):
            ph.reb_delta = np.vstack([ph.reb_delta, ph.reb_delta[-1:]])
            ph.reb_eps = np.vstack([ph.reb_eps, ph.reb_eps[-1:]])
        else:
            deltas, _, epss = self._reb_row_params()
            ph.reb_delta = np.tile(deltas, (1, 1))
            ph.reb_eps = np.tile(epss, (1, 1))

    # ------------------------------------------------------------------
    # flattening
    # ------------------------------------------------------------------

    def pretty_print(self):
        """Phase-schedule table (HKDProblem::pretty_print analog,
        HKDProblem.cpp:313-358 — plain text instead of vendored tabulate)."""
        hdr = ("idx", "horizon", "start", "end", "contact", "durations")
        rows = [(str(i), str(ph.horizon), f"{ph.start_time:.3f}",
                 f"{ph.end_time:.3f}", " ".join(map(str, ph.contact)),
                 " ".join(f"{d:.2f}" for d in ph.contact_duration))
                for i, ph in enumerate(self.phases)]
        widths = [max(len(r[c]) for r in [hdr] + rows) for c in range(len(hdr))]
        line = " | ".join(h.ljust(w) for h, w in zip(hdr, widths))
        print(f"Plan duration {self.plan_duration}  dt_sim {self.dt_sim}  "
              f"dt_mpc {self.dt_mpc}")
        print(line)
        print("-" * len(line))
        for r in rows:
            print(" | ".join(v.ljust(w) for v, w in zip(r, widths)))

    def all_shooting(self) -> bool:
        """True when every phase's nodes are shooting nodes — enables the
        scan-free parallel rollout path (ddp.solve(parallel_rollout=True))."""
        return all(self._ss_on(i) for i in range(len(self.phases)))

    def _ss_on(self, i: int) -> bool:
        """Shooting-set activity of phase i (HKDProblem.cpp:205-216 +
        SinglePhase::update_SS_config)."""
        return i < len(self.phases) - 1 or self.phases[i].horizon > 2

    def flat_offsets(self) -> dict:
        """{uid: (node_offset, trans_offset, horizon)} for the current
        schedule in the flat layout build() produces."""
        out = {}
        off = 0
        for i, ph in enumerate(self.phases):
            out[ph.uid] = (off, off, ph.horizon)
            off += ph.horizon + (1 if i < len(self.phases) - 1 else 0)
        return out

    def shift_descriptor(self, old_offsets: dict) -> dict:
        """Index arrays expressing the receding-horizon warm-start update
        (unflatten -> update() -> build of the state half) as pure gathers
        over the *previous* flat SolverState — the device-residency fast
        path's wire format (gather indices are host ints; the big arrays
        never leave the device).

        Call AFTER update(); `old_offsets` is flat_offsets() captured before.
        Per-entry semantics (all -1 = "no source"):
          gidx_node (T+1,): source node for Xbar / AL rows. Grown-tail nodes
            clamp to the phase's old terminal (push_back dup-last,
            TrajectoryManagement.cpp:181-207; AL params live at the moving
            terminal node). -1 -> zero (appended phases warm-start at zero,
            HKDProblem.cpp:116-222 quirk).
          node_new (T+1,): 1 where dX/defect_bar are zeroed (new nodes).
          gidx_u (T,): source transition for Ubar/dU/K. -1 -> zero.
          gidx_reb (T,): source transition for ReB rows; grown steps clamp
            to the phase's old last step (push_back copies constraint
            params). -1 -> fresh default tile.
          al_init (T+1,): 1 where _add_tconstr re-initialized AL params this
            update (overrides the gather).
        """
        T = self.T
        gidx_node = np.full(T + 1, -1, np.int32)
        node_new = np.zeros(T + 1)
        gidx_u = np.full(T, -1, np.int32)
        gidx_reb = np.full(T, -1, np.int32)
        al_init = np.zeros(T + 1)

        new_offsets = self.flat_offsets()
        for ph in self.phases:
            no_n, to_n, h_n = new_offsets[ph.uid]
            old = old_offsets.get(ph.uid)
            if old is None:
                continue  # appended phase: zeros / fresh tiles
            no_o, to_o, h_o = old
            trim = max(0, h_o - h_n)   # front phase: steps popped
            grown = max(0, h_n - h_o)  # back phase: steps pushed
            assert trim == 0 or grown == 0, \
                "a phase cannot shrink and grow in one update"
            for k in range(h_n + 1):
                k_old = k + trim
                gidx_node[no_n + k] = no_o + min(k_old, h_o)
                if k_old > h_o:
                    node_new[no_n + k] = 1.0
            for k in range(h_n):
                k_old = k + trim
                if k_old <= h_o - 1:
                    gidx_u[to_n + k] = to_o + k_old
                gidx_reb[to_n + k] = to_o + min(k_old, h_o - 1)
            if ph.uid in self._al_reinit_uids:
                al_init[no_n + h_n] = 1.0

        return dict(gidx_node=gidx_node, node_new=node_new, gidx_u=gidx_u,
                    gidx_reb=gidx_reb, al_init=al_init)

    def problem_arrays(self) -> dict:
        """The ProblemData-side flat arrays as host numpy (no warm-start
        state, no device transfer): the layout build() produces, plus the
        per-node reference-table index `ridx` and `node_active` mask in
        place of the gathered xr/ur/foot_r."""
        T = self.T
        P = len(self.phases)
        n_trans = sum(ph.horizon for ph in self.phases) + P - 1
        assert n_trans <= T, f"problem needs {n_trans} transitions > T={T}"

        kind = np.zeros(T, np.int32)
        contact = np.zeros((T, 4))
        contact_next = np.zeros((T, 4))
        ridx = np.zeros(T + 1, np.int32)
        node_active = np.zeros(T + 1)
        term_mask = np.zeros(T + 1)
        term_contact = np.zeros((T + 1, 4))
        td_mask = np.zeros((T + 1, 4))
        ss_mask = np.zeros(T + 1)
        start_mask = np.zeros(T + 1)

        t_idx = 0  # transition cursor; node j = t_idx
        node_map = []  # (phase, local node) per flat node, for unflatten
        for i, ph in enumerate(self.phases):
            ss = 1.0 if self._ss_on(i) else 0.0
            for k in range(ph.horizon + 1):
                j = t_idx + k
                t_rel = (ph.start_time - self.phases[0].start_time
                         + k * self.dt_sim)
                ridx[j] = self.ref._index(t_rel)
                node_active[j] = 1.0
                term_contact[j] = ph.contact
                ss_mask[j] = ss
                node_map.append((i, k))
                if k == 0:
                    start_mask[j] = 1.0
            kind[t_idx: t_idx + ph.horizon] = DYN
            contact[t_idx: t_idx + ph.horizon] = ph.contact
            contact_next[t_idx: t_idx + ph.horizon] = ph.contact
            jterm = t_idx + ph.horizon
            term_mask[jterm] = 1.0
            if ph.has_tconstr:
                td_mask[jterm] = ph.td_mask
            if i < P - 1:
                t = t_idx + ph.horizon
                kind[t] = RESET
                contact[t] = ph.contact
                contact_next[t] = ph.next_contact
                t_idx = t + 1
            else:
                t_idx = t_idx + ph.horizon

        return dict(kind=kind, contact=contact, contact_next=contact_next,
                    ridx=ridx, node_active=node_active, term_mask=term_mask,
                    term_contact=term_contact, td_mask=td_mask,
                    ss_mask=ss_mask, start_mask=start_mask,
                    node_map=node_map)

    def build(self, x0: np.ndarray):
        """Flatten to (ProblemData, SolverState) with static size T."""
        T = self.T
        pa = self.problem_arrays()
        self._node_map = pa["node_map"]

        # reference gathers from the dense tables (zeros at inactive nodes)
        act = pa["node_active"][:, None]
        xr = self.ref.hkd_state_table()[pa["ridx"]] * act
        ur = self.ref.hkd_control_table()[pa["ridx"]] * act
        foot_r = self.ref.foot_placements[pa["ridx"]] * act

        Xbar = np.zeros((T + 1, 24))
        Ubar = np.zeros((T, 24))
        dU = np.zeros((T, 24))
        K = np.zeros((T, 24, 24))
        dX = np.zeros((T + 1, 24))
        defect_bar = np.zeros((T + 1, 24))
        n_tr = self.n_term_rows
        deltas, delta_mins, epss = self._reb_row_params()
        reb_delta = np.tile(deltas, (T, 1))
        reb_eps = np.tile(epss, (T, 1))
        al_lambda = np.zeros((T + 1, n_tr))
        al_sigma = np.zeros((T + 1, n_tr))

        t_idx = 0
        for i, ph in enumerate(self.phases):
            for k in range(ph.horizon + 1):
                j = t_idx + k
                Xbar[j] = ph.Xbar[k]
                dX[j] = ph.dX[k]
                defect_bar[j] = ph.defect_bar[k]
            h = ph.horizon
            Ubar[t_idx: t_idx + h] = ph.Ubar
            dU[t_idx: t_idx + h] = ph.dU
            K[t_idx: t_idx + h] = ph.K
            reb_delta[t_idx: t_idx + h] = ph.reb_delta
            reb_eps[t_idx: t_idx + h] = ph.reb_eps
            jterm = t_idx + h
            if ph.has_tconstr:
                al_lambda[jterm] = ph.al_lambda
                al_sigma[jterm] = ph.al_sigma
            t_idx += h + (1 if i < len(self.phases) - 1 else 0)

        dtype = self.dtype
        prob = ProblemData(
            kind=jnp.asarray(pa["kind"]),
            contact=jnp.asarray(pa["contact"], dtype),
            contact_next=jnp.asarray(pa["contact_next"], dtype),
            dt=jnp.asarray(self.dt_sim, dtype),
            xr=jnp.asarray(xr, dtype), ur=jnp.asarray(ur, dtype),
            foot_r=jnp.asarray(foot_r, dtype),
            term_mask=jnp.asarray(pa["term_mask"], dtype),
            term_contact=jnp.asarray(pa["term_contact"], dtype),
            td_mask=jnp.asarray(pa["td_mask"], dtype),
            ss_mask=jnp.asarray(pa["ss_mask"], dtype),
            start_mask=jnp.asarray(pa["start_mask"], dtype),
            x0=jnp.asarray(x0, dtype),
        )
        constr = ConstraintState(
            reb_delta=jnp.asarray(reb_delta, dtype),
            reb_delta_min=jnp.asarray(np.tile(delta_mins, (T, 1)), dtype),
            reb_eps=jnp.asarray(reb_eps, dtype),
            al_lambda=jnp.asarray(al_lambda, dtype),
            al_sigma=jnp.asarray(al_sigma, dtype),
            al_sigma_max=jnp.full((T + 1, n_tr), self.cparams.td_al.sigma_max,
                                  dtype),
        )
        state = SolverState(
            Xbar=jnp.asarray(Xbar, dtype), Ubar=jnp.asarray(Ubar, dtype),
            dU=jnp.asarray(dU, dtype), K=jnp.asarray(K, dtype),
            dX=jnp.asarray(dX, dtype), defect_bar=jnp.asarray(defect_bar, dtype),
            constr=constr,
        )
        return prob, state

    def unflatten(self, state: SolverState):
        """Write a solved SolverState back into the per-phase warm-start
        arrays (the reference keeps these alive inside HKDProblemData)."""
        Xbar = np.asarray(state.Xbar)
        Ubar = np.asarray(state.Ubar)
        dU = np.asarray(state.dU)
        K = np.asarray(state.K)
        dX = np.asarray(state.dX)
        defect = np.asarray(state.defect_bar)
        rd = np.asarray(state.constr.reb_delta)
        re = np.asarray(state.constr.reb_eps)
        al_l = np.asarray(state.constr.al_lambda)
        al_s = np.asarray(state.constr.al_sigma)

        for j, (i, k) in enumerate(self._node_map):
            ph = self.phases[i]
            ph.Xbar[k] = Xbar[j]
            ph.dX[k] = dX[j]
            ph.defect_bar[k] = defect[j]
            if k < ph.horizon:
                ph.Ubar[k] = Ubar[j]
                ph.dU[k] = dU[j]
                ph.K[k] = K[j]
                ph.reb_delta[k] = rd[j]
                ph.reb_eps[k] = re[j]
            if k == ph.horizon and ph.has_tconstr:
                ph.al_lambda = al_l[j].copy()
                ph.al_sigma = al_s[j].copy()
