"""A deliberately naive, per-phase numpy implementation of the reference
HS-DDP solver — an independent oracle for the flattened TPU solver.

Mirrors the C++ structure statement-for-statement (deque of phases, per-step
loops, shared mutable trajectories): MultiPhaseDDP.cpp solve/rollout/sweep/
line_search, SinglePhase.cpp, ConstraintsBase.h. Uses the (golden-verified)
JAX model functions in f64 for dynamics/FK so any trace mismatch against the
flattened solver isolates *solver* logic, not the model.

Test-only code: clarity over speed.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from hkdmpc_tpu.models import hkd
from hkdmpc_tpu.models import hkd_weights as HW


def _np(f, *args):
    return np.asarray(f(*[jnp.asarray(a, jnp.float64) for a in args]))


class PhaseRef:
    def __init__(self, horizon, contact, contact_next, td_mask, ss_on,
                 xr, ur, foot_r, cparams, has_tconstr=True):
        h = self.horizon = horizon
        self.contact = np.asarray(contact, float)
        self.contact_next = np.asarray(contact_next, float)
        self.td_mask = np.asarray(td_mask, float)
        self.ss = ss_on
        self.xr = xr          # (h+1, 24)
        self.ur = ur          # (h+1, 24)
        self.foot_r = foot_r  # (h+1, 12)
        self.Xbar = xr.copy()
        self.X = xr.copy()
        self.Ubar = np.zeros((h, 24))
        self.U = np.zeros((h, 24))
        self.Xsim = np.zeros((h + 1, 24))
        self.defect = np.zeros((h + 1, 24))
        self.defect_bar = np.zeros((h + 1, 24))
        self.dU = np.zeros((h, 24))
        self.K = np.zeros((h, 24, 24))
        self.dX = np.zeros((h + 1, 24))
        self.G = np.zeros((h + 1, 24))
        self.H = np.zeros((h + 1, 24, 24))
        self.A = np.zeros((h, 24, 24))
        self.B = np.zeros((h, 24, 24))
        self.rc = [dict() for _ in range(h)]
        self.tc = dict()
        # constraints
        self.reb_delta = np.full((h, 20), cparams.grf_reb.delta)
        self.reb_delta_min = np.full((h, 20), cparams.grf_reb.delta_min)
        self.reb_eps = np.full((h, 20), cparams.grf_reb.eps)
        self.g = np.zeros((h, 20))
        self.h_td = np.zeros(4)
        self.al_lambda = np.full(4, cparams.td_al.lambda_)
        self.al_sigma = np.full(4, cparams.td_al.sigma)
        self.al_sigma_max = cparams.td_al.sigma_max
        self.has_tconstr = has_tconstr

    # --- model pieces ------------------------------------------------------

    def dynamics(self, x, u, dt):
        return _np(hkd.dynamics, x, u, self.contact, np.float64(dt))

    def dyn_jac(self, x, u, dt):
        A, B = hkd.dynamics_jacobians_analytic(
            jnp.asarray(x), jnp.asarray(u), jnp.asarray(self.contact),
            jnp.float64(dt))
        return np.asarray(A), np.asarray(B)

    def resetmap(self, x):
        return _np(hkd.reset_map, x, self.contact, self.contact_next)

    def resetmap_partial(self, x):
        return np.asarray(hkd.reset_map_jacobian(
            jnp.asarray(x), jnp.asarray(self.contact),
            jnp.asarray(self.contact_next)))

    # --- costs (HKDCost.h / SinglePhaseInterface.cpp) ----------------------

    def q_diag(self):
        q = np.array(list(HW.Q_BODY) + [0.0] * 12)
        for l in range(4):
            q[12 + 3 * l: 15 + 3 * l] = HW.Q_SWING_LEG * (1 - self.contact[l])
        return q

    def qf_diag(self):
        scale = np.array(list(HW.QF_SCALE_BODY) + [HW.QF_SCALE_LEG] * 12)
        return HW.QF_MULT * scale * self.q_diag()

    R_DIAG = np.array([HW.R_GRF] * 12 + [HW.R_QJD] * 12)

    def footreg(self, x, k):
        c12 = np.repeat(self.contact, 3)
        W = HW.FOOTREG_MULT * np.tile(HW.FOOTREG_AXIS, 4) * c12
        prel = x[12:24] - np.tile(x[3:6], 4)
        prel_r = self.foot_r[k] - np.tile(self.xr[k][3:6], 4)
        d = prel - prel_r
        J = np.zeros((12, 24))
        J[:, 12:24] = np.diag(c12)
        J[:, 3:6] = -np.tile(np.eye(3), (4, 1)) * c12[:, None]
        return d, W, J

    def running_cost(self, x, u, k, dt):
        dx = x - self.xr[k]
        du = u - self.ur[k]
        d, W, _ = self.footreg(x, k)
        return dt * 0.5 * (dx @ (self.q_diag() * dx) + du @ (self.R_DIAG * du)
                           + d @ (W * d))

    def terminal_cost(self, x):
        k = self.horizon
        dx = x - self.xr[k]
        d, W, _ = self.footreg(x, k)
        return (0.5 * dx @ (self.qf_diag() * dx)
                + HW.FOOTREG_TERM_FACTOR * d @ (W * d))

    # --- GRF constraint + ReB ---------------------------------------------

    _MU = HW.MU_FRICTION
    A_LEG = np.array([[0, 0, 1.], [-1, 0, _MU], [1, 0, _MU], [0, -1, _MU],
                      [0, 1, _MU]])

    def grf_rows(self, u):
        g = np.zeros(20)
        for l in range(4):
            g[5 * l:5 * l + 5] = self.A_LEG @ u[3 * l:3 * l + 3]
        mask = np.repeat(self.contact, 5)
        return g * mask + (1 - mask), mask

    def reb_value(self, g, k):
        out = 0.0
        for i in range(20):
            if self.contact[i // 5] == 0:
                continue
            delta, eps = self.reb_delta[k][i], self.reb_eps[k][i]
            if g[i] > delta:
                out += eps * (-np.log(g[i]))
            else:
                out += eps * (0.5 * (((g[i] - 2 * delta) / delta) ** 2 - 1)
                              - np.log(delta))
        return out

    def touchdown(self, x):
        h = np.zeros(4)
        for l in range(4):
            if self.td_mask[l]:
                pf = _np(lambda p, e, q: hkd.foot_position(p, e, q, l),
                         x[3:6], x[0:3], x[12 + 3 * l:15 + 3 * l])
                h[l] = pf[2]
        return h

    def al_cost(self, h):
        return float(np.sum(self.td_mask * (0.5 * self.al_sigma * h * h
                                            + self.al_lambda * h)))


    # --- receding-horizon trajectory mutation (TrajectoryManagement.cpp) --

    def pop_front(self):
        """Drop the first step (Trajectory::pop_front,
        TrajectoryManagement.cpp:118-145 + ConstraintContainer pop_front_n)."""
        self.horizon -= 1
        for name in ("Xbar", "X", "Xsim", "defect", "defect_bar", "dX",
                     "G", "H"):
            setattr(self, name, getattr(self, name)[1:].copy())
        for name in ("Ubar", "U", "dU", "K", "A", "B", "g",
                     "reb_delta", "reb_delta_min", "reb_eps"):
            setattr(self, name, getattr(self, name)[1:].copy())
        self.rc = self.rc[1:]

    def push_back_default(self):
        """Append one step: Xbar/X duplicate the last state, everything else
        zero, constraint params copy the last row (SinglePhase.cpp:486-491
        push_back_default -> Trajectory::push_back_state,
        TrajectoryManagement.cpp:181-207; ConstraintsBase.h push_back)."""
        self.horizon += 1
        for name in ("Xbar", "X"):
            a = getattr(self, name)
            setattr(self, name, np.vstack([a, a[-1:]]))
        for name in ("Xsim", "defect", "defect_bar", "dX", "G"):
            a = getattr(self, name)
            setattr(self, name, np.vstack([a, np.zeros((1, 24))]))
        self.H = np.concatenate([self.H, np.zeros((1, 24, 24))], axis=0)
        for name in ("Ubar", "U", "dU"):
            a = getattr(self, name)
            setattr(self, name, np.vstack([a, np.zeros((1, 24))]))
        for name in ("A", "B", "K"):
            a = getattr(self, name)
            setattr(self, name, np.concatenate(
                [a, np.zeros((1, 24, 24))], axis=0))
        self.g = np.vstack([self.g, np.zeros((1, 20))])
        for name in ("reb_delta", "reb_delta_min", "reb_eps"):
            a = getattr(self, name)
            setattr(self, name, np.vstack([a, a[-1:]]))
        self.rc = self.rc + [dict()]


class NaiveMPC:
    """Independent numpy mirror of HKDProblem's receding-horizon machinery
    (HKD-TrajOpt/HKDProblem.cpp:14-222) over PhaseRef objects and its own
    QuadReference window: contact segmentation, per-MPC-step front
    shrink/pop, back grow/append (appended phases warm-start at ZERO —
    HKDProblem.cpp:160-184 never touches the reference), touchdown-
    constraint refresh with AL re-init (add_tconstr_one_phase re-creates
    the constraint each call, HKDProblem.cpp:267-310), the shooting-set
    refresh with the asymmetric tiny-last-phase rule (HKDProblem.cpp:215-218),
    and the front Ubar[0] zeroing quirk (HKDProblem.cpp:219). reach_end
    starts False for every phase — initialization's
    `contact_prev != contact_prev` self-compare (HKDProblem.cpp:59) is
    always false; kept as behavior."""

    def __init__(self, ref, plan_duration, cparams, dt_sim=0.01,
                 dt_mpc=0.01):
        self.ref = ref
        self.plan_duration = plan_duration
        self.dt = dt_sim
        self.dt_mpc = dt_mpc
        self.cparams = cparams
        self.phases = []
        ref.initialize(plan_duration)

        contact_prev = np.asarray(ref.contact_at_t(0.0), float).copy()
        phase_start = 0.0
        t = 0.0
        while t <= plan_duration + 1e-6:
            c = np.asarray(ref.contact_at_t(t), float)
            if (c != contact_prev).any() or t >= plan_duration - 1e-6:
                h = int(round((t - phase_start) / dt_sim))
                ph = self._make_phase(phase_start, t, h, contact_prev)
                self.phases.append(ph)
                contact_prev = c.copy()
                phase_start = t
            t += dt_sim
        self._refresh_refs()
        for ph in self.phases:           # initial warm start from reference
            ph.Xbar = ph.xr.copy()
            ph.X = ph.xr.copy()
        for i in range(len(self.phases)):
            self._add_tconstr(i)
        self._refresh_ss()

    def _make_phase(self, t0, t1, h, contact):
        ph = PhaseRef(horizon=h, contact=contact,
                      contact_next=np.asarray(contact, float).copy(),
                      td_mask=np.zeros(4), ss_on=True,
                      xr=np.zeros((h + 1, 24)), ur=np.zeros((h + 1, 24)),
                      foot_r=np.zeros((h + 1, 12)), cparams=self.cparams,
                      has_tconstr=False)
        # fresh phases carry zero warm starts and zero AL params until
        # _add_tconstr binds a touchdown (HKDProblem.cpp:160-184)
        ph.Xbar = np.zeros((h + 1, 24))
        ph.X = np.zeros((h + 1, 24))
        ph.al_lambda = np.zeros(4)
        ph.al_sigma = np.zeros(4)
        ph.start_time = t0
        ph.end_time = t1
        ph.reach_end = False
        return ph

    def _add_tconstr(self, idx):
        ph = self.phases[idx]
        if idx < len(self.phases) - 1:
            contact_next = np.asarray(self.phases[idx + 1].contact, float)
        else:
            contact_next = np.asarray(self.ref.contact_at_t(
                self.plan_duration + self.dt_mpc), float)
        ph.contact_next = contact_next.copy()
        td = ((ph.contact == 0) & (contact_next == 1)).astype(float)
        ph.td_mask = td
        ph.has_tconstr = True
        if td.any():   # re-created constraint => fresh AL params
            ph.al_lambda = np.full(4, self.cparams.td_al.lambda_)
            ph.al_sigma = np.full(4, self.cparams.td_al.sigma)

    def _refresh_refs(self):
        """Re-derive per-phase reference arrays from the (shifted) window —
        the C++ queries the reference live through per-phase time offsets
        (HKDProblem.cpp:205-208 set_time_offset + HKDReference)."""
        t0 = self.phases[0].start_time
        for ph in self.phases:
            h = ph.horizon
            ph.xr = np.zeros((h + 1, 24))
            ph.ur = np.zeros((h + 1, 24))
            ph.foot_r = np.zeros((h + 1, 12))
            for k in range(h + 1):
                ridx = self.ref._index(ph.start_time - t0 + k * self.dt)
                ph.xr[k] = self.ref.hkd_state_at(ridx)
                ph.ur[k] = self.ref.hkd_control_at(ridx)
                ph.foot_r[k] = self.ref.foot_placements[ridx]

    def _refresh_ss(self):
        n = len(self.phases)
        for i, ph in enumerate(self.phases):
            # HKDProblem.cpp:215-218: the last phase only (re)arms its
            # shooting set while horizon > 2; a freshly appended tiny phase
            # has an empty SS_set (SinglePhase::initialization clears it)
            ph.ss = (i < n - 1) or ph.horizon > 2

    def update(self, nsteps=1):
        """Mirror of HKDProblem::update (HKDProblem.cpp:116-222)."""
        for _ in range(nsteps):
            self.ref.step(self.dt)
            new_start = self.ref.start_time
            new_end = self.ref.end_time

            front = self.phases[0]
            front.start_time += self.dt
            if front.end_time <= new_start + 1e-6:
                self.phases.pop(0)
            else:
                front.pop_front()
                front.start_time = new_start

            back = self.phases[-1]
            new_contact = np.asarray(
                self.ref.contact_at_t(new_end - new_start), float)
            contact_change = (new_contact != back.contact).any()

            if contact_change and back.reach_end:
                h_new = int(round((new_end - back.end_time) / self.dt))
                ph = self._make_phase(back.end_time, new_end, h_new,
                                      new_contact.astype(int))
                self.phases.append(ph)
            else:
                back.end_time = new_end
                back.push_back_default()
                if contact_change:
                    back.reach_end = True

            if self.phases[-1].reach_end:
                self._add_tconstr(len(self.phases) - 1)

        # front Ubar[0] zeroed every update (HKDProblem.cpp:219)
        if self.phases[0].horizon > 0:
            self.phases[0].Ubar[0] = 0.0
        self._refresh_refs()
        self._refresh_ss()

    def solve(self, x0, opt):
        """One warm-started re-solve over the current phases; returns the
        NaiveHSDDP instance (traces on it) and its result dict."""
        solver = NaiveHSDDP(self.phases, x0, self.dt, opt)
        out = solver.solve()
        return solver, out


class NaiveHSDDP:
    """Direct mirror of MultiPhaseDDP<double> over PhaseRef objects."""

    def __init__(self, phases, x0, dt, opt):
        self.phases = phases
        self.x0 = np.asarray(x0, float)
        self.dt = dt
        self.opt = opt
        self.cost_trace = []
        self.feas_trace = []
        self.eqn_trace = []
        self.ineq_trace = []

    # --- forward (MultiPhaseDDP::hybrid_rollout + SinglePhase) ------------

    def hybrid_rollout(self, eps):
        xinit = self.x0.copy()
        xsim_init = self.x0.copy()
        ok = True
        for i, ph in enumerate(self.phases):
            if i > 0:
                prev = self.phases[i - 1]
                xinit = prev.resetmap(prev.X[-1])
                xsim_init = prev.resetmap(prev.Xsim[-1])
            ph.Xsim[0] = xsim_init
            ph.X[0] = ph.Xbar[0] + eps * ph.dX[0] if ph.ss else xinit
            for k in range(ph.horizon):
                ph.U[k] = (ph.Ubar[k] + eps * ph.dU[k]
                           + ph.K[k] @ (ph.X[k] - ph.Xbar[k]))
                ph.Xsim[k + 1] = ph.dynamics(ph.X[k], ph.U[k], self.dt)
                if np.linalg.norm(ph.Xsim[k + 1]) > 1e6:
                    ok = False
                if self.opt.MS and ph.ss:
                    ph.X[k + 1] = ph.Xbar[k + 1] + eps * ph.dX[k + 1]
                else:
                    ph.X[k + 1] = ph.Xsim[k + 1]
                ph.g[k], _ = ph.grf_rows(ph.U[k])
            ph.h_td = ph.touchdown(ph.X[ph.horizon])
            ph.defect = ph.Xsim - ph.X
        return ok

    def compute_cost(self):
        total = 0.0
        for ph in self.phases:
            for k in range(ph.horizon):
                l = ph.running_cost(ph.X[k], ph.U[k], k, self.dt)
                if self.opt.ReB_active:
                    g_raw = np.zeros(20)
                    for l4 in range(4):
                        g_raw[5 * l4:5 * l4 + 5] = (
                            ph.A_LEG @ ph.U[k][3 * l4:3 * l4 + 3])
                    l += self.dt * ph.reb_value(g_raw, k)
                total += l
            phi = ph.terminal_cost(ph.X[ph.horizon])
            if self.opt.AL_active:
                phi += ph.al_cost(ph.h_td)
            total += phi
        return total

    def feasibility(self):
        s = 0.0
        for ph in self.phases:
            s += np.sum(ph.defect ** 2)
        return np.sqrt(s)

    def max_violations(self):
        maxp, maxt = 0.0, 0.0
        for ph in self.phases:
            maxp = min(maxp, ph.g.min() if ph.g.size else 0.0)
            maxt = max(maxt, np.abs(ph.h_td * ph.td_mask).max())
        return maxp, maxt

    # --- LQ + backward -----------------------------------------------------

    def lq_approximation(self):
        for ph in self.phases:
            for k in range(ph.horizon):
                x, u = ph.X[k], ph.U[k]
                ph.A[k], ph.B[k] = ph.dyn_jac(x, u, self.dt)
                dx = x - ph.xr[k]
                du = u - ph.ur[k]
                d, W, J = ph.footreg(x, k)
                rc = ph.rc[k]
                rc["lx"] = self.dt * (ph.q_diag() * dx + J.T @ (W * d))
                rc["lu"] = self.dt * (ph.R_DIAG * du)
                rc["lxx"] = self.dt * (np.diag(ph.q_diag())
                                       + J.T @ (W[:, None] * J))
                rc["luu"] = self.dt * np.diag(ph.R_DIAG)
                rc["lux"] = np.zeros((24, 24))
                if self.opt.ReB_active:
                    g_raw = np.zeros(20)
                    gu = np.zeros((20, 24))
                    for l4 in range(4):
                        g_raw[5 * l4:5 * l4 + 5] = (
                            ph.A_LEG @ u[3 * l4:3 * l4 + 3])
                        gu[5 * l4:5 * l4 + 5, 3 * l4:3 * l4 + 3] = ph.A_LEG
                    for i in range(20):
                        if ph.contact[i // 5] == 0:
                            continue
                        delta, epsb = ph.reb_delta[k][i], ph.reb_eps[k][i]
                        if g_raw[i] > delta:
                            d1 = -1.0 / g_raw[i]
                            d2 = 1.0 / g_raw[i] ** 2
                        else:
                            d1 = (g_raw[i] - 2 * delta) / delta ** 2
                            d2 = 1.0 / delta ** 2
                        rc["lu"] += self.dt * epsb * d1 * gu[i]
                        rc["luu"] += self.dt * epsb * d2 * np.outer(gu[i],
                                                                    gu[i])
            x = ph.X[ph.horizon]
            k = ph.horizon
            dx = x - ph.xr[k]
            d, W, J = ph.footreg(x, k)
            tf2 = 2.0 * HW.FOOTREG_TERM_FACTOR
            ph.tc["phix"] = ph.qf_diag() * dx + tf2 * J.T @ (W * d)
            ph.tc["phixx"] = (np.diag(ph.qf_diag())
                              + tf2 * J.T @ (W[:, None] * J))
            if self.opt.AL_active:
                h = ph.touchdown(x)
                for l in range(4):
                    if not ph.td_mask[l]:
                        continue
                    hx = np.asarray(hkd.foot_height_jacobian(
                        jnp.asarray(x), l))
                    sig, lam = ph.al_sigma[l], ph.al_lambda[l]
                    ph.tc["phix"] += (sig * h[l] + lam) * hx
                    ph.tc["phixx"] += ((sig * (1 + h[l]) + lam)
                                       * np.outer(hx, hx))

    def backward_sweep(self, reg):
        dV1 = dV2 = 0.0
        Gp = np.zeros(24)
        Hp = np.zeros((24, 24))
        for i in range(len(self.phases) - 1, -1, -1):
            ph = self.phases[i]
            if i < len(self.phases) - 1:
                Px = ph.resetmap_partial(ph.X[-1])
                nxt = self.phases[i + 1]
                Gp = Px.T @ nxt.G[0]
                Hp = Px.T @ nxt.H[0] @ Px
            else:
                Gp = np.zeros(24)
                Hp = np.zeros((24, 24))
            ph.G[ph.horizon] = ph.tc["phix"] + Gp
            ph.H[ph.horizon] = ph.tc["phixx"] + Hp
            for k in range(ph.horizon - 1, -1, -1):
                rc = ph.rc[k]
                Gn = ph.G[k + 1] + ph.H[k + 1] @ ph.defect[k + 1]
                Hn = ph.H[k + 1]
                Qx = rc["lx"] + ph.A[k].T @ Gn
                Qu = rc["lu"] + ph.B[k].T @ Gn
                Qxx = rc["lxx"] + ph.A[k].T @ Hn @ ph.A[k]
                Quu = rc["luu"] + ph.B[k].T @ Hn @ ph.B[k]
                Qux = rc["lux"] + ph.B[k].T @ Hn @ ph.A[k]
                Qxx = Qxx + reg * np.eye(24)
                Quu = Quu + reg * np.eye(24)
                try:
                    np.linalg.cholesky(Quu - 1e-9 * np.eye(24))
                except np.linalg.LinAlgError:
                    return None
                Quu_inv = np.linalg.inv(Quu)
                Quu_inv = 0.5 * (Quu_inv + Quu_inv.T)
                Qxx = 0.5 * (Qxx + Qxx.T)
                ph.dU[k] = -Quu_inv @ Qu
                ph.K[k] = -Quu_inv @ Qux
                ph.G[k] = Qx - Qux.T @ Quu_inv @ Qu
                ph.H[k] = Qxx - Qux.T @ Quu_inv @ Qux
                dv_k = -Qu @ ph.dU[k]
                dV1 -= dv_k
                dV2 += dv_k
            ph.G[0] = ph.G[0] + ph.H[0] @ ph.defect[0]
        return dV1, dV2

    def backward_sweep_regularized(self, reg):
        while True:
            out = self.backward_sweep(reg)
            if out is not None:
                break
            reg = max(reg * self.opt.update_regularization, 1e-3)
            if reg > 1e2:
                return None, reg
        reg_out = reg / 20.0
        if reg_out < 1e-6:
            reg_out = 0.0
        return out, reg_out

    def linear_rollout(self, eps):
        dV1 = dV2 = 0.0
        dx = np.zeros(24)
        for i, ph in enumerate(self.phases):
            if i > 0:
                prev = self.phases[i - 1]
                Px = prev.resetmap_partial(prev.X[-1])
                dx = Px @ prev.dX[-1]
            ph.dX[0] = dx + eps * ph.defect[0]
            for k in range(ph.horizon):
                rc = ph.rc[k]
                du = eps * ph.dU[k] + ph.K[k] @ ph.dX[k]
                ph.dX[k + 1] = (ph.A[k] @ ph.dX[k] + ph.B[k] @ du
                                + eps * ph.defect[k + 1])
                dV1 += rc["lx"] @ ph.dX[k] + rc["lu"] @ du
                dV2 += (ph.dX[k] @ rc["lxx"] @ ph.dX[k]
                        + du @ rc["luu"] @ du + du @ rc["lux"] @ ph.dX[k])
            dxk = ph.dX[ph.horizon]
            dV1 += ph.tc["phix"] @ dxk
            dV2 += dxk @ ph.tc["phixx"] @ dxk
            dx = ph.dX[ph.horizon]
        return dV1, dV2

    def update_nominal(self):
        for ph in self.phases:
            ph.Xbar = ph.X.copy()
            ph.Ubar = ph.U.copy()
            ph.defect_bar = ph.defect.copy()

    # --- solve (MultiPhaseDDP::solve) --------------------------------------

    def solve(self):
        opt = self.opt
        self.hybrid_rollout(0.0)
        self.update_nominal()
        cost = self.compute_cost()
        feas = self.feasibility()
        self.cost_trace = [cost]
        self.feas_trace = [feas]
        maxp, maxt = self.max_violations()
        self.eqn_trace = [maxt]
        self.ineq_trace = [maxp]

        for iter_ou in range(opt.max_AL_iter):
            maxt_prev, maxp_prev = maxt, maxp
            reg = 0.0
            for iter_in in range(opt.max_DDP_iter):
                cost = self.compute_cost()
                feas = self.feasibility()
                self.lq_approximation()
                out, reg = self.backward_sweep_regularized(reg)
                if out is None:
                    return dict(failed=True)
                dV1, dV2 = out
                if opt.MS:
                    dV1, dV2 = self.linear_rollout(1.0)
                dv_abs = abs(dV1 + 0.5 * dV2)
                rho = (dv_abs / ((1 - opt.merit_scale) * feas)
                       + opt.merit_offset) if feas > opt.dynamics_feas_thresh \
                    else 0.0
                merit = cost + rho * feas
                cost_prev, merit_prev = cost, merit
                if dv_abs < opt.cost_thresh and feas <= opt.dynamics_feas_thresh:
                    break
                # line search
                feas_prev = feas
                eps = 1.0
                success = False
                while eps > 1e-3:
                    ok = self.hybrid_rollout(eps)
                    cost = self.compute_cost()
                    feas = self.feasibility()
                    merit = cost + rho * feas
                    exp_cost = eps * dV1 + 0.5 * eps * eps * dV2
                    exp_merit = exp_cost - eps * rho * feas_prev
                    if merit <= merit_prev + opt.gamma * exp_merit and ok:
                        success = True
                        break
                    eps *= opt.alpha
                if success:
                    self.update_nominal()
                else:
                    cost = cost_prev
                    merit = merit_prev
                if (abs((cost_prev - cost) / cost_prev) < opt.cost_thresh
                        and feas <= opt.dynamics_feas_thresh):
                    maxp, maxt = self.max_violations()
                    break  # reference breaks BEFORE buffering (cpp:359)
                maxp, maxt = self.max_violations()
                self.cost_trace.append(cost)
                self.feas_trace.append(feas)
                self.eqn_trace.append(maxt)
                self.ineq_trace.append(maxp)
            # AL / ReB updates
            if opt.AL_active:
                for ph in self.phases:
                    for l in range(4):
                        if not ph.td_mask[l]:
                            continue
                        habs = abs(ph.h_td[l])
                        if habs < opt.tconstr_thresh:
                            continue
                        if habs > 0.005:
                            ph.al_sigma[l] = min(
                                ph.al_sigma[l] * opt.update_penalty,
                                ph.al_sigma_max)
                        else:
                            ph.al_lambda[l] += ph.h_td[l] * ph.al_sigma[l]
            if opt.ReB_active:
                for ph in self.phases:
                    for k in range(ph.horizon):
                        for i in range(20):
                            if ph.g[k][i] > -opt.pconstr_thresh:
                                continue
                            ph.reb_eps[k][i] = (ph.reb_eps[k][i]
                                                * opt.update_ReB)
                            ph.reb_delta[k][i] = max(
                                ph.reb_delta[k][i] * opt.update_relax,
                                ph.reb_delta_min[k][i])
            feas_ok = feas <= opt.dynamics_feas_thresh
            if (maxt < opt.tconstr_thresh and abs(maxp) < opt.pconstr_thresh
                    and feas_ok):
                break
            if (abs(maxt - maxt_prev) < 1e-4 and abs(maxp - maxp_prev) < 1e-4
                    and feas_ok):
                break
        return dict(failed=False, cost=cost, feas=feas, maxp=maxp, maxt=maxt)
