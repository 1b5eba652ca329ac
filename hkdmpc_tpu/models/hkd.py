"""Hybrid kino-dynamic (HKD) quadruped model — pure JAX.

Re-implements, from first principles, the model that the reference ships as
CasADi-generated C (reference: HKDMPC/HKD-TrajOpt/CasadiGen/source/
hkinodyn_casadi.cpp, hkinodyn_par_casadi.cpp, comp_foot_pos_casadi.cpp,
comp_foot_jacob_{1..4}_casadi.cpp) and wraps in HKDMPC/HKD-TrajOpt/HKDModel.h
and HKDReset.h. Verified to machine precision against those kernels
(tests/test_dynamics_golden.py).

State x (24): [eul(3) = (yaw, pitch, roll) ZYX, pos(3) world, omega(3) body,
               v(3) world, qdummy(12)]
qdummy per leg: joint angles (abad, hip, knee) while in swing; world-frame
foot xy position (z meaningless) while in stance.
Control u (24): [GRF(12) world frame per leg, commanded joint velocity(12)].
contact: float (4,) per-leg stance indicator (1 = stance, 0 = swing).

Everything here is shape-static, control-flow free (masking only), and
therefore `jit`/`vmap`/`jacfwd` friendly — contact is *data*, not structure.
"""

from functools import partial

import jax
import jax.numpy as jnp

from hkdmpc_tpu.models import mini_cheetah as mc
from hkdmpc_tpu.ops import precise


def euler_zyx_to_rotmat(eul):
    """R = Rz(yaw) @ Ry(pitch) @ Rx(roll). eul = (yaw, pitch, roll)."""
    yaw, pitch, roll = eul[0], eul[1], eul[2]
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    return jnp.array([
        [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
        [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
        [-sp,     cp * sr,                cp * cr],
    ])


def euler_zyx_rates_matrix(eul):
    """E(eul) with eul_dot = E @ omega_body, for eul = (yaw, pitch, roll)."""
    pitch, roll = eul[1], eul[2]
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    return jnp.array([
        [0.0, sr / cp,      cr / cp],
        [0.0, cr,           -sr],
        [1.0, sr * sp / cp, cr * sp / cp],
    ])


def leg_forward_kinematics(qleg, side_sign):
    """Foot position in the hip frame for one leg. qleg = (abad, hip, knee)."""
    l1, l2, l3 = mc.ABAD_LINK, mc.THIGH_LINK, mc.SHANK_LINK
    q1, q2, q3 = qleg[0], qleg[1], qleg[2]
    s1, c1 = jnp.sin(q1), jnp.cos(q1)
    s2, c2 = jnp.sin(q2), jnp.cos(q2)
    s23, c23 = jnp.sin(q2 + q3), jnp.cos(q2 + q3)
    return jnp.array([
        l3 * s23 + l2 * s2,
        l1 * side_sign * c1 + l3 * s1 * c23 + l2 * c2 * s1,
        l1 * side_sign * s1 - l3 * c1 * c23 - l2 * c1 * c2,
    ])


def foot_position(pos, eul, qleg, leg):
    """World-frame foot position of `leg` (static int 0..3).

    Parity with reference `compute_foot_position` (leg_id = leg + 1).
    """
    R = euler_zyx_to_rotmat(eul)
    hip = jnp.asarray(mc.HIP_OFFSETS[leg], dtype=pos.dtype)
    p_hip = leg_forward_kinematics(qleg, float(mc.SIDE_SIGNS[leg]))
    return pos + precise.mv(R, hip + p_hip)


def foot_positions(pos, eul, qJ):
    """(4,3) world-frame foot positions; qJ is (12,) joint angles."""
    q = qJ.reshape(4, 3)
    return jnp.stack([foot_position(pos, eul, q[l], l) for l in range(4)])


def _euler_zyx_rotmat_derivs(eul):
    """(R, dR/dyaw, dR/dpitch, dR/droll)."""
    yaw, pitch, roll = eul[0], eul[1], eul[2]
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    Rz = jnp.array([[cy, -sy, 0.0], [sy, cy, 0.0], [0.0, 0.0, 1.0]])
    Ry = jnp.array([[cp, 0.0, sp], [0.0, 1.0, 0.0], [-sp, 0.0, cp]])
    Rx = jnp.array([[1.0, 0.0, 0.0], [0.0, cr, -sr], [0.0, sr, cr]])
    dRz = jnp.array([[-sy, -cy, 0.0], [cy, -sy, 0.0], [0.0, 0.0, 0.0]])
    dRy = jnp.array([[-sp, 0.0, cp], [0.0, 0.0, 0.0], [-cp, 0.0, -sp]])
    dRx = jnp.array([[0.0, 0.0, 0.0], [0.0, -sr, -cr], [0.0, cr, -sr]])
    RyRx = precise.mm(Ry, Rx)
    return (precise.mm(Rz, RyRx), precise.mm(dRz, RyRx),
            precise.mm(Rz, precise.mm(dRy, Rx)),
            precise.mm(precise.mm(Rz, Ry), dRx))


def leg_jacobian(qleg, side_sign):
    """d p_leg / d qleg (3,3), closed form (derivative of
    leg_forward_kinematics)."""
    l1, l2, l3 = mc.ABAD_LINK, mc.THIGH_LINK, mc.SHANK_LINK
    q1, q2, q3 = qleg[0], qleg[1], qleg[2]
    s1, c1 = jnp.sin(q1), jnp.cos(q1)
    s2, c2 = jnp.sin(q2), jnp.cos(q2)
    s23, c23 = jnp.sin(q2 + q3), jnp.cos(q2 + q3)
    ext = l3 * c23 + l2 * c2           # leg extension terms
    flx = l3 * s23 + l2 * s2
    p_y = l1 * side_sign * c1 + s1 * ext
    p_z = l1 * side_sign * s1 - c1 * ext
    return jnp.array([
        [0.0,        ext,       l3 * c23],
        [-p_z,       -s1 * flx, -s1 * l3 * s23],
        [p_y,        c1 * flx,  c1 * l3 * s23],
    ])


def foot_jacobian_analytic(pos, eul, qleg, leg):
    """(d pf/d pos (3,3)=I implied, d pf/d eul (3,3), d pf/d qleg (3,3)) for
    pf = pos + R (hip + p_leg). Matches the reference's comp_foot_jacob_l
    kernels to machine precision (tests/test_dynamics_golden.py)."""
    R, dRy_, dRp_, dRr_ = _euler_zyx_rotmat_derivs(eul)
    p = jnp.asarray(mc.HIP_OFFSETS[leg], eul.dtype) + leg_forward_kinematics(
        qleg, float(mc.SIDE_SIGNS[leg]))
    d_eul = jnp.stack([precise.mv(dRy_, p), precise.mv(dRp_, p),
                       precise.mv(dRr_, p)], axis=1)
    d_q = precise.mm(R, leg_jacobian(qleg, float(mc.SIDE_SIGNS[leg])))
    return d_eul, d_q


def foot_height_jacobian(x, leg):
    """d foot_z / dx (24,) for `leg`, with qdummy interpreted as joint angles.

    Matches the reference's TouchDownConstraint::compute_partial row layout
    (reference: HKDMPC/HKD-TrajOpt/HKDConstraints.cpp:124-171), via the
    closed-form foot jacobian.
    """
    d_eul, d_q = foot_jacobian_analytic(x[3:6], x[0:3],
                                        x[12 + 3 * leg: 15 + 3 * leg], leg)
    row = jnp.zeros(24, x.dtype)
    row = row.at[0:3].set(d_eul[2])
    row = row.at[5].set(1.0)  # d pf_z / d pos_z (d pf/d pos = I)
    row = row.at[12 + 3 * leg: 15 + 3 * leg].set(d_q[2])
    return row


def compute_hkd_state(eul, pos, qJ, contact):
    """Build qdummy from joint angles: FK foot position for stance legs,
    raw joint angles for swing legs.

    Parity with reference compute_hkd_state (HKDMPC/HKD-TrajOpt/HKDModel.h:65-96).
    contact: float (4,).
    """
    pf = foot_positions(pos, eul, qJ)              # (4,3)
    qj = qJ.reshape(4, 3)
    c = contact.reshape(4, 1)
    return (c * pf + (1.0 - c) * qj).reshape(12)


def dynamics_continuous(x, u, contact):
    """Continuous-time HKD dynamics xdot = f(x, u, contact)."""
    dtype = x.dtype
    eul, pos = x[0:3], x[3:6]
    omega, v = x[6:9], x[9:12]
    qdummy = x[12:24]
    grf = u[0:12].reshape(4, 3)
    qJd = u[12:24].reshape(4, 3)
    c = contact.reshape(4, 1)

    R = euler_zyx_to_rotmat(eul)
    eul_dot = precise.mv(euler_zyx_rates_matrix(eul), omega)

    # torque about CoM in body frame; stance feet assumed on the ground (z = 0),
    # foot xy from qdummy (reference: hkinodyn_casadi.cpp body)
    foot_xy = qdummy.reshape(4, 3)
    r_world = jnp.concatenate(
        [foot_xy[:, 0:2] - pos[0:2], jnp.broadcast_to(-pos[2], (4, 1))], axis=1)
    r_body = precise.mm(r_world, R)  # == (R^T r^T)^T
    f_body = precise.mm(grf, R)
    tau_body = jnp.sum(c * jnp.cross(r_body, f_body), axis=0)

    I_diag = jnp.asarray(mc.INERTIA_DIAG, dtype=dtype)
    I_inv = jnp.asarray(mc.INERTIA_INV_DIAG, dtype=dtype)
    omega_dot = I_inv * (tau_body - jnp.cross(omega, I_diag * omega))

    f_total = jnp.sum(c * grf, axis=0)
    g_vec = jnp.array([0.0, 0.0, -mc.GRAVITY], dtype=dtype)
    v_dot = f_total / mc.MASS + g_vec

    qdummy_dot = ((1.0 - c) * qJd).reshape(12)

    return jnp.concatenate([eul_dot, v, omega_dot, v_dot, qdummy_dot])


def dynamics(x, u, contact, dt):
    """Forward-Euler discrete step — parity with reference `hkinodyn`."""
    return x + dt * dynamics_continuous(x, u, contact)


def dynamics_jacobians(x, u, contact, dt):
    """(A, B) = (d xnext/dx, d xnext/du) — parity with `hkinodyn_par`."""
    A = jax.jacfwd(lambda xx: dynamics(xx, u, contact, dt))(x)
    B = jax.jacfwd(lambda uu: dynamics(x, uu, contact, dt))(u)
    return A, B


def _cross_mat(v):
    z = jnp.zeros((), v.dtype)
    return jnp.array([
        [z, -v[2], v[1]],
        [v[2], z, -v[0]],
        [-v[1], v[0], z]])


def dynamics_jacobians_analytic(x, u, contact, dt):
    """Hand-derived (A, B) — identical values to `dynamics_jacobians` but
    ~20x cheaper than the 48-tangent jacfwd (validated to machine precision
    in tests/test_dynamics_golden.py).

    Key simplification: since R in SO(3) satisfies (R^T a) x (R^T b)
    = R^T (a x b), the body torque is tau = R^T m with m = sum_l c_l r_l x f_l,
    so all orientation derivatives reduce to dR^T/d(angle) @ m.
    """
    dtype = x.dtype
    eul, pos = x[0:3], x[3:6]
    omega = x[6:9]
    qdummy = x[12:24]
    grf = u[0:12].reshape(4, 3)
    c = contact
    c12 = jnp.repeat(c, 3)

    yaw, pitch, roll = eul[0], eul[1], eul[2]
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    R = euler_zyx_to_rotmat(eul)

    z33 = jnp.zeros((3, 3), dtype)

    # --- euler-rate rows (0:3): d(E w)/d(eul), E itself wrt omega
    E = euler_zyx_rates_matrix(eul)
    wy, wz = omega[1], omega[2]
    s = sr * wy + cr * wz                 # appears in yaw/roll rows
    t = cr * wy - sr * wz
    dE_deul = jnp.array([
        [0.0, s * sp / (cp * cp), t / cp],
        [0.0, 0.0, -s],
        [0.0, s / (cp * cp), t * sp / cp],
    ])

    # --- torque m = sum c r x f  (world), tau = R^T m
    foot = qdummy.reshape(4, 3)
    r_world = jnp.concatenate(
        [foot[:, 0:2] - pos[0:2], jnp.broadcast_to(-pos[2], (4, 1))], axis=1)
    m = jnp.sum(c[:, None] * jnp.cross(r_world, grf), axis=0)
    F_c = jnp.sum(c[:, None] * grf, axis=0)

    # dR/d(angle)^T @ m  for the three ZYX angles
    dRz = jnp.array([[-sy, -cy, 0.0], [cy, -sy, 0.0], [0.0, 0.0, 0.0]])
    dRy = jnp.array([[-sp, 0.0, cp], [0.0, 0.0, 0.0], [-cp, 0.0, -sp]])
    dRx = jnp.array([[0.0, 0.0, 0.0], [0.0, -sr, -cr], [0.0, cr, -sr]])
    Rz = jnp.array([[cy, -sy, 0.0], [sy, cy, 0.0], [0.0, 0.0, 1.0]])
    Ry = jnp.array([[cp, 0.0, sp], [0.0, 1.0, 0.0], [-sp, 0.0, cp]])
    Rx = jnp.array([[1.0, 0.0, 0.0], [0.0, cr, -sr], [0.0, sr, cr]])
    RyRx = precise.mm(Ry, Rx)
    dR_yaw = precise.mm(dRz, RyRx)
    dR_pitch = precise.mm(Rz, precise.mm(dRy, Rx))
    dR_roll = precise.mm(precise.mm(Rz, Ry), dRx)
    dtau_deul = jnp.stack([precise.mv(dR_yaw.T, m), precise.mv(dR_pitch.T, m),
                           precise.mv(dR_roll.T, m)], axis=1)

    dtau_dpos = precise.mm(R.T, _cross_mat(F_c))

    I_diag = jnp.asarray(mc.INERTIA_DIAG, dtype=dtype)
    I_inv = jnp.asarray(mc.INERTIA_INV_DIAG, dtype=dtype)
    # d/dw [ -w x (I w) ] = -( [w]x I - [I w]x )
    gyro = -(precise.mm(_cross_mat(omega), jnp.diag(I_diag))
             - _cross_mat(I_diag * omega))

    # d tau / d qdummy: per leg, columns (x, y) are R^T (e_j x f_l), z is 0
    # e_x x f = (0, -f_z, f_y); e_y x f = (f_z, 0, -f_x)
    cols = []
    zero3 = jnp.zeros(3, dtype)
    for l in range(4):
        f = grf[l]
        ex_cross_f = jnp.array([0.0, -f[2], f[1]], dtype)
        ey_cross_f = jnp.array([f[2], 0.0, -f[0]], dtype)
        cols.append(c[l] * precise.mv(R.T, ex_cross_f))
        cols.append(c[l] * precise.mv(R.T, ey_cross_f))
        cols.append(zero3)
    dtau_dqd = jnp.stack(cols, axis=1)

    Iinv_col = I_inv[:, None]
    # --- assemble A = I + dt * J
    A = jnp.zeros((24, 24), dtype)
    A = A.at[0:3, 1:3].set(dE_deul[:, 1:3])
    A = A.at[0:3, 6:9].set(E)
    A = A.at[3:6, 9:12].set(jnp.eye(3, dtype=dtype))
    A = A.at[6:9, 0:3].set(Iinv_col * dtau_deul)
    A = A.at[6:9, 3:6].set(Iinv_col * dtau_dpos)
    A = A.at[6:9, 6:9].set(Iinv_col * gyro)
    A = A.at[6:9, 12:24].set(Iinv_col * dtau_dqd)
    A = dt * A + jnp.eye(24, dtype=dtype)

    # --- B
    B = jnp.zeros((24, 24), dtype)
    for l in range(4):
        B = B.at[6:9, 3 * l:3 * l + 3].set(
            c[l] * (Iinv_col * precise.mm(R.T, _cross_mat(r_world[l]))))
        B = B.at[9:12, 3 * l:3 * l + 3].set(
            (c[l] / mc.MASS) * jnp.eye(3, dtype=dtype))
    B = B.at[12:24, 12:24].set(jnp.diag(1.0 - c12))
    B = dt * B
    return A, B


def reset_map(x, c_cur, c_next):
    """Hybrid reset map applied at a phase boundary.

    stance -> swing: qdummy_leg := default leg pose.
    swing -> stance: qdummy_leg := (pf_x, pf_y, 0) from FK at the pre-impact pose.
    otherwise identity. Parity with HKDReset::resetmap (HKDReset.h:41-75).
    c_cur / c_next: float (4,).
    """
    dtype = x.dtype
    eul, pos, qdummy = x[0:3], x[3:6], x[12:24]
    qd = qdummy.reshape(4, 3)
    qleg_default = jnp.asarray(mc.QLEG_DEFAULT, dtype=dtype)
    cmap = jnp.array([1.0, 1.0, 0.0], dtype=dtype)

    new_legs = []
    for l in range(4):
        to_swing = c_cur[l] * (1.0 - c_next[l])          # stance -> swing
        to_stance = (1.0 - c_cur[l]) * c_next[l]         # swing -> stance
        pf = foot_position(pos, eul, qd[l], l) * cmap
        keep = 1.0 - to_swing - to_stance
        new_legs.append(keep * qd[l] + to_swing * qleg_default + to_stance * pf)
    return jnp.concatenate([x[0:12], jnp.concatenate(new_legs)])


def reset_map_jacobian(x, c_cur, c_next):
    """Px = d reset_map / dx (24,24) — parity with HKDReset::resetmap_partial.

    Closed-form: identity body block; per leg, stance->swing rows zero,
    swing->stance rows = cmap-masked analytic foot jacobian, otherwise
    identity (validated against jacfwd of reset_map in the test suite).
    """
    dtype = x.dtype
    eul, pos, qdummy = x[0:3], x[3:6], x[12:24]
    qd = qdummy.reshape(4, 3)
    Px = jnp.eye(24, dtype=dtype)
    for l in range(4):
        to_swing = c_cur[l] * (1.0 - c_next[l])
        to_stance = (1.0 - c_cur[l]) * c_next[l]
        keep = 1.0 - to_swing - to_stance
        r0 = 12 + 3 * l
        d_eul, d_q = foot_jacobian_analytic(pos, eul, qd[l], l)
        blk = jnp.zeros((3, 24), dtype)
        blk = blk.at[:, 0:3].set(d_eul)
        blk = blk.at[:, 3:6].set(jnp.eye(3, dtype=dtype))
        blk = blk.at[:, r0:r0 + 3].set(d_q)
        blk = blk.at[2, :].set(0.0)               # cmap = diag(1,1,0)
        ident = jnp.zeros((3, 24), dtype).at[:, r0:r0 + 3].set(
            jnp.eye(3, dtype=dtype))
        rows = keep * ident + to_stance * blk     # to_swing -> zero rows
        Px = Px.at[r0:r0 + 3, :].set(rows)
    return Px


def reset_map_jacobian_ad(x, c_cur, c_next):
    """jacfwd reference implementation (used in tests)."""
    return jax.jacfwd(lambda xx: reset_map(xx, c_cur, c_next))(x)


# ---- batched conveniences -------------------------------------------------

dynamics_vmap_steps = jax.vmap(dynamics, in_axes=(0, 0, 0, None))
dynamics_jacobians_vmap = jax.vmap(dynamics_jacobians, in_axes=(0, 0, 0, None))
