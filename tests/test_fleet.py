"""Batched fleet MPC (mpc/fleet.py) vs N independent fused solvers.

The fleet step vmaps the fused receding-horizon core over robots; this must
reproduce N independent device-resident HKDMPCSolver loops exactly —
commands AND warm-started device state, through front-phase pops and a
back-phase append (the same 12-step trot segment the fused-vs-classic test
straddles)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

REF = "/root/reference/Reference/Data/trot/quad_reference.csv"
SET = "/root/reference/HKDMPC/settings/ddp_setting.info"
CPAR = "/root/reference/HKDMPC/settings/constraint_params.info"

N = 3


def _meas_stream(seed):
    rng = np.random.default_rng(seed)

    def meas(step):
        return dict(
            rpy=rng.normal(scale=0.01, size=3),
            p=np.array([0.0, 0.0, 0.25]) + rng.normal(scale=0.005, size=3),
            v=rng.normal(scale=0.02, size=3),
            omega=rng.normal(scale=0.02, size=3),
            qJ=np.tile([0.0, -0.8, 1.6], 4) + rng.normal(scale=0.01, size=12))
    return meas


@pytest.mark.slow
def test_fleet_step_matches_independent_fused():
    jax.clear_caches()
    from hkdmpc_tpu.mpc.fleet import FleetConfig, FleetMPC
    from hkdmpc_tpu.mpc.solver import HKDMPCSolver, MPCConfig

    # match the single-robot fused stack on CPU (assoc_linear scan-free
    # linear rollout, sequential backward): the fleet program must be the
    # same math, just vmapped
    fleet = FleetMPC(REF, N, SET, CPAR,
                     FleetConfig(kernel_jac=False, unroll_caps=False,
                                 assoc_linear=True),
                     dtype=jnp.float64)
    fleet.initialize()

    solvers = [HKDMPCSolver(REF, SET, CPAR, MPCConfig(fused_step=True))
               for _ in range(N)]
    for s in solvers:
        s.initialize()

    streams = [_meas_stream(100 + i) for i in range(N)]
    for step in range(12):
        ms = [streams[i](step) for i in range(N)]
        t = step * 0.01
        out = fleet.step(
            rpy_b=np.stack([m["rpy"] for m in ms]),
            p_b=np.stack([m["p"] for m in ms]),
            v_b=np.stack([m["v"] for m in ms]),
            omega_b=np.stack([m["omega"] for m in ms]),
            qJ_b=np.stack([m["qJ"] for m in ms]),
            mpc_time=t)
        for i in range(N):
            ci = solvers[i].update(mpc_time=t, **ms[i])
            fi = fleet.command(i)
            np.testing.assert_allclose(
                fi.hkd_controls, ci.hkd_controls, rtol=1e-9, atol=1e-10,
                err_msg=f"robot {i} step {step}")
            np.testing.assert_allclose(
                fi.des_body_state, ci.des_body_state, rtol=1e-9, atol=1e-10,
                err_msg=f"robot {i} step {step}")
            np.testing.assert_allclose(
                fi.feedback, ci.feedback, rtol=1e-8, atol=1e-8,
                err_msg=f"robot {i} step {step}")
            np.testing.assert_allclose(
                fi.foot_placement, ci.foot_placement, rtol=1e-9, atol=1e-10,
                err_msg=f"robot {i} step {step}")
            # same solve path taken (iteration traces identical)
            ct_s = np.asarray(solvers[i].last_result.cost_trace)
            ct_f = out["cost_trace"][i]
            np.testing.assert_allclose(
                ct_f[~np.isnan(ct_f)], ct_s[~np.isnan(ct_s)], rtol=1e-9,
                err_msg=f"robot {i} step {step}")

    # warm-started device state identical robot-for-robot
    for i in range(N):
        st_i = solvers[i]._state_dev
        np.testing.assert_allclose(
            np.asarray(fleet._state_dev.Xbar[i]), np.asarray(st_i.Xbar),
            rtol=1e-9, atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(fleet._state_dev.Ubar[i]), np.asarray(st_i.Ubar),
            rtol=1e-9, atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(fleet._state_dev.constr.al_lambda[i]),
            np.asarray(st_i.constr.al_lambda), rtol=1e-9, atol=1e-12)

    # robots with different measurements must NOT have collapsed together
    assert not np.allclose(np.asarray(fleet._state_dev.Ubar[0]),
                           np.asarray(fleet._state_dev.Ubar[1]))


@pytest.mark.slow
def test_fleet_checkpoint_resume_continues_exactly(tmp_path):
    """FleetMPC.save -> a fresh fleet .resume() continues the stepped
    fleet exactly: same commands and same device state as the original
    fleet never restarted (phase uids survive, so the shift-descriptor
    gathers stay valid — the fleet analog of the fused resume test)."""
    jax.clear_caches()
    from hkdmpc_tpu.mpc.fleet import FleetConfig, FleetMPC

    cfg = FleetConfig(kernel_jac=False, unroll_caps=False, assoc_linear=True,
                      plan_duration=0.3)
    kw = dict(ddp_settings=SET, constraint_params=CPAR, config=cfg,
              dtype=jnp.float64)
    live = FleetMPC(REF, 2, **kw)
    live.initialize()
    stream = _meas_stream(42)

    def mb(m):
        return {k: np.stack([v, v * 0.5]) for k, v in m.items()}

    for step in range(3):
        live.step(**{f"{k}_b": v for k, v in mb(stream(step)).items()},
                  mpc_time=step * 0.01)
    ckpt = str(tmp_path / "fleet.npz")
    live.save(ckpt)

    resumed = FleetMPC(REF, 2, **kw)
    resumed.resume(ckpt)
    assert len({ph.uid for ph in resumed.problem.phases}) == \
        len(resumed.problem.phases)

    for step in range(3, 6):
        m = mb(stream(step))
        kwm = {f"{k}_b": v for k, v in m.items()}
        out_l = live.step(**kwm, mpc_time=step * 0.01)
        out_r = resumed.step(**kwm, mpc_time=step * 0.01)
        np.testing.assert_allclose(out_r["controls"], out_l["controls"],
                                   rtol=1e-12, atol=1e-13,
                                   err_msg=f"step {step}")
        np.testing.assert_allclose(out_r["gains"], out_l["gains"],
                                   rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(resumed._state_dev.Xbar),
                               np.asarray(live._state_dev.Xbar),
                               rtol=1e-12, atol=1e-13)


@pytest.mark.slow
def test_mixed_fleet_groups_step_independently():
    """MixedFleetMPC: two gait groups (trot + flytrot) step one mixed
    fleet; each group's commands must equal a standalone uniform fleet of
    the same gait driven with the same measurements."""
    jax.clear_caches()
    from hkdmpc_tpu.mpc.fleet import FleetConfig, FleetMPC, MixedFleetMPC

    FREF = "/root/reference/Reference/Data/flytrot/quad_reference.csv"
    cfg = FleetConfig(kernel_jac=False, unroll_caps=False, assoc_linear=True,
                      plan_duration=0.3)
    kw = dict(ddp_settings=SET, constraint_params=CPAR, config=cfg,
              dtype=jnp.float64)
    mixed = MixedFleetMPC([(REF, 2), (FREF, 2)], **kw)
    mixed.initialize()
    solo = FleetMPC(FREF, 2, **kw)
    solo.initialize()

    stream = _meas_stream(5)
    for step in range(3):
        m = stream(step)
        mb = {k: np.stack([v, v]) for k, v in m.items()}
        outs = mixed.step([mb, mb], mpc_time=step * 0.01)
        solo_out = solo.step(mb["rpy"], mb["p"], mb["v"], mb["omega"],
                             mb["qJ"], mpc_time=step * 0.01)
        np.testing.assert_allclose(outs[1]["controls"],
                                   solo_out["controls"],
                                   rtol=1e-9, atol=1e-10)
        np.testing.assert_allclose(outs[1]["body"], solo_out["body"],
                                   rtol=1e-9, atol=1e-10)
        assert np.all(np.isfinite(outs[0]["controls"]))
        # the two gaits genuinely differ
        assert not np.allclose(outs[0]["controls"], outs[1]["controls"])


@pytest.mark.slow
def test_fleet_step_kernel_jac_matches_scan_stack():
    """The fleet receding-horizon step on the PRODUCTION kernel stack
    (kernel_jac, interpret mode on CPU) tracks the scan-stack fleet to
    solver-decision accuracy: same schedule, same measurements, f32 both
    sides, costs within kernel-vs-scan roundoff and zero failures. The
    dryrun smoke-tests this composition; this pins the numbers."""
    jax.clear_caches()
    from hkdmpc_tpu.mpc.fleet import FleetConfig, FleetMPC

    N = 2
    kw = dict(ddp_settings=SET, constraint_params=CPAR, dtype=jnp.float32)
    cfg_kj = FleetConfig(kernel_jac=True, unroll_caps=False,
                         plan_duration=0.3)
    cfg_sc = FleetConfig(kernel_jac=False, unroll_caps=False,
                         plan_duration=0.3)
    f_kj = FleetMPC(REF, N, config=cfg_kj, **kw)
    f_sc = FleetMPC(REF, N, config=cfg_sc, **kw)
    f_kj.initialize()
    f_sc.initialize()

    stream = _meas_stream(9)
    for step in range(2):
        m = stream(step)
        mb = {f"{k}_b": np.stack([v, v * 0.7]) for k, v in m.items()}
        out_a = f_kj.step(**mb, mpc_time=step * 0.01)
        out_b = f_sc.step(**mb, mpc_time=step * 0.01)
        assert int(np.sum(out_a["scalars"][:, 5] > 0)) == 0
        assert int(np.sum(out_b["scalars"][:, 5] > 0)) == 0
        np.testing.assert_allclose(
            out_a["scalars"][:, 0], out_b["scalars"][:, 0], rtol=1e-3,
            err_msg=f"step {step} cost")
        np.testing.assert_allclose(out_a["controls"], out_b["controls"],
                                   rtol=1e-2, atol=2e-2,
                                   err_msg=f"step {step}")


def test_fleet_meas_pack_and_bundle_roundtrip():
    """Fast structural checks: the (N, 28) measurement pack applies the
    reference's rpy flip per robot, and unpack_bundle_batch slices the
    bundle exactly like the single-robot unpack."""
    from hkdmpc_tpu.mpc import fused
    from hkdmpc_tpu.mpc.fleet import unpack_bundle_batch

    n_cmd = 8
    L = sum(ln for _, ln in fused.bundle_layout(n_cmd))
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(4, L))
    got = unpack_bundle_batch(arr, n_cmd)
    for i in range(4):
        ref = fused.unpack_bundle(arr[i], n_cmd)
        for k in ref:
            np.testing.assert_array_equal(got[k][i], ref[k])
