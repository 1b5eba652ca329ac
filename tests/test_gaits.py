"""Solver coverage across gait families (BASELINE configs 2-4).

- flytrot: flight phases (no stance legs -> no GRF constraint rows)
- barrelroll: aggressive attitude maneuver
- synthesized hop: AL touchdown + ReB cone on a pronk/hop schedule
- gait transition: trot -> hop -> pronk in one horizon (synthesized)
"""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from hkdmpc_tpu.config import load_constraint_params, load_ddp_setting
from hkdmpc_tpu.models import hkd
from hkdmpc_tpu.reference import QuadReference
from hkdmpc_tpu.reference.refgen import GaitSynthesizer
from hkdmpc_tpu.solver import ddp
from hkdmpc_tpu.solver.problem import HKDProblem

REF_ROOT = "/root/reference/Reference/Data"
REF_SETTINGS = "/root/reference/HKDMPC/settings/ddp_setting.info"
REF_CPARAMS = "/root/reference/HKDMPC/settings/constraint_params.info"


def solve_reference_file(path, plan=0.6, qJ0=(0.0, -0.8, 1.6)):
    ref = QuadReference.from_file(path)
    cp = load_constraint_params(REF_CPARAMS)
    opt = load_ddp_setting(REF_SETTINGS)
    pb = HKDProblem(ref, plan_duration=plan, cparams=cp)
    pb.initialization()
    body = ref.body_state[0].copy()
    qJ = ref.qJ[0].copy() if np.any(ref.qJ[0]) else np.tile(qJ0, 4)
    qd = hkd.compute_hkd_state(
        jnp.array(body[:3]), jnp.array(body[3:6]), jnp.array(qJ),
        jnp.array(pb.phases[0].contact, dtype=float))
    x0 = np.concatenate([body[:12], np.asarray(qd)])
    prob, state = pb.build(x0)
    res = ddp.solve_jit(prob, state, opt)
    return pb, res


@pytest.mark.skipif(not os.path.exists(f"{REF_ROOT}/flytrot/quad_reference.csv"),
                    reason="no reference data")
def test_flytrot_with_flight_phases():
    pb, res = solve_reference_file(f"{REF_ROOT}/flytrot/quad_reference.csv")
    # flight phases present
    assert any((ph.contact == 0).all() for ph in pb.phases)
    assert not bool(res.solve_failed)
    assert float(res.dyn_feas) < 1e-2
    assert float(res.max_tconstr) < 5e-3


@pytest.mark.skipif(not os.path.exists(f"{REF_ROOT}/barrelroll/quad_reference.csv"),
                    reason="no reference data")
def test_barrelroll():
    pb, res = solve_reference_file(f"{REF_ROOT}/barrelroll/quad_reference.csv")
    assert not bool(res.solve_failed)
    assert float(res.dyn_feas) < 5e-2


def test_synthesized_hop(tmp_path):
    gs = GaitSynthesizer()
    path = gs.write(str(tmp_path / "hop.csv"), [("hop", 1.0, 0.2)])
    pb, res = solve_reference_file(path)
    assert not bool(res.solve_failed)
    assert float(res.dyn_feas) < 1e-2
    assert float(res.max_tconstr) < 5e-3
    assert float(res.max_pconstr) > -1e-6


def test_gait_transition_trot_hop_pronk(tmp_path):
    gs = GaitSynthesizer()
    path = gs.write(str(tmp_path / "mix.csv"),
                    [("trot", 0.4, 0.3), ("hop", 0.4, 0.2),
                     ("pronk", 0.4, 0.3)], lead_in=0.1)
    pb, res = solve_reference_file(path)
    assert not bool(res.solve_failed)
    assert float(res.dyn_feas) < 1e-2

    # MPC across the gait transitions: phase structure changes every which
    # way; must never recompile-fail or blow up
    opt = load_ddp_setting(REF_SETTINGS).runtime()
    pb.unflatten(res.state)
    xk = np.asarray(res.state.Xbar[1])
    feas_hist = []
    for _ in range(30):
        pb.update()
        prob2, state2 = pb.build(xk)
        res2 = ddp.solve_jit(prob2, state2, opt)
        assert not bool(res2.solve_failed)
        assert np.isfinite(float(res2.cost))
        feas_hist.append(float(res2.dyn_feas))
        pb.unflatten(res2.state)
        xk = np.asarray(res2.state.Xbar[1])
    # with runtime caps (1 DDP iter/solve) feasibility spikes when fresh
    # phases appear at gait boundaries, but must stay bounded and recover
    assert max(feas_hist) < 5.0, feas_hist
    assert np.median(feas_hist) < 0.5, feas_hist
