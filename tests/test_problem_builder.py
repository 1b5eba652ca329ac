"""Long-run receding-horizon bookkeeping invariants (host-side only — no
solves): the problem builder must mirror the reference's update() through
hundreds of steps without drifting."""
import numpy as np
import pytest

from tests.test_solver import make_trot
from hkdmpc_tpu.reference import QuadReference
from hkdmpc_tpu.reference.refgen import GaitSynthesizer
from hkdmpc_tpu.config import load_constraint_params
from hkdmpc_tpu.solver.problem import HKDProblem
from tests.test_solver import REF_CPARAMS


def _invariants(pb, step):
    horizons = [ph.horizon for ph in pb.phases]
    total = sum(horizons)
    n_steps = int(round(pb.plan_duration / pb.dt_sim))
    assert total == n_steps, (step, horizons)
    assert all(h >= 0 for h in horizons), (step, horizons)
    # flat size always fits
    n_trans = total + len(pb.phases) - 1
    assert n_trans <= pb.T, (step, n_trans, pb.T)
    # times consistent
    for ph in pb.phases:
        assert abs((ph.end_time - ph.start_time)
                   - ph.horizon * pb.dt_sim) < 1e-6
    for a, b in zip(pb.phases[:-1], pb.phases[1:]):
        assert abs(a.end_time - b.start_time) < 1e-6
        # contacts differ across real phase boundaries
        assert (a.contact != b.contact).any() or a.reach_end
    # warm-start arrays sized with horizons
    for ph in pb.phases:
        assert ph.Xbar.shape == (ph.horizon + 1, 24)
        assert ph.Ubar.shape == (ph.horizon, 24)
        assert ph.reb_delta.shape[0] == ph.horizon


def test_trot_long_mpc_bookkeeping():
    pb, x0, opt = make_trot()
    for step in range(300):
        pb.update()
        _invariants(pb, step)
        prob, state = pb.build(x0)  # must always flatten cleanly
        pb.unflatten(state)


def test_synthesized_mixed_gait_bookkeeping(tmp_path):
    gs = GaitSynthesizer()
    path = gs.write(str(tmp_path / "mix.csv"),
                    [("walk", 0.5, 0.2), ("trot", 0.5, 0.4),
                     ("bound", 0.5, 0.4), ("pronk", 0.5, 0.3),
                     ("hop", 0.5, 0.2)], lead_in=0.2, lead_out=1.2)
    ref = QuadReference.from_file(path)
    cp = load_constraint_params(REF_CPARAMS)
    pb = HKDProblem(ref, cparams=cp)
    pb.initialization()
    x0 = np.zeros(24)
    n_updates = ref.n - int(round(pb.plan_duration / pb.dt_sim)) - 5
    for step in range(min(n_updates, 240)):
        pb.update()
        _invariants(pb, step)
    prob, state = pb.build(x0)
