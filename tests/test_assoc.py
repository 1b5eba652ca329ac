"""Associative-scan linear rollout vs the sequential scan."""
import dataclasses

import numpy as np

from tests.test_solver import make_trot
from hkdmpc_tpu.ops.assoc import affine_prefix, linear_rollout_assoc
from hkdmpc_tpu.solver import backward, ddp, lq as lq_mod, rollout as ro_mod

import jax.numpy as jnp


def test_affine_prefix():
    rng = np.random.default_rng(0)
    T = 13
    M = jnp.asarray(rng.normal(size=(T, 24, 24)) * 0.3)
    b = jnp.asarray(rng.normal(size=(T, 24)))
    dx0 = jnp.asarray(rng.normal(size=24))
    dX = affine_prefix(M, b, dx0)
    ref = [np.asarray(dx0)]
    for t in range(T):
        ref.append(np.asarray(M[t]) @ ref[-1] + np.asarray(b[t]))
    np.testing.assert_allclose(dX, np.stack(ref), atol=1e-10)


def test_linear_rollout_assoc_matches_scan():
    pb, x0, opt = make_trot()
    prob, state = pb.build(x0)
    res = ddp.solve_jit(prob, state, opt)
    state = res.state

    ro = ro_mod.hybrid_rollout(prob, state, 0.0, True)
    lqd = lq_mod.lq_approximation(prob, ro.X, ro.U, state.constr, True, True)
    last = ro_mod.last_active_node(prob)
    dU, K, *_ = backward.backward_sweep_regularized(
        prob, lqd, ro.defect, 0.0, 4.0, last)
    state = dataclasses.replace(state, dU=dU, K=K)

    dX_a, dv1_a, dv2_a = ro_mod.linear_rollout(prob, state, lqd, ro.defect, 1.0)
    dX_b, dv1_b, dv2_b = linear_rollout_assoc(prob, state, lqd, ro.defect, 1.0)
    np.testing.assert_allclose(dX_a, dX_b, atol=1e-8)
    assert abs(float(dv1_a) - float(dv1_b)) < 1e-8
    assert abs(float(dv2_a) - float(dv2_b)) < 1e-8
