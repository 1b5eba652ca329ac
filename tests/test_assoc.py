"""Associative-scan linear rollout vs the sequential scan."""
import dataclasses

import numpy as np
import pytest

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


def test_value_map_combine_is_composition():
    """combine_value_maps(e1, e2) must equal applying e2 then e1 for random
    elements and random value params — nails the LFT composition formulas
    (and their sign conventions) against the definition."""
    from hkdmpc_tpu.ops.assoc import apply_value_map, combine_value_maps

    rng = np.random.default_rng(3)
    n = 5

    def rnd_psd(scale=0.5):
        X = rng.normal(size=(n, n)) * scale
        return jnp.asarray(X @ X.T)

    def rnd_elem():
        return (jnp.asarray(rng.normal(size=(n, n)) * 0.7),
                jnp.asarray(rng.normal(size=n)),
                rnd_psd(0.4),
                jnp.asarray(rng.normal(size=n)),
                rnd_psd(0.6),
                jnp.asarray(True))

    for _ in range(5):
        e1, e2 = rnd_elem(), rnd_elem()
        G = jnp.asarray(rng.normal(size=n))
        H = rnd_psd(0.5)
        Gm, Hm = apply_value_map(e2, G, H)
        G_ref, H_ref = apply_value_map(e1, Gm, Hm)
        e12 = combine_value_maps(e1, e2)
        G_got, H_got = apply_value_map(e12, G, H)
        np.testing.assert_allclose(H_got, H_ref, rtol=1e-9, atol=1e-10)
        np.testing.assert_allclose(G_got, G_ref, rtol=1e-9, atol=1e-10)
        assert bool(e12[5])  # healthy pivots propagate ok=True

    # identity element (seed with zero mask) must be neutral
    ident = (jnp.eye(n), jnp.zeros(n), jnp.zeros((n, n)), jnp.zeros(n),
             jnp.zeros((n, n)), jnp.asarray(True))
    e = rnd_elem()
    for a, b in zip(combine_value_maps(e, ident), e):
        np.testing.assert_allclose(a, b, atol=1e-12)

    # an unhealthy operand poisons the composition's ok flag
    bad = rnd_elem()[:5] + (jnp.asarray(False),)
    assert not bool(combine_value_maps(rnd_elem(), bad)[5])


@pytest.mark.slow
def test_riccati_backward_assoc_matches_scan():
    """Parallel-in-time backward sweep == the sequential sweep on the trot
    problem (f64): gains, feedforward, expected-cost terms and the PSD
    verdict, at reg 0 and a retry-level reg."""
    pb, x0, opt = make_trot()
    prob, state = pb.build(x0)
    res = ddp.solve_jit(prob, state, opt)
    state = res.state

    ro = ro_mod.hybrid_rollout(prob, state, 0.0, True)
    lqd = lq_mod.lq_approximation(prob, ro.X, ro.U, state.constr, True, True)
    last = ro_mod.last_active_node(prob)

    from hkdmpc_tpu.ops.assoc import riccati_backward_assoc

    for reg in (0.0, 0.05):
        dU_s, K_s, G0, H0, dv1_s, dv2_s, ok_s = backward.backward_sweep(
            prob, lqd, ro.defect, reg, last, aug_sweep=True)
        dU_a, K_a, dv1_a, dv2_a, ok_a = riccati_backward_assoc(
            prob, lqd, ro.defect, jnp.float64(reg), last)
        np.testing.assert_allclose(dU_a, dU_s, rtol=1e-7, atol=1e-8)
        np.testing.assert_allclose(K_a, K_s, rtol=1e-7, atol=1e-8)
        np.testing.assert_allclose(float(dv1_a), float(dv1_s), rtol=1e-8)
        np.testing.assert_allclose(float(dv2_a), float(dv2_s), rtol=1e-8)
        assert bool(ok_a) == bool(ok_s)

    # cross-term generality: with lux != 0 the leaves eliminate u by
    # completing the square; must still match the sequential sweep (which
    # adds lux to Qux per step). Random small lux, masked to DYN rows.
    rng = np.random.default_rng(7)
    from hkdmpc_tpu.solver.structs import DYN
    dyn_m = np.asarray(prob.kind == DYN, float)[:, None, None]
    lux = jnp.asarray(rng.normal(size=(pb.T, 24, 24)) * 0.05 * dyn_m)
    lqd_x = dataclasses.replace(lqd, lux=lux)
    dU_s, K_s, _, _, dv1_s, dv2_s, ok_s = backward.backward_sweep(
        prob, lqd_x, ro.defect, 0.05, last, aug_sweep=True)
    dU_a, K_a, dv1_a, dv2_a, ok_a = riccati_backward_assoc(
        prob, lqd_x, ro.defect, jnp.float64(0.05), last)
    np.testing.assert_allclose(dU_a, dU_s, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(K_a, K_s, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(float(dv1_a), float(dv1_s), rtol=1e-7)
    np.testing.assert_allclose(float(dv2_a), float(dv2_s), rtol=1e-7)
    assert bool(ok_a) == bool(ok_s)


@pytest.mark.slow
def test_solve_assoc_backward_equivalent():
    """Full solve with assoc_backward (+ assoc_linear, the latency stack)
    matches the sequential-scan solve to solver-decision accuracy."""
    pb, x0, opt = make_trot()
    prob, state = pb.build(x0)
    optr = opt.runtime()
    ra = ddp.solve_jit(prob, state, optr, True, assoc_linear=True)
    rb = ddp.solve_jit(prob, state, optr, True, assoc_linear=True,
                       assoc_backward=True)
    np.testing.assert_allclose(ra.cost, rb.cost, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(ra.state.Ubar),
                               np.asarray(rb.state.Ubar),
                               rtol=1e-6, atol=1e-8)
    assert int(ra.n_iters) == int(rb.n_iters)
    assert not bool(rb.solve_failed)
