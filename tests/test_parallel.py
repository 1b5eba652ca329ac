"""Distribution tests: sharded batched solves must equal unsharded ones
(SURVEY §4(d): single-chip vs multi-host equivalence), and the ICI metric
aggregations must match host-side reductions."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_solver import make_trot
from hkdmpc_tpu.parallel import (make_mesh, perturb_scenarios,
                                 replicate_problem, solve_sharded)
from hkdmpc_tpu.solver import ddp


@pytest.fixture(scope="module")
def batch_problem():
    pb, x0, opt = make_trot(plan_duration=0.2)
    prob, state = pb.build(x0)
    batch = 8
    prob_b, state_b = replicate_problem(prob, state, batch)
    prob_b = perturb_scenarios(prob_b, jax.random.PRNGKey(7))
    return prob_b, state_b, opt


def test_sharded_equals_unsharded(batch_problem):
    prob_b, state_b, opt = batch_problem
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    mesh = make_mesh(jax.devices()[:4])

    res_ref = jax.vmap(ddp.solve, in_axes=(0, 0, None))(prob_b, state_b, opt)
    res_sh, agg = solve_sharded(prob_b, state_b, opt, mesh)

    np.testing.assert_allclose(res_sh.cost, res_ref.cost, rtol=1e-10)
    np.testing.assert_allclose(res_sh.dyn_feas, res_ref.dyn_feas, rtol=1e-8,
                               atol=1e-12)
    np.testing.assert_allclose(res_sh.state.Ubar, res_ref.state.Ubar,
                               atol=1e-10)

    # ICI aggregates == host-side reductions
    assert abs(float(agg["mean_cost"]) - float(jnp.mean(res_ref.cost))) < 1e-8
    assert abs(float(agg["max_feas"]) - float(jnp.max(res_ref.dyn_feas))) < 1e-10
    assert int(agg["n_failed"]) == int(jnp.sum(res_ref.solve_failed))


def test_uneven_perturbations_solve_independently(batch_problem):
    # each scenario's result depends only on its own x0 (no cross-talk)
    prob_b, state_b, opt = batch_problem
    res = jax.vmap(ddp.solve, in_axes=(0, 0, None))(prob_b, state_b, opt)
    import dataclasses
    one = jax.tree_util.tree_map(lambda a: a[3], prob_b)
    one_state = jax.tree_util.tree_map(lambda a: a[3], state_b)
    res1 = ddp.solve_jit(one, one_state, opt)
    np.testing.assert_allclose(float(res1.cost), float(res.cost[3]),
                               rtol=1e-10)
