"""Pod-scale scenario batching: vmap over scenarios, shard_map over the mesh.

The reference is a single-robot controller (one LCM loop, one solver thread;
HKDMPC/HKDMPC.cpp:168-200). The TPU-native scale-out axis is *scenarios*:
thousands of independent HS-DDP solves (perturbed initial states, gait
schedules, references) batched per chip with `vmap` and sharded across a
device mesh with `shard_map`. Per-scenario solves are independent, so the
only collectives are metric reductions (`psum`/`pmax` over ICI); there is no
cross-device traffic in the hot path — this is embarrassing parallelism laid
out deliberately, the analog of data parallelism for this workload.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hkdmpc_tpu.solver import ddp
from hkdmpc_tpu.solver.structs import ProblemData, SolverState


def make_mesh(devices=None, axis: str = "scenario") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def get_shard_map():
    """shard_map with the replication check disabled, picking the kwarg by
    the actual signature (renamed check_rep -> check_vma across jax
    versions; attribute existence alone doesn't pin which one a given jax
    takes)."""
    import inspect
    sm = getattr(jax, "shard_map", None)
    if sm is None:  # pre-0.8 jax
        from jax.experimental.shard_map import shard_map as sm
    params = inspect.signature(sm).parameters
    kw = {"check_vma": False} if "check_vma" in params else \
        ({"check_rep": False} if "check_rep" in params else {})
    return partial(sm, **kw)


def init_multihost(coordinator: str = None, num_processes: int = None,
                   process_id: int = None):
    """Initialize multi-host (DCN) execution: each host contributes its local
    chips; scenario shards ride ICI within a host and only metric scalars
    cross DCN. Call before any other JAX API on every host.

    With no arguments, uses the cluster's auto-detected environment
    (TPU pod metadata / JAX_COORDINATOR_ADDRESS)."""
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    return make_mesh()


def host_local_batch(global_batch: int) -> int:
    """Per-host slice of a global scenario batch (data-parallel layout)."""
    return global_batch // jax.process_count()


def replicate_problem(prob: ProblemData, state: SolverState, batch: int):
    """Tile a single problem/state along a new leading scenario axis."""
    tile = lambda a: jnp.broadcast_to(a[None], (batch,) + a.shape)
    return (jax.tree_util.tree_map(tile, prob),
            jax.tree_util.tree_map(tile, state))


def perturb_scenarios(prob_b: ProblemData, key, x0_scale=None):
    """Perturb the batched initial conditions — the BASELINE.json config-5
    workload (4096 perturbed-initial-state MPC scenarios)."""
    batch = prob_b.x0.shape[0]
    dtype = prob_b.x0.dtype
    if x0_scale is None:
        # modest perturbations: orientation/position/velocity/leg states
        x0_scale = jnp.concatenate([
            jnp.full(3, 0.03), jnp.full(3, 0.01), jnp.full(3, 0.1),
            jnp.full(3, 0.05), jnp.full(12, 0.01)]).astype(dtype)
    noise = jax.random.normal(key, (batch, 24), dtype) * x0_scale
    import dataclasses
    return dataclasses.replace(prob_b, x0=prob_b.x0 + noise)


def solve_sharded(prob_b: ProblemData, state_b: SolverState, opt, mesh: Mesh,
                  axis: str = "scenario", parallel_rollout: bool = False,
                  pallas_backward: bool = False, kernel_jac: bool = False,
                  assoc_linear: bool = False, unroll_caps: bool = False,
                  assoc_backward: bool = False):
    """Batched solve sharded over the mesh.

    Scenario-parallel solves ride per-device vmap; cross-chip aggregation of
    solve metrics (mean cost, max violations) uses ICI collectives inside
    shard_map — the only communication this workload needs.

    kernel_jac / assoc_linear / pallas_backward pass through to ddp.solve so
    the flagship production configuration (in-kernel-jacobian Pallas
    backward) runs under sharding exactly as it does under plain vmap.

    Returns (SolveResult batched, aggregates dict of replicated scalars).
    """
    smap = get_shard_map()

    @partial(smap, mesh=mesh, in_specs=(P(axis), P(axis)),
             out_specs=(P(axis), P()))
    def _solve_shard(prob_shard, state_shard):
        res = jax.vmap(lambda p, s: ddp.solve(
            p, s, opt, parallel_rollout=parallel_rollout,
            pallas_backward=pallas_backward, kernel_jac=kernel_jac,
            assoc_linear=assoc_linear, unroll_caps=unroll_caps,
            assoc_backward=assoc_backward))(prob_shard, state_shard)
        n_local = res.cost.shape[0]
        agg = {
            "mean_cost": jax.lax.psum(jnp.sum(res.cost), axis)
                         / jax.lax.psum(jnp.asarray(n_local, res.cost.dtype), axis),
            "max_tconstr": jax.lax.pmax(jnp.max(res.max_tconstr), axis),
            "max_feas": jax.lax.pmax(jnp.max(res.dyn_feas), axis),
            "n_failed": jax.lax.psum(
                jnp.sum(res.solve_failed.astype(jnp.int32)), axis),
        }
        return res, agg

    return jax.jit(_solve_shard)(prob_b, state_b)
