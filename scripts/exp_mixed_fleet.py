"""Mixed-gait fleet: per-kind-skip robustness + throughput.

The round-4 kernel skips whole branches per grid step when no lane in the
128-wide block needs them (DESIGN §3b). On a uniform fleet (one gait,
perturbed x0 — bench.py's default) pad/reset steps align across lanes and
the skip engages; on a MIXED fleet (different gaits per lane) the phase
structures disagree and more steps must compute every branch. This
measures both, interleaved vs sorted-by-gait lanes:

  uniform   1024 trot
  mixed-i   512 trot + 512 flytrot, interleaved lane order (worst case:
            every block mixes schedules)
  mixed-s   same scenarios, sorted by gait (blocks are uniform again —
            what a production batcher should do)
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _problem(csv, dtype):
    import jax.numpy as jnp
    import numpy as np
    from hkdmpc_tpu.config import load_constraint_params, load_ddp_setting
    from hkdmpc_tpu.models import hkd
    from hkdmpc_tpu.reference import QuadReference
    from hkdmpc_tpu.solver.problem import HKDProblem

    ref = QuadReference.from_file(csv)
    cp = load_constraint_params(
        "/root/reference/HKDMPC/settings/constraint_params.info")
    pb = HKDProblem(ref, plan_duration=0.6, cparams=cp, dtype=dtype)
    pb.initialization()
    body = np.zeros(12)
    body[5] = 0.2486
    qJ = np.tile([0.0, -0.8, 1.6], 4)
    qd = hkd.compute_hkd_state(
        jnp.array(body[:3], dtype), jnp.array(body[3:6], dtype),
        jnp.array(qJ, dtype), jnp.array(pb.phases[0].contact, dtype))
    x0 = np.concatenate([body, np.asarray(qd)])
    return pb.build(x0)


def main():
    import jax
    import jax.numpy as jnp

    from hkdmpc_tpu.config import load_ddp_setting
    from hkdmpc_tpu.parallel import perturb_scenarios, replicate_problem
    from hkdmpc_tpu.solver import ddp

    B = int(os.environ.get("B", "1024"))
    opt = load_ddp_setting(
        "/root/reference/HKDMPC/settings/ddp_setting.info").runtime()

    trot = _problem("/root/reference/Reference/Data/trot/quad_reference.csv",
                    jnp.float32)
    fly = _problem(
        "/root/reference/Reference/Data/flytrot/quad_reference.csv",
        jnp.float32)
    assert trot[0].kind.shape == fly[0].kind.shape

    def tile(pair, n, key):
        pb_b, st_b = replicate_problem(pair[0], pair[1], n)
        pb_b = dataclasses.replace(
            pb_b, x0=perturb_scenarios(pb_b, jax.random.PRNGKey(key)).x0)
        return pb_b, st_b

    t_b = tile(trot, B, 0)
    f_b = tile(fly, B // 2, 1)
    t_h = jax.tree_util.tree_map(lambda a: a[: B // 2], t_b[0]), \
        jax.tree_util.tree_map(lambda a: a[: B // 2], t_b[1])

    def interleave(a, b):
        return jax.tree_util.tree_map(
            lambda x, y: jnp.stack([x, y], axis=1).reshape(
                (-1,) + x.shape[1:]), a, b)

    def concat(a, b):
        return jax.tree_util.tree_map(
            lambda x, y: jnp.concatenate([x, y], axis=0), a, b)

    cases = {
        "uniform": jax.device_put(t_b),
        "mixed-i": jax.device_put((interleave(t_h[0], f_b[0]),
                                   interleave(t_h[1], f_b[1]))),
        "mixed-s": jax.device_put((concat(t_h[0], f_b[0]),
                                   concat(t_h[1], f_b[1]))),
    }

    for name, (pb_b, st_b) in cases.items():
        def run():
            r = ddp.solve_batch(pb_b, st_b, opt, parallel_rollout=True,
                                kernel_jac=True, unroll_caps=True)
            r.cost.block_until_ready()
            return r
        r = run()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        print(f"{name:8s} {min(ts)*1e3:6.1f} ms  "
              f"mean_cost={float(jnp.mean(r.cost)):.2f} "
              f"failed={int(jnp.sum(r.solve_failed))}/{B}", flush=True)


if __name__ == "__main__":
    main()
