"""Measure the in-kernel terminal-partials kernel (round 4) on TPU.

Round-3 ledger: 67.4 ms at batch 1024 with the in-kernel jacobians +
running partials; remaining per-step DMA was the TWO (T+1,24,24) phixx
views + the K output (~0.9 MB/step). This round moves the terminal
partials (tracking + foot reg + AL touchdown FK) into the kernel too —
the phix/phixx slabs disappear from the grid inputs entirely.

Env:
  KBB   — kernel batch-block width (default 128; VMEM now fits wider)
  KB    — scenario batch (default 1024)
  KREPS — timing reps (default 5)

Run ONE process at a time (tunnel contention).
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    kbb = int(os.environ.get("KBB", "128"))
    kb = int(os.environ.get("KB", "1024"))
    reps = int(os.environ.get("KREPS", "5"))
    unroll = os.environ.get("KUNROLL", "0") == "1"

    import hkdmpc_tpu.ops.pallas_backward as pbk
    pbk.BB = kbb

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from hkdmpc_tpu.parallel import perturb_scenarios, replicate_problem
    from hkdmpc_tpu.solver import ddp

    _, prob, state, opt = ge._trot_problem(dtype=jnp.float32)
    opt = opt.runtime()
    prob_b, state_b = replicate_problem(prob, state, kb)
    prob_b = dataclasses.replace(
        prob_b, x0=perturb_scenarios(prob_b, jax.random.PRNGKey(0)).x0)
    prob_b, state_b = jax.device_put((prob_b, state_b))

    def run():
        r = ddp.solve_batch(prob_b, state_b, opt, parallel_rollout=True,
                            kernel_jac=True, unroll_caps=unroll)
        r.cost.block_until_ready()
        return r

    t0 = time.perf_counter()
    r = run()
    print(f"compile+run {time.perf_counter() - t0:.1f}s  "
          f"mean_cost={float(jnp.mean(r.cost)):.4f} "
          f"failed={int(jnp.sum(r.solve_failed))}")
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"KBB={kbb} B={kb} unroll={int(unroll)} best={best*1e3:.1f}ms "
          f"solves_per_s={kb/best:.0f} "
          f"times_ms={[round(t*1e3,1) for t in ts]}")


if __name__ == "__main__":
    main()
