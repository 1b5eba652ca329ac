"""Roofline placement of the batched solve on the TPU.

Uses the compiled executable's cost analysis (XLA's flop/byte counts) plus
measured wall time to report achieved FLOP/s and HBM bandwidth against the
chip's public peaks. The solve is deliberately MXU-free (ops/precise.py), so
the relevant compute ceiling is the VPU's f32 throughput, not the 197 TFLOP/s
bf16 MXU number.

Usage: python scripts/exp_roofline.py [batch]
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e public specs
HBM_GBPS = 819.0
MXU_BF16_TFLOPS = 197.0
# VPU f32 peak estimate: (8, 128) vector unit, 4 ALUs/lane, FMA = 2 FLOPs,
# ~0.94 GHz TensorCore clock. Not an official number — the VPU peak is not
# published for v5e — but the right order for an all-FMA workload.
VPU_F32_TFLOPS = 8 * 128 * 4 * 2 * 0.94e9 / 1e12  # ~7.7


def pallas_backward_flops(T, B, n_sweeps=1):
    """Hand count for the round-4 kernel_jac kernel (XLA reports 0 flops
    for custom calls): per DYN (t, lane) — sparsity-aware entry-scaled
    row/column FMAs for the quadratic expansion (edA ~70 / edB ~60 nonzero
    jacobian entries), the jacobian/running-partial entry formulas
    (approximate scalar-op counts), forward elimination +
    back-substitution on the (24,49) tableau, and the dense
    Schur-complement slab. Accurate to ~±20% (the entry-formula terms are
    estimates); pad/reset steps are skipped by the per-kind predicates and
    not counted."""
    sparse_prod = (3 * 70 + 2 * 60) * 24 * 2   # HA/AtHA (edA), Qux/HB/BtHB
    vecs = (2 * 70 + 60) * 2                   # AtGn, BtGn sparse
    jac_entries = 2500                         # dynA/dynB/reset formulas
    partials = 1500                            # running partials + ReB
    assembly = 2 * 576 * 2                     # Qxx/Quu adds + sym
    elim = sum((23 - k) * 49 * 2 for k in range(24))   # fwd elimination
    backsub = sum((24 - i) * 25 * 2 for i in range(24))
    schur = 24 * 24 * 24 * 2 + 4 * 24 * 2      # Hd dense, Gd, dv
    per_step = (sparse_prod + vecs + jac_entries + partials + assembly
                + elim + backsub + schur)
    return per_step * T * B * n_sweeps


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from hkdmpc_tpu.parallel import perturb_scenarios, replicate_problem
    from hkdmpc_tpu.solver import ddp

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    _, prob, state, opt = ge._trot_problem(dtype=jnp.float32)
    opt = opt.runtime()
    prob_b, state_b = replicate_problem(prob, state, batch)
    prob_b, state_b = jax.device_put((prob_b, state_b))
    prob_b = dataclasses.replace(
        prob_b, x0=perturb_scenarios(prob_b, jax.random.PRNGKey(0)).x0)

    fn = jax.jit(lambda p, s: jax.vmap(
        lambda pp, ss: ddp.solve(pp, ss, opt, True, kernel_jac=True,
                                 unroll_caps=True))(p, s))
    compiled = fn.lower(prob_b, state_b).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    out = compiled(prob_b, state_b)
    jax.block_until_ready(out.cost)

    # slope protocol (DESIGN §3h): cancels the tunnel's ~24 ms sync RPC —
    # the round-4 run divided the traffic by a wall that was ~45% RPC
    def wall(K):
        t0 = time.perf_counter()
        o = None
        for _ in range(K):
            o = compiled(prob_b, state_b)
        o.cost.block_until_ready()
        return time.perf_counter() - t0

    ts = []
    for _ in range(4):
        w1, w2 = wall(4), wall(16)
        ts.append((w2 - w1) / 12)
    t = min(ts)

    mem = compiled.memory_analysis()
    peak_hbm = getattr(mem, "temp_size_in_bytes", 0) + \
        getattr(mem, "argument_size_in_bytes", 0) + \
        getattr(mem, "output_size_in_bytes", 0)

    # the runtime-caps workload runs the backward kernel twice per solve
    # (2 outer iters x 1 DDP iter, no reg retries on this workload)
    n_dyn = int((np.asarray(prob.kind) == 1).sum())
    kflops = pallas_backward_flops(n_dyn, batch, n_sweeps=2)
    total_flops = flops + kflops

    print(f"batch={batch} wall={t*1e3:.1f} ms "
          f"({batch / t:.0f} solves/s)")
    print(f"XLA-counted flops          : {flops/1e12:.3f} TFLOP "
          f"(+{kflops/1e12:.3f} hand-counted in the Pallas kernel, which "
          f"XLA reports as 0) -> {total_flops/t/1e12:.2f} TFLOP/s achieved")
    print(f"VPU f32 utilization        : "
          f"{100*total_flops/t/1e12/VPU_F32_TFLOPS:.1f}% of the ~"
          f"{VPU_F32_TFLOPS:.1f} TFLOP/s VPU estimate "
          f"(MXU irrelevant: program is deliberately MXU-free)")
    print(f"XLA-counted bytes accessed : {bytes_acc/1e9:.2f} GB "
          f"-> {bytes_acc/t/1e9:.1f} GB/s "
          f"({100*bytes_acc/t/1e9/HBM_GBPS:.1f}% of HBM peak)")
    print(f"arithmetic intensity       : "
          f"{total_flops/max(bytes_acc,1):.2f} FLOP/B "
          f"(VPU roofline knee at ~{VPU_F32_TFLOPS*1e12/HBM_GBPS/1e9:.1f})")
    print(f"peak HBM footprint (XLA)   : {peak_hbm/1e9:.2f} GB of 16")


if __name__ == "__main__":
    main()
