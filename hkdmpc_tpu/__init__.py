"""hkdmpc_tpu — TPU-native Hybrid-Systems DDP framework for kino-dynamic quadruped MPC.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of heli-sudoo/HKD-MPC:
multi-phase hybrid-systems DDP (HS-DDP) with multiple shooting, augmented-Lagrangian
terminal constraints, relaxed-barrier path constraints, impact-aware value-function
reset maps, and a receding-horizon MPC runtime — built TPU-first:

- dynamics / Jacobians: pure-JAX analytic model + ``jax.jacfwd`` (replaces the
  reference's CasADi generated C kernels, HKDMPC/HKD-TrajOpt/CasadiGen/*)
- rollouts and Riccati sweeps: ``lax.scan`` over a flattened transition graph
  (dynamics steps + reset transitions), one compiled solver for all gaits
- phase structure is *data* (masks), not program structure — no recompiles in MPC
- scale: ``vmap`` over scenario batches + ``shard_map`` over device meshes
"""

__version__ = "0.1.0"

from hkdmpc_tpu.config import HSDDPOption, load_ddp_setting, ConstraintParams
