from hkdmpc_tpu.ops.linalg import sweep_inverse
