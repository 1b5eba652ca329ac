from hkdmpc_tpu.mpc.solver import MPCConfig, HKDMPCSolver
