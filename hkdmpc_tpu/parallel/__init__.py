from hkdmpc_tpu.parallel.batch import (make_mesh, perturb_scenarios,
                                       replicate_problem, solve_sharded)
