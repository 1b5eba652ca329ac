from hkdmpc_tpu.solver.structs import ProblemData, SolverState, SolveResult
from hkdmpc_tpu.solver.ddp import solve
from hkdmpc_tpu.solver.problem import HKDProblem
