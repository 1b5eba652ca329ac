from hkdmpc_tpu.utils.logging import log_trajectory_sequence
from hkdmpc_tpu.utils.timing import StageTimer
