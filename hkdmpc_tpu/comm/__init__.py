from hkdmpc_tpu.comm.lcm_types import LCMType, parse_lcm_file
from hkdmpc_tpu.comm.transport import LCMTransport
