from hkdmpc_tpu.models import hkd, mini_cheetah
