from quda_qkxtm_multigrid_tpu.ops import gamma
from quda_qkxtm_multigrid_tpu.ops import gauge
