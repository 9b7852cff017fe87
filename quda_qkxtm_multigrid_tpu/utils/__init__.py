from quda_qkxtm_multigrid_tpu.utils import rng
