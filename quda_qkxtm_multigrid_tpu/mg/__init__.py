from quda_qkxtm_multigrid_tpu.mg.transfer import BlockGeometry, Transfer
from quda_qkxtm_multigrid_tpu.mg.coarse_op import CoarseOperator, build_coarse_op
from quda_qkxtm_multigrid_tpu.mg.multigrid import MGParams, setup_mg, mg_solve
