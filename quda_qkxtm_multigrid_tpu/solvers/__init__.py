from quda_qkxtm_multigrid_tpu.solvers.cg import cg, cg_mixed, CGResult
from quda_qkxtm_multigrid_tpu.solvers.bicgstab import (
    bicgstab, bicgstab_mixed, BiCGStabResult)
from quda_qkxtm_multigrid_tpu.solvers.mr import mr
from quda_qkxtm_multigrid_tpu.solvers.gcr import gcr, GCRResult
from quda_qkxtm_multigrid_tpu.solvers.multishift import (
    multishift_cg, multishift_cg_refined, MultiShiftResult,
    RefinedMultiShiftResult)
from quda_qkxtm_multigrid_tpu.solvers.msrc import msrc_cg, MultiSrcResult
from quda_qkxtm_multigrid_tpu.solvers.eigen import lanczos, chebyshev_op, deflate_guess, project_out, EigResult
from quda_qkxtm_multigrid_tpu.solvers.gmresdr import gmresdr, GMResDRResult
from quda_qkxtm_multigrid_tpu.solvers.mre import min_res_ext, ChronoHistory
from quda_qkxtm_multigrid_tpu.solvers.pipelined import pipelined_cg, pipelined_cg_reliable
from quda_qkxtm_multigrid_tpu.solvers.inc_eigcg import IncEigCG
from quda_qkxtm_multigrid_tpu.solvers.sd import sd
