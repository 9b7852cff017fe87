from quda_qkxtm_multigrid_tpu.solvers.cg import cg, cg_mixed, CGResult
