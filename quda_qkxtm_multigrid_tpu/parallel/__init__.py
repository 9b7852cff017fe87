from quda_qkxtm_multigrid_tpu.parallel.mesh import (
    make_lattice_mesh, spinor_pspec, gauge_pspec, shard_spinor, shard_gauge,
)
