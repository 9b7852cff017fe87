"""TPU-native lattice-QCD solver + measurement framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of QUDA 0.8.0 +
QKXTM-Multigrid (reference: ETMC-QUDA/quda-QKXTM-Multigrid): Wilson /
twisted-mass / clover / twisted-clover Dirac operators on even-odd
preconditioned color-spinor fields, Krylov solvers (CG, BiCGstab, GCR,
multi-shift, multi-source, eigCG-style deflation), adaptive aggregation
multigrid, and the QKXTM hadron-structure measurement layer (smearing,
propagators, 2pt/3pt contractions, disconnected loops, deflation).

Design notes (TPU-first, not a port):
  * fields are parity-split complex JAX arrays `[T, Z, Y, X/2, ...]`
    (even-odd checkerboard is the native storage; QUDA reaches the same
    layout via `QUDA_EVEN_ODD_SITE_ORDER`, lib/color_spinor_field.cpp)
  * operators are pure functions; parameters travel in small frozen
    dataclasses (the analogue of QudaInvertParam / QudaGaugeParam,
    reference include/quda.h:25,86)
  * inter-chip parallelism is `jax.sharding.Mesh` + pjit/shard_map with
    XLA collectives, replacing the reference's MPI halo machinery
    (lib/comm_mpi.cpp, lib/dslash_policy.cuh)
  * precision ladder double/single/half maps to f64 (CPU oracle tier),
    f32, bf16.
"""

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu import fields
from quda_qkxtm_multigrid_tpu import ops
from quda_qkxtm_multigrid_tpu import utils

__version__ = "0.1.0"


def enable_compile_cache(path: str | None = None,
                         min_secs: float = 2.0) -> str:
    """Enable JAX's persistent compilation cache under
    $QKXTM_RESOURCE_PATH (default ~/.cache/qkxtm) — the role of QUDA's
    tunecache/resource dir (reference lib/tune.cpp:211-260,
    QUDA_RESOURCE_PATH): cold Mosaic+XLA compiles of the big solver
    programs cost minutes through the remote-compile tunnel; the disk
    cache makes every later process warm-start.  Called by bench.py,
    the CLI, and the on-chip scripts."""
    import os
    import jax

    if path is None:
        path = os.path.join(os.environ.get(
            "QKXTM_RESOURCE_PATH", os.path.expanduser("~/.cache/qkxtm")),
            "xla_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_secs))
    return path


def enable_x64():
    """Enable 64-bit (double / complex128) mode, the analogue of
    QUDA_DOUBLE_PRECISION (reference include/enum_quda.h:55)."""
    import jax

    jax.config.update("jax_enable_x64", True)
