"""Device mesh and sharding layout for lattice fields.

The TPU-native replacement of the reference's process-grid machinery
(reference lib/comm_common.cpp Topology, include/comm_quda.h:18-121,
initCommsGridQuda interface_quda.cpp:261-283): a 3-axis
`jax.sharding.Mesh` named ("t", "z", "w") matching the canonical
trailing lattice axes [T, Z, W] (W = Y·X/2, so a "w" split is a
y-direction domain decomposition).  A mesh axis of size 1 is an
unpartitioned dimension (the analogue of comm_dim_partitioned == 0).
x-direction decomposition is intentionally unsupported — the reference
too prefers partitioning t/z first (halo surfaces are smallest there).

Under pjit, the neighbour gathers in ops/dslash (rolls) lower to XLA
CollectivePermutes of the wavefront face along each partitioned axis —
the role of dslash_pack/FaceBuffer/MPI (lib/dslash_pack.cu,
lib/face_buffer.cpp, lib/comm_mpi.cpp) — and solver inner products
lower to AllReduce over the mesh (comm_allreduce, lib/comm_mpi.cpp:297).

Sharding layout (parity/spin/color axes always replicated):
  spinor [2, 4, 3, T, Z, W]     → P(None,None,None,'t','z','w')
  gauge  [4, 2, 3, 3, T, Z, W]  → P(None,None,None,None,'t','z','w')
  clover [2, 2, 6, 6, T, Z, W]  → same trailing split
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("t", "z", "w")


def make_lattice_mesh(grid: Sequence[int] = (1, 1, 1),
                      devices: Optional[Sequence] = None) -> Mesh:
    """grid = (Gt, Gz, Gw) process decomposition over (T, Z, Y)."""
    if devices is None:
        devices = jax.devices()
    n = int(np.prod(grid))
    if n > len(devices):
        raise ValueError(f"grid {grid} needs {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(grid)
    return Mesh(dev, AXES)


def spinor_pspec(extra_leading: int = 0, parity_split: bool = True) -> P:
    lead = (None,) * (extra_leading + (1 if parity_split else 0) + 2)
    return P(*lead, *AXES)


def gauge_pspec() -> P:
    return P(None, None, None, None, *AXES)


def clover_pspec() -> P:
    return P(None, None, None, None, *AXES)


def shard_spinor(psi, mesh: Mesh, extra_leading: int = 0):
    return jax.device_put(
        psi, NamedSharding(mesh, spinor_pspec(extra_leading=extra_leading)))


def shard_gauge(u, mesh: Mesh):
    return jax.device_put(u, NamedSharding(mesh, gauge_pspec()))


def shard_dirac(dirac, mesh: Mesh):
    """Shard all fields of a Dirac bundle onto the mesh."""
    from quda_qkxtm_multigrid_tpu.dirac import Dirac

    clover = dirac.clover
    clover_inv = dirac.clover_inv
    if clover is not None:
        cs = NamedSharding(mesh, clover_pspec())
        clover = jax.device_put(clover, cs)
        clover_inv = jax.device_put(clover_inv, cs)
    return Dirac(u=shard_gauge(dirac.u, mesh), params=dirac.params,
                 geom=dirac.geom, clover=clover, clover_inv=clover_inv)
