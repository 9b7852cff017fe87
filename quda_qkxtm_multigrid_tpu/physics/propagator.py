"""Forward propagators: 12 spin-color solves, twisted→physical basis
rotation, propagator containers.

The analogue of QKXTM_Propagator (reference qudaQKXTM_Propagator_Kepler.cpp,
absorbVectorToDevice :253, rotateToPhysicalBase :255-256) and the
12-solve loop of the 2pt/3pt driver (reference interface_quda.cpp:6342-6501).

Propagator layout: [2(parity), 4(snk spin), 4(src spin), 3(snk col),
3(src col), T, Z, W].
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu import fields
from quda_qkxtm_multigrid_tpu.ops.smear import gaussian_smear


def forward_propagator(solve: Callable, geom: Geometry, coords,
                       dtype=jnp.complex64,
                       smear: Optional[Callable] = None):
    """12 point-source solves → propagator.

    ``solve(b) -> x`` solves M x = b (e.g. a closure over invert or
    mg_solve).  ``smear`` optionally smears each source (Gaussian over
    APE links, reference gaussianSmearing before each solve,
    interface_quda.cpp:6398)."""
    cols = []
    for spin in range(4):
        for col in range(3):
            b = fields.point_source(geom, coords, spin, col, dtype=dtype)
            if smear is not None:
                b = smear(b)
            cols.append(solve(b))
    sols = jnp.stack(cols)                   # [12, 2, 4, 3, T,Z,W]
    sols = sols.reshape((4, 3) + sols.shape[1:])
    # [src_s, src_c, parity, snk_s, snk_c, T,Z,W] → canonical
    return jnp.transpose(sols, (2, 3, 0, 4, 1, 5, 6, 7))


def rotate_to_physical(prop, sign: int):
    """S_phys = Ω S Ω, Ω = (1 + i·sign·γ5)/√2 — the twisted→physical
    basis rotation (reference rotateToPhysicalBase_core_Kepler.h; sign
    +1 for up, −1 for down quarks)."""
    g5 = jnp.asarray([1.0, 1.0, -1.0, -1.0])
    s = prop
    left = s + (1j * sign) * g5[:, None, None, None].reshape(
        1, 4, 1, 1, 1, 1, 1, 1) * s
    # multiply γ5 from the right on src spin axis (axis 2)
    out = left + (1j * sign) * left * g5.reshape(1, 1, 4, 1, 1, 1, 1, 1)
    # ΩSΩ = (S + isγ5S + isSγ5 - γ5Sγ5)/2 == ((1+isγ5)(S(1+isγ5)))/2
    return 0.5 * out


def propagator_gamma5_dag(prop):
    """γ5 S† γ5 with source/sink swapped — used to obtain the opposite-
    flavor propagator via twisted-mass γ5-hermiticity
    S_d(x,y) = γ5 S_u(y,x)† γ5."""
    g5 = jnp.asarray([1.0, 1.0, -1.0, -1.0])
    s = jnp.conj(jnp.swapaxes(jnp.swapaxes(prop, 1, 2), 3, 4))
    return (g5.reshape(1, 4, 1, 1, 1, 1, 1, 1)
            * s * g5.reshape(1, 1, 4, 1, 1, 1, 1, 1))


def smear_propagator(prop, u_smeared, geom, alpha, n):
    """Gaussian-smear the SINK of all 12 columns at once (used for the
    smeared-smeared 2pt and the sink preparation of the 3pt)."""
    # reorganise to [src_s, src_c, 2, 4, 3, T,Z,W] batches for the smear
    p = jnp.transpose(prop, (2, 4, 0, 1, 3, 5, 6, 7))
    p = gaussian_smear(p, u_smeared, geom, alpha, n)
    return jnp.transpose(p, (2, 3, 0, 4, 1, 5, 6, 7))
