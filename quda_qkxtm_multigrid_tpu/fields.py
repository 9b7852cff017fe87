"""Field containers: thin pytree wrappers around parity-split arrays.

The compute path works on raw arrays (pure functions, jit-friendly);
these dataclasses carry the metadata the reference keeps in
LatticeField/ColorSpinorField/GaugeField (reference
include/lattice_field.h:76, color_spinor_field.h:230, gauge_field.h).

Canonical layouts:
  spinor  (full)    [2, T, Z, Y, X/2, 4, 3]   complex
  spinor  (parity)  [T, Z, Y, X/2, 4, 3]      complex
  gauge             [4, 2, T, Z, Y, X/2, 3, 3] complex  (mu, parity, ...)
  clover            [2, 2, T, Z, Y, X/2, 6, 6] complex  (parity, chirality)
"""

from __future__ import annotations

import jax.numpy as jnp

from quda_qkxtm_multigrid_tpu.lattice import Geometry, split_parity, join_parity


def geom_of_spinor(psi) -> Geometry:
    """Geometry from a full (parity-split) spinor [2,T,Z,Y,Xh,...]."""
    _, T, Z, Y, Xh = psi.shape[:5]
    return Geometry(2 * Xh, Y, Z, T)


def geom_of_gauge(u) -> Geometry:
    _, _, T, Z, Y, Xh = u.shape[:6]
    return Geometry(2 * Xh, Y, Z, T)


def zeros_spinor(geom: Geometry, dtype=jnp.complex128, nspin=4, ncolor=3):
    return jnp.zeros((2,) + geom.cb_shape + (nspin, ncolor), dtype=dtype)


def point_source(geom: Geometry, coords, spin: int, color: int,
                 dtype=jnp.complex128):
    """Delta source at global site ``coords=(x,y,z,t)``, unit at (spin,color).

    The analogue of QKXTM's point-source construction feeding the 12
    forward-propagator solves (reference interface_quda.cpp:6342 loop)."""
    x, y, z, t = coords
    p = (x + y + z + t) % 2
    psi = zeros_spinor(geom, dtype)
    return psi.at[p, t, z, y, x // 2, spin, color].set(1.0)


def gauge_to_full(u):
    """[4,2,T,Z,Y,Xh,3,3] → [4,T,Z,Y,X,3,3] lexicographic (for I/O)."""
    return jnp.stack([join_parity(u[mu]) for mu in range(4)])


def gauge_from_full(u_full):
    return jnp.stack([split_parity(u_full[mu]) for mu in range(4)])


def spinor_to_full(psi):
    return join_parity(psi)


def spinor_from_full(psi_full):
    return split_parity(psi_full)
