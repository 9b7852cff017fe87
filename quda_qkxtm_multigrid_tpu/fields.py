"""Field constructors and layout conversions.

Canonical (TPU lane-major) layouts — see lattice.py module docstring:
  spinor  [2, 4, 3, T, Z, W]          complex
  gauge   [4, 2, 3, 3, T, Z, W]       complex
  clover  [2, 2, 6, 6, T, Z, W]       complex
Lexicographic layouts (I/O + NumPy-oracle tier, the analogue of the
reference's QDP/CPS host orders, include/color_spinor_field_order.h:387):
  spinor  [T, Z, Y, X, 4, 3]
  gauge   [4, T, Z, Y, X, 3, 3]
"""

from __future__ import annotations

import jax.numpy as jnp

from quda_qkxtm_multigrid_tpu.lattice import (
    Geometry, spinor_to_lex, spinor_from_lex, gauge_to_lex, gauge_from_lex,
    site_index)


def geom_of_spinor(psi) -> Geometry:
    raise NotImplementedError(
        "W is merged; geometry is not recoverable from shape alone — pass geom")


def zeros_spinor(geom: Geometry, dtype=jnp.complex128, nspin=4, ncolor=3):
    return jnp.zeros((2, nspin, ncolor) + geom.lat_shape, dtype=dtype)


def point_source(geom: Geometry, coords, spin: int, color: int,
                 dtype=jnp.complex128):
    """Delta source at global site ``coords=(x,y,z,t)``, unit at
    (spin,color) — feeds the 12 forward-propagator solves
    (reference interface_quda.cpp:6342)."""
    p, t, z, w = site_index(geom, coords)
    psi = zeros_spinor(geom, dtype)
    return psi.at[p, spin, color, t, z, w].set(1.0)


def point_source_dyn(geom: Geometry, coords, spin: int, color: int,
                     dtype=jnp.complex128):
    """point_source with TRACED coords (a length-4 int array) — one
    compiled program serves every source position instead of
    recompiling the whole solve pipeline per source (the reference's
    sources are runtime values too, GK_sourcePosition)."""
    x, y, z, t = coords[0], coords[1], coords[2], coords[3]
    p = (x + y + z + t) % 2
    w = y * geom.Xh + x // 2
    psi = zeros_spinor(geom, dtype)
    return psi.at[p, spin, color, t, z, w].set(1.0)


# lexicographic converters (re-exported from lattice)
spinor_to_full = spinor_to_lex
spinor_from_full = spinor_from_lex
gauge_to_full = gauge_to_lex
gauge_from_full = gauge_from_lex
