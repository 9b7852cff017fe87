"""Lattice geometry and even-odd (checkerboard) indexing — TPU-native layout.

**Canonical storage layout (lane-major).**  TPU arrays are tiled on their
last two axes (sublane x lane = 8 x 128 for f32); any stored array whose
trailing axes are small (spin=4, color=3) pays a 40-100x padding tax when
XLA materialises it at a loop boundary.  So the canonical layout puts the
*lattice* on the trailing axes and spin/color in front:

    spinor  [2(parity), 4(spin), 3(color), T, Z, W]
    gauge   [4(mu), 2(parity), 3, 3, T, Z, W]
    clover  [2(parity), 2(chirality), 6, 6, T, Z, W]

with ``W = Y * X/2`` — the y and checkerboard-x dimensions merged into a
single lane axis (W = 288 at 24^3x48: 1.33x padding instead of 42x).

This replaces the reference's FloatN site-ordering machinery
(reference include/color_spinor_field_order.h:287,
gauge_field_order.h:635) — same purpose (match the hardware's vector
layout), different hardware.

**Index conventions.**  Site coords (x,y,z,t), parity = (x+y+z+t) % 2,
direction mu: 0=x,1=y,2=z,3=t (reference tests/wilson_dslash_reference.cpp).
Within a parity, checkerboard x-index k = x//2 and the true x coordinate
is ``2k + (parity + t+z+y) % 2``; the merged lane index is
``w = y * (X/2) + k``.

**Neighbour gathers** (`gather_neighbor`) are pure rolls on the trailing
axes plus checkerboard selects for mu=x:
  t,z : roll on axis -3 / -2
  y   : roll on axis -1 by X/2  (wrap lands on the same z row — exact)
  x   : two rolls + two selects using (row-parity, block-edge) masks.
Under pjit these lower to XLA CollectivePermutes of the wavefront faces,
replacing the reference's MPI halo pipeline (lib/dslash_pack.cu,
lib/face_buffer.cpp, lib/comm_mpi.cpp).
"""

from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

EVEN = 0
ODD = 1


@dataclasses.dataclass(frozen=True)
class Geometry:
    """Local lattice geometry (the analogue of LatticeField dims,
    reference include/lattice_field.h:76)."""

    X: int
    Y: int
    Z: int
    T: int

    def __post_init__(self):
        for d, n in zip("XYZT", (self.X, self.Y, self.Z, self.T)):
            if n < 2 or n % 2:
                raise ValueError(f"dimension {d}={n} must be even and >= 2")

    @property
    def dims(self) -> tuple[int, int, int, int]:
        return (self.X, self.Y, self.Z, self.T)

    @property
    def volume(self) -> int:
        return self.X * self.Y * self.Z * self.T

    @property
    def half_volume(self) -> int:
        return self.volume // 2

    @property
    def Xh(self) -> int:
        return self.X // 2

    @property
    def W(self) -> int:
        """Merged lane axis: y * Xh + k."""
        return self.Y * self.Xh

    @property
    def lat_shape(self) -> tuple[int, int, int]:
        """Trailing lattice axes of every canonical array."""
        return (self.T, self.Z, self.W)

    @property
    def cb4_shape(self) -> tuple[int, int, int, int]:
        """Unmerged single-parity shape [T, Z, Y, Xh] (conversion helper)."""
        return (self.T, self.Z, self.Y, self.Xh)

    # ---- checkerboard masks (numpy constants, folded by XLA) ----------
    @functools.lru_cache(maxsize=None)
    def _x_masks(self, parity: int):
        """(s0, k_first, k_last): s0[T,Z,W] true where the site's true x
        coordinate is even; k_first/k_last[W] true at checkerboard block
        edges."""
        t = np.arange(self.T).reshape(-1, 1, 1)
        z = np.arange(self.Z).reshape(1, -1, 1)
        w = np.arange(self.W).reshape(1, 1, -1)
        y = w // self.Xh
        k = w % self.Xh
        s0 = ((t + z + y + parity) % 2 == 0)
        k_first = (k == 0)
        k_last = (k == self.Xh - 1)
        return (np.broadcast_to(s0, (self.T, self.Z, self.W)),
                np.broadcast_to(k_first, (1, 1, self.W)),
                np.broadcast_to(k_last, (1, 1, self.W)))


def gather_neighbor(f, mu: int, forward: bool, parity: int, geom: Geometry):
    """Gather psi(x ± mu) for every site x of ``parity``.

    ``f`` lives on the opposite parity, any leading axes, trailing axes
    [T, Z, W].  Returns same shape, aligned with sites of ``parity``.
    """
    if mu == 3:                      # t
        return jnp.roll(f, -1 if forward else 1, axis=-3)
    if mu == 2:                      # z
        return jnp.roll(f, -1 if forward else 1, axis=-2)
    if mu == 1:                      # y: merged-axis roll by Xh is exact
        return jnp.roll(f, -geom.Xh if forward else geom.Xh, axis=-1)
    # mu == 0: x with checkerboard halving
    s0, k_first, k_last = geom._x_masks(parity)
    lead = (1,) * (f.ndim - 3)
    s0 = jnp.asarray(s0.reshape(lead + s0.shape))
    if forward:
        # true x even (s0): +x neighbour at same k; odd: k+1 (wrap in block)
        k_last = jnp.asarray(k_last.reshape(lead + k_last.shape))
        fwd_odd = jnp.where(k_last, jnp.roll(f, geom.Xh - 1, axis=-1),
                            jnp.roll(f, -1, axis=-1))
        return jnp.where(s0, f, fwd_odd)
    else:
        # true x even: -x neighbour at k-1 (wrap); odd: same k
        k_first = jnp.asarray(k_first.reshape(lead + k_first.shape))
        bwd_even = jnp.where(k_first, jnp.roll(f, -(geom.Xh - 1), axis=-1),
                             jnp.roll(f, 1, axis=-1))
        return jnp.where(s0, bwd_even, f)


# ---------------------------------------------------------------------
# Layout conversions (I/O + test-oracle tier, not hot paths)
# ---------------------------------------------------------------------

def _split_parity_sites(full):
    """[T, Z, Y, X, ...] → [2, T, Z, Y, X/2, ...] (even, odd)."""
    T, Z, Y, X = full.shape[:4]
    trailing = full.shape[4:]
    pairs = full.reshape(T, Z, Y, X // 2, 2, *trailing)
    t = np.arange(T).reshape(-1, 1, 1, 1)
    z = np.arange(Z).reshape(1, -1, 1, 1)
    y = np.arange(Y).reshape(1, 1, -1, 1)
    r = jnp.asarray(((t + z + y) % 2).reshape((T, Z, Y, 1) + (1,) * len(trailing)))
    even = jnp.where(r == 0, pairs[:, :, :, :, 0], pairs[:, :, :, :, 1])
    odd = jnp.where(r == 0, pairs[:, :, :, :, 1], pairs[:, :, :, :, 0])
    return jnp.stack([even, odd], axis=0)


def _join_parity_sites(split):
    """[2, T, Z, Y, X/2, ...] → [T, Z, Y, X, ...]."""
    two, T, Z, Y, Xh = split.shape[:5]
    assert two == 2
    trailing = split.shape[5:]
    t = np.arange(T).reshape(-1, 1, 1, 1)
    z = np.arange(Z).reshape(1, -1, 1, 1)
    y = np.arange(Y).reshape(1, 1, -1, 1)
    r = jnp.asarray(((t + z + y) % 2).reshape((T, Z, Y, 1) + (1,) * len(trailing)))
    even, odd = split[0], split[1]
    slot0 = jnp.where(r == 0, even, odd)
    slot1 = jnp.where(r == 0, odd, even)
    pairs = jnp.stack([slot0, slot1], axis=4)
    return pairs.reshape(T, Z, Y, 2 * Xh, *trailing)


def _join_parity_sites_dof_leading(split):
    """[2, D..., T, Z, Y, Xh] → [D..., T, Z, Y, X] — the parity join
    with LEADING dof dims, so no intermediate ever has a small
    (spin, color) minor pair (such minors tile-pad up to 32x on TPU;
    the r4 on-chip compile report measured a 3.0 GB copy of a 96 MB
    field from exactly that in the V-cycle restrict)."""
    even, odd = split[0], split[1]
    T, Z, Y = even.shape[-4], even.shape[-3], even.shape[-2]
    t = np.arange(T).reshape(-1, 1, 1, 1)
    z = np.arange(Z).reshape(1, -1, 1, 1)
    y = np.arange(Y).reshape(1, 1, -1, 1)
    r = jnp.asarray((t + z + y) % 2)           # [T,Z,Y,1] broadcasts
    slot0 = jnp.where(r == 0, even, odd)
    slot1 = jnp.where(r == 0, odd, even)
    pairs = jnp.stack([slot0, slot1], axis=-1)  # [D...,T,Z,Y,Xh,2]
    return pairs.reshape(even.shape[:-1] + (2 * even.shape[-1],))


def _split_parity_sites_dof_leading(full):
    """[D..., T, Z, Y, X] → [2, D..., T, Z, Y, Xh] (dof-leading twin of
    _split_parity_sites — see _join_parity_sites_dof_leading)."""
    T, Z, Y, X = full.shape[-4], full.shape[-3], full.shape[-2], \
        full.shape[-1]
    pairs = full.reshape(full.shape[:-1] + (X // 2, 2))
    t = np.arange(T).reshape(-1, 1, 1, 1)
    z = np.arange(Z).reshape(1, -1, 1, 1)
    y = np.arange(Y).reshape(1, 1, -1, 1)
    r = jnp.asarray((t + z + y) % 2)
    even = jnp.where(r == 0, pairs[..., 0], pairs[..., 1])
    odd = jnp.where(r == 0, pairs[..., 1], pairs[..., 0])
    return jnp.stack([even, odd], axis=0)


def spinor_to_lex_dof_leading(psi, geom: Geometry):
    """canonical [2,4,3,T,Z,W] → [4,3,T,Z,Y,X]: dof axes stay LEADING
    throughout, minors stay site dims (lane-friendly layouts only)."""
    p = psi.reshape((2, 4, 3) + geom.cb4_shape)
    return _join_parity_sites_dof_leading(p)


def spinor_from_lex_dof_leading(full, geom: Geometry):
    """[4,3,T,Z,Y,X] → canonical [2,4,3,T,Z,W] (see to_lex twin)."""
    s = _split_parity_sites_dof_leading(full)  # [2,4,3,T,Z,Y,Xh]
    return s.reshape((2, 4, 3) + geom.lat_shape)


def spinor_to_lex(psi, geom: Geometry):
    """canonical [2,4,3,T,Z,W] → lexicographic [T,Z,Y,X,4,3]."""
    p = psi.reshape((2, 4, 3) + geom.cb4_shape)
    p = jnp.moveaxis(p, (1, 2), (5, 6))       # [2,T,Z,Y,Xh,4,3]
    return _join_parity_sites(p)


def spinor_from_lex(full, geom: Geometry):
    """[T,Z,Y,X,4,3] → canonical [2,4,3,T,Z,W]."""
    s = _split_parity_sites(full)             # [2,T,Z,Y,Xh,4,3]
    s = jnp.moveaxis(s, (5, 6), (1, 2))       # [2,4,3,T,Z,Y,Xh]
    return s.reshape((2, 4, 3) + geom.lat_shape)


def gauge_to_lex(u, geom: Geometry):
    """canonical [4,2,3,3,T,Z,W] → lexicographic [4,T,Z,Y,X,3,3]."""
    g = u.reshape((4, 2, 3, 3) + geom.cb4_shape)
    g = jnp.moveaxis(g, (2, 3), (6, 7))       # [4,2,T,Z,Y,Xh,3,3]
    return jnp.stack([_join_parity_sites(g[mu]) for mu in range(4)])


def gauge_from_lex(full, geom: Geometry):
    s = jnp.stack([_split_parity_sites(full[mu]) for mu in range(4)])
    s = jnp.moveaxis(s, (6, 7), (2, 3))       # [4,2,3,3,T,Z,Y,Xh]
    return s.reshape((4, 2, 3, 3) + geom.lat_shape)


def site_index(geom: Geometry, coords):
    """(x,y,z,t) → (parity, t, z, w) canonical indices."""
    x, y, z, t = coords
    p = (x + y + z + t) % 2
    return p, t, z, y * geom.Xh + x // 2
