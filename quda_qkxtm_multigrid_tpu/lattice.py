"""Lattice geometry and even-odd (checkerboard) indexing.

The 4D lattice has dimensions (X, Y, Z, T); arrays are stored with axis
order [T, Z, Y, X(/2), ...] so that X is fastest-varying, matching the
reference's lexicographic site index ``x + X*(y + Y*(z + Z*t))``
(reference lib/color_spinor_field.cpp, tests/wilson_dslash_reference.cpp:107).

Parity (checkerboard color) of a site is ``(x+y+z+t) % 2``; parity-split
arrays store only sites of one parity with the X axis halved:
``split[p, t, z, y, k] = full[t, z, y, 2k + (p + t+z+y) % 2]``.

Direction index ``mu`` follows the reference: 0=x, 1=y, 2=z, 3=t
(reference tests/wilson_dslash_reference.cpp gaugeLink dir/2 mapping),
so lattice array axis for mu is ``3 - mu``.
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
    def cb_shape(self) -> tuple[int, int, int, int]:
        """Shape of the lattice axes of a single-parity array."""
        return (self.T, self.Z, self.Y, self.X // 2)

    @property
    def full_shape(self) -> tuple[int, int, int, int]:
        return (self.T, self.Z, self.Y, self.X)

    @functools.lru_cache(maxsize=None)
    def row_parity(self) -> np.ndarray:
        """(T, Z, Y, 1) int array r = (t+z+y) % 2.

        A site on parity ``p`` at checkerboard x-index ``k`` has true x
        coordinate ``2k + (p + r) % 2``.
        """
        t = np.arange(self.T).reshape(-1, 1, 1, 1)
        z = np.arange(self.Z).reshape(1, -1, 1, 1)
        y = np.arange(self.Y).reshape(1, 1, -1, 1)
        return (t + z + y) % 2

    def x_is_even_mask(self, parity: int, trailing_ndim: int) -> np.ndarray:
        """Boolean mask (broadcastable over a parity array with
        ``trailing_ndim`` non-lattice trailing axes) that is True where
        the site's true x coordinate is even."""
        r = self.row_parity()
        mask = ((r + parity) % 2 == 0)
        return mask.reshape(mask.shape + (1,) * trailing_ndim)


def axis_of_mu(mu: int) -> int:
    """Lattice array axis (in [T,Z,Y,X] order) for direction mu."""
    return 3 - mu


def gather_neighbor(f_opp, mu: int, forward: bool, parity: int, geom: Geometry):
    """Gather ψ(x ± mu) for every site x of ``parity``.

    ``f_opp`` lives on the opposite parity (any trailing shape); returns
    an array of the same shape aligned with sites of ``parity``.

    For mu in {y,z,t} this is a plain circular shift.  For mu = x the
    checkerboard halves the axis: the +x neighbour of an even-x site sits
    at the same checkerboard index, of an odd-x site at index+1 (and
    mirrored for −x).  This reproduces the reference's neighborIndex
    checkerboard arithmetic (reference tests/dslash_util.h / test_util.cpp
    neighborIndex) as vectorised rolls + a row-parity select.

    Under pjit with the lattice axes sharded over a mesh, XLA lowers the
    roll wavefront into a collective-permute of the face slice — the
    TPU-native replacement of the reference's MPI face exchange
    (lib/face_buffer.cpp, lib/dslash_pack.cu).
    """
    axis = axis_of_mu(mu)
    shift = -1 if forward else 1
    if mu != 0:
        return jnp.roll(f_opp, shift, axis=axis)
    trailing = f_opp.ndim - 4
    even_x = jnp.asarray(geom.x_is_even_mask(parity, trailing))
    rolled = jnp.roll(f_opp, shift, axis=axis)
    if forward:
        # even x: neighbour (x+1, odd) has same cb index; odd x: index+1
        return jnp.where(even_x, f_opp, rolled)
    else:
        # even x: neighbour (x-1) at cb index-1 (roll +1); odd x: same index
        return jnp.where(even_x, rolled, f_opp)


def split_parity(full):
    """[T, Z, Y, X, ...] → [2, T, Z, Y, X/2, ...] (even, odd)."""
    T, Z, Y, X = full.shape[:4]
    trailing = full.shape[4:]
    geom = Geometry(X, Y, Z, T)
    pairs = full.reshape(T, Z, Y, X // 2, 2, *trailing)
    r = jnp.asarray(geom.row_parity().reshape((T, Z, Y, 1) + (1,) * len(trailing)))
    even = jnp.where(r == 0, pairs[:, :, :, :, 0], pairs[:, :, :, :, 1])
    odd = jnp.where(r == 0, pairs[:, :, :, :, 1], pairs[:, :, :, :, 0])
    return jnp.stack([even, odd], axis=0)


def join_parity(split):
    """[2, T, Z, Y, X/2, ...] → [T, Z, Y, X, ...]."""
    two, T, Z, Y, Xh = split.shape[:5]
    assert two == 2
    trailing = split.shape[5:]
    geom = Geometry(2 * Xh, Y, Z, T)
    r = jnp.asarray(geom.row_parity().reshape((T, Z, Y, 1) + (1,) * len(trailing)))
    even, odd = split[0], split[1]
    slot0 = jnp.where(r == 0, even, odd)   # x even positions
    slot1 = jnp.where(r == 0, odd, even)   # x odd positions
    pairs = jnp.stack([slot0, slot1], axis=4)
    return pairs.reshape(T, Z, Y, 2 * Xh, *trailing)
