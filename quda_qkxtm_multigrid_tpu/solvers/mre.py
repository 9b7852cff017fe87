"""Minimum-residual extrapolation over prior solutions — the
chronological initial guess.

The analogue of the reference MinResExt solver (reference
include/invert_quda.h:664, lib/inv_mre.cpp): given a basis of previous
solutions {x_i} of nearby systems, the best initial guess for a new
right-hand side b is the combination x = Σ c_i x_i minimising
|b − A x|², i.e. the small hermitian system

    G c = h,   G_ij = <A x_i, A x_j>,   h_i = <A x_i, b>.

On TPU the history is one stacked array [n, ...field]; A is applied to
all of it in one batched (vmap) program, and both G and h come out of a
single pair of einsums — the reference needs its multi-blas/multi-reduce
kernels (lib/multi_reduce_core.h) for the same contraction.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def min_res_ext(matvec: Callable, b, history):
    """Return the minimum-residual combination of ``history``
    [n, ...field] as an initial guess for M x = b.

    Solves the n×n projected normal equations on device (n is the
    chronological-history depth, typically ≤ 16)."""

    @jax.jit
    def guess(history, b):
        ax = jax.vmap(matvec)(history)               # [n, ...field]
        n = history.shape[0]
        flat = ax.reshape(n, -1)
        g = flat.conj() @ flat.T                     # [n, n] Gram
        h = flat.conj() @ b.reshape(-1)              # [n]
        # Tikhonov floor: nearly parallel history vectors (common when
        # successive sources differ little) make G singular
        eps = jnp.asarray(1e-10 if b.dtype == jnp.complex128 else 1e-5,
                          g.dtype)
        g = g + eps * jnp.trace(g).real.astype(g.dtype) * jnp.eye(n, dtype=g.dtype)
        c = jnp.linalg.solve(g, h)
        return jnp.einsum("j,j...->...", c, history)

    return guess(history, b)


class ChronoHistory:
    """Rolling chronological-guess store (the resident chrono basis of
    the reference, quda.h make_resident_solution / chrono_* params).

    Host-side ring buffer of the last ``depth`` solutions; ``guess``
    projects a new RHS onto it with min_res_ext."""

    def __init__(self, depth: int = 8):
        self.depth = depth
        self._xs: list = []

    def push(self, x) -> None:
        self._xs.append(x)
        if len(self._xs) > self.depth:
            self._xs.pop(0)

    def __len__(self) -> int:
        return len(self._xs)

    def guess(self, matvec: Callable, b):
        if not self._xs:
            return jax.jit(jnp.zeros_like)(b)
        hist = jax.jit(lambda xs: jnp.stack(xs))(self._xs)
        return min_res_ext(matvec, b, hist)
