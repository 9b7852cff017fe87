"""Steepest descent — the reference's SD solver (reference
include/invert_quda.h:564, lib/inv_sd_quda.cpp), kept for smoother /
sanity duty.  The XSD (extended-precision) variant is the f64 dtype on
CPU; on TPU the defect-correction wrappers play that role."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from quda_qkxtm_multigrid_tpu.solvers.cg import CGResult


def sd(matvec: Callable, b, x0=None, tol: float = 1e-10,
       maxiter: int = 100) -> CGResult:
    """x ← x + (r·r / r·Ar) r on a hermitian positive-definite op."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b if x0 is None else b - matvec(x)
    b2 = jnp.real(jnp.vdot(b, b))
    target = (tol * tol) * b2

    def cond(c):
        return jnp.logical_and(c[2] > target, c[3] < maxiter)

    def body(c):
        x, r, r2, k = c
        ar = matvec(r)
        alpha = (r2 / jnp.real(jnp.vdot(r, ar))).astype(b.dtype)
        x = x + alpha * r
        r = r - alpha * ar
        return (x, r, jnp.real(jnp.vdot(r, r)), k + 1)

    x, r, r2, k = jax.lax.while_loop(
        cond, body, (x, r, jnp.real(jnp.vdot(r, r)),
                     jnp.asarray(0, jnp.int32)))
    return CGResult(x, k, r2)
