"""Conjugate gradient on a hermitian positive-definite operator.

The analogue of the reference CG solver (reference lib/inv_cg_quda.cpp:37,
hot loop :175-330) with its reliable-update / mixed-precision structure:
here the sloppy-precision inner solve is a full functional CG in low
precision wrapped by high-precision defect-correction restarts — the
same flops-vs-precision trade the reference's reliable updates make
(inv_cg_quda.cpp:207-311), but expressed as compiler-friendly
`lax.while_loop`s instead of event-driven update logic.

Global reductions (`_dot`) lower to XLA `psum`s when the field is
sharded over a mesh — the reference's comm_allreduce
(lib/comm_mpi.cpp:297) comes for free.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    x: jax.Array
    iters: jax.Array      # iterations used
    r2: jax.Array         # final residual norm² (of the solved system)


def _dot(a, b):
    return jnp.real(jnp.vdot(a, b))


def cg(matvec: Callable, b, x0=None, tol: float = 1e-10, maxiter: int = 1000,
       abs_b2: Optional[jax.Array] = None) -> CGResult:
    """Solve A x = b, A hermitian positive definite.

    Stops on |r|² ≤ tol²·|b|² (QUDA's L2-relative stopping condition,
    reference include/quda.h:252) or maxiter.
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
        r = b
    else:
        r = b - matvec(x0)
    b2 = _dot(b, b) if abs_b2 is None else abs_b2
    target = (tol * tol) * b2
    r2 = _dot(r, r)

    def cond(carry):
        _, _, _, r2, k = carry
        return jnp.logical_and(r2 > target, k < maxiter)

    def body(carry):
        x, r, p, r2, k = carry
        ap = matvec(p)
        alpha = r2 / _dot(p, ap)
        alpha_c = alpha.astype(b.dtype)
        x = x + alpha_c * p
        r = r - alpha_c * ap
        r2_new = _dot(r, r)
        beta = (r2_new / r2).astype(b.dtype)
        p = r + beta * p
        return (x, r, p, r2_new, k + 1)

    x, r, p, r2, k = jax.lax.while_loop(
        cond, body, (x0, r, r, r2, jnp.asarray(0, jnp.int32)))
    return CGResult(x, k, r2)


def cg_mixed(matvec_hi: Callable, matvec_lo: Callable, b,
             tol: float = 1e-10, maxiter: int = 2000,
             inner_tol: float = 1e-3, inner_maxiter: int = 500,
             lo_dtype=jnp.complex64, max_restarts: int = 20) -> CGResult:
    """Mixed-precision CG: sloppy inner CG + high-precision
    defect-correction restarts (the role of matSloppy + reliable updates,
    reference inv_cg_quda.cpp:207-311)."""
    b2 = _dot(b, b)
    target = (tol * tol) * b2
    x0 = jnp.zeros_like(b)

    def cond(carry):
        _, r2, restarts, _ = carry
        return jnp.logical_and(r2 > target, restarts < max_restarts)

    def body(carry):
        x, r2, restarts, iters = carry
        r = b - matvec_hi(x)
        e = cg(matvec_lo, r.astype(lo_dtype), tol=inner_tol,
               maxiter=inner_maxiter)
        x = x + e.x.astype(b.dtype)
        r_new = b - matvec_hi(x)
        return (x, _dot(r_new, r_new), restarts + 1, iters + e.iters)

    r2 = _dot(b, b)
    x, r2, restarts, iters = jax.lax.while_loop(
        cond, body, (x0, r2, jnp.asarray(0, jnp.int32),
                     jnp.asarray(0, jnp.int32)))
    return CGResult(x, iters, r2)
