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
    stats: object = None  # ReliableStats for the mixed-precision solver


def _dot(a, b):
    return jnp.real(jnp.vdot(a, b))


def cg(matvec: Callable, b, x0=None, tol: float = 1e-10, maxiter: int = 1000,
       abs_b2: Optional[jax.Array] = None,
       tol_hq: Optional[float] = None) -> CGResult:
    """Solve A x = b, A hermitian positive definite.

    Stops on |r|² ≤ tol²·|b|² (QUDA's L2-relative stopping condition,
    reference include/quda.h:252) or maxiter.  With tol_hq set, the
    Fermilab heavy-quark residual hq(x, r) must ALSO fall below tol_hq
    (the bitwise-OR bitmask semantics of quda.h:252-260: both stopping
    conditions required) — fields must be in the canonical complex
    layout [..., 4, 3, T, Z, W] for the per-site norms.
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
        r = b
    else:
        r = b - matvec(x0)
    b2 = _dot(b, b) if abs_b2 is None else abs_b2
    target = (tol * tol) * b2
    r2 = _dot(r, r)
    use_hq = tol_hq is not None
    if use_hq:
        from quda_qkxtm_multigrid_tpu.solvers.support import (
            heavy_quark_residual_sq)
        hq_target = tol_hq * tol_hq

    def cond(carry):
        x, r, _, r2, k = carry
        not_done = r2 > target
        if use_hq:
            not_done = jnp.logical_or(
                not_done, heavy_quark_residual_sq(x, r) > hq_target)
        return jnp.logical_and(not_done, k < maxiter)

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
             lo_dtype=jnp.complex64, max_restarts: int = 20,
             max_res_increase: int = 1,
             max_res_increase_total: int = 10) -> CGResult:
    """Mixed-precision CG: sloppy inner CG + high-precision
    defect-correction restarts (the role of matSloppy + reliable updates,
    reference inv_cg_quda.cpp:207-311).

    Residual-increase counters (inv_cg_quda.cpp:260-281): if the TRUE
    residual after a reliable update exceeds the previous reliable
    residual more than ``max_res_increase`` consecutive times (or
    ``max_res_increase_total`` over the solve), the solver has hit the
    precision floor of the sloppy operator and terminates instead of
    looping forever; ``result.stats.diverged`` reports it."""
    from quda_qkxtm_multigrid_tpu.solvers.support import ReliableStats

    b2 = _dot(b, b)
    target = (tol * tol) * b2
    x0 = jnp.zeros_like(b)

    def cond(carry):
        _, r2, restarts, _, inc, inc_tot = carry
        ok = jnp.logical_and(inc <= max_res_increase,
                             inc_tot <= max_res_increase_total)
        return jnp.logical_and(
            jnp.logical_and(r2 > target, restarts < max_restarts), ok)

    def body(carry):
        x, r2, restarts, iters, inc, inc_tot = carry
        r = b - matvec_hi(x)
        e = cg(matvec_lo, r.astype(lo_dtype), tol=inner_tol,
               maxiter=inner_maxiter)
        x = x + e.x.astype(b.dtype)
        r_new = b - matvec_hi(x)
        r2_new = _dot(r_new, r_new)
        increased = r2_new > r2
        inc = jnp.where(increased, inc + 1, 0)
        inc_tot = inc_tot + increased.astype(jnp.int32)
        return (x, r2_new, restarts + 1, iters + e.iters, inc, inc_tot)

    z32 = jnp.asarray(0, jnp.int32)
    x, r2, restarts, iters, inc, inc_tot = jax.lax.while_loop(
        cond, body, (x0, _dot(b, b), z32, z32, z32, z32))
    diverged = jnp.logical_and(
        r2 > target,
        jnp.logical_or(inc > max_res_increase,
                       inc_tot > max_res_increase_total))
    return CGResult(x, iters, r2,
                    ReliableStats(restarts, inc, inc_tot, diverged))
