"""Pipelined conjugate gradient (single-reduction CG).

The analogue of the reference's solver ``pipeline`` knob (reference
include/quda.h:130 — "trade extra flops for fewer global sums",
SURVEY.md §2.10.8): the Ghysels–Vanroose pipelined CG recurrence fuses
the two dependent reductions of classic CG into ONE simultaneous
reduction per iteration by carrying extra recurrences (w = A r,
s = A p, z = A s).  On a multi-pod mesh every reduction is a psum over
DCN, so halving the latency-critical reduction points per iteration
does for ICI/DCN what the reference's pipelined CG does for MPI
allreduces.

Same matvec count as classic CG; three extra carried vectors; round-off
drift of the auxiliary recurrences is handled by the defect-correction
restart wrapper (pipelined_cg_reliable).

Recurrences (Ghysels & Vanroose 2014, Alg. 3):
    β = γ/γ_old                    α = γ / (δ − β γ / α_old)
    m = A w
    p = r + β p;  s = w + β s;  z = m + β z
    x += α p;     r −= α s;     w −= α z
    (γ, δ) = (<r,r>, <w,r>)        ← the ONE fused reduction
with invariants w = A r, s = A p, z = A s maintained by construction.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from quda_qkxtm_multigrid_tpu.solvers.cg import CGResult


def pipelined_cg(matvec: Callable, b, x0=None, tol: float = 1e-10,
                 maxiter: int = 1000,
                 abs_b2: Optional[jax.Array] = None) -> CGResult:
    """Solve A x = b, A hermitian positive definite, with one
    simultaneous reduction per iteration (Ghysels & Vanroose 2014)."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
        r0 = b
    else:
        r0 = b - matvec(x0)
    b2 = jnp.real(jnp.vdot(b, b)) if abs_b2 is None else abs_b2
    target = (tol * tol) * b2

    w0 = matvec(r0)
    gamma0 = jnp.real(jnp.vdot(r0, r0))
    delta0 = jnp.vdot(w0, r0)
    zeros = jnp.zeros_like(b)

    state0 = (x0, r0, w0, zeros, zeros, zeros, gamma0, delta0,
              jnp.ones_like(gamma0), jnp.ones_like(delta0),
              jnp.asarray(0, jnp.int32))

    def cond(st):
        gamma, k = st[6], st[10]
        return jnp.logical_and(gamma > target, k < maxiter)

    def body(st):
        x, r, w, p, s, z, gamma, delta, gamma_old, alpha_old, k = st
        first = k == 0
        beta = jnp.where(first, 0.0, gamma / gamma_old)
        alpha = jnp.where(
            first, gamma / delta,
            gamma / (delta - beta * gamma / alpha_old))
        m = matvec(w)                       # the only matvec
        beta_c = beta.astype(b.dtype)
        alpha_c = alpha.astype(b.dtype)
        p = r + beta_c * p
        s = w + beta_c * s
        z = m + beta_c * z
        x = x + alpha_c * p
        r = r - alpha_c * s
        w = w - alpha_c * z
        # THE single fused reduction point: XLA emits one pass (one
        # psum when sharded) for both — the role of tripleCGReduction
        # (reference lib/reduce_quda.cu)
        gamma_new = jnp.real(jnp.vdot(r, r))
        delta_new = jnp.vdot(w, r)
        return (x, r, w, p, s, z, gamma_new, delta_new, gamma, alpha,
                k + 1)

    st = jax.lax.while_loop(cond, body, state0)
    return CGResult(st[0], st[10], st[6])


def pipelined_cg_reliable(matvec_hi: Callable, matvec_lo: Callable, b,
                          tol: float = 1e-10, maxiter: int = 2000,
                          inner_tol: float = 1e-3,
                          inner_maxiter: int = 500,
                          lo_dtype=jnp.complex64,
                          max_restarts: int = 20) -> CGResult:
    """Pipelined CG under high-precision defect-correction restarts
    (the reliable-update discipline, reference inv_cg_quda.cpp:207-311,
    needed because the s/z recurrences drift faster than classic CG)."""
    b2 = jnp.real(jnp.vdot(b, b))
    target = (tol * tol) * b2
    x0 = jnp.zeros_like(b)

    def cond(carry):
        _, r2, restarts, _ = carry
        return jnp.logical_and(r2 > target, restarts < max_restarts)

    def body(carry):
        x, r2, restarts, iters = carry
        r = b - matvec_hi(x)
        e = pipelined_cg(matvec_lo, r.astype(lo_dtype), tol=inner_tol,
                         maxiter=inner_maxiter)
        x = x + e.x.astype(b.dtype)
        r_new = b - matvec_hi(x)
        return (x, jnp.real(jnp.vdot(r_new, r_new)), restarts + 1,
                iters + e.iters)

    x, r2, restarts, iters = jax.lax.while_loop(
        cond, body, (x0, b2, jnp.asarray(0, jnp.int32),
                     jnp.asarray(0, jnp.int32)))
    return CGResult(x, iters, r2)
