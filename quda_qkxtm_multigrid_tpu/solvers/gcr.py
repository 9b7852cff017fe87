"""GCR with right preconditioning — THE production outer solver for
multigrid runs (reference lib/inv_gcr_quda.cpp; orthoDir :86,
back-substitution :131, restarts :348-457).

Flexible: the preconditioner K may be a nonlinear map (an MG V-cycle).
Restart cycle of length n_krylov; fixed-size Krylov bases carried as
stacked arrays [n_krylov, ...field] so the loop is jit-compilable.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class GCRResult(NamedTuple):
    x: jax.Array
    iters: jax.Array
    r2: jax.Array


def gcr(matvec: Callable, b, x0=None, tol: float = 1e-10,
        n_krylov: int = 10, max_restarts: int = 50,
        precond: Optional[Callable] = None) -> GCRResult:
    """Solve M x = b.  ``precond`` maps r -> approximate M^-1 r."""
    if precond is None:
        precond = lambda r: r
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b if x0 is None else b - matvec(x)
    b2 = jnp.real(jnp.vdot(b, b))
    target = (tol * tol) * b2

    zeros_basis = jnp.zeros((n_krylov,) + b.shape, b.dtype)

    def cycle(carry):
        x, r, restarts, iters = carry

        def inner(k, st):
            x, r, zs, vs, r2 = st
            z = precond(r)
            v = matvec(z)
            # orthogonalise v against previous vs (modified Gram-Schmidt,
            # reference orthoDir inv_gcr_quda.cpp:86)
            def ortho(j, sv):
                z, v = sv
                c = jnp.vdot(vs[j], v)
                mask = (j < k).astype(b.dtype)
                return (z - mask * c * zs[j], v - mask * c * vs[j])
            v0n2 = jnp.real(jnp.vdot(v, v))
            z, v = jax.lax.fori_loop(0, n_krylov, ortho, (z, v))
            vnorm2 = jnp.real(jnp.vdot(v, v))
            # breakdown guard: if orthogonalisation annihilated v (the
            # preconditioner returned a direction already in the span —
            # common with a strong MG V-cycle in single precision), skip
            # the direction instead of amplifying round-off
            # (the role of the reference's GCR restart logic,
            # inv_gcr_quda.cpp:348-457).
            eps2 = 1e-10 if b.dtype == jnp.complex64 else 1e-24
            ok = vnorm2 > eps2 * v0n2
            inv = jnp.where(ok, 1.0 / jnp.sqrt(jnp.maximum(vnorm2, 1e-30)),
                            0.0).astype(b.dtype)
            z = z * inv
            v = v * inv
            alpha = jnp.vdot(v, r)
            x = x + alpha * z
            r = r - alpha * v
            zs = zs.at[k].set(z)
            vs = vs.at[k].set(v)
            return (x, r, zs, vs, jnp.real(jnp.vdot(r, r)))

        r2 = jnp.real(jnp.vdot(r, r))
        x, r, _, _, r2 = jax.lax.fori_loop(
            0, n_krylov, inner, (x, r, zeros_basis, zeros_basis, r2))
        # recompute the TRUE residual at each restart: the recursed r
        # drifts in single precision (reliable-update analogue,
        # reference inv_cg_quda.cpp:207-311)
        r = b - matvec(x)
        return (x, r, restarts + 1, iters + n_krylov)

    def cond(carry):
        x, r, restarts, iters = carry
        return jnp.logical_and(jnp.real(jnp.vdot(r, r)) > target,
                               restarts < max_restarts)

    x, r, restarts, iters = jax.lax.while_loop(
        cond, cycle, (x, r, jnp.asarray(0, jnp.int32),
                      jnp.asarray(0, jnp.int32)))
    return GCRResult(x, iters, jnp.real(jnp.vdot(r, r)))


def gcr_restarted(matvec, b, tol: float = 1e-8, n_krylov: int = 10,
                  max_restarts: int = 50, precond=None):
    """Host-loop restarted GCR: one jitted GCR cycle per restart, true
    residual recomputed on host between cycles.

    Exists because on the TPU backend the fully-jitted outer while_loop
    miscompiles with a strong (MG) preconditioner in complex64: the
    in-graph residual-norm check evaluates orders of magnitude below the
    true residual and terminates the loop after one cycle (observed:
    reported 2.8e-9 vs true 3.2e-2 for the SAME x).  The host loop pays
    one device sync per restart — negligible against an n_krylov-cycle —
    and doubles as the reference's interface-level restart structure
    (reference inv_gcr_quda.cpp:348-457)."""
    import jax as _jax

    @_jax.jit
    def _cycle(x, b):
        r = b - matvec(x)
        out = gcr(matvec, r, tol=0.0, n_krylov=n_krylov, max_restarts=1,
                  precond=precond)
        xn = x + out.x
        rn = b - matvec(xn)
        return xn, jnp.real(jnp.vdot(rn, rn))

    # eager complex ops are unsupported on some TPU backends: jit the
    # trivial setup reductions too
    x = _jax.jit(jnp.zeros_like)(b)
    b2 = float(_jax.jit(lambda v: jnp.real(jnp.vdot(v, v)))(b))
    iters = 0
    r2 = None
    for i in range(max_restarts):
        x, r2 = _cycle(x, b)
        iters += n_krylov
        if float(r2) <= tol * tol * b2:
            break
    return GCRResult(x, jnp.asarray(iters), r2)


def gcr_cycle(matvec, b, n_krylov: int = 10, precond=None, x0=None):
    """One while_loop-free GCR(n_krylov) cycle (fori_loop only).

    Used inside the MG stack: nested lax.while_loops (coarse-level GCR
    inside the outer solve) miscompile on the TPU backend — downstream
    values computed from the loop result read stale/garbage buffers.
    A fixed cycle is also what the reference's coarse solver does
    (GCR with maxiter 11, multigrid.cpp:229-272)."""
    if precond is None:
        precond = lambda r: r
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b if x0 is None else b - matvec(x)
    zeros_basis = jnp.zeros((n_krylov,) + b.shape, b.dtype)

    def inner(k, st):
        x, r, zs, vs = st
        z = precond(r)
        v = matvec(z)

        def ortho(j, sv):
            z, v = sv
            c = jnp.vdot(vs[j], v)
            mask = (j < k).astype(b.dtype)
            return (z - mask * c * zs[j], v - mask * c * vs[j])
        v0n2 = jnp.real(jnp.vdot(v, v))
        z, v = jax.lax.fori_loop(0, n_krylov, ortho, (z, v))
        vnorm2 = jnp.real(jnp.vdot(v, v))
        eps2 = 1e-10 if b.dtype == jnp.complex64 else 1e-24
        ok = vnorm2 > eps2 * v0n2
        inv = jnp.where(ok, 1.0 / jnp.sqrt(jnp.maximum(vnorm2, 1e-30)),
                        0.0).astype(b.dtype)
        z = z * inv
        v = v * inv
        alpha = jnp.vdot(v, r)
        x = x + alpha * z
        r = r - alpha * v
        zs = zs.at[k].set(z)
        vs = vs.at[k].set(v)
        return (x, r, zs, vs)

    x, r, _, _ = jax.lax.fori_loop(0, n_krylov, inner,
                                   (x, r, zeros_basis, zeros_basis))
    return x
