"""Preconditioned CG, simple BiCGstab, and extended-precision SD — the
reference's auxiliary solver tail (reference lib/inv_pcg_quda.cpp:358,
inv_sbicgstab_quda.cpp, inv_xsd_quda.cpp via lib/inv_sd_quda.cpp).

TPU-native notes: the flexible (Polak-Ribière) β makes pcg robust to a
nonlinear preconditioner (inner CG/MR cycle, the reference's K solver);
xsd replaces the reference's extended-*storage* precision (double-single
arithmetic on the GPU) with Kahan-compensated accumulation of the
iterate — the same effective-precision gain expressed in hardware-
supported dtypes.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from quda_qkxtm_multigrid_tpu.solvers.cg import CGResult, _dot


def pcg(matvec: Callable, b, precond: Optional[Callable] = None,
        x0=None, tol: float = 1e-10, maxiter: int = 1000,
        flexible: bool = True) -> CGResult:
    """Left-preconditioned CG (reference PreconCG, inv_pcg_quda.cpp:358
    with K = inner CG/MR via tol_precondition/maxiter_precondition).

    flexible=True uses the Polak-Ribière β = <z_new, r_new − r_old> /
    <z, r> — required when ``precond`` is a nonlinear map like a fixed
    MR/CG cycle (the reference's inner solvers run at fixed iteration
    counts, which is nonlinear in r)."""
    if precond is None:
        precond = lambda r: r
    if x0 is None:
        x0 = jnp.zeros_like(b)
        r = b
    else:
        r = b - matvec(x0)
    b2 = _dot(b, b)
    target = (tol * tol) * b2
    z = precond(r)
    rz = _dot(r, z)

    def cond(carry):
        x, r, z, p, rz, r2, k = carry
        return jnp.logical_and(r2 > target, k < maxiter)

    def body(carry):
        x, r, z, p, rz, r2, k = carry
        ap = matvec(p)
        alpha = (rz / _dot(p, ap)).astype(b.dtype)
        x = x + alpha * p
        r_new = r - alpha * ap
        z_new = precond(r_new)
        if flexible:
            num = _dot(z_new, r_new) - _dot(z_new, r)
        else:
            num = _dot(z_new, r_new)
        beta = (num / rz).astype(b.dtype)
        p = z_new + beta * p
        rz_new = _dot(r_new, z_new)
        return (x, r_new, z_new, p, rz_new, _dot(r_new, r_new), k + 1)

    st = (x0, r, z, z, rz, _dot(r, r), jnp.asarray(0, jnp.int32))
    x, r, z, p, rz, r2, k = jax.lax.while_loop(cond, body, st)
    return CGResult(x, k, r2)


def simple_bicgstab(matvec: Callable, b, x0=None, tol: float = 1e-10,
                    maxiter: int = 1000,
                    precond: Optional[Callable] = None) -> CGResult:
    """Textbook BiCGstab without the fused-kernel restructuring — the
    reference's SimpleBiCGstab (lib/inv_sbicgstab_quda.cpp), kept as the
    numerically-transparent variant; optional right preconditioning."""
    K = (lambda v: v) if precond is None else precond
    if x0 is None:
        x0 = jnp.zeros_like(b)
        r = b
    else:
        r = b - matvec(x0)
    r0 = r
    b2 = _dot(b, b)
    target = (tol * tol) * b2
    one = jnp.asarray(1.0, b.dtype)

    def cond(carry):
        x, r, p, v, rho, alpha, omega, r2, k = carry
        return jnp.logical_and(r2 > target, k < maxiter)

    def body(carry):
        x, r, p, v, rho, alpha, omega, r2, k = carry
        rho_new = jnp.vdot(r0, r)
        beta = (rho_new / rho) * (alpha / omega)
        p = r + beta * (p - omega * v)
        kp = K(p)
        v = matvec(kp)
        alpha = rho_new / jnp.vdot(r0, v)
        s = r - alpha * v
        ks = K(s)
        t = matvec(ks)
        omega = (jnp.vdot(t, s) / _dot(t, t).astype(b.dtype))
        x = x + alpha * kp + omega * ks
        r = s - omega * t
        return (x, r, p, v, rho_new, alpha, omega, _dot(r, r), k + 1)

    st = (x0, r, jnp.zeros_like(b), jnp.zeros_like(b),
          one, one, one, _dot(r, r), jnp.asarray(0, jnp.int32))
    x = jax.lax.while_loop(cond, body, st)
    return CGResult(x[0], x[8], x[7])


def xsd(matvec: Callable, b, tol: float = 1e-8, maxiter: int = 200,
        omega_scale: float = 1.0) -> CGResult:
    """Extended-precision steepest descent (reference XSD,
    invert_quda.h:581): SD whose iterate is accumulated with Kahan
    compensation, recovering the extra mantissa bits the reference gets
    from its extended-storage formats — useful when the working dtype
    (c64 on TPU) is the accuracy limiter of plain SD."""
    x = jnp.zeros_like(b)
    c = jnp.zeros_like(b)          # Kahan compensation term
    b2 = _dot(b, b)
    target = (tol * tol) * b2

    def cond(carry):
        x, c, r, r2, k = carry
        return jnp.logical_and(r2 > target, k < maxiter)

    def body(carry):
        x, c, r, r2, k = carry
        ar = matvec(r)
        alpha = (omega_scale * r2 / _dot(r, ar)).astype(b.dtype)
        # compensated x += alpha r
        yv = alpha * r - c
        t = x + yv
        c = (t - x) - yv
        x = t
        r = r - alpha * ar
        return (x, c, r, _dot(r, r), k + 1)

    x, c, r, r2, k = jax.lax.while_loop(
        cond, body, (x, c, b, b2, jnp.asarray(0, jnp.int32)))
    return CGResult(x, k, r2)
