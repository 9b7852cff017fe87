"""BiCGstab for the non-hermitian operator M (no normal equations).

The analogue of reference lib/inv_bicgstab_quda.cpp (used both as a
standalone solver and for MG null-vector setup, lib/multigrid.cpp:26-36).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class BiCGStabResult(NamedTuple):
    x: jax.Array
    iters: jax.Array
    r2: jax.Array
    stats: object = None  # ReliableStats for the mixed-precision solver


def _dot(a, b):
    return jnp.vdot(a, b)


def bicgstab(matvec: Callable, b, x0=None, tol: float = 1e-10,
             maxiter: int = 1000) -> BiCGStabResult:
    if x0 is None:
        x0 = jnp.zeros_like(b)
        r = b
    else:
        r = b - matvec(x0)
    r0 = r                       # shadow residual
    b2 = jnp.real(_dot(b, b))
    target = (tol * tol) * b2
    one = jnp.asarray(1.0, b.dtype)

    def cond(c):
        return jnp.logical_and(c["r2"] > target, c["k"] < maxiter)

    def body(c):
        x, r, p, v = c["x"], c["r"], c["p"], c["v"]
        rho, alpha, omega = c["rho"], c["alpha"], c["omega"]
        rho_new = _dot(r0, r)
        beta = (rho_new / rho) * (alpha / omega)
        p = r + beta * (p - omega * v)
        v = matvec(p)
        alpha = rho_new / _dot(r0, v)
        s = r - alpha * v
        t = matvec(s)
        omega = _dot(t, s) / _dot(t, t)
        x = x + alpha * p + omega * s
        r = s - omega * t
        return {"x": x, "r": r, "p": p, "v": v, "rho": rho_new,
                "alpha": alpha, "omega": omega,
                "r2": jnp.real(_dot(r, r)), "k": c["k"] + 1}

    init = {"x": x0, "r": r, "p": jnp.zeros_like(b), "v": jnp.zeros_like(b),
            "rho": one, "alpha": one, "omega": one,
            "r2": jnp.real(_dot(r, r)), "k": jnp.asarray(0, jnp.int32)}
    out = jax.lax.while_loop(cond, body, init)
    return BiCGStabResult(out["x"], out["k"], out["r2"])


def bicgstab_mixed(matvec_hi: Callable, matvec_lo: Callable, b,
                   tol: float = 1e-10, maxiter: int = 2000,
                   inner_tol: float = 1e-3, inner_maxiter: int = 300,
                   lo_dtype=jnp.complex64, max_restarts: int = 20,
                   max_res_increase: int = 1,
                   max_res_increase_total: int = 10) -> BiCGStabResult:
    """Mixed-precision BiCGstab: sloppy inner BiCGstab + high-precision
    defect-correction restarts — the solver of BASELINE parity config 2
    (TM/TMC dslash + mixed-precision BiCGstab), reference
    lib/inv_bicgstab_quda.cpp:240-320 reliable-update form.

    Same residual-increase guard as cg_mixed
    (inv_cg_quda.cpp:260-281): terminate at the sloppy operator's
    precision floor instead of looping; stats.diverged reports it."""
    from quda_qkxtm_multigrid_tpu.solvers.support import ReliableStats

    b2 = jnp.real(_dot(b, b))
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
        e = bicgstab(matvec_lo, r.astype(lo_dtype), tol=inner_tol,
                     maxiter=inner_maxiter)
        x = x + e.x.astype(b.dtype)
        r_new = b - matvec_hi(x)
        r2_new = jnp.real(_dot(r_new, r_new))
        increased = r2_new > r2
        inc = jnp.where(increased, inc + 1, 0)
        inc_tot = inc_tot + increased.astype(jnp.int32)
        return (x, r2_new, restarts + 1, iters + e.iters, inc, inc_tot)

    z32 = jnp.asarray(0, jnp.int32)
    x, r2, restarts, iters, inc, inc_tot = jax.lax.while_loop(
        cond, body, (x0, b2, z32, z32, z32, z32))
    diverged = jnp.logical_and(
        r2 > target,
        jnp.logical_or(inc > max_res_increase,
                       inc_tot > max_res_increase_total))
    return BiCGStabResult(x, iters, r2,
                          ReliableStats(restarts, inc, inc_tot, diverged))
