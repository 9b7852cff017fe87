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
