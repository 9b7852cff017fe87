"""Minimal residual — the default MG smoother
(reference lib/inv_mr_quda.cpp; smoother choice multigrid.cpp:72-79).

x_{k+1} = x_k + omega * <Ar, r>/<Ar, Ar> * r, fixed iteration count
(smoothers run an exact number of nu_pre/nu_post steps, so this uses
fori_loop, not a convergence test).  omega = 0.85 is the reference's
production relaxation (CalcMG_2pt3pt_EvenOdd.cpp:429).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def mr(matvec: Callable, b, x0=None, niter: int = 4, omega: float = 0.85):
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b if x0 is None else b - matvec(x)

    def body(i, carry):
        x, r = carry
        ar = matvec(r)
        d = jnp.vdot(ar, ar)
        alpha = jnp.where(jnp.real(d) > 0, jnp.vdot(ar, r) / d, 0.0)
        alpha = (omega * alpha).astype(b.dtype)
        return (x + alpha * r, r - alpha * ar)

    x, r = jax.lax.fori_loop(0, niter, body, (x, r))
    return x
