"""df64 defect-correction outer — the reference-depth residual tier.

The analogue of running the outer solver in double with a single-
precision sloppy inner (reference inv_xsd_quda.cpp double-single XSD;
the production MG outers in interface_quda.cpp run
QUDA_DOUBLE_PRECISION outer + single sloppy).  On TPU the solution is
accumulated as a df64 (two-float) field and the true residual
r = b − M x is evaluated with the OPERATOR applied in df64
(ops/dslash_df64.py), so certified residuals are no longer bounded by
the c64 matvec-noise floor (~3e-8 on this backend): each restart
contracts the true residual by the inner solver's own floor, reaching
1e-9/1e-10 — the reference's production tolerances — in 2-3 restarts.

Eager orchestration (host restart loop around jitted programs), the
same driver shape as mg_solve: the residual program returns the
residual FIELD beside the scalars (axon backend: scalar-only residual
programs miscompile — utils/backend_quirks.py Q1).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from quda_qkxtm_multigrid_tpu.ops.dslash_df64 import (
    cdf_compress, m_df, residual_df)
from quda_qkxtm_multigrid_tpu.utils.df64 import cdf_add, cdf_from_c


class DF64Result(NamedTuple):
    x: object          # solution compressed to the storage dtype
    x_df: object       # full df64 solution (cdf pytree)
    true_res: float    # df64-certified |b - M x| / |b|
    restarts: int
    inner_iters: int


@jax.jit
def _resid_program(dirac, x_df, b):
    r, rn2, bn2 = residual_df(dirac, x_df, b)
    return cdf_compress(r, b.dtype), rn2, bn2


@jax.jit
def _accum_program(x_df, e):
    return cdf_add(x_df, cdf_from_c(e))


@jax.jit
def _zero_df(b):
    return cdf_from_c(jnp.zeros_like(b))


@jax.jit
def _final_x(x_df, b):
    return cdf_compress(x_df, b.dtype)


def df64_refine(dirac, b, solve_fn: Callable, tol: float = 1e-10,
                max_restarts: int = 6) -> DF64Result:
    """Defect correction: x_df += solve(b − M x_df) with the residual
    evaluated in df64.  ``solve_fn(r) -> (e, iters)`` is any full-system
    inner solver at its own native tolerance (CG chain, MG-GCR, ...).

    Convergence: if the inner solve reaches relative residual f on its
    own system, each restart multiplies the TRUE residual by ~f, so
    restarts ≈ ceil(log(tol)/log(f)).  The df64 evaluation noise floor
    is ~2^-48 ≈ 4e-15 relative — far below any practical tol."""
    x_df = _zero_df(b)
    rel = float("inf")
    inner_total = 0
    restarts = 0
    for it in range(max_restarts):
        r_c, rn2, bn2 = _resid_program(dirac, x_df, b)
        rel = float(jnp.sqrt(rn2 / bn2))
        if rel < tol:
            break
        e, iters = solve_fn(r_c)
        inner_total += int(iters)
        x_df = _accum_program(x_df, e)
        restarts += 1
    else:
        r_c, rn2, bn2 = _resid_program(dirac, x_df, b)
        rel = float(jnp.sqrt(rn2 / bn2))
    return DF64Result(x=_final_x(x_df, b), x_df=x_df, true_res=rel,
                      restarts=restarts, inner_iters=inner_total)


def invert_df64(dirac, b, tol: float = 1e-10, maxiter: int = 2000,
                inner_tol: float = 1e-7, max_restarts: int = 6,
                mg=None) -> DF64Result:
    """df64-certified full-system solve: inner = the production
    invert() chain (fused matpc CG) or an MG preconditioner when one is
    passed — the TPU form of 'double outer, single sloppy'
    (reference interface_quda.cpp invertQuda precision ladder)."""
    from quda_qkxtm_multigrid_tpu.invert import invert

    if mg is not None:
        from quda_qkxtm_multigrid_tpu.mg.multigrid import mg_solve

        def solve_fn(r):
            out = mg_solve(mg, r, tol=inner_tol)
            return out.x, int(out.iters)
    else:
        _inner = jax.jit(partial(invert, tol=inner_tol, maxiter=maxiter))

        def solve_fn(r):
            out = _inner(dirac, r)
            return out.x, int(out.iters)

    return df64_refine(dirac, b, solve_fn, tol=tol,
                       max_restarts=max_restarts)
