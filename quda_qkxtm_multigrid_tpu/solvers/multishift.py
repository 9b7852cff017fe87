"""Multi-shift CG: solves (A + sigma_i) x_i = b for all shifts in one
Krylov pass (reference lib/inv_multi_cg_quda.cpp:157, entry
invertMultiShiftQuda interface_quda.cpp:2913; up to 32 shifts,
quda_constants.h:31).

Shifted-CG zeta recurrences relative to the sigma=0 base system; the
shift axis is a leading batch axis [n_shift, ...field] — fused per-shift
updates are one broadcasted multiply-add (the role of multi_blas,
lib/multi_blas_core.cuh).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp


class MultiShiftResult(NamedTuple):
    x: jax.Array          # [n_shift, ...field]
    iters: jax.Array
    r2: jax.Array         # base-system |r|^2


def multishift_cg(matvec: Callable, b, shifts: Sequence[float],
                  tol: float = 1e-10, maxiter: int = 1000) -> MultiShiftResult:
    """matvec applies the base operator A (sigma = 0; the smallest shift
    should be folded into A for best convergence, as the reference's
    caller does)."""
    sig = jnp.asarray(shifts, dtype=jnp.result_type(b.dtype))
    n = len(shifts)
    lead = (n,) + (1,) * b.ndim
    sig_b = sig.reshape(lead)

    b2 = jnp.real(jnp.vdot(b, b))
    target = (tol * tol) * b2
    one = jnp.ones((), b.dtype)

    init = {
        "x": jnp.zeros((n,) + b.shape, b.dtype),
        "p_s": jnp.broadcast_to(b, (n,) + b.shape).astype(b.dtype),
        "r": b, "p": b,
        "zeta": jnp.ones((n,), b.dtype),
        "zeta_old": jnp.ones((n,), b.dtype),
        "beta_old": jnp.zeros((), b.dtype),
        "alpha_old": one,
        "r2": jnp.real(jnp.vdot(b, b)),
        "k": jnp.asarray(0, jnp.int32),
    }

    def cond(c):
        return jnp.logical_and(c["r2"] > target, c["k"] < maxiter)

    def body(c):
        r2 = c["r2"]
        ap = matvec(c["p"])
        pap = jnp.real(jnp.vdot(c["p"], ap))
        alpha = (r2 / pap).astype(b.dtype)       # base-system step (>0)
        # shifted zeta recurrence (reference inv_multi_cg_quda.cpp:60-80)
        zeta, zeta_old = c["zeta"], c["zeta_old"]
        beta_old, alpha_old = c["beta_old"], c["alpha_old"]
        # standard recurrence:
        #   zeta_new = zeta*zeta_old*alpha_old /
        #     (alpha*beta_old*(zeta_old - zeta) + zeta_old*alpha_old*(1 + sigma*alpha))
        zeta_new = (zeta * zeta_old * alpha_old) / (
            alpha * beta_old * (zeta_old - zeta)
            + zeta_old * alpha_old * (1.0 + sig * alpha))
        alpha_s = alpha * zeta_new / zeta        # per-shift step
        x = c["x"] + alpha_s.reshape(lead) * c["p_s"]
        r = c["r"] - alpha * ap
        r2_new = jnp.real(jnp.vdot(r, r))
        beta = (r2_new / r2).astype(b.dtype)
        beta_s = beta * (zeta_new * alpha_s) / (zeta * alpha)
        p = r + beta * c["p"]
        p_s = (zeta_new.reshape(lead) * r[None] + beta_s.reshape(lead) * c["p_s"])
        return {"x": x, "p_s": p_s, "r": r, "p": p,
                "zeta": zeta_new, "zeta_old": zeta,
                "beta_old": beta, "alpha_old": alpha,
                "r2": r2_new, "k": c["k"] + 1}

    out = jax.lax.while_loop(cond, body, init)
    return MultiShiftResult(out["x"], out["k"], out["r2"])


class RefinedMultiShiftResult(NamedTuple):
    x: jax.Array            # [n_shift, ...field] refined solutions
    iters: jax.Array        # shifted-pass iterations
    refine_iters: jax.Array  # [n_shift] per-shift refinement CG iterations
    r2: jax.Array           # [n_shift] per-shift final |r|² after refinement


def multishift_cg_refined(matvec: Callable, b, shifts: Sequence[float],
                          tol: float = 1e-10, maxiter: int = 1000,
                          refine_tol: float | None = None,
                          refine_maxiter: int = 500) -> RefinedMultiShiftResult:
    """Shifted pass + per-shift sequential-CG refinement.

    The zeta recurrences converge every shift only as fast as the base
    system; the reference therefore refines each shift afterwards with
    a CG on (A + sigma_i), seeded with the multishift solution
    (reference lib/interface_quda.cpp:3083-3112: per-offset true
    residual check then CG refinement with
    inv_param->use_init_guess = QUDA_USE_INIT_GUESS_YES).

    One CG program is compiled once and reused for every shift: sigma
    and the initial guess are TRACED scan carries (lax.scan over the
    shift axis), the analogue of the reference reusing its solver
    kernels across the offset loop.
    """
    from quda_qkxtm_multigrid_tpu.solvers.cg import cg

    base = multishift_cg(matvec, b, shifts, tol=tol, maxiter=maxiter)
    rdtype = jnp.finfo(jnp.result_type(b.dtype)).dtype
    sig = jnp.asarray(shifts, dtype=rdtype)
    rtol = tol if refine_tol is None else refine_tol

    def refine_one(_, inp):
        sigma, x0 = inp
        res = cg(lambda v: matvec(v) + sigma * v, b, x0=x0,
                 tol=rtol, maxiter=refine_maxiter)
        return None, (res.x, res.iters, res.r2)

    _, (x, it, r2) = jax.lax.scan(refine_one, None, (sig, base.x))
    return RefinedMultiShiftResult(x, base.iters, it, r2)
