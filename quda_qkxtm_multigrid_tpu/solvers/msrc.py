"""Multi-source CG: simultaneous independent CG over a batch of RHS —
the analogue of invertMultiSrcQuda (reference interface_quda.cpp:2546,
lib/inv_msrc_cg_quda.cpp).

On TPU the RHS batch is a leading array axis: per-source alpha/beta are
vectors, every update one broadcasted fused op, and all sources share
the operator application (better MXU/VPU utilisation than QUDA's
sequential loop — SURVEY.md §2.10.4's "batchable axis").  Converged
sources are mask-frozen until the slowest finishes.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class MultiSrcResult(NamedTuple):
    x: jax.Array          # [n_src, ...field]
    iters: jax.Array
    r2: jax.Array         # [n_src]


def msrc_cg(matvec_batched: Callable, b, tol: float = 1e-10,
            maxiter: int = 1000) -> MultiSrcResult:
    """``matvec_batched`` applies A to [n_src, ...field] (e.g.
    jax.vmap(matvec) or an operator written with leading batch axes)."""
    n = b.shape[0]
    axes = tuple(range(1, b.ndim))

    def dots(a, c):
        return jnp.real(jnp.sum(jnp.conj(a) * c, axis=axes))

    b2 = dots(b, b)
    target = (tol * tol) * b2
    lead = (n,) + (1,) * (b.ndim - 1)

    def cond(c):
        return jnp.logical_and(jnp.any(c["r2"] > target), c["k"] < maxiter)

    def body(c):
        x, r, p, r2 = c["x"], c["r"], c["p"], c["r2"]
        active = (r2 > target)
        ap = matvec_batched(p)
        pap = dots(p, ap)
        alpha = jnp.where(active, r2 / jnp.where(pap > 0, pap, 1.0), 0.0)
        al = alpha.astype(b.dtype).reshape(lead)
        x = x + al * p
        r = r - al * ap
        r2_new = dots(r, r)
        beta = jnp.where(active, r2_new / jnp.where(r2 > 0, r2, 1.0), 0.0)
        p = r + beta.astype(b.dtype).reshape(lead) * p
        return {"x": x, "r": r, "p": p, "r2": r2_new, "k": c["k"] + 1}

    init = {"x": jnp.zeros_like(b), "r": b, "p": b, "r2": b2,
            "k": jnp.asarray(0, jnp.int32)}
    out = jax.lax.while_loop(cond, body, init)
    return MultiSrcResult(out["x"], out["k"], out["r2"])
