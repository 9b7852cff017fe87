"""Incremental eigCG: CG solves over an RHS sequence that accumulate a
deflation space and deflate every subsequent solve.

The analogue of the reference's IncEigCG / incrementalEigQuda
(reference lib/inv_eigcg_quda.cpp:453, ExpandDeflationSpace :747, API
quda.h:682): each solve harvests ``nev_per_solve`` low eigenpairs of the
operator from its own Krylov space (here: a thick-restart Lanczos pass
seeded by the solve's residual history — the reference's Rayleigh-Ritz
restart machinery collapses to jnp.linalg.eigh on the projected block),
orthogonalises them into the accumulated space V, and later solves
start from the deflated guess x0 = V Λ⁻¹ V† b with the init-CG
restart structure.

The space lives as one stacked array [n_total, ...field]; Rayleigh-Ritz
re-diagonalisation of the accumulated space keeps the stored ``evals``
consistent as vectors from different solves mix.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from quda_qkxtm_multigrid_tpu.solvers.cg import cg, CGResult
from quda_qkxtm_multigrid_tpu.solvers.eigen import (lanczos, deflate_guess,
                                                    project_out)


class IncEigCG:
    """Deflation-space accumulator over a right-hand-side sequence.

    Usage (mirrors the reference's per-RHS incrementalEigQuda loop):
        inc = IncEigCG(matvec, nev_per_solve=8, max_nev=48)
        for b in rhs_sequence:
            x = inc.solve(b, tol=1e-8)
    """

    def __init__(self, matvec: Callable, nev_per_solve: int = 8,
                 max_nev: int = 64, lanczos_ncv: Optional[int] = None,
                 lanczos_tol: float = 1e-3):
        self.matvec = matvec
        self.nev_per_solve = nev_per_solve
        self.max_nev = max_nev
        self.lanczos_ncv = lanczos_ncv
        self.lanczos_tol = lanczos_tol
        self.evecs = None          # [n, ...field]
        self.evals = None          # [n]

    @property
    def n_deflated(self) -> int:
        return 0 if self.evecs is None else self.evecs.shape[0]

    def _expand(self, b, key):
        """Harvest nev_per_solve new eigenpairs (ExpandDeflationSpace,
        reference inv_eigcg_quda.cpp:747) and merge + re-Rayleigh-Ritz
        the accumulated space."""
        if self.n_deflated >= self.max_nev:
            return
        want = min(self.nev_per_solve, self.max_nev - self.n_deflated)
        if self.evecs is not None:
            # search the orthogonal COMPLEMENT of the accumulated space
            # (the role of the reference's orthogonalisation in
            # ExpandDeflationSpace, inv_eigcg_quda.cpp:747).  P A P has
            # a NULL space on span(V) — a plain projected operator
            # would hand "smallest" Ritz pairs back inside V — so V is
            # shifted to the TOP of the spectrum instead.
            vs = self.evecs
            sigma = 10.0 * float(jnp.max(jnp.abs(self.evals))) + 1.0

            def op(v):
                pv = project_out(vs, v)
                return (project_out(vs, self.matvec(pv))
                        + sigma * (v - pv))
        else:
            op = self.matvec
        eig = lanczos(op, b, nev=want, ncv=self.lanczos_ncv,
                      tol=self.lanczos_tol, max_restarts=30, key=key)
        # accept only ACCURATE pairs: one inaccurate vector in V poisons
        # every later Galerkin correction (the reference's eigCG
        # similarly gates on restart-converged Ritz pairs)
        import numpy as np
        resid = np.asarray(eig.resid)
        scale = max(float(jnp.max(jnp.abs(eig.evals))), 1e-30)
        keep = resid <= 20.0 * self.lanczos_tol * scale
        if not keep.any():
            return
        new = eig.evecs[np.nonzero(keep)[0]]
        if self.evecs is None:
            v = new
        else:
            v = jnp.concatenate([self.evecs, new], axis=0)
        # orthonormalise + Rayleigh-Ritz the merged space on device
        self.evecs, self.evals = _rayleigh_ritz(self.matvec, v)

    def solve(self, b, tol: float = 1e-8, maxiter: int = 1000,
              expand: bool = True, key=None) -> CGResult:
        """Deflated init-CG solve of matvec x = b; expands the space
        afterwards (until max_nev) so later RHS converge faster.

        The Krylov part runs on the PROJECTED operator P A P (P = 1 −
        V V†): a deflated initial guess alone loses its benefit to
        round-off drift back into the low modes — the projection is the
        robust form of the reference's init-CG restarts
        (inv_eigcg_quda.cpp initCG projection)."""
        if key is None:
            key = jax.random.PRNGKey(self.n_deflated + 1)
        if self.evecs is not None:
            vs, lam, mv = self.evecs, self.evals, self.matvec

            @jax.jit
            def outer_cycle(x, b):
                # span (Galerkin) correction: V†AV = diag(λ) exactly
                # after Rayleigh-Ritz, so this solves the in-span block
                r = b - mv(x)
                x = x + deflate_guess(vs, lam, r)
                r = b - mv(x)

                def op(v):
                    return project_out(vs, mv(project_out(vs, v)))

                inner = cg(op, project_out(vs, r), tol=tol,
                           maxiter=maxiter,
                           abs_b2=jnp.real(jnp.vdot(b, b)))
                x = x + project_out(vs, inner.x)
                rn = b - mv(x)
                return x, jnp.real(jnp.vdot(rn, rn)), inner.iters

            b2 = float(jax.jit(
                lambda v: jnp.real(jnp.vdot(v, v)))(b))
            x = jax.jit(jnp.zeros_like)(b)
            iters = 0
            r2 = None
            # defect-correction outers absorb the invariance defect of
            # the approximate space (the cross-coupling the one-shot
            # deflated guess cannot remove)
            for _ in range(4):
                x, r2, it = outer_cycle(x, b)
                iters += int(it)
                if float(r2) <= tol * tol * b2:
                    break
            res = CGResult(x, jnp.asarray(iters), r2)
        else:
            res = _cg_x0(self.matvec, b, None, tol, maxiter)
        if expand:
            self._expand(b, key)
        return res


def _cg_x0(matvec, b, x0, tol, maxiter):
    @jax.jit
    def run(b, x0):
        return cg(matvec, b, x0=x0, tol=tol, maxiter=maxiter)

    @jax.jit
    def run0(b):
        return cg(matvec, b, tol=tol, maxiter=maxiter)

    return run(b, x0) if x0 is not None else run0(b)


def _rayleigh_ritz(matvec, v):
    """Orthonormalise the stacked space v [n, ...] and diagonalise the
    projected operator (the MAGMA Rayleigh-Ritz of the reference,
    lib/blas_magma.cu, as one QR + eigh)."""

    @jax.jit
    def rr(v):
        n = v.shape[0]
        flat = v.reshape(n, -1)
        q, _ = jnp.linalg.qr(flat.T)         # [dim, n] orthonormal
        qv = q.T.reshape(v.shape)            # [n, ...field]
        av = jax.vmap(matvec)(qv)
        h = q.conj().T @ av.reshape(n, -1).T  # [n, n] projected op
        evals, w = jnp.linalg.eigh(0.5 * (h + h.conj().T))
        evecs = jnp.einsum("nm,n...->m...", w, qv)
        return evecs, jnp.real(evals)

    return rr(v)
