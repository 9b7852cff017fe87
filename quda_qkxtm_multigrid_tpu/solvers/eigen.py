"""Hermitian eigensolver: thick-restart Lanczos with optional Chebyshev
acceleration, plus deflation utilities.

Replaces the reference's two eigensolver stacks:
  * ARPACK/PARPACK znaupd/zneupd (reference QKXTM_Deflation::eigenSolver,
    lib/qudaQKXTM_Deflation_Kepler.cpp:816, Chebyshev acceleration
    ``polynomialOperator`` :746 with params amin/amax/PolyDeg,
    qudaQKXTM_Kepler_utils.h:80-92)
  * the in-tree Lanczos/ImpRstLanczos (reference lib/eig_lanczos_quda.cpp,
    lib/ritz_quda.cpp)
with one TPU-native thick-restart Lanczos: the Krylov basis is a stacked
leading-axis array [ncv, ...field], the projected tridiagonal problem is
solved with jnp.linalg.eigh (small, on-device), and restarts keep the
best ``nev`` Ritz vectors (thick restart).  Full reorthogonalisation —
the flops are negligible next to the operator applications and it keeps
single precision usable.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class EigResult(NamedTuple):
    evals: jax.Array      # [nev] ascending
    evecs: jax.Array      # [nev, ...field]
    resid: jax.Array      # [nev] |A v - λ v|


def _dot(a, b):
    return jnp.vdot(a, b)


def _orthonormalize_against(v, basis, n_active):
    """Remove components of v along basis[0:n_active] (full reorth, 2x)."""
    def proj(_, vv):
        def body(j, w):
            c = _dot(basis[j], w)
            mask = (j < n_active).astype(w.dtype)
            return w - mask * c * basis[j]
        return jax.lax.fori_loop(0, basis.shape[0], body, vv)
    v = proj(0, v)
    v = proj(0, v)
    return v


def chebyshev_op(matvec: Callable, amin: float, amax: float, degree: int):
    """Chebyshev polynomial filter T_n of the spectrum-mapped operator —
    amplifies the low end of [amin, amax] (reference polynomialOperator,
    qudaQKXTM_Deflation_Kepler.cpp:746)."""
    d = (amax + amin) / 2.0
    c = (amax - amin) / 2.0

    def op(v):
        tm1 = v
        t = (matvec(v) - d * v) * (1.0 / c)
        for _ in range(degree - 1):
            tp1 = 2.0 / c * (matvec(t) - d * t) - tm1
            tm1, t = t, tp1
        return t

    return op


def lanczos(matvec: Callable, example, nev: int, ncv: int = None,
            tol: float = 1e-8, max_restarts: int = 100, key=None,
            which: str = "smallest"):
    """Thick-restart Lanczos for the hermitian ``matvec``.

    ``example``: field template (shape/dtype) for the start vector.
    Returns EigResult with eigenpairs of matvec (ascending)."""
    if ncv is None:
        ncv = max(2 * nev + 8, nev + 16)
    if key is None:
        key = jax.random.PRNGKey(7)
    dtype = example.dtype
    shape = example.shape

    kr, ki = jax.random.split(key)
    rdt = jnp.float64 if dtype == jnp.complex128 else jnp.float32
    v0 = (jax.random.normal(kr, shape, rdt)
          + 1j * jax.random.normal(ki, shape, rdt)).astype(dtype)
    v0 = v0 / jnp.sqrt(jnp.real(_dot(v0, v0)))

    basis = jnp.zeros((ncv + 1,) + shape, dtype)   # slot ncv = residual vec
    basis = basis.at[0].set(v0)

    def build(basis, tmat, k_start):
        """Extend the Lanczos factorisation from k_start to ncv; the
        normalised residual vector lands in basis[ncv]."""
        def body(k, carry):
            basis, tmat = carry
            w = matvec(basis[k])
            alpha = jnp.real(_dot(basis[k], w))
            w = _orthonormalize_against(w, basis, k + 1)
            beta = jnp.sqrt(jnp.real(_dot(w, w)))
            w = w / jnp.where(beta > 0, beta, 1.0)
            tmat = tmat.at[k, k].add(alpha)
            tmat = tmat.at[k + 1, k].set(beta)
            tmat = tmat.at[k, k + 1].set(beta)
            basis = basis.at[k + 1].set(w)
            return basis, tmat
        return jax.lax.fori_loop(k_start, ncv, body, (basis, tmat))

    tmat = jnp.zeros((ncv + 1, ncv + 1), jnp.float64 if dtype == jnp.complex128
                     else jnp.float32)

    @jax.jit
    def restart_cycle(basis, tmat, k_keep):
        basis, tmat = build(basis, tmat, k_keep)
        tt = tmat[:ncv, :ncv]
        evals, q = jnp.linalg.eigh(tt)
        # ritz vectors for the nev kept + residual estimates
        ritz = jnp.einsum("kv,k...->v...", q[:, :nev].astype(dtype),
                          basis[:ncv])
        beta_last = tmat[ncv, ncv - 1]
        res = jnp.abs(beta_last * q[ncv - 1, :nev])
        # thick restart: new basis = ritz vectors + carried residual vec
        new_basis = jnp.zeros_like(basis)
        new_basis = new_basis.at[:nev].set(ritz)
        new_basis = new_basis.at[nev].set(basis[ncv])
        new_tmat = jnp.zeros_like(tmat)
        new_tmat = new_tmat.at[jnp.diag_indices(nev)[0],
                               jnp.diag_indices(nev)[1]].set(
            evals[:nev].astype(new_tmat.dtype))
        # coupling row: beta_last * last components of each ritz vector
        s = (beta_last * q[ncv - 1, :nev]).astype(new_tmat.dtype)
        new_tmat = new_tmat.at[nev, :nev].set(s)
        new_tmat = new_tmat.at[:nev, nev].set(s)
        return new_basis, new_tmat, evals[:nev], ritz, res

    evals = ritz = res = None
    k_keep = 0
    for it in range(max_restarts):
        basis, tmat, evals, ritz, res = restart_cycle(basis, tmat, k_keep)
        k_keep = nev
        if float(jnp.max(res)) < tol:
            break
    # final residuals against the true operator
    av = jnp.stack([matvec(ritz[i]) for i in range(nev)])
    true_res = jnp.stack([
        jnp.sqrt(jnp.real(_dot(av[i] - evals[i] * ritz[i],
                               av[i] - evals[i] * ritz[i])))
        for i in range(nev)])
    return EigResult(evals=evals, evecs=ritz, resid=true_res)


def deflate_guess(evecs, evals, b):
    """x0 = V diag(1/λ) V† b — exact low-mode solution used as the
    initial guess (reference deflateVector,
    qudaQKXTM_Deflation_Kepler.cpp:554)."""
    axes = tuple(range(1, b.ndim + 1))
    coeffs = jnp.sum(jnp.conj(evecs) * b[None], axis=axes[:b.ndim])
    coeffs = coeffs / evals.astype(coeffs.dtype)
    return jnp.tensordot(coeffs, evecs, axes=1)


def project_out(evecs, v):
    """Remove the deflation-space component (reference projectVector,
    used on stochastic sources in the wExact loops driver,
    interface_quda.cpp:7969)."""
    axes = tuple(range(1, v.ndim + 1))
    coeffs = jnp.sum(jnp.conj(evecs) * v[None], axis=axes[:v.ndim])
    return v - jnp.tensordot(coeffs, evecs, axes=1)
