"""GMRES-DR: GMRES with deflated restarting (Morgan 2002).

The analogue of the reference GMResDR solver (reference
lib/inv_gmresdr_quda.cpp, class decl include/invert_quda.h:802): a
restarted GMRES whose restart subspace keeps ``n_defl`` harmonic Ritz
vectors of the Hessenberg matrix, so the low modes that stall plain
restarted GMRES stay deflated across cycles.  The reference drives the
small dense problems through MAGMA (lib/blas_magma.cu); here they are a
few (m+1)×m host-side numpy solves per cycle — O(m³) with m ≈ 20,
invisible next to the m operator applications — while the Krylov basis
lives on device as one stacked array [m+1, ...field] updated by jitted
einsum programs.

Host-stepped restarts with jitted cycle bodies (the structure of
gcr_restarted); convergence checks recompute the residual explicitly in
a program that also returns the field (backend rule, verify SKILL.md).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class GMResDRResult(NamedTuple):
    x: jax.Array
    iters: jax.Array
    r2: jax.Array


def _harmonic_ritz(h: np.ndarray, m: int, k: int) -> np.ndarray:
    """[m, k] eigenvectors of the harmonic Ritz problem
    (H_m + h²_{m+1,m} H_m^{-H} e_m e_mᵀ) g = θ g for the k smallest |θ|
    (the deflation subspace of GMRES-DR; the reference computes the same
    spectrum via MAGMA, inv_gmresdr_quda.cpp)."""
    hm = h[:m, :m]
    em = np.zeros((m,), h.dtype)
    em[m - 1] = 1.0
    f = np.linalg.solve(hm.conj().T, em)
    hh = hm + (abs(h[m, m - 1]) ** 2) * np.outer(f, em)
    theta, g = np.linalg.eig(hh)
    order = np.argsort(np.abs(theta))
    return g[:, order[:k]]


def gmresdr(matvec: Callable, b, x0=None, tol: float = 1e-8,
            n_krylov: int = 20, n_defl: int = 8,
            max_restarts: int = 100) -> GMResDRResult:
    """Solve M x = b (M non-hermitian) by GMRES-DR(m, k).

    n_krylov = m (cycle length), n_defl = k (retained harmonic Ritz
    vectors, k < m).  First cycle is plain GMRES(m); subsequent cycles
    restart from the k-dimensional harmonic-Ritz deflation space.
    """
    m, k = n_krylov, n_defl
    if not 0 < k < m:
        raise ValueError(f"need 0 < n_defl={k} < n_krylov={m}")
    cdt = b.dtype
    np_dt = np.complex128 if cdt == jnp.complex128 else np.complex64

    @partial(jax.jit, static_argnames=("k0",))
    def arnoldi(basis, h, k0: int):
        """Extend A V = V H̄ from column k0 to m; full modified
        Gram-Schmidt against all filled slots (j <= current k)."""
        def col(kk, st):
            basis, h = st
            w = matvec(basis[kk])

            def ortho(j, sw):
                w, h = sw
                c = jnp.vdot(basis[j], w)
                mask = (j <= kk).astype(w.dtype)
                h = h.at[j, kk].add(mask * c)
                return (w - mask * c * basis[j], h)

            w, h = jax.lax.fori_loop(0, m + 1, ortho, (w, h))
            nrm = jnp.sqrt(jnp.real(jnp.vdot(w, w)))
            h = h.at[kk + 1, kk].set(nrm.astype(h.dtype))
            inv = jnp.where(nrm > 0, 1.0 / nrm, 0.0).astype(w.dtype)
            basis = basis.at[kk + 1].set(w * inv)
            return (basis, h)

        return jax.lax.fori_loop(k0, m, col, (basis, h))

    @jax.jit
    def combine(basis, coeff, x):
        return x + jnp.einsum("j,j...->...", coeff.astype(basis.dtype),
                              basis)

    @jax.jit
    def residual(x):
        # returns the FIELD too — scalar-only residual programs
        # miscompile on the axon TPU backend (verify SKILL.md)
        r = b - matvec(x)
        return r, jnp.real(jnp.vdot(r, r))

    @jax.jit
    def restart_basis(basis, p):
        """V_new[:k+1] = (V P); remaining slots zeroed."""
        small = jnp.einsum("jk,j...->k...", p.astype(basis.dtype), basis)
        out = jnp.zeros_like(basis)
        return out.at[:p.shape[1]].set(small)

    @jax.jit
    def norm_scale(v):
        nrm = jnp.sqrt(jnp.real(jnp.vdot(v, v)))
        return v / nrm.astype(v.dtype), nrm

    x = jax.jit(jnp.zeros_like)(b) if x0 is None else x0
    r, r2 = residual(x)
    b2 = float(jax.jit(lambda v: jnp.real(jnp.vdot(v, v)))(b))
    target = tol * tol * b2

    basis = jnp.zeros((m + 1,) + b.shape, cdt)
    v0, beta = norm_scale(r)
    basis = jax.jit(lambda bs, v: bs.at[0].set(v))(basis, v0)
    # c = V_{m+1}^H r at cycle start, maintained on host (length m+1)
    c = np.zeros((m + 1,), np_dt)
    c[0] = complex(beta)

    h_dev = jnp.zeros((m + 1, m), cdt)
    k0 = 0
    iters = 0

    for restart in range(max_restarts):
        basis, h_dev = arnoldi(basis, h_dev, k0)
        iters += m - k0
        h = np.asarray(jax.device_get(h_dev)).astype(np_dt)

        # least-squares y = argmin |c − H̄ y|  (GMRES projection)
        y, *_ = np.linalg.lstsq(h, c, rcond=None)
        x = combine(basis[:m], jnp.asarray(y), x)

        r, r2 = residual(x)
        if float(r2) <= target or restart == max_restarts - 1:
            break

        # ---- deflated restart ----------------------------------------
        g = _harmonic_ritz(h, m, k)                       # [m, k]
        cr = c - h @ y                                    # residual coeffs
        pk = np.zeros((m + 1, k + 1), np_dt)
        pk[:m, :k] = g
        pk[:, k] = cr
        pk, _ = np.linalg.qr(pk)                          # [m+1, k+1]
        h_new = pk.conj().T @ h @ pk[:m, :k]              # [k+1, k]

        basis = restart_basis(basis, jnp.asarray(pk))
        h_dev = jnp.zeros((m + 1, m), cdt)
        h_dev = jax.jit(lambda hd, hn: hd.at[:k + 1, :k].set(hn))(
            h_dev, jnp.asarray(h_new))
        # V_new^H r = P^H (c − H̄ y); columns k+1..m are zero
        c = np.zeros((m + 1,), np_dt)
        c[:k + 1] = pk.conj().T @ cr
        k0 = k

    return GMResDRResult(x, jnp.asarray(iters), r2)
