"""Communication-avoiding / s-step solvers.

The reference's MPCG ("matrix-powers" s-step CG, lib/inv_mpcg_quda.cpp
402 — gamma/rho recurrences over s-step blocks) and MPBiCGstab
(lib/inv_mpbicgstab_quda.cpp:318) exist to amortise global reductions
over s matvecs.  The TPU-native forms here express the same trade with
batched einsum Gram matrices (ONE fused all-reduce per s matvecs when
sharded — the psum count is the per-iteration cost the reference's
'pipeline' knob targets, quda.h:130):

  mpcg        s-step block CG: monomial basis V = [r, Ar, ..], new block
              A-conjugated against the previous block (Chronopoulos/
              Gear s-step CG — mathematically s CG steps per block in
              exact arithmetic).
  bicgstab_l  BiCGstab(L) (Sleijpen-Fokkema): the degree-L stabilising
              polynomial generalisation filling MPBiCGstab's role
              (fewer synchronisation points per matvec, better
              convergence on indefinite spectra than plain BiCGstab).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from quda_qkxtm_multigrid_tpu.solvers.cg import CGResult, _dot


def mpcg(matvec: Callable, b, s: int = 4, tol: float = 1e-10,
         max_blocks: int = 500) -> CGResult:
    """s-step CG.  Monomial bases limit practical s to <= ~6 in f32
    (the reference's MPCG shares this conditioning caveat)."""
    x = jnp.zeros_like(b)
    b2 = _dot(b, b)
    target = (tol * tol) * b2
    zeros_blk = jnp.zeros((s,) + b.shape, b.dtype)
    eye = jnp.eye(s, dtype=b.dtype)

    def blk_matvec(V):
        return jax.lax.map(matvec, V)

    def gram(A_, B_):
        # [s,...],[s,...] -> [s,s] single fused reduction
        return jnp.einsum("i...,j...->ij", jnp.conj(A_), B_)

    def proj(V, r):
        return jnp.einsum("i...,...->i", jnp.conj(V), r)

    def basis(r):
        def step(v, _):
            av = matvec(v)
            return av, v
        _, V = jax.lax.scan(step, r, None, length=s)
        return V                      # [s, ...]: r, Ar, ..., A^{s-1} r

    def body(carry):
        x, r, P, AP, G_prev, have_prev, r2, k = carry
        V = basis(r)
        # A-conjugate the new block against the previous one
        C = gram(AP, V)               # (AP)^dag V
        coef = jnp.linalg.solve(G_prev + (1 - have_prev) * eye, C)
        V = V - have_prev * jnp.einsum("i...,ij->j...", P, coef)
        AV = blk_matvec(V)
        G = gram(V, AV)               # V^dag A V (hermitian s x s)
        g = proj(V, r)
        y = jnp.linalg.solve(G, g)
        x = x + jnp.einsum("i...,i->...", V, y)
        r = r - jnp.einsum("i...,i->...", AV, y)
        return (x, r, V, AV, G, jnp.asarray(1.0, b.dtype),
                _dot(r, r), k + s)

    def cond(carry):
        return jnp.logical_and(carry[6] > target,
                               carry[7] < max_blocks * s)

    st = (x, b, zeros_blk, zeros_blk, eye, jnp.asarray(0.0, b.dtype),
          b2, jnp.asarray(0, jnp.int32))
    out = jax.lax.while_loop(cond, body, st)
    return CGResult(out[0], out[7], out[6])


def bicgstab_l(matvec: Callable, b, L: int = 2, tol: float = 1e-10,
               maxiter: int = 1000) -> CGResult:
    """BiCGstab(L): BiCG steps followed by a degree-L minimal-residual
    polynomial update (Sleijpen-Fokkema).  L=1 reduces to BiCGstab;
    L=2 is the standard choice."""
    x = jnp.zeros_like(b)
    r0 = b
    b2 = _dot(b, b)
    target = (tol * tol) * b2
    one = jnp.asarray(1.0, b.dtype)

    zeros_L1 = jnp.zeros((L + 1,) + b.shape, b.dtype)

    def body(carry):
        x, rs, us, rho0, alpha, omega, r2, k = carry
        rho0 = -omega * rho0
        # BiCG part (L is small and static: unrolled; stack slices
        # 0..j are exact, entries > j+1 are dead until overwritten)
        for j in range(L):
            rho1 = jnp.vdot(r0, rs[j])
            beta = alpha * (rho1 / rho0)
            rho0 = rho1
            us = us.at[:j + 1].set(rs[:j + 1] - beta * us[:j + 1])
            us = us.at[j + 1].set(matvec(us[j]))
            alpha = rho0 / jnp.vdot(r0, us[j + 1])
            rs = rs.at[:j + 1].set(rs[:j + 1] - alpha * us[1:j + 2])
            rs = rs.at[j + 1].set(matvec(rs[j]))
            x = x + alpha * us[0]
        # MR part: gamma = argmin || r_0 - sum_{j>=1} gamma_j r_j ||
        Rm = rs[1:]                   # [L, ...]
        Gm = jnp.einsum("i...,j...->ij", jnp.conj(Rm), Rm)
        gv = jnp.einsum("i...,...->i", jnp.conj(Rm), rs[0])
        gamma = jnp.linalg.solve(Gm, gv)
        x = x + jnp.einsum("i,i...->...", gamma, rs[:L])
        r_new = rs[0] - jnp.einsum("i,i...->...", gamma, Rm)
        u_new = us[0] - jnp.einsum("i,i...->...", gamma, us[1:])
        omega = gamma[L - 1]
        rs = zeros_L1.at[0].set(r_new)
        us = zeros_L1.at[0].set(u_new)
        return (x, rs, us, rho0, alpha, omega, _dot(r_new, r_new),
                k + 2 * L)

    def cond(carry):
        return jnp.logical_and(carry[6] > target, carry[7] < maxiter)

    st = (x, zeros_L1.at[0].set(b), zeros_L1, one, one, one, b2,
          jnp.asarray(0, jnp.int32))
    out = jax.lax.while_loop(cond, body, st)
    return CGResult(out[0], out[7], out[6])
