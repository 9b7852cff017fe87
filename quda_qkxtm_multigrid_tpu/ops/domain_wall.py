"""Domain-wall fermions (Shamir), 4D even-odd preconditioned form.

Semantics match the reference CPU oracle
(reference tests/domain_wall_dslash_reference.cpp):
  * 4D part: the Wilson hopping term applied per s-slice
    (dslashReference_4d, same projectors as Wilson)
  * 5th-dim part (dslashReference_5th :370-401):
      out(x,s) += PR psi(x,s+1) + PL psi(x,s-1)
    with PR = 1 - gamma5, PL = 1 + gamma5 (table :219-231; the "2 on
    the chiral diagonal" convention matching the 4D 1∓gamma_mu), and
    the boundary factor -mferm on the wrap s=Ls-1 -> 0 (fwd) and
    s=0 -> Ls-1 (bwd); dagger swaps PR/PL.
  * full operator (dw_4d_mat :...): out = psi - kappa5 * (D4 + D5) psi,
    kappa5 = 1/(2(4 - M5 + 1)).

5D field layout: [Ls, 2(parity), 4, 3, T, Z, W] (Ls as the leading
batch axis — SURVEY.md's "Ls as leading batch axis" plan).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu.ops import dslash as _dsl

DW_DSLASH_FLOPS_PER_SITE = 1320   # 4D part; +96 bulk/120 wall for 5th dim
                                  # (reference lib/dirac_domain_wall.cpp:54)

_PR = np.diag([0.0, 0.0, 2.0, 2.0])   # 1 - gamma5
_PL = np.diag([2.0, 2.0, 0.0, 0.0])   # 1 + gamma5


def kappa5(m5: float) -> float:
    return 1.0 / (2.0 * (4.0 - m5 + 1.0))


def dslash4(u, psi5_opp, parity: int, geom: Geometry, dagger: bool = False):
    """4D Wilson hop per s-slice: psi5_opp [Ls, 4, 3, T, Z, W]."""
    return jax.vmap(
        lambda p: _dsl.dslash_parity(u, p, parity, geom, dagger))(psi5_opp)


def dslash5(psi5_same, mferm: float, dagger: bool = False):
    """5th-dimension hop (site-local in 4D): psi5_same [Ls, 4, 3, T, Z, W]."""
    ls = psi5_same.shape[0]
    pr = jnp.asarray(_PL if dagger else _PR, psi5_same.dtype)
    pl = jnp.asarray(_PR if dagger else _PL, psi5_same.dtype)
    fwd = jnp.roll(psi5_same, -1, axis=0)      # psi(s+1), wraps Ls-1 -> 0
    bwd = jnp.roll(psi5_same, 1, axis=0)       # psi(s-1), wraps 0 -> Ls-1
    s = jnp.arange(ls).reshape(-1, 1, 1, 1, 1, 1)
    ffac = jnp.where(s == ls - 1, -mferm, 1.0).astype(psi5_same.dtype)
    bfac = jnp.where(s == 0, -mferm, 1.0).astype(psi5_same.dtype)
    out = ffac * jnp.einsum("st,ltc...->lsc...", pr, fwd)
    out = out + bfac * jnp.einsum("st,ltc...->lsc...", pl, bwd)
    return out


def dw4d_mat(u, psi5, kappa: float, mferm: float, geom: Geometry,
             dagger: bool = False):
    """Full 4D-PC domain-wall operator on [Ls, 2, 4, 3, T, Z, W]:
    out = psi - kappa * (D4 + D5) psi (reference dw_4d_mat)."""
    d4_e = dslash4(u, psi5[:, 1], 0, geom, dagger)
    d4_o = dslash4(u, psi5[:, 0], 1, geom, dagger)
    d4 = jnp.stack([d4_e, d4_o], axis=1)
    d5 = jnp.stack([dslash5(psi5[:, p], mferm, dagger) for p in (0, 1)],
                   axis=1)
    return psi5 - kappa * (d4 + d5)


def dw4d_matpc(u, psi5_p, kappa: float, mferm: float, geom: Geometry,
               parity: int = 0, dagger: bool = False):
    """Even-odd preconditioned (symmetric, kappa^2 form):
    out = psi - kappa^2 D4_{p,1-p} D4_{1-p,p} psi - kappa D5 psi + ...

    For the 4D-PC domain-wall operator the Schur complement over 4D
    parity is M_pc = A - kappa^2 D4 A^{-1} D4 with A = 1 - kappa D5
    (s-hop is parity-diagonal).  Exposed as the hermitian-squarable
    building block; the exact A^{-1} lives in mdw_dslash5_inv below."""
    a = psi5_p - kappa * dslash5(psi5_p, mferm, dagger)
    t = dslash4(u, psi5_p, 1 - parity, geom, dagger)
    t = dslash4(u, t, parity, geom, dagger)
    return a - (kappa * kappa) * t


# --- Möbius ----------------------------------------------------------
# Semantics match the reference CPU oracle
# (reference tests/domain_wall_dslash_reference.cpp): mdw_dslash_4_pre
# :647 (out = b5 ψ + c5/2 D5hop ψ), mdw_dslash_5 :633 (ψ + κ5 D5hop ψ),
# dslashReference_5th_inv :404-460 (the tridiagonal-with-wrap solve —
# here a dense [Ls,Ls] inverse applied as one einsum: Ls ≤ 32, so the
# matrix inverse is negligible and the apply is MXU matmul work, the
# TPU-preferred form of the reference's sequential substitution), and
# mdw_mat :698 / mdw_matpc :805 with
#   κ_b[s] = 1/(2(b5[s](4+m5)+1)),  κ_c[s] = 1/(2(c5[s](4+m5)−1)),
#   κ5 = κ_b/(2κ_c),  κ2 = −κ_b²  (reference tests/dslash_test.cpp:877).
# b5/c5 may be scalars or per-s arrays (zMöbius).


def mdw_kappas(b5, c5, m5: float, ls: int):
    """(kappa_b, kappa_c, kappa5) per-s arrays from b5/c5/m5."""
    b5 = np.broadcast_to(np.asarray(b5, np.float64), (ls,))
    c5 = np.broadcast_to(np.asarray(c5, np.float64), (ls,))
    kb = 1.0 / (2.0 * (b5 * (4.0 + m5) + 1.0))
    kc = 1.0 / (2.0 * (c5 * (4.0 + m5) - 1.0))
    return kb, kc, 0.5 * kb / kc


def _sfac(coef, psi5):
    """Broadcast a per-s coefficient over [Ls, 4, 3, T, Z, W]."""
    return jnp.asarray(coef, psi5.dtype).reshape(-1, 1, 1, 1, 1, 1)


def mdw_dslash4_pre(psi5_same, b5, c5, mferm: float, dagger: bool = False):
    """D4pre = B5 ψ + (1/2) C5 D5hop ψ (reference mdw_dslash_4_pre);
    dagger is the TRUE adjoint B5 ψ + (1/2) D5hop† (C5 ψ) — for per-s
    coefficients the diagonal-in-s C5 moves through the hop (the
    reference oracle keeps C5 on the left even under daggerBit, which is
    only the adjoint for s-constant coefficients)."""
    if dagger:
        hop = dslash5(_sfac(c5, psi5_same) * psi5_same, mferm, True)
        return _sfac(b5, psi5_same) * psi5_same + 0.5 * hop
    hop = dslash5(psi5_same, mferm, False)
    return _sfac(b5, psi5_same) * psi5_same + 0.5 * _sfac(c5, psi5_same) * hop


def mdw_dslash5(psi5_same, kappa5, mferm: float, dagger: bool = False):
    """D̃5 = ψ + K5 D5hop ψ (reference mdw_dslash_5); dagger is the
    TRUE adjoint ψ + D5hop† (K5 ψ)."""
    if dagger:
        return psi5_same + dslash5(_sfac(kappa5, psi5_same) * psi5_same,
                                   mferm, True)
    return psi5_same + _sfac(kappa5, psi5_same) * dslash5(psi5_same, mferm,
                                                          False)


def _d5_matrices(ls: int, kappa5, mferm: float):
    """[4, Ls, Ls] matrices of D̃5 = 1 + K5 D5hop per spin (the
    projectors are spin-diagonal with entries 0/2)."""
    k5 = np.broadcast_to(np.asarray(kappa5, np.float64), (ls,))
    pr = np.diag(_PR)                        # coefficient of ψ(s+1)
    pl = np.diag(_PL)                        # coefficient of ψ(s-1)
    mats = np.zeros((4, ls, ls), np.complex128)
    for t in range(4):
        a = np.eye(ls, dtype=np.complex128)
        for s in range(ls):
            sp, sm = (s + 1) % ls, (s - 1) % ls
            ffac = -mferm if s == ls - 1 else 1.0
            bfac = -mferm if s == 0 else 1.0
            a[s, sp] += k5[s] * pr[t] * ffac
            a[s, sm] += k5[s] * pl[t] * bfac
        mats[t] = a
    return mats


def mdw_dslash5_inv(psi5_same, kappa5, mferm: float, dagger: bool = False):
    """Exact D̃5⁻¹ (reference dslashReference_5th_inv, called with
    kappa_mdwf = −κ5 there; here κ5 is passed directly and the operator
    inverted is 1 + κ5 D5hop — the two conventions agree).  dagger
    applies (D̃5†)⁻¹ = (D̃5⁻¹)† exactly."""
    ls = psi5_same.shape[0]
    inv = np.stack([np.linalg.inv(m)
                    for m in _d5_matrices(ls, kappa5, mferm)])
    if dagger:
        inv = np.conj(np.swapaxes(inv, 1, 2))
    inv_j = jnp.asarray(inv, psi5_same.dtype)
    return jnp.einsum("tsr,rtc...->stc...", inv_j, psi5_same)


def mdw_mat(u, psi5, m5: float, mferm: float, b5, c5, geom: Geometry,
            dagger: bool = False):
    """Full Möbius operator on [Ls, 2, 4, 3, T, Z, W]
    (reference mdw_mat, domain_wall_dslash_reference.cpp:698):
        out_p = D̃5 ψ_p − κ_b · D4_{p,1−p} (D4pre ψ_{1−p})
    dagger applies the true adjoint (sub-operators daggered AND the
    D4/D4pre order reversed)."""
    ls = psi5.shape[0]
    kb, kc, k5 = mdw_kappas(b5, c5, m5, ls)
    outs = []
    for p in (0, 1):
        if not dagger:
            t = mdw_dslash4_pre(psi5[:, 1 - p], b5, c5, mferm)
            t = dslash4(u, t, p, geom)
            t = _sfac(kb, t) * t
        else:
            # (K_b D4 D4pre)† = D4pre† D4† K_b — the per-s κ_b scaling
            # moves to the FRONT under the adjoint
            t = _sfac(kb, psi5[:, 1 - p]) * psi5[:, 1 - p]
            t = dslash4(u, t, p, geom, dagger=True)
            t = mdw_dslash4_pre(t, b5, c5, mferm, dagger=True)
        d5 = mdw_dslash5(psi5[:, p], k5, mferm, dagger)
        outs.append(d5 - t)
    return jnp.stack(outs, axis=1)


def mdw_matpc(u, psi5_p, m5: float, mferm: float, b5, c5, geom: Geometry,
              parity: int = 0, dagger: bool = False):
    """Symmetric even-odd preconditioned Möbius operator
    (reference mdw_matpc, domain_wall_dslash_reference.cpp:805,
    QUDA_MATPC_EVEN_EVEN path):
        M_pc = 1 + κ2 · D̃5⁻¹ D4 D4pre D̃5⁻¹ D4 D4pre,   κ2 = −κ_b²
    with the adjoint ordering for dagger (reference symmetric&&dagger
    branch)."""
    ls = psi5_p.shape[0]
    kb, kc, k5 = mdw_kappas(b5, c5, m5, ls)
    kappa2 = -kb * kb

    def hop(v, out_parity, dg):
        return dslash4(u, v, out_parity, geom, dagger=dg)

    if not dagger:
        t = psi5_p
        t = mdw_dslash4_pre(t, b5, c5, mferm)
        t = hop(t, 1 - parity, False)
        t = mdw_dslash5_inv(t, k5, mferm)
        t = mdw_dslash4_pre(t, b5, c5, mferm)
        t = hop(t, parity, False)
        t = mdw_dslash5_inv(t, k5, mferm)
        return psi5_p + _sfac(kappa2, t) * t
    # adjoint: (1 + K2 C)† = 1 + C† K2 — per-s κ2 scales FIRST
    t = _sfac(kappa2, psi5_p) * psi5_p
    t = mdw_dslash5_inv(t, k5, mferm, dagger=True)
    t = hop(t, 1 - parity, True)
    t = mdw_dslash4_pre(t, b5, c5, mferm, dagger=True)
    t = mdw_dslash5_inv(t, k5, mferm, dagger=True)
    t = hop(t, parity, True)
    t = mdw_dslash4_pre(t, b5, c5, mferm, dagger=True)
    return psi5_p + t
