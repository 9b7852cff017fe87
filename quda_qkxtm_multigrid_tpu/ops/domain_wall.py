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
    building block; the A^{-1} (tridiagonal-in-s solve, the reference's
    dslashReference_5th_inv) lands with the Moebius extension."""
    a = psi5_p - kappa * dslash5(psi5_p, mferm, dagger)
    t = dslash4(u, psi5_p, 1 - parity, geom, dagger)
    t = dslash4(u, t, parity, geom, dagger)
    return a - (kappa * kappa) * t
