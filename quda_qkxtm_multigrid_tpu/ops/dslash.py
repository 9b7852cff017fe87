"""Wilson-type Dslash stencils on the parity-split layout (XLA path).

Semantics match the reference CPU oracle exactly
(reference tests/wilson_dslash_reference.cpp:105-131):

    D_{p<-1-p} psi(x) = sum_mu (1 - gamma_mu) U_mu(x)        psi(x+mu)
                              + (1 + gamma_mu) U_mu^†(x-mu)  psi(x-mu)

(no 1/2 — folded into kappa), with the dagger variant swapping the
projectors.  Full operator M = in - kappa*D(in)
(reference wil_mat, wilson_dslash_reference.cpp:295-308); even-odd
preconditioned M_pc = in - kappa^2 D_eo D_oe in (wil_matpc, :333-355).

This is the shift-based XLA formulation: 8 neighbour gathers +
spin-projection einsums + SU(3) multiplies, fused by XLA.  The Pallas
interior kernel (ops/dslash_pallas.py) replaces it on the hot path.

Flops: 1,320 per site per application (reference lib/dirac_wilson.cpp:60).
"""

from __future__ import annotations

import jax.numpy as jnp

import jax.lax as _lax


def _einsum(*args, **kw):
    """einsum pinned to HIGHEST precision: on TPU the default lowers 3x3
    SU(3)/spin contractions to bf16 MXU passes, flooring solver residuals
    at ~1e-3.  bf16 compute is an explicit sloppy-field choice, never an
    implicit one."""
    kw.setdefault("precision", _lax.Precision.HIGHEST)
    return jnp.einsum(*args, **kw)

from quda_qkxtm_multigrid_tpu.lattice import Geometry, gather_neighbor
from quda_qkxtm_multigrid_tpu.ops import gamma as _g

WILSON_DSLASH_FLOPS_PER_SITE = 1320


def _proj(mu: int, plus: bool, psi):
    """Apply (1 ± gamma_mu) to spinor [..., 4, 3]."""
    p = jnp.asarray(_g.PROJ[mu, 1 if plus else 0], dtype=psi.dtype)
    return _einsum("st,...tc->...sc", p, psi)


def _su3(u, psi):
    """U psi over color: u [..., 3, 3], psi [..., 4, 3]."""
    return _einsum("...ab,...sb->...sa", u, psi)


def _su3_dag(u, psi):
    return _einsum("...ba,...sb->...sa", jnp.conj(u), psi)


def dslash_parity(u, psi_opp, parity: int, geom: Geometry, dagger: bool = False):
    """Apply the hopping term, writing sites of ``parity`` from the
    opposite-parity field ``psi_opp`` [T,Z,Y,X/2,4,3]."""
    out = None
    for mu in range(4):
        fwd_psi = gather_neighbor(psi_opp, mu, True, parity, geom)
        bwd_psi = gather_neighbor(psi_opp, mu, False, parity, geom)
        u_fwd = u[mu, parity]
        u_bwd = gather_neighbor(u[mu, 1 - parity], mu, False, parity, geom)
        term = _su3(u_fwd, _proj(mu, dagger, fwd_psi))
        term = term + _su3_dag(u_bwd, _proj(mu, not dagger, bwd_psi))
        out = term if out is None else out + term
    return out


def wilson_mat(u, psi, kappa: float, geom: Geometry, dagger: bool = False):
    """Full Wilson operator on [2,T,Z,Y,X/2,4,3]: out = psi - kappa D psi."""
    d_even = dslash_parity(u, psi[1], 0, geom, dagger)
    d_odd = dslash_parity(u, psi[0], 1, geom, dagger)
    return psi - kappa * jnp.stack([d_even, d_odd])


def wilson_matpc(u, psi_p, kappa: float, geom: Geometry, parity: int = 0,
                 dagger: bool = False):
    """Even-odd preconditioned: out = psi - kappa^2 D_{p,1-p} D_{1-p,p} psi.

    ``parity=0`` is QUDA_MATPC_EVEN_EVEN (reference wil_matpc)."""
    tmp = dslash_parity(u, psi_p, 1 - parity, geom, dagger)
    out = dslash_parity(u, tmp, parity, geom, dagger)
    return psi_p - (kappa * kappa) * out


def dslash_flops(geom: Geometry, sites: str = "half") -> int:
    v = geom.half_volume if sites == "half" else geom.volume
    return WILSON_DSLASH_FLOPS_PER_SITE * v
