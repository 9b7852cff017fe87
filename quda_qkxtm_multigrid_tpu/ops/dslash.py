"""Wilson-type Dslash stencils on the canonical lane-major layout (XLA path).

Semantics match the reference CPU oracle exactly
(reference tests/wilson_dslash_reference.cpp:105-131):

    D_{p<-1-p} psi(x) = sum_mu (1 - gamma_mu) U_mu(x)        psi(x+mu)
                              + (1 + gamma_mu) U_mu^dag(x-mu) psi(x-mu)

(no 1/2 — folded into kappa), dagger swaps the projectors.  Full operator
M = in - kappa*D(in) (reference wil_mat :295-308); even-odd preconditioned
M_pc = in - kappa^2 D_eo D_oe in (wil_matpc :333-355).

Layouts: psi [4,3,T,Z,W] per parity; u [4,2,3,3,T,Z,W].
Spin/color contractions sit on the LEADING axes so every fused temporary
keeps the large (Z, W) trailing tile — the layout decision that makes
solver while_loops storable on TPU (see lattice.py docstring).

Flops: 1,320 per site per application (reference lib/dirac_wilson.cpp:60).
"""

from __future__ import annotations

import jax.numpy as jnp

from quda_qkxtm_multigrid_tpu.lattice import Geometry, gather_neighbor
from quda_qkxtm_multigrid_tpu.ops import gamma as _g
from quda_qkxtm_multigrid_tpu.ops.smallmat import (
    su3_mul as _su3, su3_dag_mul as _su3_dag, spinmat_mul)

WILSON_DSLASH_FLOPS_PER_SITE = 1320


def _proj(mu: int, plus: bool, psi):
    """(1 ± gamma_mu) psi over the leading spin axis: psi [4,3,T,Z,W]."""
    return spinmat_mul(_g.PROJ[mu, 1 if plus else 0], psi)


def dslash_parity(u, psi_opp, parity: int, geom: Geometry, dagger: bool = False):
    """Hopping term writing sites of ``parity`` from the opposite-parity
    field ``psi_opp`` [4,3,T,Z,W]."""
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
    """Full Wilson operator on [2,4,3,T,Z,W]: out = psi - kappa D psi."""
    d_even = dslash_parity(u, psi[1], 0, geom, dagger)
    d_odd = dslash_parity(u, psi[0], 1, geom, dagger)
    return psi - kappa * jnp.stack([d_even, d_odd])


def wilson_matpc(u, psi_p, kappa: float, geom: Geometry, parity: int = 0,
                 dagger: bool = False):
    """Even-odd preconditioned: out = psi - kappa^2 D_{p,1-p} D_{1-p,p} psi
    (parity=0 is QUDA_MATPC_EVEN_EVEN, reference wil_matpc)."""
    tmp = dslash_parity(u, psi_p, 1 - parity, geom, dagger)
    out = dslash_parity(u, tmp, parity, geom, dagger)
    return psi_p - (kappa * kappa) * out


def dslash_flops(geom: Geometry, sites: str = "half") -> int:
    v = geom.half_volume if sites == "half" else geom.volume
    return WILSON_DSLASH_FLOPS_PER_SITE * v


def double_gauge(u, geom: Geometry):
    """Precompute the backward-gathered links once per gauge load:
    ud[mu, parity, 0] = U_mu(x) and ud[mu, parity, 1] = U_mu(x-mu) for
    x of ``parity`` — the analogue of QUDA's resident gauge keeping both
    hop directions addressable (reference lib/cuda_gauge_field.cu).
    Halves the per-application gather traffic of the XLA shift path."""
    dirs = []
    for mu in range(4):
        per_par = []
        for p in range(2):
            per_par.append(jnp.stack(
                [u[mu, p], gather_neighbor(u[mu, 1 - p], mu, False, p, geom)]))
        dirs.append(jnp.stack(per_par))
    return jnp.stack(dirs)          # [4, 2, 2, 3, 3, T, Z, W]


def dslash_parity_doubled(ud, psi_opp, parity: int, geom: Geometry,
                          dagger: bool = False):
    """dslash_parity using a doubled gauge field (no in-loop link gathers)."""
    out = None
    for mu in range(4):
        fwd_psi = gather_neighbor(psi_opp, mu, True, parity, geom)
        bwd_psi = gather_neighbor(psi_opp, mu, False, parity, geom)
        term = _su3(ud[mu, parity, 0], _proj(mu, dagger, fwd_psi))
        term = term + _su3_dag(ud[mu, parity, 1], _proj(mu, not dagger, bwd_psi))
        out = term if out is None else out + term
    return out


def hop_apply(u, psi, mu: int, sign: int, geom: Geometry,
              dagger: bool = False):
    """Single directional hop term on a FULL field [2,4,3,T,Z,W]:
    sign=+1: out(x) = (1∓γ_mu) U_mu(x) psi(x+mu)
    sign=-1: out(x) = (1±γ_mu) U_mu†(x-mu) psi(x-mu)
    (one of the 8 dir terms of dslashReference,
    tests/wilson_dslash_reference.cpp:117-125).  Used by the coarse-
    operator construction to probe individual coarse links."""
    outs = []
    for parity in (0, 1):
        src = psi[1 - parity]
        if sign > 0:
            fwd = gather_neighbor(src, mu, True, parity, geom)
            outs.append(_su3(u[mu, parity], _proj(mu, dagger, fwd)))
        else:
            bwd = gather_neighbor(src, mu, False, parity, geom)
            u_bwd = gather_neighbor(u[mu, 1 - parity], mu, False, parity, geom)
            outs.append(_su3_dag(u_bwd, _proj(mu, not dagger, bwd)))
    return jnp.stack(outs)
