"""Staggered and improved (asqtad-style fat+long) staggered operators.

Semantics match the reference CPU oracle
(reference tests/staggered_dslash_reference.cpp dslashReference):

  D psi(x) = sum_mu [ F_mu(x) psi(x+mu)  - F_mu^dag(x-mu)  psi(x-mu) ]
           + sum_mu [ L_mu(x) psi(x+3mu) - L_mu^dag(x-3mu) psi(x-3mu) ]

with the staggered eta phases FOLDED INTO the links (MILC convention,
reference applyGaugeFieldScaling_long / staggeredPhaseQuda quda.h:805);
the long-link (L) term only for the improved operator.  Full operator
mat = 2m psi + D psi; D is anti-hermitian so MdagM = 4m^2 - D^2
(even-odd: matpc = 4m^2 psi_e - D_eo D_oe psi_e, reference
tests/staggered_dslash_reference.cpp matdagmat).

Fields: single-spin color vectors [3, T, Z, W] per parity
(reference nSpin=1 staggered ColorSpinorField).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from quda_qkxtm_multigrid_tpu.lattice import Geometry, gather_neighbor
from quda_qkxtm_multigrid_tpu.ops.smallmat import su3_mul, su3_dag_mul

STAGGERED_DSLASH_FLOPS_PER_SITE = 570   # reference lib/dirac_staggered.cpp


def staggered_phases(geom: Geometry, antiperiodic_t: bool = True):
    """MILC eta phases per (mu, parity, site) in canonical layout
    [4, 2, T, Z, W] (real ±1): eta_x=1, eta_y=(-1)^x, eta_z=(-1)^{x+y},
    eta_t=(-1)^{x+y+z}, plus the antiperiodic-t factor at t=T-1."""
    T, Z, Y, Xh = geom.T, geom.Z, geom.Y, geom.Xh
    t = np.arange(T).reshape(-1, 1, 1, 1)
    z = np.arange(Z).reshape(1, -1, 1, 1)
    y = np.arange(Y).reshape(1, 1, -1, 1)
    k = np.arange(Xh).reshape(1, 1, 1, -1)
    out = np.zeros((4, 2, T, Z, Y, Xh))
    for p in (0, 1):
        x = 2 * k + (p + t + z + y) % 2
        eta = [np.ones((T, Z, Y, Xh)), (-1.0) ** x, (-1.0) ** (x + y),
               (-1.0) ** (x + y + z)]
        for mu in range(4):
            e = np.broadcast_to(eta[mu], (T, Z, Y, Xh)).astype(float)
            if mu == 3 and antiperiodic_t:
                e = e * np.where(t == T - 1, -1.0, 1.0)
            out[mu, p] = e
    return out.reshape(4, 2, T, Z, geom.W)


def apply_staggered_phases(u, geom: Geometry, antiperiodic_t: bool = True):
    """Fold the eta phases into the links (staggeredPhaseQuda analogue)."""
    ph = jnp.asarray(staggered_phases(geom, antiperiodic_t), u.real.dtype)
    return u * ph[:, :, None, None]


def shift3(f_opp, mu: int, forward: bool, parity: int, geom: Geometry):
    """psi(x ± 3mu) for x of ``parity`` (f stored on the opposite parity).
    Chain of single gathers with alternating target parities p,q,p."""
    p, q = parity, 1 - parity
    v = gather_neighbor(f_opp, mu, forward, p, geom)    # psi(y±mu), aligned p
    v = gather_neighbor(v, mu, forward, q, geom)        # psi(y±2mu), aligned q
    return gather_neighbor(v, mu, forward, p, geom)     # psi(x±3mu), aligned p


def staggered_dslash(fat, psi_opp, parity: int, geom: Geometry,
                     long_links=None, dagger: bool = False):
    """Single-parity staggered D (phases already in the links).
    psi_opp [3, T, Z, W] → out [3, T, Z, W] on ``parity``.
    dagger flips the overall sign (D is anti-hermitian)."""
    psi = psi_opp[None]                  # fake spin axis for su3 helpers
    out = None
    for mu in range(4):
        fwd = gather_neighbor(psi, mu, True, parity, geom)
        bwd = gather_neighbor(psi, mu, False, parity, geom)
        f_bwd = gather_neighbor(fat[mu, 1 - parity], mu, False, parity, geom)
        term = su3_mul(fat[mu, parity], fwd) - su3_dag_mul(f_bwd, bwd)
        if long_links is not None:
            fwd3 = shift3(psi, mu, True, parity, geom)
            bwd3 = shift3(psi, mu, False, parity, geom)
            # L_mu(x-3mu) lives on the opposite parity: gather back 3
            l_bwd = shift3(long_links[mu, 1 - parity], mu, False, parity, geom)
            term = term + su3_mul(long_links[mu, parity], fwd3)
            term = term - su3_dag_mul(l_bwd, bwd3)
        out = term if out is None else out + term
    out = out[0]
    return -out if dagger else out


def staggered_mat(fat, psi, mass: float, geom: Geometry, long_links=None,
                  dagger: bool = False):
    """Full operator on [2, 3, T, Z, W]: out = 2m psi + D psi
    (reference staggered matdagmat's building block)."""
    d_e = staggered_dslash(fat, psi[1], 0, geom, long_links, dagger)
    d_o = staggered_dslash(fat, psi[0], 1, geom, long_links, dagger)
    return 2.0 * mass * psi + jnp.stack([d_e, d_o])


def staggered_matpc(fat, psi_p, mass: float, geom: Geometry,
                    long_links=None, parity: int = 0):
    """Even-odd preconditioned MdagM: 4m^2 psi - D_{p,1-p} D_{1-p,p} psi
    (hermitian positive definite; solved by CG)."""
    t = staggered_dslash(fat, psi_p, 1 - parity, geom, long_links)
    t = staggered_dslash(fat, t, parity, geom, long_links)
    return 4.0 * mass * mass * psi_p - t
