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
from quda_qkxtm_multigrid_tpu.ops.smallmat import (
    su3_mul, su3_dag_mul, mat_mul, mat_dag)

STAGGERED_DSLASH_FLOPS_PER_SITE = 570   # reference lib/dirac_staggered.cpp

# Asqtad path coefficients (MILC asqtad_action.h conventions; the
# reference consumes them as act_path_coeff[6] in
# lib/llfat_quda.cu / computeKSLinkQuda, interface_quda.cpp:4401):
#   one-link 5/8 = 1/8 (fat7) + 3/8 (Lepage backtrack correction)
#                + 1/8 (Naik correction)
#   3-staple -1/16, 5-staple 1/64, 7-staple -1/384, Lepage -1/16,
#   Naik -1/24.
ASQTAD_COEFFS = {
    "one_link": 5.0 / 8.0,
    "three_staple": -1.0 / 16.0,
    "five_staple": 1.0 / 64.0,
    "seven_staple": -1.0 / 384.0,
    "lepage": -1.0 / 16.0,
    "naik": -1.0 / 24.0,
}


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


def gen_staple(u, w, mu: int, nu: int, geom: Geometry):
    """Generalized staple of a link-like field W in direction mu,
    displaced through nu (MILC compute_gen_staple / the reference's
    llfat building block, lib/llfat_quda.cu):

      up:  U_nu(x)        W(x+nu)  U_nu^dag(x+mu)
      low: U_nu^dag(x-nu) W(x-nu)  U_nu(x-nu+mu)

    ``w`` is [2(parity), 3, 3, T, Z, W] living on the mu-link sites;
    returns the same shape.  Composing gen_staple builds the 3-, 5-,
    7-link and Lepage contributions of the asqtad fat link."""
    per_par = []
    for p in (0, 1):
        q = 1 - p
        up = mat_mul(mat_mul(u[nu, p],
                             gather_neighbor(w[q], nu, True, p, geom)),
                     mat_dag(gather_neighbor(u[nu, q], mu, True, p, geom)))
        u_nu_b = gather_neighbor(u[nu, q], nu, False, p, geom)
        w_b = gather_neighbor(w[q], nu, False, p, geom)
        u_nu_bm = gather_neighbor(
            gather_neighbor(u[nu, p], mu, True, q, geom), nu, False, p, geom)
        low = mat_mul(mat_mul(mat_dag(u_nu_b), w_b), u_nu_bm)
        per_par.append(up + low)
    return jnp.stack(per_par)


def naik_links(u, geom: Geometry, coeff: float = ASQTAD_COEFFS["naik"]):
    """Third-neighbor (Naik) long links
    L_mu(x) = coeff * U_mu(x) U_mu(x+mu) U_mu(x+2mu)
    (reference lib/llfat_quda.cu computeLongLink)."""
    out = []
    for mu in range(4):
        per_par = []
        for p in (0, 1):
            q = 1 - p
            u1 = gather_neighbor(u[mu, q], mu, True, p, geom)   # U(x+mu)
            u2 = gather_neighbor(
                gather_neighbor(u[mu, p], mu, True, q, geom),
                mu, True, p, geom)                              # U(x+2mu)
            per_par.append(coeff * mat_mul(mat_mul(u[mu, p], u1), u2))
        out.append(jnp.stack(per_par))
    return jnp.stack(out)


def asqtad_links(u, geom: Geometry, coeffs: dict | None = None):
    """Asqtad fat + long links from the thin gauge field — the
    computeKSLinkQuda analogue (reference interface_quda.cpp:4401,
    lib/llfat_quda.cu), following MILC's nested gen_staple composition:

      fat_mu = c1 U_mu + c3 Σ_nu S_nu(U_mu)
             + c_lep Σ_nu S_nu(S_nu(U_mu))
             + c5 Σ_{nu,rho} S_rho(S_nu(U_mu))
             + c7 Σ_{nu,rho,sig} S_sig(S_rho(S_nu(U_mu)))

    (indices pairwise distinct and != mu; the one-link coefficient's
    +3/8 term compensates the backtracking paths the Lepage composition
    introduces, exactly as in MILC).  Returns (fat, long), each
    [4, 2, 3, 3, T, Z, W]; staggered phases are NOT applied — feed the
    results to apply_staggered_phases for the solver convention."""
    c = dict(ASQTAD_COEFFS)
    if coeffs:
        c.update(coeffs)
    fat = []
    for mu in range(4):
        acc = c["one_link"] * u[mu]
        for nu in range(4):
            if nu == mu:
                continue
            s3 = gen_staple(u, u[mu], mu, nu, geom)
            acc = acc + c["three_staple"] * s3
            acc = acc + c["lepage"] * gen_staple(u, s3, mu, nu, geom)
            for rho in range(4):
                if rho in (mu, nu):
                    continue
                s5 = gen_staple(u, s3, mu, rho, geom)
                acc = acc + c["five_staple"] * s5
                for sig in range(4):
                    if sig in (mu, nu, rho):
                        continue
                    acc = acc + c["seven_staple"] * gen_staple(
                        u, s5, mu, sig, geom)
        fat.append(acc)
    return jnp.stack(fat), naik_links(u, geom, c["naik"])


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
