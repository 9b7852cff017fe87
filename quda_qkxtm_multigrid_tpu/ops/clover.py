"""Clover term: field-strength tensor, chiral-block construction,
batched 6x6 apply and inverse — canonical lane-major layout.

Math follows the reference exactly (reference lib/field_strength_tensor.cu:30-200,
lib/clover_quda.cu:68-145):
  F_idx = (1/8) (Q - Q^dag), Q = sum of the 4 clover leaves in plane
  (mu,nu), component order idx(mu,nu) = (1,0),(2,0),(2,1),(3,0),(3,1),(3,2).
  With c = clover_coeff = csw * kappa (reference
  qkxtm/CalcMG_2pt3pt_EvenOdd.cpp:229):
    b1[0] = i c (F[0] - F[5]),  b1[1] = i c (F[0] + F[5])
    b2[0] = c (F[1] + F[4] - i (F[2] - F[3]))
    b2[1] = c (F[1] - F[4] - i (F[2] + F[3]))
    A_ch  = [[I - b1[ch], b2[ch]^dag], [b2[ch], I + b1[ch]]]   (6x6 hermitian)
(identity weight 1 here; QUDA stores 0.5*A and compensates in its apply
kernels — a storage convention, not a physics difference).

Chirality blocks in DeGrand-Rossi: spins (0,1) = gamma5=+1 block (ch=0),
spins (2,3) = ch=1.

Layouts:
  clover  [2(parity), 2(ch), 6, 6, T, Z, W]
  fmunu   [6(pair), 2(parity), 3, 3, T, Z, W]
"""

from __future__ import annotations

import jax.numpy as jnp

from quda_qkxtm_multigrid_tpu.lattice import Geometry, gather_neighbor
from quda_qkxtm_multigrid_tpu.ops.smallmat import (
    mat_mul, mat_dag as _dag, chiral_mat_mul, mat6_inv_blocks)

CLOVER_APPLY_FLOPS_PER_SITE = 504  # reference lib/dirac_clover.cpp:92


def _mm(*ms):
    out = ms[0]
    for m in ms[1:]:
        out = mat_mul(out, m)
    return out


FMUNU_PAIRS = ((1, 0), (2, 0), (2, 1), (3, 0), (3, 1), (3, 2))


def field_strength(u, geom: Geometry):
    """Clover-leaf field strength on the canonical parity-split layout.

    u [4,2,3,3,T,Z,W] → F [6,2,3,3,T,Z,W], anti-hermitian.

    Each leaf is built by composing parity-alternating neighbour gathers
    (a double shift passes through the opposite parity and back).
    """
    def g(mat_on_parity_q, mu, fwd, target_p):
        return gather_neighbor(mat_on_parity_q, mu, fwd, target_p, geom)

    fs = []
    for mu, nu in FMUNU_PAIRS:
        per_parity = []
        for p in (0, 1):
            q = 1 - p
            umu_p, unu_p = u[mu, p], u[nu, p]
            umu_q, unu_q = u[mu, q], u[nu, q]
            # L1 = U_mu(x) U_nu(x+mu) U_mu†(x+nu) U_nu†(x)
            l1 = _mm(umu_p, g(unu_q, mu, True, p),
                     _dag(g(umu_q, nu, True, p)), _dag(unu_p))
            # L2 = U_nu(x) U_mu†(x+nu-mu) U_nu†(x-mu) U_mu(x-mu)
            #   x+nu-mu: shift -mu (to parity q) then... two shifts: first
            #   +nu from parity p→q is wrong order; compose: value at
            #   x+nu-mu = gather(+nu at target q) applied to same-parity
            #   field then gather(-mu at target p).
            u_numu = g(g(umu_p, nu, True, q), mu, False, p)   # U_mu(x+nu-mu)
            l2 = _mm(unu_p, _dag(u_numu), _dag(g(unu_q, mu, False, p)),
                     g(umu_q, mu, False, p))
            # L3 = U_mu†(x-mu) U_nu†(x-mu-nu) U_mu(x-mu-nu) U_nu(x-nu)
            u_mn_nu = g(g(unu_p, mu, False, q), nu, False, p)  # U_nu(x-mu-nu)
            u_mn_mu = g(g(umu_p, mu, False, q), nu, False, p)  # U_mu(x-mu-nu)
            l3 = _mm(_dag(g(umu_q, mu, False, p)), _dag(u_mn_nu),
                     u_mn_mu, g(unu_q, nu, False, p))
            # L4 = U_nu†(x-nu) U_mu(x-nu) U_nu(x+mu-nu) U_mu†(x)
            u_munu = g(g(unu_p, mu, True, q), nu, False, p)    # U_nu(x+mu-nu)
            l4 = _mm(_dag(g(unu_q, nu, False, p)), g(umu_q, nu, False, p),
                     u_munu, _dag(umu_p))
            qsum = l1 + l2 + l3 + l4
            per_parity.append(0.125 * (qsum - _dag(qsum)))
        fs.append(jnp.stack(per_parity))
    return jnp.stack(fs)


def make_clover(u, geom: Geometry, coeff: float):
    """Build A [2(parity),2(ch),6,6,T,Z,W], coeff = csw * kappa."""
    f = field_strength(u, geom)              # [6,2,3,3,T,Z,W]
    ic = 1j * coeff
    b1 = jnp.stack([ic * (f[0] - f[5]), ic * (f[0] + f[5])], axis=1)
    b2 = jnp.stack([coeff * (f[1] + f[4] - 1j * (f[2] - f[3])),
                    coeff * (f[1] - f[4] - 1j * (f[2] + f[3]))], axis=1)
    # b1,b2: [2(parity),2(ch),3,3,T,Z,W]
    lead = (1, 1, 3, 3) + (1, 1, 1)
    eye = jnp.eye(3, dtype=u.dtype).reshape(1, 1, 3, 3, 1, 1, 1)
    dag = lambda m: jnp.conj(jnp.swapaxes(m, 2, 3))
    top = jnp.concatenate([eye - b1, dag(b2)], axis=3)   # [2,2,3,6,T,Z,W]
    bot = jnp.concatenate([b2, eye + b1], axis=3)
    return jnp.concatenate([top, bot], axis=2)           # [2,2,6,6,T,Z,W]


def clover_with_twist(clover, kappa: float, mu: float, flavor: int):
    """A + i·2κμ·flavor·γ5 as chiral blocks (γ5 = ±1 per chirality)."""
    a = 2.0 * kappa * mu * flavor
    eye = jnp.eye(6, dtype=clover.dtype).reshape(1, 6, 6, 1, 1, 1)
    return jnp.stack([clover[:, 0] + 1j * a * eye,
                      clover[:, 1] - 1j * a * eye], axis=1)


def invert_clover(clover):
    """Batched 6x6 inverse per (parity, chirality, site) — the analogue of
    cloverInvert (reference lib/clover_invert.cu).  Explicit 3x3-block
    Schur inversion in leading-axes component form (batched
    jnp.linalg.inv lowers with 28x-padded LU temporaries on TPU)."""
    # clover [2(p),2(ch),6,6,T,Z,W] -> vectorise the block inverse over
    # the two leading axes with plain python loops (4 cases)
    outs = []
    for p in range(2):
        outs.append(jnp.stack([mat6_inv_blocks(clover[p, ch])
                               for ch in range(2)]))
    return jnp.stack(outs)


def clover_apply(clover_p, psi, dagger: bool = False):
    """clover_p [2(ch),6,6,T,Z,W] applied to psi [4,3,T,Z,W]
    (reference tests/clover_reference.cpp:20-63)."""
    shp = psi.shape
    chi = psi.reshape((2, 6) + shp[2:])      # [2(ch),6,T,Z,W]
    out = chiral_mat_mul(clover_p, chi, dagger=dagger)
    return out.reshape(shp)


def make_clover_pair(u, geom: Geometry, params):
    """clover + inverse (inverse includes the twist for twisted-clover,
    matching the reference's cInv in tmc_matpc,
    tests/clover_reference.cpp:234-255)."""
    coeff = params.csw * params.kappa
    clov = make_clover(u, geom, coeff)
    if params.kind == "twisted-clover" and params.mu != 0.0:
        inv = invert_clover(clover_with_twist(clov, params.kappa, params.mu,
                                              params.flavor))
    else:
        inv = invert_clover(clov)
    return clov, inv
