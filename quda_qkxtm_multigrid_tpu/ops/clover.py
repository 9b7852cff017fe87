"""Clover term: field-strength tensor, chiral-block construction,
batched 6x6 apply and inverse.

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

Spinor chirality blocks in the DeGrand-Rossi basis: spins (0,1) form the
gamma5=+1 block (ch=0), spins (2,3) the gamma5=-1 block (ch=1).

Layouts:
  clover      [2(parity), 2(chirality), T, Z, Y, X/2, 6, 6]
  fmunu       [6, 2(parity), T, Z, Y, X/2, 3, 3]

Construction runs on the full (non-split) lattice with jnp.roll — it is
a once-per-gauge-load setup cost (reference loadCloverQuda,
interface_quda.cpp:4004), not a hot path.
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

from quda_qkxtm_multigrid_tpu.lattice import Geometry, split_parity
from quda_qkxtm_multigrid_tpu import fields as _fields

CLOVER_APPLY_FLOPS_PER_SITE = 504  # reference lib/dirac_clover.cpp:92


def _sh(f, mu: int, s: int):
    """Value at x + s*mu on the full lattice ([T,Z,Y,X,...] layout)."""
    return jnp.roll(f, -s, axis=3 - mu)


def _mm(*ms):
    out = ms[0]
    for m in ms[1:]:
        out = _einsum("...ab,...bc->...ac", out, m)
    return out


def _dag(m):
    return jnp.conj(jnp.swapaxes(m, -1, -2))


FMUNU_PAIRS = ((1, 0), (2, 0), (2, 1), (3, 0), (3, 1), (3, 2))


def field_strength_full(u_full):
    """Clover-leaf field strength on the full lattice.

    u_full [4,T,Z,Y,X,3,3] → F [6,T,Z,Y,X,3,3], anti-hermitian."""
    fs = []
    for mu, nu in FMUNU_PAIRS:
        umu, unu = u_full[mu], u_full[nu]
        l1 = _mm(umu, _sh(unu, mu, 1), _dag(_sh(umu, nu, 1)), _dag(unu))
        l2 = _mm(unu, _dag(_sh(_sh(umu, nu, 1), mu, -1)),
                 _dag(_sh(unu, mu, -1)), _sh(umu, mu, -1))
        l3 = _mm(_dag(_sh(umu, mu, -1)),
                 _dag(_sh(_sh(unu, mu, -1), nu, -1)),
                 _sh(_sh(umu, mu, -1), nu, -1), _sh(unu, nu, -1))
        l4 = _mm(_dag(_sh(unu, nu, -1)), _sh(umu, nu, -1),
                 _sh(_sh(unu, nu, -1), mu, 1), _dag(umu))
        q = l1 + l2 + l3 + l4
        fs.append(0.125 * (q - _dag(q)))
    return jnp.stack(fs)


def make_clover(u, geom: Geometry, coeff: float):
    """Build the clover term A [2(parity),2(ch),T,Z,Y,X/2,6,6],
    coeff = csw * kappa."""
    u_full = _fields.gauge_to_full(u)
    f = field_strength_full(u_full)          # [6,T,Z,Y,X,3,3]
    ic = 1j * coeff
    b1 = jnp.stack([ic * (f[0] - f[5]), ic * (f[0] + f[5])])
    b2 = jnp.stack([coeff * (f[1] + f[4] - 1j * (f[2] - f[3])),
                    coeff * (f[1] - f[4] - 1j * (f[2] + f[3]))])
    eye = jnp.eye(3, dtype=u.dtype)
    # assemble [2(ch), T,Z,Y,X, 6, 6]
    top = jnp.concatenate([eye - b1, _dag(b2)], axis=-1)
    bot = jnp.concatenate([b2, eye + b1], axis=-1)
    a_full = jnp.concatenate([top, bot], axis=-2)   # [2,T,Z,Y,X,6,6]
    # parity-split: [2(ch),T,Z,Y,X,6,6] -> [2(p),2(ch),T,Z,Y,Xh,6,6]
    a_split = jnp.stack([split_parity(a_full[ch]) for ch in range(2)], axis=1)
    return a_split


def clover_with_twist(clover, kappa: float, mu: float, flavor: int):
    """A + i·2κμ·flavor·γ5 as chiral blocks (γ5 = ±1 per chirality)."""
    a = 2.0 * kappa * mu * flavor
    eye = jnp.eye(6, dtype=clover.dtype)
    return jnp.stack([clover[:, 0] + 1j * a * eye,
                      clover[:, 1] - 1j * a * eye], axis=1)


def invert_clover(clover):
    """Batched 6x6 inverse per (parity, chirality, site) — the analogue of
    cloverInvert (reference lib/clover_invert.cu)."""
    return jnp.linalg.inv(clover)


def clover_apply(clover_p, psi, dagger: bool = False):
    """Apply per-site block matrix: clover_p [2(ch),T,Z,Y,Xh,6,6],
    psi [T,Z,Y,Xh,4,3] (reference tests/clover_reference.cpp:20-63)."""
    shp = psi.shape
    chi = psi.reshape(shp[:-2] + (2, 6))             # [...,2(ch),6]
    m = clover_p
    if dagger:
        m = _dag(m)
    out = _einsum("c...ij,...cj->...ci", m, chi)
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
