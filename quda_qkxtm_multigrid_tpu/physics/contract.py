"""Hadron 2pt contraction engine: 10 mesons, 10 baryons, momentum or
position space — the analogue of QKXTM_Contraction::contractMesons /
contractBaryons (reference qudaQKXTM_Contraction_Kepler.cpp, kernels
lib/code_pieces_Kepler/contractMesons_core_Kepler.h,
contractBaryons_core_Kepler.h; type lists interface_quda.cpp:6073-6094).

The reference drives these through numeric spin-index tables
(GK_mesons_indices, GK_NTN/NTR/RTN/RTR/Delta tables,
lib/qudaQKXTM_Kepler_kernels.cu:77-88).  Here the same contractions are
expressed through the gamma matrices those tables factorise into
(factorisation verified numerically against the reference tables):

  mesons:  C_ip = sum_x  G[d,a] G[b,g] S[a,b,cu,cv] S*[d,g,cu,cv]
           G per type: [1, g4, g1, g2, g3, g5, g1g4, g2g4, g3g4, g1g2g3]
  nucleon (NTN):     M4 = -g1g3 (x) g1g3      (g1g3 ~ C gamma5 in DR)
  nucl-roper (NTR):  M6 = g1g3 (x) g1g3g4 (x) g4 on (gam',del'), overall -1
  roper-nucl (RTN):  M6 = -g1g3g4 (x) g1g3 (x) g4 on (gam,del), overall +1
  roper-roper (RTR): M8 = g1g3g4 (x) g1g3g4 (x) g4 (x) g4, overall -1
  Delta 11/22/33:    M4 = -g3g4(x)g3g4, +g5(x)g5, -g1g4(x)g1g4

Baryon outputs are open-spin 4x4 matrices per type, like the
reference's accum[4][4]; two flavor orderings per type (accum1/accum2).

Propagator layout [2, 4(snk s), 4(src s), 3(snk c), 3(src c), T, Z, W].

Einsum index conventions used throughout the baryon terms:
  spin rows  alpha=a, beta=b, gamma(open)=g ; spin cols alpha'=d,
  beta'=e, gamma'(open)=h ; colors (a,b,c)=(u,v,c), (a',b',c')=(x,y,k).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from quda_qkxtm_multigrid_tpu.utils.precision import heinsum

from quda_qkxtm_multigrid_tpu.lattice import Geometry, _join_parity_sites
from quda_qkxtm_multigrid_tpu.ops import gamma as _g

# ---- symbolic gamma structures ---------------------------------------
_G = _g.GAMMA
MESON_NAMES = ["pseudoscalar", "scalar", "g5g1", "g5g2", "g5g3", "g5g4",
               "g1", "g2", "g3", "g4"]
MESON_G = np.stack([
    _g.IDENTITY, _G[3], _G[0], _G[1], _G[2], np.asarray(_g.GAMMA5),
    _G[0] @ _G[3], _G[1] @ _G[3], _G[2] @ _G[3], _G[0] @ _G[1] @ _G[2]])

BARYON_NAMES = ["nucl_nucl", "nucl_roper", "roper_nucl", "roper_roper",
                "deltapp_deltamm_11", "deltapp_deltamm_22",
                "deltapp_deltamm_33", "deltap_deltaz_11",
                "deltap_deltaz_22", "deltap_deltaz_33"]
_G13 = _G[0] @ _G[2]
_G134 = _G[0] @ _G[2] @ _G[3]
_G4 = _G[3]
_EYE4 = _g.IDENTITY
_DELTA_A = [-(_G[2] @ _G[3]), np.asarray(_g.GAMMA5) + 0j, -(_G[0] @ _G[3])]
_DELTA_B = [(_G[2] @ _G[3]), np.asarray(_g.GAMMA5) + 0j, (_G[0] @ _G[3])]

_EPS = np.zeros((3, 3, 3))
for (a, b, c), s in (((0, 1, 2), 1), ((1, 2, 0), 1), ((2, 0, 1), 1),
                     ((2, 1, 0), -1), ((0, 2, 1), -1), ((1, 0, 2), -1)):
    _EPS[a, b, c] = s

# propagator factor strings for each (spin-row, spin-col) slot
_F = {
    ("a", "d"): "paduxtzw", ("a", "e"): "paeuytzw", ("a", "h"): "pahuktzw",
    ("b", "d"): "pbdvxtzw", ("b", "e"): "pbevytzw", ("b", "h"): "pbhvktzw",
    ("g", "d"): "pgdcxtzw", ("g", "e"): "pgecytzw", ("g", "h"): "pghcktzw",
}


# ---- position/momentum-space helpers ---------------------------------

def corr_to_lex(c, geom: Geometry):
    """Correlation field [..., 2(par), T, Z, W] → [..., T, Z, Y, X]
    (vectorised over leading axes — no python iteration over device
    arrays)."""
    lead = c.shape[:-4]
    r = c.reshape(lead + (2, geom.T, geom.Z, geom.Y, geom.Xh))
    nl = len(lead)
    if nl:
        r = jnp.moveaxis(r, tuple(range(nl)), tuple(range(-nl, 0)))
    out = _join_parity_sites(r)          # [T,Z,Y,X, lead...]
    if nl:
        out = jnp.moveaxis(out, tuple(range(-nl, 0)), tuple(range(nl)))
    return out


def momentum_list(q_sq_max: int):
    """Integer momenta with |p|² <= q_sq_max (GK_moms, reference
    lib/qudaQKXTM_Kepler_utils.cpp)."""
    lim = int(np.floor(np.sqrt(q_sq_max)))
    moms = []
    for pz in range(-lim, lim + 1):
        for py in range(-lim, lim + 1):
            for px in range(-lim, lim + 1):
                if px * px + py * py + pz * pz <= q_sq_max:
                    moms.append((px, py, pz))
    return np.asarray(moms)


def momentum_project(c_lex, geom: Geometry, moms, source_coords=(0, 0, 0, 0)):
    """[..., T, Z, Y, X] → [..., T, n_mom], phases
    exp(-2πi Σ p_i (x_i - x0_i)/L_i)
    (reference contractMesons_core_Kepler.h:57-60)."""
    x0, y0, z0, _ = source_coords
    x = np.arange(geom.X) - x0
    y = np.arange(geom.Y) - y0
    z = np.arange(geom.Z) - z0
    px = moms[:, 0].reshape(-1, 1, 1, 1)
    py = moms[:, 1].reshape(-1, 1, 1, 1)
    pz = moms[:, 2].reshape(-1, 1, 1, 1)
    ph = np.exp(-2j * np.pi * (px * x.reshape(1, 1, 1, -1) / geom.X
                               + py * y.reshape(1, 1, -1, 1) / geom.Y
                               + pz * z.reshape(1, -1, 1, 1) / geom.Z))
    ph = jnp.asarray(ph, dtype=c_lex.dtype)   # [nmom, Z, Y, X]
    return heinsum("...tzyx,mzyx->...tm", c_lex, ph)


def momentum_project_dyn(c_lex, geom: Geometry, moms, source):
    """momentum_project with TRACED source coords: the source shift
    factorises, e^{-2πi p·(x-x0)/L} = e^{-2πi p·x/L} · e^{+2πi p·x0/L},
    so the projection uses fixed phases and a per-momentum scalar
    correction — no recompilation per source position."""
    base = momentum_project(c_lex, geom, moms, (0, 0, 0, 0))
    rdt = jnp.real(base).dtype
    m = jnp.asarray(np.asarray(moms), rdt)
    x0 = source[0].astype(rdt)
    y0 = source[1].astype(rdt)
    z0 = source[2].astype(rdt)
    phase = jnp.exp(2j * jnp.pi * (m[:, 0] * x0 / geom.X
                                   + m[:, 1] * y0 / geom.Y
                                   + m[:, 2] * z0 / geom.Z))
    return base * phase.astype(base.dtype)


def fft_project(c_lex):
    """Full momentum grid via spatial FFT — the analogue of the batched
    CUFFT momentum projection (reference qudaQKXTM_Loops_Kepler.cpp
    doCudaFFT_v2, lib/CUFFT_Plans.h)."""
    return jnp.fft.fftn(c_lex, axes=(-3, -2, -1))


# ---- mesons ----------------------------------------------------------

def meson_correlators(prop_up, prop_dn):
    """Position-space meson correlators, both flavor combinations:
    [2(flavor), 10(type), 2(parity), T, Z, W]
    (reference contractMesons accum1/accum2)."""
    out = []
    for s in (prop_up, prop_dn):
        g = jnp.asarray(MESON_G, dtype=s.dtype)
        c = heinsum("mda,mbg,pabuvtzw,pdguvtzw->mptzw",
                       g, g, s, jnp.conj(s))
        out.append(c)
    return jnp.stack(out, axis=1)  # [10, 2(flavor), 2(par), T, Z, W]


# ---- baryons ---------------------------------------------------------

def _ee(dtype):
    return (jnp.asarray(_EPS, dtype), jnp.asarray(_EPS, dtype))


def _nucleon_like(u, d, A, B, CL, CR, overall):
    """Nucleon-family contraction (reference contractBaryons ip 0-3):
    C[γ,γ',p,t,z,w] = overall * Σ A[α,β] B[β',α'] εε D[β,β'] *
        (U[α,α'] Uo[γ,γ'] − Ur[α,γ'] Ul[γ,α'])
    with Ul = CL·U (sink open-index insertion), Ur = U·CR^T (source),
    Uo = CL·U·CR^T."""
    dt = u.dtype
    A = jnp.asarray(A, dt)
    B = jnp.asarray(B, dt)
    e1, e2 = _ee(dt)
    ul = u if CL is None else heinsum(
        "gs,psmuxtzw->pgmuxtzw", jnp.asarray(CL, dt), u)
    ur = u if CR is None else heinsum(
        "hs,pmsuxtzw->pmhuxtzw", jnp.asarray(CR, dt), u)
    uo = ur if CL is None else (ul if CR is None else heinsum(
        "gs,pshuxtzw->pghuxtzw", jnp.asarray(CL, dt), ur))
    t1 = heinsum(f"ab,ed,{_F[('b','e')]},{_F[('a','d')]},{_F[('g','h')]}"
                    ",uvc,xyk->ghptzw", A, B, d, u, uo, e1, e2)
    t2 = heinsum(f"ab,ed,{_F[('b','e')]},{_F[('a','h')]},{_F[('g','d')]}"
                    ",uvc,xyk->ghptzw", A, B, d, ur, ul, e1, e2)
    return overall * (t1 - t2)


_DELTA6 = [  # (sign, slots) for the single-flavor Delta contraction
    (+1, (("a", "e"), ("b", "h"), ("g", "d"))),
    (-1, (("a", "h"), ("b", "e"), ("g", "d"))),
    (+1, (("a", "h"), ("b", "d"), ("g", "e"))),
    (-1, (("a", "d"), ("b", "h"), ("g", "e"))),
    (-1, (("a", "e"), ("b", "d"), ("g", "h"))),
    (+1, (("a", "d"), ("b", "e"), ("g", "h"))),
]

_DELTAZ8 = [  # (coeff, which factor is the d-quark, slots)
    (-4, 1, (("a", "h"), ("b", "e"), ("g", "d"))),
    (+2, 1, (("a", "e"), ("b", "h"), ("g", "d"))),
    (+2, 2, (("a", "h"), ("b", "d"), ("g", "e"))),
    (-2, 2, (("a", "d"), ("b", "h"), ("g", "e"))),
    (-2, 1, (("a", "d"), ("b", "h"), ("g", "e"))),
    (-1, 2, (("a", "e"), ("b", "d"), ("g", "h"))),
    (+1, 2, (("a", "d"), ("b", "e"), ("g", "h"))),
    (+4, 1, (("a", "d"), ("b", "e"), ("g", "h"))),
]


def _delta_like(u, d, A, B, mixed: bool):
    """Delta contractions (reference contractBaryons ip 4-9).
    mixed=False: Δ++-type, all three quarks from ``u`` (6 terms).
    mixed=True:  Δ+-type, one quark from ``d`` (8 terms, x 1/3)."""
    dt = u.dtype
    A = jnp.asarray(A, dt)
    B = jnp.asarray(B, dt)
    e1, e2 = _ee(dt)
    acc = None
    if not mixed:
        terms = [(s, None, slots) for s, slots in _DELTA6]
        scale = 1.0
    else:
        terms = _DELTAZ8
        scale = 1.0 / 3.0
    for item in terms:
        coeff, dpos, slots = item
        ops = []
        for i, slot in enumerate(slots):
            field = d if (dpos is not None and i == dpos) else u
            ops.append((field, _F[slot]))
        sub = ",".join(s for _, s in ops)
        t = heinsum(f"ab,ed,{sub},uvc,xyk->ghptzw",
                       A, B, *(f for f, _ in ops), e1, e2)
        t = coeff * t
        acc = t if acc is None else acc + t
    return scale * acc


def baryon_correlators(prop_up, prop_dn):
    """All 10 baryon types, open spin [10, 2(flavor), 4, 4, 2(par), T, Z, W]
    — accum ordering matches the reference (accum1 = first flavor)."""
    out = []
    specs = [
        (+1.0, -_G13, _G13, None, None),        # NTN: table = (-g13)x(g13),
        # kernel accumulates +factor (contractBaryons_core_Kepler.h:68)
        (-1.0, _G13, _G134, None, _G4),         # NTR (kernel applies -factor)
        (+1.0, -_G134, _G13, _G4, None),        # RTN
        (-1.0, _G134, _G134, _G4, _G4),         # RTR
    ]
    # note: sign conventions — the A matrices above already carry the
    # table signs; ``overall`` carries the kernel's explicit -factor.
    for overall, A, B, CL, CR in specs:
        c1 = _nucleon_like(prop_up, prop_dn, A, B, CL, CR, overall)
        c2 = _nucleon_like(prop_dn, prop_up, A, B, CL, CR, overall)
        out.append(jnp.stack([c1, c2]))
    for k in range(3):
        c1 = _delta_like(prop_up, prop_dn, _DELTA_A[k], _DELTA_B[k], False)
        c2 = _delta_like(prop_dn, prop_up, _DELTA_A[k], _DELTA_B[k], False)
        out.append(jnp.stack([c1, c2]))
    for k in range(3):
        c1 = _delta_like(prop_up, prop_dn, _DELTA_A[k], _DELTA_B[k], True)
        c2 = _delta_like(prop_dn, prop_up, _DELTA_A[k], _DELTA_B[k], True)
        out.append(jnp.stack([c1, c2]))
    return jnp.stack(out)   # [10, 2, 4, 4, 2(par), T, Z, W]
