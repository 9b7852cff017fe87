"""Nucleon three-point functions: fixed-sink sequential sources and the
ultra-local / conserved (noether) / one-derivative insertion
contractions.

References (all formulas transcribed from the reference kernels, with
the numeric spin tables replaced by the gamma matrices they factorise
into — factorisations verified numerically):
  seqSourceFixSinkPart1/2 — lib/code_pieces_Kepler/seqSourceFixSinkPart{1,2}_core_Kepler.h
  projectors (twisted basis) — lib/code_pieces_Kepler/projectors_tm_base.h
  insertion operators (twisted basis) — lib/code_pieces_Kepler/gammas_tm_base.h
  fixSink contractions — lib/code_pieces_Kepler/fixSinkContractions_{local,noether,oneD}_core_Kepler.h
  driver — interface_quda.cpp calcMG_threepTwop_EvenOdd :6018-7090

Workflow per projector/flavor-part (reference interface_quda.cpp:6600-6710):
  prop3D (sink timeslice, sink-smeared) → seq source (12 columns) →
  gamma5 → scale 1e10 → Gaussian smear → solve with OPPOSITE twist →
  scale 2κ·1e-10 → seq propagator → fixSink contractions vs the forward
  propagator → momentum projection with e^{+i p·x} phases.

Projector decomposition (twisted basis; s=+1 proton, −1 neutron):
  G4    = 0.25( γ1γ2γ3γ4 + i·s·γ4 )
  G5Gi  = −0.25( s·γ5γiγ4·(−1)^… )  — encoded explicitly below
  G5G123 = G5G1 + G5G2 + G5G3
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from quda_qkxtm_multigrid_tpu.utils.precision import heinsum
from quda_qkxtm_multigrid_tpu.lattice import (
    Geometry, gather_neighbor, _join_parity_sites, _split_parity_sites)
from quda_qkxtm_multigrid_tpu.ops import gamma as _g
from quda_qkxtm_multigrid_tpu.ops.smallmat import (
    su3_mul, su3_dag_mul, su3_conj_mul, su3_transp_mul)
from quda_qkxtm_multigrid_tpu.physics.contract import _EPS, _G13

_G = _g.GAMMA
_B = _g.GAMMA_BASIS
# basis indices: bit i of the index = gamma_{i+1} present
_I, _G1, _G2, _G3, _G4i = _B[0], _B[1], _B[2], _B[4], _B[8]
_G14, _G24, _G34 = _B[9], _B[10], _B[12]
_G124, _G134, _G234 = _B[11], _B[13], _B[14]
_G12, _G13b, _G23 = _B[3], _B[5], _B[6]
_G123, _G1234 = _B[7], _B[15]

PROTON, NEUTRON = +1, -1
PROJ_NAMES = ["G4", "G5G123", "G5G1", "G5G2", "G5G3"]


def projector(name: str, particle: int):
    """Twisted-basis sink projector (reference projectors_tm_base.h;
    decomposed in the gamma basis, see module docstring)."""
    s = 1.0 if particle == PROTON else -1.0
    if name == "G4":
        return 0.25 * (_G1234 + 1j * s * _G4i)
    if name == "G5G1":
        return -0.25j * _G14 - 0.25 * s * _G234
    if name == "G5G2":
        return +0.25j * _G24 - 0.25 * s * _G134
    if name == "G5G3":
        return -0.25j * _G34 - 0.25 * s * _G124
    if name == "G5G123":
        return (projector("G5G1", particle) + projector("G5G2", particle)
                + projector("G5G3", particle))
    raise ValueError(name)


# the 16 twisted-basis ultra-local insertion matrices
# (reference gammas_tm_base.h cases 0-15; sign-flipping set carries
#  s = +1 when (partflag==1) == (particle==PROTON) else -1)
_OP_BASE = [1j * _G4i, _G1, -_G2, _G3, _G1234, 1j * _I, -_G14, _G24,
            -_G34, -_G123, -_G124, _G134, -_G234, -_G23, -_G13b, -_G12]
_OP_FLIPS = {0, 5, 10, 11, 12, 13, 14, 15}


def insertion_ops(particle: int, partflag: int):
    s = 1.0 if (partflag == 1) == (particle == PROTON) else -1.0
    return np.stack([(s * m if i in _OP_FLIPS else m)
                     for i, m in enumerate(_OP_BASE)])


# noether (1 ± gamma) matrices: reference gammas_tm_base.h cases 16-23
_NOETHER_G = [_G1, -_G2, _G3, _G1234]


def _eps2():
    return np.einsum("uvc,xys->uvcxys", _EPS, _EPS)


# ---- sink-timeslice propagators --------------------------------------

def prop_timeslice_lex(prop, geom: Geometry, t: int):
    """Canonical propagator → lexicographic sink timeslice
    [4,4,3,3,Z,Y,X] (the analogue of QKXTM_Propagator3D absorbTimeSlice,
    reference qudaQKXTM_Kepler.h:263-277)."""
    p = jnp.moveaxis(prop, (1, 2, 3, 4), (-4, -3, -2, -1))  # [2,T,Z,W,4,4,3,3]
    r = p.reshape((2, geom.T, geom.Z, geom.Y, geom.Xh, 4, 4, 3, 3))
    lex = _join_parity_sites(r)                             # [T,Z,Y,X,...]
    return jnp.moveaxis(lex[t], (3, 4, 5, 6), (0, 1, 2, 3))


def embed_timeslice(src_lex, geom: Geometry, t: int, dtype):
    """[q,s, 4,3, Z,Y,X] sequential sources → canonical full fields
    [q,s, 2,4,3,T,Z,W] (zero off the sink timeslice)."""
    q, s = src_lex.shape[:2]
    full = jnp.zeros((q, s, geom.T, geom.Z, geom.Y, geom.X, 4, 3), dtype)
    ts = jnp.moveaxis(src_lex, (2, 3), (-2, -1))            # [q,s,Z,Y,X,4,3]
    full = full.at[:, :, t].set(ts)
    flat = full.reshape((q * s,) + full.shape[2:])
    out = jnp.stack([_split_parity_sites(f) for f in flat])
    out = out.reshape(q, s, 2, geom.T, geom.Z, geom.Y, geom.Xh, 4, 3)
    out = jnp.moveaxis(out, (-2, -1), (3, 4))
    return out.reshape(q, s, 2, 4, 3, geom.T, geom.Z, geom.W)


# ---- sequential sources ----------------------------------------------

def seq_source_part1(t1_lex, t2_lex, proj):
    """Sequential source, mixed-flavor part (reference
    seqSourceFixSinkPart1_core_Kepler.h): for every source column
    (q = spin, s = color) a spinor [4,3] over the sink timeslice.

    t1_lex/t2_lex: [4,4,3,3,Z,Y,X] sink-timeslice propagators (tex1, tex2).
    Returns [4(q), 3(s), 4(n), 3(c), Z, Y, X]."""
    A = -_G13
    B = _G13
    ee = jnp.asarray(_eps2(), t1_lex.dtype)
    A = jnp.asarray(A, t1_lex.dtype)
    B = jnp.asarray(B, t1_lex.dtype)
    P = jnp.asarray(proj, t1_lex.dtype)
    t1 = heinsum("ng,kj,qa,gjuxZYX,akvyZYX,uvcxys->qsncZYX",
                 A, B, P, t2_lex, t1_lex, ee)
    t2 = heinsum("ng,qj,ba,gjuxZYX,abvyZYX,uvcxys->qsncZYX",
                 A, B, P, t2_lex, t1_lex, ee)
    t3 = heinsum("mg,kj,qn,gjuxZYX,mkvyZYX,uvcxys->qsncZYX",
                 A, B, P, t2_lex, t1_lex, ee)
    t4 = heinsum("mg,qj,bn,gjuxZYX,mbvyZYX,uvcxys->qsncZYX",
                 A, B, P, t2_lex, t1_lex, ee)
    return -(t1 + t2 + t3 + t4)


def seq_source_part2(t_lex, proj):
    """Sequential source, same-flavor part (reference
    seqSourceFixSinkPart2_core_Kepler.h)."""
    A = jnp.asarray(-_G13, t_lex.dtype)
    B = jnp.asarray(_G13, t_lex.dtype)
    ee = jnp.asarray(_eps2(), t_lex.dtype)
    P = jnp.asarray(proj, t_lex.dtype)
    p1 = heinsum("mn,kq,ba,mbuxZYX,akvyZYX,uvcxys->qsncZYX",
                 A, B, P, t_lex, t_lex, ee)
    p2 = heinsum("mn,kq,ba,mkuxZYX,abvyZYX,uvcxys->qsncZYX",
                 A, B, P, t_lex, t_lex, ee)
    return -(p1 + p2)


# ---- fixed-sink contractions -----------------------------------------

def fixsink_local(seq, fwd, particle: int, partflag: int):
    """Ultra-local insertions: [16, 2(par), T, Z, W]
    (reference fixSinkContractions_local_core_Kepler.h:36-46):
    thrp[iop] = Σ Γ_iop[ν,ρ] FWD[ρ,μ'] SEQ[ν,μ']  (color-diagonal trace).
    """
    ops = jnp.asarray(insertion_ops(particle, partflag), fwd.dtype)
    return heinsum("onr,prmbatzw,pnmbatzw->optzw", ops, fwd, seq)


def _shift_col_fwd(u, prop, mu, geom):
    """U_mu(x) P(x+mu) on the SINK color axis; prop arranged
    [2, 4(src s), 3(src c), 4(snk s), 3(snk c), T, Z, W]."""
    return jnp.stack([su3_mul(u[mu, p],
                              gather_neighbor(prop[1 - p], mu, True, p, geom))
                      for p in (0, 1)])


def _shift_col_bwd(u, prop, mu, geom):
    return jnp.stack([su3_dag_mul(
        gather_neighbor(u[mu, 1 - p], mu, False, p, geom),
        gather_neighbor(prop[1 - p], mu, False, p, geom)) for p in (0, 1)])


def _shift_row_fwd(u, prop, mu, geom):
    """P(x+mu)·U_mu(x)† on the sink color axis (row side)."""
    return jnp.stack([su3_conj_mul(u[mu, p],
                                   gather_neighbor(prop[1 - p], mu, True, p, geom))
                      for p in (0, 1)])


def _shift_row_bwd(u, prop, mu, geom):
    """P(x-mu)·U_mu(x-mu)."""
    return jnp.stack([su3_transp_mul(
        gather_neighbor(u[mu, 1 - p], mu, False, p, geom),
        gather_neighbor(prop[1 - p], mu, False, p, geom)) for p in (0, 1)])


def _to_shiftable(prop):
    """canonical [2,4,4,3,3,T,Z,W] → [2, src s, src c, snk s, snk c, T,Z,W]
    (snk color at axis -4 for the su3 helpers)."""
    return jnp.moveaxis(prop, (1, 3), (3, 4))


def _from_shiftable(prop):
    return jnp.moveaxis(prop, (3, 4), (1, 3))


def fixsink_oneD(seq, fwd, u, geom: Geometry, particle: int, partflag: int):
    """One-derivative insertions: [16, 4(dir), 2(par), T, Z, W]
    (reference fixSinkContractions_oneD_core_Kepler.h:100-130, with the
    0.25 normalisation of :167):
    thrp[iop,dir] = 0.25 Σ Γ[k,l] { SEQ[k](D_dir FWD)[l] − (D̃_dir SEQ)[k] FWD[l] }
    """
    ops = jnp.asarray(insertion_ops(particle, partflag), fwd.dtype)
    fwd_s = _to_shiftable(fwd)
    seq_s = _to_shiftable(seq)
    out = []
    for mu in range(4):
        dfwd = _from_shiftable(_shift_col_fwd(u, fwd_s, mu, geom)
                               - _shift_col_bwd(u, fwd_s, mu, geom))
        dseq = _from_shiftable(_shift_row_fwd(u, seq_s, mu, geom)
                               - _shift_row_bwd(u, seq_s, mu, geom))
        t1 = heinsum("okl,pkmbatzw,plmbatzw->optzw", ops, seq, dfwd)
        t2 = heinsum("okl,pkmbatzw,plmbatzw->optzw", ops, dseq, fwd)
        out.append(0.25 * (t1 - t2))
    return jnp.stack(out, axis=1)


def fixsink_noether(seq, fwd, u, geom: Geometry, particle: int, partflag: int):
    """Conserved (point-split) vector current: [4(dir), 2(par), T, Z, W]
    (reference fixSinkContractions_noether_core_Kepler.h:95-130):
    j_dir = 0.25 Σ { −SEQ (1−γ) F⁺ + SEQ (1+γ) F⁻ + S⁺ (1+γ) FWD − S⁻ (1−γ) FWD }
    with F± the covariant forward/backward shifts of FWD and S± of SEQ.
    """
    eye = jnp.asarray(np.eye(4), fwd.dtype)
    fwd_s = _to_shiftable(fwd)
    seq_s = _to_shiftable(seq)
    out = []
    for mu in range(4):
        g = jnp.asarray(_NOETHER_G[mu], fwd.dtype)
        one_p = eye + g
        one_m = eye - g
        f_fwd = _from_shiftable(_shift_col_fwd(u, fwd_s, mu, geom))
        f_bwd = _from_shiftable(_shift_col_bwd(u, fwd_s, mu, geom))
        s_fwd = _from_shiftable(_shift_row_fwd(u, seq_s, mu, geom))
        s_bwd = _from_shiftable(_shift_row_bwd(u, seq_s, mu, geom))
        t = (-heinsum("kl,pkmbatzw,plmbatzw->ptzw", one_m, seq, f_fwd)
             + heinsum("kl,pkmbatzw,plmbatzw->ptzw", one_p, seq, f_bwd)
             + heinsum("kl,pkmbatzw,plmbatzw->ptzw", one_p, s_fwd, fwd)
             - heinsum("kl,pkmbatzw,plmbatzw->ptzw", one_m, s_bwd, fwd))
        out.append(0.25 * t)
    return jnp.stack(out)
