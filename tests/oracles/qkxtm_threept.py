"""Site-loop NumPy oracle of the reference QKXTM fixed-sink 3pt kernels,
transcribed directly from the reference cores:
  get_Operator  — lib/code_pieces_Kepler/gammas_tm_base.h (cases 0-23)
  get_Projector — lib/code_pieces_Kepler/projectors_tm_base.h
  fixSink local  — fixSinkContractions_local_core_Kepler.h:36-46
  fixSink noether— fixSinkContractions_noether_core_Kepler.h:95-134,
                   0.25 at writeout (:161)
  fixSink oneD   — fixSinkContractions_oneD_core_Kepler.h:100-130,
                   0.25 at writeout (:167)
  seqSource part1/2 — seqSourceFixSinkPart{1,2}_core_Kepler.h

Layouts: propagators P[4(sink spin),4(src spin),3(sink c),3(src c),
T,Z,Y,X]; gauge U[4(dir),3,3,T,Z,Y,X]; all single-process (periodic
np.roll shifts — the oracle never needs the dimBreak ghost branches).
PROTON=+1, NEUTRON=-1; partflag in (1, 2).
"""

from __future__ import annotations

import numpy as np

from . import qkxtm_tables as T

PROTON, NEUTRON = +1, -1
_EPS_ROWS = [(0, 1, 2, 1.0), (2, 0, 1, 1.0), (1, 2, 0, 1.0),
             (0, 2, 1, -1.0), (1, 0, 2, -1.0), (2, 1, 0, -1.0)]


def _mat(entries):
    g = np.zeros((4, 4), complex)
    for (m, n), v in entries.items():
        g[m, n] = v
    return g


def get_operator(flag: int, particle: int, partflag: int) -> np.ndarray:
    """gammas_tm_base.h verbatim."""
    s = 1.0 if (partflag == 1) == (particle == PROTON) else -1.0
    i = 1j
    if flag == 0:
        return s * _mat({(0, 2): i, (1, 3): i, (2, 0): i, (3, 1): i})
    if flag == 1:
        return _mat({(3, 0): -i, (2, 1): -i, (1, 2): i, (0, 3): i})
    if flag == 2:
        return _mat({(3, 0): 1, (2, 1): -1, (1, 2): -1, (0, 3): 1})
    if flag == 3:
        return _mat({(0, 2): i, (1, 3): -i, (2, 0): -i, (3, 1): i})
    if flag == 4:
        return _mat({(0, 0): 1, (1, 1): 1, (2, 2): -1, (3, 3): -1})
    if flag == 5:
        return s * _mat({(0, 0): i, (1, 1): i, (2, 2): i, (3, 3): i})
    if flag == 6:
        return _mat({(0, 1): -i, (1, 0): -i, (2, 3): i, (3, 2): i})
    if flag == 7:
        return _mat({(0, 1): -1, (1, 0): 1, (2, 3): 1, (3, 2): -1})
    if flag == 8:
        return _mat({(0, 0): -i, (1, 1): i, (2, 2): i, (3, 3): -i})
    if flag == 9:
        return _mat({(0, 2): -1, (1, 3): -1, (2, 0): 1, (3, 1): 1})
    if flag == 10:
        return s * _mat({(0, 2): i, (1, 3): -i, (2, 0): i, (3, 1): -i})
    if flag == 11:
        return s * _mat({(0, 3): -1, (1, 2): 1, (2, 1): -1, (3, 0): 1})
    if flag == 12:
        return s * _mat({(0, 3): i, (1, 2): i, (2, 1): i, (3, 0): i})
    if flag == 13:
        return s * _mat({(0, 1): i, (1, 0): i, (2, 3): i, (3, 2): i})
    if flag == 14:
        return s * _mat({(0, 1): 1, (1, 0): -1, (2, 3): 1, (3, 2): -1})
    if flag == 15:
        return s * _mat({(0, 0): i, (1, 1): -i, (2, 2): i, (3, 3): -i})
    eye = np.eye(4, dtype=complex)
    if flag == 16:
        return eye + _mat({(0, 3): i, (1, 2): i, (2, 1): -i, (3, 0): -i})
    if flag == 17:
        return eye + _mat({(0, 3): 1, (1, 2): -1, (2, 1): -1, (3, 0): 1})
    if flag == 18:
        return eye + _mat({(0, 2): i, (1, 3): -i, (2, 0): -i, (3, 1): i})
    if flag == 19:
        return _mat({(0, 0): 2, (1, 1): 2})
    if flag == 20:
        return eye - _mat({(0, 3): i, (1, 2): i, (2, 1): -i, (3, 0): -i})
    if flag == 21:
        return eye - _mat({(0, 3): 1, (1, 2): -1, (2, 1): -1, (3, 0): 1})
    if flag == 22:
        return eye - _mat({(0, 2): i, (1, 3): -i, (2, 0): -i, (3, 1): i})
    if flag == 23:
        return _mat({(2, 2): 2, (3, 3): 2})
    raise ValueError(flag)


def get_projector(pid: str, particle: int) -> np.ndarray:
    """projectors_tm_base.h verbatim."""
    i = 1j
    s = 1.0 if particle == PROTON else -1.0
    if pid == "G4":
        return 0.25 * (_mat({(0, 0): 1, (1, 1): 1, (2, 2): -1,
                             (3, 3): -1})
                       + s * _mat({(0, 2): i, (1, 3): i, (2, 0): i,
                                   (3, 1): i}))
    if pid == "G5G1":
        return 0.25 * (_mat({(0, 1): 1, (1, 0): 1, (2, 3): -1,
                             (3, 2): -1})
                       + s * _mat({(0, 3): i, (1, 2): i, (2, 1): i,
                                   (3, 0): i}))
    if pid == "G5G2":
        return 0.25 * (s * _mat({(0, 3): 1, (1, 2): -1, (2, 1): 1,
                                 (3, 0): -1})
                       + _mat({(0, 1): -i, (1, 0): i, (2, 3): i,
                               (3, 2): -i}))
    if pid == "G5G3":
        return 0.25 * (_mat({(0, 0): 1, (1, 1): -1, (2, 2): -1,
                             (3, 3): 1})
                       + s * _mat({(0, 2): i, (1, 3): -i, (2, 0): i,
                                   (3, 1): -i}))
    if pid == "G5G123":
        return (get_projector("G5G1", particle)
                + get_projector("G5G2", particle)
                + get_projector("G5G3", particle))
    raise ValueError(pid)


def fixsink_local_ref(seq, fwd, particle: int, partflag: int):
    """[16, T, Z, Y, X]."""
    out = np.zeros((16,) + fwd.shape[4:], complex)
    for iop in range(16):
        g = get_operator(iop, particle, partflag)
        out[iop] = np.einsum("nr,rmba...,nmba...->...", g, fwd, seq)
    return out


def _sh(P, d, sign):
    """P(x + sign*e_d); spatial axes of P are (-4..-1) = (T,Z,Y,X) and
    d=0..3 -> (X,Y,Z,T)."""
    ax = {0: -1, 1: -2, 2: -3, 3: -4}[d]
    return np.roll(P, -sign, axis=ax)


def fixsink_noether_ref(seq, fwd, U, particle: int, partflag: int):
    """[4(dir), T, Z, Y, X] — noether core four-term form, x0.25."""
    out = np.zeros((4,) + fwd.shape[4:], complex)
    for d in range(4):
        onep = get_operator(16 + d, particle, partflag)
        onem = get_operator(20 + d, particle, partflag)
        Ud, Udm = U[d], _sh(U[d], d, -1)
        fwd_p, fwd_m = _sh(fwd, d, +1), _sh(fwd, d, -1)
        seq_p, seq_m = _sh(seq, d, +1), _sh(seq, d, -1)
        acc = -np.einsum("kpab...,kl,ac...,lpcb...->...",
                         seq, onem, Ud, fwd_p)
        acc += np.einsum("kpab...,kl,ca...,lpcb...->...",
                         seq, onep, np.conj(Udm), fwd_m)
        acc += np.einsum("kpab...,kl,ca...,lpcb...->...",
                         seq_p, onep, np.conj(Ud), fwd)
        acc -= np.einsum("kpab...,kl,ac...,lpcb...->...",
                         seq_m, onem, Udm, fwd)
        out[d] = 0.25 * acc
    return out


def fixsink_oneD_ref(seq, fwd, U, particle: int, partflag: int):
    """[16, 4(dir), T, Z, Y, X] — oneD core four-term form, x0.25."""
    out = np.zeros((16, 4) + fwd.shape[4:], complex)
    for d in range(4):
        Ud, Udm = U[d], _sh(U[d], d, -1)
        fwd_p, fwd_m = _sh(fwd, d, +1), _sh(fwd, d, -1)
        seq_p, seq_m = _sh(seq, d, +1), _sh(seq, d, -1)
        for iop in range(16):
            g = get_operator(iop, particle, partflag)
            acc = np.einsum("kpab...,kl,ac...,lpcb...->...",
                            seq, g, Ud, fwd_p)
            acc -= np.einsum("kpab...,kl,ca...,lpcb...->...",
                             seq, g, np.conj(Udm), fwd_m)
            acc -= np.einsum("kpab...,kl,ca...,lpcb...->...",
                             seq_p, g, np.conj(Ud), fwd)
            acc += np.einsum("kpab...,kl,ac...,lpcb...->...",
                             seq_m, g, Udm, fwd)
            out[iop, d] = 0.25 * acc
    return out


def seq_source_part1_ref(t1, t2, particle: int, pid: str,
                         c_nu: int, c_c2: int):
    """Mixed-flavor sequential source for source column (c_nu, c_c2):
    [4(nu), 3(c3), Z, Y, X].  t1/t2 are the SINK-TIMESLICE propagators
    (tex1/tex2) [4,4,3,3,Z,Y,X]."""
    proj = get_projector(pid, particle)
    out = np.zeros((4, 3) + t1.shape[4:], complex)
    for c1, c2, c3, s1 in _EPS_ROWS:
        for c1p, c2p, c3p, s2 in _EPS_ROWS:
            if c3p != c_c2:
                continue
            for idx in range(16):
                mu, gu, ku, ju = T.NTN_IDX[idx]
                for a in range(4):
                    for b in range(4):
                        if abs(proj[b, a]) < 1e-12:
                            continue
                        f = -s1 * s2 * T.NTN_VAL[idx] * proj[b, a]
                        t2f = t2[gu, ju, c1, c1p]
                        if b == c_nu:
                            out[mu, c3] += f * t2f * t1[a, ku, c2, c2p]
                        if ku == c_nu:
                            out[mu, c3] += f * t2f * t1[a, b, c2, c2p]
                        if b == c_nu:
                            out[a, c3] += f * t2f * t1[mu, ku, c2, c2p]
                        if ku == c_nu:
                            out[a, c3] += f * t2f * t1[mu, b, c2, c2p]
    return out


def seq_source_part2_ref(t, particle: int, pid: str,
                         c_nu: int, c_c2: int):
    """Same-flavor sequential source: [4, 3, Z, Y, X]."""
    proj = get_projector(pid, particle)
    out = np.zeros((4, 3) + t.shape[4:], complex)
    for c1, c2, c3, s1 in _EPS_ROWS:
        for c1p, c2p, c3p, s2 in _EPS_ROWS:
            if c3p != c_c2:
                continue
            for idx in range(16):
                mu, nu, ku, lu = T.NTN_IDX[idx]
                if lu != c_nu:
                    continue
                for a in range(4):
                    for b in range(4):
                        if abs(proj[b, a]) < 1e-12:
                            continue
                        f = -s1 * s2 * T.NTN_VAL[idx] * proj[b, a]
                        out[nu, c3] += f * (t[mu, b, c1, c1p]
                                            * t[a, ku, c2, c2p])
                        out[nu, c3] += f * (t[mu, ku, c1, c1p]
                                            * t[a, b, c2, c2p])
    return out
