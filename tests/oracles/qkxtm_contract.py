"""Site-loop NumPy oracle of the reference QKXTM 2pt contraction
kernels, written DIRECTLY from the reference core loops
(reference lib/code_pieces_Kepler/contractMesons_core_Kepler.h:19-33 and
contractBaryons_core_Kepler.h:42-72 [NTN], :113-142 [NTR], :185-213
[RTN], :258-287 [RTR], :335-368 [Delta x3], :420-455 [DeltaISO1O2 x3])
using the verbatim numeric spin tables in qkxtm_tables.py — completely
independent of the package's gamma-factorised einsum formulation in
quda_qkxtm_multigrid_tpu/physics/contract.py.

Propagator layout here is the reference's PROP(mu, nu, a, b) per
lexicographic site: P[4(sink spin), 4(src spin), 3(sink color),
3(src color), T, Z, Y, X] complex.
"""

from __future__ import annotations

import numpy as np

from . import qkxtm_tables as T

_EPS_ROWS = [(0, 1, 2, 1.0), (2, 0, 1, 1.0), (1, 2, 0, 1.0),
             (0, 2, 1, -1.0), (1, 0, 2, -1.0), (2, 1, 0, -1.0)]


def mesons_ref(P1, P2):
    """contractMesons: [10(type), 2(accum1/2), T, Z, Y, X]."""
    space = P1.shape[4:]
    out = np.zeros((10, 2) + space, complex)
    for ip in range(10):
        for i_s in range(16):
            beta, gamma, delta, alpha = T.MESON_IDX[ip, i_s]
            val = T.MESON_VAL[ip, i_s]
            for P, fl in ((P1, 0), (P2, 1)):
                out[ip, fl] += val * np.einsum(
                    "ab...,ab...->...", P[alpha, beta],
                    np.conj(P[delta, gamma]))
    return out


def _eps_pairs():
    for a, b, c, s1 in _EPS_ROWS:
        for a1, b1, c1, s2 in _EPS_ROWS:
            yield (a, b, c, a1, b1, c1, s1 * s2)


def baryons_ref(P1, P2):
    """contractBaryons: [10(type), 2(accum1/2), 4(gamma), 4(gamma'),
    T, Z, Y, X]."""
    space = P1.shape[4:]
    out = np.zeros((10, 2, 4, 4) + space, complex)

    def two_term(Pd, Pu, al, alp, s_row, s_col, a, b, c, a1, b1, c1,
                 be, bep):
        # Pd[beta,betap,b,b1] * (Pu[al,alp,a,a1] Pu[s_row,s_col,c,c1]
        #                        - Pu[al,s_col,a,c1] Pu[s_row,alp,c,a1])
        return Pd[be, bep, b, b1] * (
            Pu[al, alp, a, a1] * Pu[s_row, s_col, c, c1]
            - Pu[al, s_col, a, c1] * Pu[s_row, alp, c, a1])

    # ---- NTN (ip 0): free gamma, gammap; overall + ----------------
    for g in range(4):
        for gp in range(4):
            for idx in range(16):
                al, be, bep, alp = T.NTN_IDX[idx]
                for a, b, c, a1, b1, c1, sg in _eps_pairs():
                    f = sg * T.NTN_VAL[idx]
                    out[0, 0, g, gp] += f * two_term(
                        P2, P1, al, alp, g, gp, a, b, c, a1, b1, c1,
                        be, bep)
                    out[0, 1, g, gp] += f * two_term(
                        P1, P2, al, alp, g, gp, a, b, c, a1, b1, c1,
                        be, bep)

    # ---- NTR (ip 1): gamma free, gammap/deltap from table; overall -
    for g in range(4):
        for idx in range(64):
            al, be, bep, alp, gp, dp = T.NTR_IDX[idx]
            for a, b, c, a1, b1, c1, sg in _eps_pairs():
                f = sg * T.NTR_VAL[idx]
                out[1, 0, g, gp] -= f * two_term(
                    P2, P1, al, alp, g, dp, a, b, c, a1, b1, c1, be, bep)
                out[1, 1, g, gp] -= f * two_term(
                    P1, P2, al, alp, g, dp, a, b, c, a1, b1, c1, be, bep)

    # ---- RTN (ip 2): gammap free, gamma/delta from table; overall +
    for gp in range(4):
        for idx in range(64):
            al, be, bep, alp, g, dl = T.RTN_IDX[idx]
            for a, b, c, a1, b1, c1, sg in _eps_pairs():
                f = sg * T.RTN_VAL[idx]
                out[2, 0, g, gp] += f * P2[be, bep, b, b1] * (
                    P1[al, alp, a, a1] * P1[dl, gp, c, c1]
                    - P1[al, gp, a, c1] * P1[dl, alp, c, a1])
                out[2, 1, g, gp] += f * P1[be, bep, b, b1] * (
                    P2[al, alp, a, a1] * P2[dl, gp, c, c1]
                    - P2[al, gp, a, c1] * P2[dl, alp, c, a1])

    # ---- RTR (ip 3): all spins from table; overall - --------------
    for idx in range(256):
        al, be, bep, alp, g, dl, gp, dp = T.RTR_IDX[idx]
        for a, b, c, a1, b1, c1, sg in _eps_pairs():
            f = sg * T.RTR_VAL[idx]
            out[3, 0, g, gp] -= f * P2[be, bep, b, b1] * (
                P1[al, alp, a, a1] * P1[dl, dp, c, c1]
                - P1[al, dp, a, c1] * P1[dl, alp, c, a1])
            out[3, 1, g, gp] -= f * P1[be, bep, b, b1] * (
                P2[al, alp, a, a1] * P2[dl, dp, c, c1]
                - P2[al, dp, a, c1] * P2[dl, alp, c, a1])

    # ---- Deltas ip 4-6: single-flavor six-term form ---------------
    for ii in range(3):
        ip = 4 + ii
        for g in range(4):
            for gp in range(4):
                for idx in range(16):
                    al, be, bep, alp = T.DELTA_IDX[ii, idx]
                    for a, b, c, a1, b1, c1, sg in _eps_pairs():
                        f = sg * T.DELTA_VAL[ii, idx]
                        for P, fl in ((P1, 0), (P2, 1)):
                            out[ip, fl, g, gp] += f * (
                                P[al, bep, a, b1] * P[be, gp, b, c1]
                                * P[g, alp, c, a1]
                                - P[al, gp, a, c1] * P[be, bep, b, b1]
                                * P[g, alp, c, a1]
                                + P[al, gp, a, c1] * P[be, alp, b, a1]
                                * P[g, bep, c, b1]
                                - P[al, alp, a, a1] * P[be, gp, b, c1]
                                * P[g, bep, c, b1]
                                - P[al, bep, a, b1] * P[be, alp, b, a1]
                                * P[g, gp, c, c1]
                                + P[al, alp, a, a1] * P[be, bep, b, b1]
                                * P[g, gp, c, c1])

    # ---- Deltas ip 7-9: mixed-flavor eight-term form (x 1/3) ------
    for ii in range(3):
        ip = 7 + ii
        for g in range(4):
            for gp in range(4):
                for idx in range(16):
                    al, be, bep, alp = T.DELTA_IDX[ii, idx]
                    for a, b, c, a1, b1, c1, sg in _eps_pairs():
                        f = sg * T.DELTA_VAL[ii, idx] / 3.0
                        for (Pa, Pb), fl in (((P1, P2), 0),
                                             ((P2, P1), 1)):
                            out[ip, fl, g, gp] += f * (
                                -4 * Pa[al, gp, a, c1] * Pb[be, bep, b, b1]
                                * Pa[g, alp, c, a1]
                                + 2 * Pa[al, bep, a, b1] * Pb[be, gp, b, c1]
                                * Pa[g, alp, c, a1]
                                + 2 * Pa[al, gp, a, c1] * Pa[be, alp, b, a1]
                                * Pb[g, bep, c, b1]
                                - 2 * Pa[al, alp, a, a1] * Pa[be, gp, b, c1]
                                * Pb[g, bep, c, b1]
                                - 2 * Pa[al, alp, a, a1] * Pb[be, gp, b, c1]
                                * Pa[g, bep, c, b1]
                                - Pa[al, bep, a, b1] * Pa[be, alp, b, a1]
                                * Pb[g, gp, c, c1]
                                + Pa[al, alp, a, a1] * Pa[be, bep, b, b1]
                                * Pb[g, gp, c, c1]
                                + 4 * Pa[al, alp, a, a1] * Pb[be, bep, b, b1]
                                * Pa[g, gp, c, c1])
    return out
