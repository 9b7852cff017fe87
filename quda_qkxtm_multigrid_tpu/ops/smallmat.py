"""Unrolled small-matrix primitives over lane-major fields.

On TPU, einsum over LEADING axes lowers to dot_general: XLA transposes
operands so the contraction dims are minor, materialising copies whose
trailing dims are the small matrix axes — a 28-114x tile-padding tax
inside solver loops.  These helpers unroll the 3x3/4x4/6x6 contractions
into elementwise multiply-adds on [T,Z,W] slices instead: pure VPU code
that XLA fuses with zero layout churn — the same register-blocked
complex arithmetic the reference's generated CUDA cores use
(reference lib/dslash_core/, lib/generate/dslash_cuda_gen.py), produced
here by Python unrolling at trace time rather than code generation.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def su3_mul(u, psi):
    """out[..., s, a, t, z, w] = sum_b u[a,b] psi[..., s, b]; color axis
    at -4 so arbitrary leading batch/spin axes are supported."""
    cols = []
    for a in range(3):
        acc = u[a, 0] * psi[..., 0, :, :, :]
        acc = acc + u[a, 1] * psi[..., 1, :, :, :]
        acc = acc + u[a, 2] * psi[..., 2, :, :, :]
        cols.append(acc)
    return jnp.stack(cols, axis=-4)


def su3_dag_mul(u, psi):
    """out[..., s, a] = sum_b conj(u[b,a]) psi[..., s, b]."""
    cols = []
    for a in range(3):
        acc = jnp.conj(u[0, a]) * psi[..., 0, :, :, :]
        acc = acc + jnp.conj(u[1, a]) * psi[..., 1, :, :, :]
        acc = acc + jnp.conj(u[2, a]) * psi[..., 2, :, :, :]
        cols.append(acc)
    return jnp.stack(cols, axis=-4)


def mat_mul(a, b):
    """3x3 (leading axes) matrix product: [3,3,...] x [3,3,...]."""
    rows = []
    for i in range(3):
        row = []
        for j in range(3):
            acc = a[i, 0] * b[0, j] + a[i, 1] * b[1, j] + a[i, 2] * b[2, j]
            row.append(acc)
        rows.append(jnp.stack(row, axis=0))
    return jnp.stack(rows, axis=0)


def mat_dag(m):
    """Conjugate transpose over leading (row,col) axes."""
    return jnp.conj(jnp.swapaxes(m, 0, 1))


def spinmat_mul(p, psi):
    """out[s] = sum_t p[s,t] psi[t] for a CONSTANT 4x4 numpy matrix p and
    psi [4,C,T,Z,W].  Unrolls over nonzero entries only (Wilson
    projectors have 2 per row), with trace-time complex scalars."""
    p = np.asarray(p)
    out = []
    for s in range(4):
        acc = None
        for t in range(4):
            c = complex(p[s, t])
            if c == 0.0:
                continue
            term = psi[t] if c == 1.0 else c * psi[t]
            acc = term if acc is None else acc + term
        if acc is None:
            acc = jnp.zeros_like(psi[0])
        out.append(acc)
    return jnp.stack(out, axis=0)


def chiral_mat_mul(m, chi, dagger: bool = False):
    """out[c,i] = sum_j m[c,i,j] chi[c,j]; m [2,6,6,T,Z,W], chi [2,6,T,Z,W].

    The clover apply (reference tests/clover_reference.cpp:20-63)."""
    outs = []
    for i in range(6):
        acc = None
        for j in range(6):
            mm = jnp.conj(m[:, j, i]) if dagger else m[:, i, j]
            term = mm * chi[:, j]
            acc = term if acc is None else acc + term
        outs.append(acc)
    return jnp.stack(outs, axis=1)


def mat3_inv(m):
    """Closed-form (adjugate/determinant) inverse of 3x3 matrices with
    LEADING (row,col) axes — `jnp.linalg.inv`'s batched LU lowers with
    28x-padded temporaries on TPU."""
    a, b, c = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    g, h, i = m[2, 0], m[2, 1], m[2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / det
    row0 = [A, -(b * i - c * h), (b * f - c * e)]
    row1 = [B, (a * i - c * g), -(a * f - c * d)]
    row2 = [C, -(a * h - b * g), (a * e - b * d)]
    rows = [jnp.stack([x * inv_det for x in r], axis=0)
            for r in (row0, row1, row2)]
    return jnp.stack(rows, axis=0)


def mat6_inv_blocks(m):
    """Inverse of a 6x6 matrix (leading axes [6,6,...]) via 3x3 block
    Schur complement: m = [[P, Qt],[Q, R]],
    S = R - Q P^-1 Qt,
    inv = [[P^-1 + P^-1 Qt S^-1 Q P^-1,  -P^-1 Qt S^-1],
           [-S^-1 Q P^-1,                 S^-1]]."""
    P, Qt = m[0:3, 0:3], m[0:3, 3:6]
    Q, R = m[3:6, 0:3], m[3:6, 3:6]
    Pi = mat3_inv(P)
    S = R - mat_mul(Q, mat_mul(Pi, Qt))
    Si = mat3_inv(S)
    PiQt = mat_mul(Pi, Qt)
    QPi = mat_mul(Q, Pi)
    tl = Pi + mat_mul(PiQt, mat_mul(Si, QPi))
    tr = -mat_mul(PiQt, Si)
    bl = -mat_mul(Si, QPi)
    br = Si
    top = jnp.concatenate([tl, tr], axis=1)
    bot = jnp.concatenate([bl, br], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def su3_conj_mul(u, psi):
    """out[..., s, a] = sum_b conj(u[a,b]) psi[..., s, b]  (U* v)."""
    cols = []
    for a in range(3):
        acc = jnp.conj(u[a, 0]) * psi[..., 0, :, :, :]
        acc = acc + jnp.conj(u[a, 1]) * psi[..., 1, :, :, :]
        acc = acc + jnp.conj(u[a, 2]) * psi[..., 2, :, :, :]
        cols.append(acc)
    return jnp.stack(cols, axis=-4)


def su3_transp_mul(u, psi):
    """out[..., s, a] = sum_b u[b,a] psi[..., s, b]  (U^T v)."""
    cols = []
    for a in range(3):
        acc = u[0, a] * psi[..., 0, :, :, :]
        acc = acc + u[1, a] * psi[..., 1, :, :, :]
        acc = acc + u[2, a] * psi[..., 2, :, :, :]
        cols.append(acc)
    return jnp.stack(cols, axis=-4)
