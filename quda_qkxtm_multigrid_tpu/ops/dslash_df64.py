"""Wilson-type operators applied in df64 (two-float) arithmetic — the
extended-precision operator tier.

The reference certifies production solves with the operator applied in
double (its outer solvers run QUDA_DOUBLE_PRECISION; the double-single
XSD solver inv_xsd_quda.cpp and dbldbl.h/double_single.h provide the
emulated ladder on pre-f64 parts).  TPU has no f64 ALU, so the residual
r = b − M x is evaluated here with every complex product and
accumulation in df64 (utils/df64.py): gauge/clover/twist operands are
EXACT f32 inputs (they define the operator), fields carry (hi, lo)
pairs, and the result is accurate to ~2^-48 — far below the c64 ~3e-8
matvec-noise floor that otherwise bounds every certified residual on
this hardware.

Semantics mirror ops/dslash.py exactly (reference CPU oracle
tests/wilson_dslash_reference.cpp:105-131, twist :234-263, clover
tests/clover_reference.cpp:20-63); tests validate against the c128
operator on CPU.

A cdf spinor field is ((re_hi, re_lo), (im_hi, im_lo)) with each plane
in the canonical layout ([2,4,3,T,Z,W] full / [4,3,T,Z,W] per parity).
Cost: ~12 f32 flops per c64 flop — used once per defect-correction
restart (solvers/df64_refine.py), not in inner loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from quda_qkxtm_multigrid_tpu.lattice import Geometry, gather_neighbor
from quda_qkxtm_multigrid_tpu.ops import gamma as _g
from quda_qkxtm_multigrid_tpu.utils.df64 import (
    cdf_add, cdf_from_c, cdf_mul_c64, cdf_mul_c64_conj, cdf_mul_i,
    cdf_neg, cdf_norm2, cdf_sub, cdf_to_c, df_add,
    df_mul_f32, df_sub as df_sub_)


def cmap(f, *xs):
    """Apply an array op to all four (re/im × hi/lo) planes."""
    return jax.tree.map(f, *xs)


def _split_scalar(v: float):
    """python float → exact (hi, lo) f32 split of its f64 value.  The
    operator's REAL coefficients (κ, 2κμ) are f64 numbers; rounding
    them to a single f32 redefines the operator at the 1e-8 level —
    exactly the error df64 exists to remove."""
    hi = np.float32(v)
    lo = np.float32(np.float64(v) - np.float64(hi))
    return (hi, lo)


def cdf_scale_df(x, s):
    """x * s with s an (hi, lo) df64 real scalar pair."""
    from quda_qkxtm_multigrid_tpu.utils.df64 import df_mul
    return (df_mul(x[0], s), df_mul(x[1], s))


def _spin(psi, t):
    return cmap(lambda a: a[t], psi)


def _color(psi, b):
    return cmap(lambda a: a[..., b, :, :, :], psi)


def _stack(parts, axis):
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=axis), *parts)


# ----------------------------------------------------------- small mats
def _cdf_const_mul(c: complex, x):
    """x * python-complex constant, exact for the projector entries."""
    if c == 1.0:
        return x
    if c == -1.0:
        return cdf_neg(x)
    if c == 1j:
        return cdf_mul_i(x)
    if c == -1j:
        return cdf_neg(cdf_mul_i(x))
    # general path (unused by Wilson projectors, kept for completeness)
    cr, ci = np.float32(c.real), np.float32(c.imag)
    t1 = df_mul_f32(x[0], cr)
    t2 = df_mul_f32(x[1], ci)
    t3 = df_mul_f32(x[0], ci)
    t4 = df_mul_f32(x[1], cr)
    return (df_sub_(t1, t2), df_add(t3, t4))


def spinmat_mul_df(p, psi):
    """Constant 4x4 matrix over the leading spin axis (cdf psi)."""
    p = np.asarray(p)
    out = []
    for s in range(4):
        acc = None
        for t in range(4):
            c = complex(p[s, t])
            if c == 0.0:
                continue
            term = _cdf_const_mul(c, _spin(psi, t))
            acc = term if acc is None else cdf_add(acc, term)
        if acc is None:
            z = cmap(jnp.zeros_like, _spin(psi, 0))
            acc = z
        out.append(acc)
    return _stack(out, axis=0)


def _proj_df(mu: int, plus: bool, psi):
    return spinmat_mul_df(_g.PROJ[mu, 1 if plus else 0], psi)


def su3_mul_df(u, psi):
    """u [3,3,T,Z,W] exact c64; psi cdf [..,4,3,T,Z,W] planes."""
    cols = []
    for a in range(3):
        acc = cdf_mul_c64(_color(psi, 0), u[a, 0])
        acc = cdf_add(acc, cdf_mul_c64(_color(psi, 1), u[a, 1]))
        acc = cdf_add(acc, cdf_mul_c64(_color(psi, 2), u[a, 2]))
        cols.append(acc)
    return _stack(cols, axis=-4)


def su3_dag_mul_df(u, psi):
    cols = []
    for a in range(3):
        acc = cdf_mul_c64_conj(_color(psi, 0), u[0, a])
        acc = cdf_add(acc, cdf_mul_c64_conj(_color(psi, 1), u[1, a]))
        acc = cdf_add(acc, cdf_mul_c64_conj(_color(psi, 2), u[2, a]))
        cols.append(acc)
    return _stack(cols, axis=-4)


# --------------------------------------------------------------- dslash
def dslash_parity_df(u, psi_opp, parity: int, geom: Geometry,
                     dagger: bool = False):
    """Hopping term in df64 (mirror of ops/dslash.dslash_parity)."""
    out = None
    for mu in range(4):
        fwd_psi = cmap(lambda a: gather_neighbor(a, mu, True, parity,
                                                 geom), psi_opp)
        bwd_psi = cmap(lambda a: gather_neighbor(a, mu, False, parity,
                                                 geom), psi_opp)
        u_fwd = u[mu, parity]
        u_bwd = gather_neighbor(u[mu, 1 - parity], mu, False, parity, geom)
        term = su3_mul_df(u_fwd, _proj_df(mu, dagger, fwd_psi))
        term = cdf_add(term, su3_dag_mul_df(u_bwd,
                                            _proj_df(mu, not dagger,
                                                     bwd_psi)))
        out = term if out is None else cdf_add(out, term)
    return out


# ------------------------------------------------------------- diagonal
def twist_apply_df(psi, kappa: float, mu: float, flavor: int = +1,
                   dagger: bool = False):
    """(1 + i a γ5) psi in df64, a = 2κμ·flavor (ops/twist.py
    conventions; γ5 = diag(+,+,−,−))."""
    a = 2.0 * kappa * mu * flavor
    if dagger:
        a = -a
    a_df, na_df = _split_scalar(a), _split_scalar(-a)
    out = []
    for s in range(4):
        ps = _spin(psi, s)
        sgn = a_df if s < 2 else na_df
        out.append(cdf_add(ps, cdf_mul_i(cdf_scale_df(ps, sgn))))
    return _stack(out, axis=0)


def clover_apply_df(clover_p, psi, dagger: bool = False):
    """clover_p [2(ch),6,6,T,Z,W] exact c64 applied to cdf psi
    [4,3,T,Z,W] (mirror of ops/clover.clover_apply)."""
    shp = psi[0][0].shape
    chi = cmap(lambda a: a.reshape((2, 6) + shp[2:]), psi)
    outs = []
    for i in range(6):
        acc = None
        for j in range(6):
            mm = jnp.conj(clover_p[:, j, i]) if dagger \
                else clover_p[:, i, j]
            cj = cmap(lambda a: a[:, j], chi)
            term = cdf_mul_c64(cj, mm)
            acc = term if acc is None else cdf_add(acc, term)
        outs.append(acc)
    out = _stack(outs, axis=1)
    return cmap(lambda a: a.reshape(shp), out)


def a_apply_df(dirac, psi_p, parity: int, dagger: bool = False):
    """Parity-diagonal A in df64 (mirror of Dirac.a_apply)."""
    p = dirac.params
    out = psi_p
    if p.has_clover:
        out = clover_apply_df(dirac.clover[parity], out, dagger=dagger)
    if p.has_twist:
        if p.has_clover:
            tw = twist_apply_df(psi_p, p.kappa, p.mu, p.flavor, dagger)
            out = cdf_add(out, cdf_sub(tw, psi_p))
        else:
            out = twist_apply_df(out, p.kappa, p.mu, p.flavor, dagger)
    return out


# --------------------------------------------------------- full operator
def m_df(dirac, psi, dagger: bool = False):
    """Full operator in df64 on a cdf full field: the analogue of
    Dirac.m with every product/accumulation error-free-transformed."""
    k = _split_scalar(dirac.params.kappa)
    pe = cmap(lambda a: a[0], psi)
    po = cmap(lambda a: a[1], psi)
    de = dslash_parity_df(dirac.u, po, 0, dirac.geom, dagger)
    do = dslash_parity_df(dirac.u, pe, 1, dirac.geom, dagger)
    out_e = cdf_sub(a_apply_df(dirac, pe, 0, dagger),
                    cdf_scale_df(de, k))
    out_o = cdf_sub(a_apply_df(dirac, po, 1, dagger),
                    cdf_scale_df(do, k))
    return _stack([out_e, out_o], axis=0)


def residual_df(dirac, x_df, b):
    """r = b − M x in df64: returns (r_cdf, |r|², |b|²).  b is exact
    c64 (the right-hand side as stored); x_df a cdf full field."""
    bc = cdf_from_c(b)
    r = cdf_sub(bc, m_df(dirac, x_df))
    return r, cdf_norm2(r), cdf_norm2(bc)


def cdf_compress(x_df, dtype=jnp.complex64):
    """cdf field → complex array (hi+lo rounded)."""
    return cdf_to_c(x_df).astype(dtype)


def cdf_expand(x, like=None):
    """complex array → cdf with zero lo parts."""
    return cdf_from_c(x)
