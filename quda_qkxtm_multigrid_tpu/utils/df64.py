"""Double-float (df64) arithmetic on f32 pairs — the TPU-native
extended-precision tier.

The reference reaches 1e-9/1e-10 production tolerances by running the
solver OUTER in double (reference include/dbldbl.h — double-double on
CUDA doubles — and double_single.h + the XSD solver inv_xsd_quda.cpp —
double-single storage).  TPU v5e has no native f64: the same ladder
step up from the working precision is float32 + float32 = df64
(~49-bit mantissa, unit roundoff ~2^-48 ≈ 3.6e-15), built from
error-free transformations:

  two_sum   — Knuth 1969 (6 flops, branch-free)
  two_prod  — Dekker 1971 split-based product (no FMA primitive in
              StableHLO; the 4097-split is exact for f32)

Numbers are (hi, lo) f32 pairs with hi = fl(hi+lo); complex df64
values are ((re_hi, re_lo), (im_hi, im_lo)) pytrees so every structural
op (roll/stack/reshape) maps componentwise.

XLA preserves IEEE f32 semantics for these expression trees
(re-association is only done under fast-math flags the repo never
sets), so the transformations stay error-free under jit.  The one
backend caveat: --xla_allow_excess_precision=true (set by the axon
terminal) may fuse a*b+c into an FMA, which only makes two_prod's
error term MORE accurate, never less.

Used by: solvers/df64_refine.py (defect-correction outer reaching below
the c64 ~3e-8 true-residual floor) and ops/dslash_df64.py (the operator
applied in df64).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SPLIT = 4097.0          # 2**12 + 1 — Dekker split constant for f32


# ---------------------------------------------------------------- core
def two_sum(a, b):
    """s + e == a + b exactly, s = fl(a+b) (Knuth TwoSum)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """TwoSum requiring |a| >= |b| (3 flops, Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    c = jnp.float32(_SPLIT) * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """p + e == a * b exactly, p = fl(a*b) (Dekker product)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# ------------------------------------------------------- df64 = (hi, lo)
def df(hi, lo=None):
    hi = jnp.asarray(hi, jnp.float32)
    return (hi, jnp.zeros_like(hi) if lo is None else lo)


def df_add(x, y):
    s, e = two_sum(x[0], y[0])
    e = e + (x[1] + y[1])
    return fast_two_sum(s, e)


def df_neg(x):
    return (-x[0], -x[1])


def df_sub(x, y):
    return df_add(x, df_neg(y))


def df_mul(x, y):
    p, e = two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return fast_two_sum(p, e)


def df_mul_f32(x, a):
    """x * a with a an EXACT f32 (gauge/clover entries, scalars)."""
    p, e = two_prod(x[0], a)
    e = e + x[1] * a
    return fast_two_sum(p, e)


def df_to_f32(x):
    return x[0] + x[1]


def df_to_f64(x):
    """Exact promotion for CPU-side validation (needs x64 enabled)."""
    return x[0].astype(jnp.float64) + x[1].astype(jnp.float64)


def df_from_f64(v):
    """Split a f64 value into a df64 pair (CPU-side validation)."""
    hi = v.astype(jnp.float32)
    lo = (v - hi.astype(jnp.float64)).astype(jnp.float32)
    return (hi, lo)


# --------------------------------------------- complex df64 = (re, im)
def cdf_from_c(z):
    """complex64 array → cdf with exact hi parts."""
    return (df(jnp.real(z)), df(jnp.imag(z)))


def cdf_to_c(z):
    return jax.lax.complex(df_to_f32(z[0]), df_to_f32(z[1]))


def cdf_to_c128(z):
    """Exact promotion to complex128 (CPU validation tier; requires
    x64).  hi+lo added in f64 so no df64 bits are lost."""
    re = z[0][0].astype(jnp.float64) + z[0][1].astype(jnp.float64)
    im = z[1][0].astype(jnp.float64) + z[1][1].astype(jnp.float64)
    return jax.lax.complex(re, im)


def cdf_zeros_like(z):
    zz = jnp.zeros_like(z[0][0])
    return ((zz, zz), (zz, zz))


def cdf_add(x, y):
    return (df_add(x[0], y[0]), df_add(x[1], y[1]))


def cdf_sub(x, y):
    return (df_sub(x[0], y[0]), df_sub(x[1], y[1]))


def cdf_neg(x):
    return (df_neg(x[0]), df_neg(x[1]))


def cdf_conj(x):
    return (x[0], df_neg(x[1]))


def cdf_mul_i(x):
    """i * x (exact)."""
    return (df_neg(x[1]), x[0])


def cdf_scale_f32(x, a):
    """x * a, a exact f32 real."""
    return (df_mul_f32(x[0], a), df_mul_f32(x[1], a))


def cdf_mul_c64(x, c):
    """x * c with c an EXACT complex64 array (gauge links, clover
    entries, trace-time scalars): 4 df_mul_f32 + 2 df_add."""
    cr, ci = jnp.real(c).astype(jnp.float32), jnp.imag(c).astype(jnp.float32)
    re = df_sub(df_mul_f32(x[0], cr), df_mul_f32(x[1], ci))
    im = df_add(df_mul_f32(x[0], ci), df_mul_f32(x[1], cr))
    return (re, im)


def cdf_mul_c64_conj(x, c):
    """x * conj(c), c exact complex64."""
    cr, ci = jnp.real(c).astype(jnp.float32), jnp.imag(c).astype(jnp.float32)
    re = df_add(df_mul_f32(x[0], cr), df_mul_f32(x[1], ci))
    im = df_sub(df_mul_f32(x[1], cr), df_mul_f32(x[0], ci))
    return (re, im)


def cdf_mul(x, y):
    """full cdf * cdf."""
    re = df_sub(df_mul(x[0], y[0]), df_mul(x[1], y[1]))
    im = df_add(df_mul(x[0], y[1]), df_mul(x[1], y[0]))
    return (re, im)


# -------------------------------------------------------------- norms
def cdf_norm2(x):
    """|x|^2 of a cdf field, f64-compressed per element then f32
    pairwise-reduced.  Sufficient for residual CERTIFICATION: norm² is
    a positive sum, so XLA's pairwise f32 tree reduction carries only
    ~log2(n)·eps ≈ 1e-6 RELATIVE error — the certified residual is
    |r|·(1 ± 5e-7) regardless of how small |r| is.  (The place f32
    genuinely loses digits — the residual FIELD and the solution
    accumulation — is handled by the df64 operator and df64 axpy, not
    here.)"""
    re = df_to_f32(x[0])
    im = df_to_f32(x[1])
    return jnp.sum(re * re) + jnp.sum(im * im)
