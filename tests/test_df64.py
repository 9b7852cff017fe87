"""df64 (two-float) extended-precision tier: arithmetic vs f64,
operator vs the promoted-c128 oracle, and the defect-correction outer
certifying below the c64 floor (the analogue of the reference's
double-precision outer / XSD double-single solver,
reference inv_xsd_quda.cpp, include/dbldbl.h, double_single.h)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu.utils import rng
from quda_qkxtm_multigrid_tpu.utils import df64 as df
from quda_qkxtm_multigrid_tpu.dirac import DiracParams, make_dirac

GEOM = Geometry(4, 4, 4, 8)


def _promote(d):
    """Promote a c64 Dirac's arrays to c128 — the ORACLE operator for
    what df64 should compute (same operands, true f64 arithmetic)."""
    import dataclasses
    return dataclasses.replace(
        d,
        u=d.u.astype(jnp.complex128),
        clover=None if d.clover is None
        else d.clover.astype(jnp.complex128),
        clover_inv=None if d.clover_inv is None
        else d.clover_inv.astype(jnp.complex128))


def test_two_sum_two_prod_exact():
    k = jax.random.PRNGKey(0)
    a = jax.random.normal(k, (1024,), jnp.float32) * 1e3
    b = jax.random.normal(jax.random.fold_in(k, 1), (1024,),
                          jnp.float32) * 1e-3
    s, e = df.two_sum(a, b)
    exact = a.astype(jnp.float64) + b.astype(jnp.float64)
    got = s.astype(jnp.float64) + e.astype(jnp.float64)
    assert jnp.all(got == exact)
    p, pe = df.two_prod(a, b)
    exact = a.astype(jnp.float64) * b.astype(jnp.float64)
    got = p.astype(jnp.float64) + pe.astype(jnp.float64)
    assert jnp.all(got == exact)


def test_df_mul_accuracy():
    k = jax.random.PRNGKey(2)
    a64 = jax.random.normal(k, (512,), jnp.float64)
    b64 = jax.random.normal(jax.random.fold_in(k, 1), (512,),
                            jnp.float64)
    a = df.df_from_f64(a64)
    b = df.df_from_f64(b64)
    got = df.df_to_f64(df.df_mul(a, b))
    rel = jnp.max(jnp.abs(got - a64 * b64) / jnp.abs(a64 * b64))
    assert float(rel) < 1e-13, float(rel)
    got = df.df_to_f64(df.df_add(a, b))
    rel = jnp.max(jnp.abs(got - (a64 + b64)))
    assert float(rel) < 1e-13 * float(jnp.max(jnp.abs(a64 + b64)))


@pytest.mark.parametrize("kind,csw,mu", [
    ("wilson", 0.0, 0.0),
    ("twisted-mass", 0.0, 0.05),
    ("twisted-clover", 1.0, 0.05),
])
def test_m_df_matches_c128_oracle(kind, csw, mu):
    """m_df == the c64-operand operator evaluated in TRUE f64, to df64
    accuracy (~1e-13) — far below c64's own 6e-8."""
    from quda_qkxtm_multigrid_tpu.ops.dslash_df64 import m_df
    u = rng.random_gauge(jax.random.PRNGKey(3), GEOM,
                         dtype=jnp.complex64)
    params = DiracParams(kind=kind, kappa=0.115, mu=mu, csw=csw)
    d = make_dirac(u, params, GEOM)
    d128 = _promote(d)
    x = rng.random_spinor(jax.random.PRNGKey(4), GEOM,
                          dtype=jnp.complex64)
    want = d128.m(x.astype(jnp.complex128))
    got = df.cdf_to_c128(m_df(d, df.cdf_from_c(x)))
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 1e-12, rel
    # dagger too
    want = d128.mdag(x.astype(jnp.complex128))
    got = df.cdf_to_c128(m_df(d, df.cdf_from_c(x), dagger=True))
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 1e-12, rel


def test_df64_refine_certifies_below_c64_floor():
    """Defect correction with the df64 residual reaches a TRUE residual
    (certified against the c128-promoted operator) below 1e-9 from c64
    storage + a 1e-7 inner solver — the reference-depth tier."""
    from quda_qkxtm_multigrid_tpu.solvers.df64_refine import invert_df64
    u = rng.random_gauge(jax.random.PRNGKey(5), GEOM,
                         dtype=jnp.complex64)
    params = DiracParams(kind="twisted-clover", kappa=0.115, mu=0.05,
                         csw=1.0)
    d = make_dirac(u, params, GEOM)
    b = rng.random_spinor(jax.random.PRNGKey(6), GEOM,
                          dtype=jnp.complex64)
    out = invert_df64(d, b, tol=1e-10, inner_tol=1e-7, maxiter=4000)
    assert out.true_res < 1e-10, out.true_res
    assert out.restarts >= 2
    # independent certification in true f64
    d128 = _promote(d)
    x128 = df.cdf_to_c128(out.x_df)
    r = b.astype(jnp.complex128) - d128.m(x128)
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
    assert rel < 1e-9, rel
    # and the df64-certified value agrees with the f64 truth
    assert abs(rel - out.true_res) / rel < 0.1, (rel, out.true_res)
