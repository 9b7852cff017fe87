"""Auxiliary solver tail: PCG / SimpleBiCGstab / XSD / s-step CG /
BiCGstab(L) + solver-support machinery (heavy-quark residual, mass
rescale, reliable-update counters) — reference lib/inv_pcg_quda.cpp,
inv_sbicgstab_quda.cpp, inv_mpcg_quda.cpp, inv_mpbicgstab_quda.cpp,
inv_sd/xsd, quda.h:252-260, interface_quda.cpp:1412-1494."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu.dirac import DiracParams, make_dirac
from quda_qkxtm_multigrid_tpu.utils import rng
from quda_qkxtm_multigrid_tpu.solvers.cg import cg, cg_mixed
from quda_qkxtm_multigrid_tpu.solvers.pcg import pcg, simple_bicgstab, xsd
from quda_qkxtm_multigrid_tpu.solvers.ca import mpcg, bicgstab_l
from quda_qkxtm_multigrid_tpu.solvers.mr import mr

GEOM = Geometry(4, 4, 4, 8)


@pytest.fixture(scope="module")
def op():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    u = rng.random_gauge(k1, GEOM, dtype=jnp.complex128)
    d = make_dirac(u, DiracParams(kind="twisted-mass", kappa=0.115,
                                  mu=0.05), GEOM)
    b = rng.random_spinor(k2, GEOM, dtype=jnp.complex128)[0]
    x_ref = cg(d.matpc_dagm, b, tol=1e-12, maxiter=2000).x
    return d, b, x_ref


def _relerr(x, y):
    return float(jnp.linalg.norm((x - y).ravel())
                 / jnp.linalg.norm(y.ravel()))


def test_pcg_matches_cg(op):
    d, b, x_ref = op
    precond = lambda r: mr(d.matpc_dagm, r, niter=4, omega=0.9)
    out = pcg(d.matpc_dagm, b, precond=precond, tol=1e-10, maxiter=500)
    assert _relerr(out.x, x_ref) < 1e-8
    plain = cg(d.matpc_dagm, b, tol=1e-10, maxiter=2000)
    assert int(out.iters) < int(plain.iters)   # preconditioning helps


def test_simple_bicgstab_nonhermitian(op):
    d, b, _ = op
    out = simple_bicgstab(d.matpc, b, tol=1e-10, maxiter=800)
    r = b - d.matpc(out.x)
    assert float(jnp.linalg.norm(r.ravel())
                 / jnp.linalg.norm(b.ravel())) < 1e-9


def test_xsd_converges(op):
    d, b, _ = op
    out = xsd(d.matpc_dagm, b, tol=1e-4, maxiter=2000)
    r = b - d.matpc_dagm(out.x)
    assert float(jnp.linalg.norm(r.ravel())
                 / jnp.linalg.norm(b.ravel())) < 1e-4


def test_mpcg_matches_cg(op):
    d, b, x_ref = op
    out = mpcg(d.matpc_dagm, b, s=4, tol=1e-10, max_blocks=500)
    assert _relerr(out.x, x_ref) < 1e-8


def test_bicgstab_l(op):
    d, b, _ = op
    out = bicgstab_l(d.matpc, b, L=2, tol=1e-10, maxiter=800)
    r = b - d.matpc(out.x)
    assert float(jnp.linalg.norm(r.ravel())
                 / jnp.linalg.norm(b.ravel())) < 1e-9


def test_heavy_quark_stopping(op):
    from quda_qkxtm_multigrid_tpu.solvers.support import (
        heavy_quark_residual_sq)
    d, b, _ = op
    out = cg(d.matpc_dagm, b, tol=1e-6, maxiter=2000, tol_hq=1e-6)
    r = b - d.matpc_dagm(out.x)
    hq = float(jnp.sqrt(heavy_quark_residual_sq(out.x, r)))
    assert hq < 1e-6
    # hq-gated solve must run at least as long as the L2-only solve
    l2_only = cg(d.matpc_dagm, b, tol=1e-6, maxiter=2000)
    assert int(out.iters) >= int(l2_only.iters)


def test_mass_rescale_table():
    from quda_qkxtm_multigrid_tpu.solvers.support import (
        MassNormalization as MN, mass_rescale_factor, mass_rescale)
    k = 0.12
    assert mass_rescale_factor("mat", MN.KAPPA, k) == 1.0
    assert mass_rescale_factor("mat", MN.MASS, k) == 2 * k
    assert mass_rescale_factor("matdag-mat", MN.MASS, k) == 4 * k * k
    assert mass_rescale_factor("matpc", MN.MASS, k) == 4 * k * k
    assert mass_rescale_factor("matpc", MN.ASYMMETRIC_MASS, k) == 2 * k
    assert mass_rescale_factor("matpcdag-matpc", MN.MASS, k) == 16 * k ** 4
    # domain-wall kappa5 (interface_quda.cpp:1414)
    m5 = -1.8
    assert mass_rescale_factor("mat", MN.MASS, k, m5=m5,
                               domain_wall=True) == 2 * (0.5 / (5 + m5))
    b = jnp.ones((3,), jnp.complex128)
    bs, sh = mass_rescale(b, shifts=(0.1, 0.2), solution_type="matpc",
                          normalization=MN.MASS, kappa=k)
    np.testing.assert_allclose(np.asarray(bs), 4 * k * k * np.ones(3))
    np.testing.assert_allclose(sh, (0.1 * 4 * k * k, 0.2 * 4 * k * k))


def test_cg_mixed_stats(op):
    d, b, x_ref = op
    d_lo = jax.tree.map(
        lambda a: a.astype(jnp.complex64)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype,
                                                  jnp.complexfloating)
        else a, d)
    out = cg_mixed(d.matpc_dagm, d_lo.matpc_dagm, b, tol=1e-10,
                   lo_dtype=jnp.complex64)
    assert not bool(out.stats.diverged)
    assert int(out.stats.restarts) >= 1
    assert _relerr(out.x, x_ref) < 1e-8
