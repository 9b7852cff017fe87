"""Incremental eigCG tests (reference inv_eigcg_quda.cpp /
incrementalEigQuda, quda.h:682): the accumulated deflation space must
cut CG iterations across an RHS sequence."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu.dirac import DiracParams, make_dirac
from quda_qkxtm_multigrid_tpu.solvers.inc_eigcg import IncEigCG
from quda_qkxtm_multigrid_tpu.utils import rng

pytestmark = pytest.mark.slow  # full-pipeline tier; smoke: -m 'not slow'

GEOM = Geometry(4, 4, 4, 8)


def _relres(matvec, x, b):
    r = b - matvec(x)
    return float(jnp.sqrt(jnp.real(jnp.vdot(r, r))
                          / jnp.real(jnp.vdot(b, b))))


class TestIncEigCG:
    def test_sequence_accelerates(self):
        """On an ill-conditioned SPD operator (cond 1e3 — a tiny random
        gauge is too benign to show deflation) the accumulated space
        must cut CG iterations across the RHS sequence."""
        n = 512
        # a few ISOLATED low modes (x2 separation — resolvable by the
        # setup Lanczos) over a benign bulk: the structure deflation
        # actually exploits
        lows = 1e-3 * (2.0 ** np.arange(8))
        bulk = np.linspace(0.5, 1.0, n - 8)
        w = jnp.asarray(np.concatenate([lows, bulk]))

        def matvec(v):
            return (w * v).astype(v.dtype)

        inc = IncEigCG(matvec, nev_per_solve=8, max_nev=24,
                       lanczos_tol=1e-4)
        iters = []
        key = jax.random.PRNGKey(3)
        for i in range(4):
            key, sub = jax.random.split(key)
            b = jax.random.normal(sub, (n,), jnp.float64).astype(
                jnp.complex128)
            res = inc.solve(b, tol=1e-8, maxiter=3000)
            assert _relres(matvec, res.x, b) < 1e-7
            iters.append(int(res.iters))
        # the 8 isolated low modes are harvested (bulk-cluster pairs are
        # residual-filtered out rather than poisoning the space)
        assert inc.n_deflated >= 8
        assert iters[-1] < 0.5 * iters[0], iters

    def test_dirac_sequence_converges(self):
        """The packaged flow on the real operator: every solve in the
        sequence converges and the space saturates at max_nev."""
        u = rng.random_gauge(jax.random.PRNGKey(0), GEOM)
        d = make_dirac(u, DiracParams(kind="twisted-mass", kappa=0.122,
                                      mu=0.03), GEOM)
        inc = IncEigCG(d.matpc_dagm, nev_per_solve=6, max_nev=12,
                       lanczos_tol=1e-2)
        for i in range(3):
            b = rng.random_spinor(jax.random.PRNGKey(10 + i), GEOM)[0]
            rhs = d.matpc(b, dagger=True)
            res = inc.solve(rhs, tol=1e-8, maxiter=500)
            assert _relres(d.matpc_dagm, res.x, rhs) < 1e-7
        assert inc.n_deflated == 12

    def test_space_is_orthonormal_eigenbasis(self):
        u = rng.random_gauge(jax.random.PRNGKey(1), GEOM)
        d = make_dirac(u, DiracParams(kind="wilson", kappa=0.115), GEOM)
        inc = IncEigCG(d.matpc_dagm, nev_per_solve=5, max_nev=10,
                       lanczos_tol=1e-3)
        for i in range(2):
            b = rng.random_spinor(jax.random.PRNGKey(20 + i), GEOM)[0]
            inc.solve(d.matpc(b, dagger=True), tol=1e-8, maxiter=500)
        v = np.asarray(inc.evecs.reshape(inc.n_deflated, -1))
        gram = v.conj() @ v.T
        np.testing.assert_allclose(gram, np.eye(inc.n_deflated),
                                   atol=1e-8)
        # Ritz pairs approximately satisfy A v = λ v
        av = np.stack([np.asarray(d.matpc_dagm(inc.evecs[i]))
                       for i in range(3)])
        lam = np.asarray(inc.evals)[:3]
        for i in range(3):
            vi = np.asarray(inc.evecs[i])
            r = np.linalg.norm(av[i] - lam[i] * vi)
            assert r < 5e-2 * max(1.0, abs(lam[i]))
