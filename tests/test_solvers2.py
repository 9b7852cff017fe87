"""Tests for the second-wave solvers: GMRES-DR, MinResExt chronological
guess, pipelined CG (reference lib/inv_gmresdr_quda.cpp, lib/inv_mre.cpp,
and the quda.h:130 pipeline knob)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu.dirac import DiracParams, make_dirac
from quda_qkxtm_multigrid_tpu.solvers.gmresdr import gmresdr
from quda_qkxtm_multigrid_tpu.solvers.mre import (min_res_ext,
                                                  ChronoHistory)
from quda_qkxtm_multigrid_tpu.solvers.pipelined import (
    pipelined_cg, pipelined_cg_reliable)
from quda_qkxtm_multigrid_tpu.solvers.cg import cg
from quda_qkxtm_multigrid_tpu.utils import rng

GEOM = Geometry(4, 4, 4, 8)


def _dirac(seed=0, **kw):
    u = rng.random_gauge(jax.random.PRNGKey(seed), GEOM)
    return make_dirac(u, DiracParams(**kw), GEOM)


def _relres(matvec, x, b):
    r = b - matvec(x)
    return float(jnp.sqrt(jnp.real(jnp.vdot(r, r))
                          / jnp.real(jnp.vdot(b, b))))


class TestGMResDR:
    def test_solves_matpc(self):
        d = _dirac(1, kind="twisted-mass", kappa=0.115, mu=0.05)
        b = rng.random_spinor(jax.random.PRNGKey(2), GEOM)[0]
        res = gmresdr(d.matpc, b, tol=1e-9, n_krylov=16, n_defl=6,
                      max_restarts=60)
        assert _relres(d.matpc, res.x, b) < 1e-8

    def test_deflation_beats_plain_restart(self):
        """With a short cycle the deflated restart must converge in
        fewer total iterations than undeflated GMRES(m) — the point of
        the DR subspace (reference inv_gmresdr_quda.cpp)."""
        d = _dirac(3, kind="wilson", kappa=0.124)   # near-critical: hard
        b = rng.random_spinor(jax.random.PRNGKey(4), GEOM)[0]
        res_dr = gmresdr(d.matpc, b, tol=1e-8, n_krylov=10, n_defl=4,
                         max_restarts=100)
        # plain restarted GMRES = GMRES-DR degenerate path measured by
        # restarting from scratch: emulate with n_defl→tiny subspace by
        # comparing against our GCR(10) restarts
        from quda_qkxtm_multigrid_tpu.solvers.gcr import gcr
        res_plain = gcr(d.matpc, b, tol=1e-8, n_krylov=10,
                        max_restarts=100)
        assert _relres(d.matpc, res_dr.x, b) < 1e-7
        assert int(res_dr.iters) <= int(res_plain.iters)

    @pytest.mark.slow
    def test_full_operator(self):
        d = _dirac(5, kind="twisted-clover", kappa=0.115, mu=0.05,
                   csw=1.0)
        b = rng.random_spinor(jax.random.PRNGKey(6), GEOM)
        res = gmresdr(d.m, b, tol=1e-9, n_krylov=20, n_defl=8,
                      max_restarts=50)
        assert _relres(d.m, res.x, b) < 1e-8


class TestMinResExt:
    def test_exact_in_span(self):
        """If b = A x for x in the history span, the guess is exact."""
        d = _dirac(7, kind="wilson", kappa=0.11)
        ks = jax.random.split(jax.random.PRNGKey(8), 3)
        hist = jnp.stack([rng.random_spinor(k, GEOM)[0] for k in ks])
        coeff = jnp.asarray([0.3 + 0.1j, -0.5, 1.2j], hist.dtype)
        x_true = jnp.einsum("j,j...->...", coeff, hist)
        b = d.matpc(x_true)
        x0 = min_res_ext(d.matpc, b, hist)
        assert _relres(d.matpc, x0, b) < 1e-5

    @pytest.mark.slow
    def test_chrono_accelerates_cg(self):
        """Chronological guess from 3 nearby solves cuts CG iterations
        for the 4th (the resident-chrono use, quda.h chrono params)."""
        d = _dirac(9, kind="twisted-mass", kappa=0.115, mu=0.05)
        chrono = ChronoHistory(depth=4)
        mv = d.matpc_dagm
        base_iters = None
        for i in range(4):
            b = rng.random_spinor(jax.random.PRNGKey(20 + 0), GEOM)[0]
            # slightly different RHSs
            b = b + 0.05 * rng.random_spinor(
                jax.random.PRNGKey(30 + i), GEOM)[0]
            rhs = d.matpc(b, dagger=True)
            x0 = chrono.guess(mv, rhs)
            res = cg(mv, rhs, x0=x0, tol=1e-8, maxiter=500)
            if i == 0:
                base_iters = int(res.iters)
            chrono.push(res.x)
        assert int(res.iters) < base_iters

    def test_empty_history_zero_guess(self):
        d = _dirac(11, kind="wilson", kappa=0.11)
        b = rng.random_spinor(jax.random.PRNGKey(12), GEOM)[0]
        x0 = ChronoHistory().guess(d.matpc, b)
        assert float(jnp.sum(jnp.abs(x0))) == 0.0


class TestSD:
    def test_reduces_residual(self):
        from quda_qkxtm_multigrid_tpu.solvers.sd import sd
        d = _dirac(17, kind="wilson", kappa=0.11)
        b = rng.random_spinor(jax.random.PRNGKey(18), GEOM)[0]
        rhs = d.matpc(b, dagger=True)
        res = sd(d.matpc_dagm, rhs, tol=1e-10, maxiter=50)
        assert _relres(d.matpc_dagm, res.x, rhs) < 0.5


class TestPipelinedCG:
    def test_matches_cg(self):
        d = _dirac(13, kind="twisted-clover", kappa=0.115, mu=0.05,
                   csw=1.0)
        b = rng.random_spinor(jax.random.PRNGKey(14), GEOM)[0]
        rhs = d.matpc(b, dagger=True)
        res_p = jax.jit(lambda b: pipelined_cg(d.matpc_dagm, b, tol=1e-10,
                                               maxiter=600))(rhs)
        res_c = jax.jit(lambda b: cg(d.matpc_dagm, b, tol=1e-10,
                                     maxiter=600))(rhs)
        assert _relres(d.matpc_dagm, res_p.x, rhs) < 1e-8
        # same Krylov space: iteration counts within a few of each other
        assert abs(int(res_p.iters) - int(res_c.iters)) <= 5
        np.testing.assert_allclose(np.asarray(res_p.x), np.asarray(res_c.x),
                                   atol=1e-6)

    def test_reliable_wrapper(self):
        d = _dirac(15, kind="wilson", kappa=0.12)
        b = rng.random_spinor(jax.random.PRNGKey(16), GEOM)[0]
        rhs = d.matpc(b, dagger=True)
        lo = jax.tree.map(
            lambda a: a.astype(jnp.complex64)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype,
                                                      jnp.complexfloating)
            else a, d)
        res = pipelined_cg_reliable(d.matpc_dagm, lo.matpc_dagm, rhs,
                                    tol=1e-9, inner_tol=1e-4)
        assert _relres(d.matpc_dagm, res.x, rhs) < 1e-8
