"""Solver suite tests: BiCGstab, MR, GCR (+preconditioned), multi-shift,
multi-source — each checked by true-residual of the original system
(mirrors reference tests/invert_test.cpp residual checks)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu import fields
from quda_qkxtm_multigrid_tpu.dirac import DiracParams, make_dirac
from quda_qkxtm_multigrid_tpu.solvers.bicgstab import bicgstab
from quda_qkxtm_multigrid_tpu.solvers.mr import mr
from quda_qkxtm_multigrid_tpu.solvers.gcr import gcr
from quda_qkxtm_multigrid_tpu.solvers.multishift import multishift_cg
from quda_qkxtm_multigrid_tpu.solvers.msrc import msrc_cg
from quda_qkxtm_multigrid_tpu.utils import rng

GEOM = Geometry(4, 4, 4, 8)


def _dirac(seed=0, **kw):
    u = rng.random_gauge(jax.random.PRNGKey(seed), GEOM)
    return make_dirac(u, DiracParams(**kw), GEOM)


def _relres(matvec, x, b):
    r = b - matvec(x)
    return float(jnp.sqrt(jnp.real(jnp.vdot(r, r)) / jnp.real(jnp.vdot(b, b))))


class TestBiCGStab:
    def test_solves_matpc(self):
        d = _dirac(1, kind="twisted-mass", kappa=0.115, mu=0.05)
        b = rng.random_spinor(jax.random.PRNGKey(2), GEOM)[0]
        res = jax.jit(lambda b: bicgstab(d.matpc, b, tol=1e-10, maxiter=500))(b)
        assert _relres(d.matpc, res.x, b) < 1e-8

    def test_solves_full_wilson(self):
        d = _dirac(3, kind="wilson", kappa=0.11)
        b = rng.random_spinor(jax.random.PRNGKey(4), GEOM)
        res = bicgstab(d.m, b, tol=1e-10, maxiter=500)
        assert _relres(d.m, res.x, b) < 1e-8


class TestMR:
    def test_reduces_residual(self):
        d = _dirac(5, kind="wilson", kappa=0.11)
        b = rng.random_spinor(jax.random.PRNGKey(6), GEOM)[0]
        x = mr(d.matpc, b, niter=8)
        assert _relres(d.matpc, x, b) < 0.9   # smoother: just reduce


class TestGCR:
    def test_solves(self):
        d = _dirac(7, kind="twisted-clover", kappa=0.115, mu=0.05, csw=1.0)
        b = rng.random_spinor(jax.random.PRNGKey(8), GEOM)[0]
        res = jax.jit(lambda b: gcr(d.matpc, b, tol=1e-9, n_krylov=10,
                                    max_restarts=60))(b)
        assert _relres(d.matpc, res.x, b) < 1e-7

    def test_preconditioned_converges_faster(self):
        d = _dirac(9, kind="wilson", kappa=0.115)
        b = rng.random_spinor(jax.random.PRNGKey(10), GEOM)[0]
        plain = gcr(d.matpc, b, tol=1e-9, n_krylov=8, max_restarts=60)
        prec = gcr(d.matpc, b, tol=1e-9, n_krylov=8, max_restarts=60,
                   precond=lambda r: mr(d.matpc, r, niter=4))
        assert _relres(d.matpc, prec.x, b) < 1e-7
        assert int(prec.iters) <= int(plain.iters)


class TestMultiShift:
    def test_all_shifts_solved(self):
        d = _dirac(11, kind="wilson", kappa=0.115)
        b = rng.random_spinor(jax.random.PRNGKey(12), GEOM)[0]
        shifts = [0.0, 0.05, 0.2, 1.0]
        res = jax.jit(lambda b: multishift_cg(d.matpc_dagm, b, shifts,
                                              tol=1e-10, maxiter=600))(b)
        for i, s in enumerate(shifts):
            mv = lambda v: d.matpc_dagm(v) + s * v
            assert _relres(mv, res.x[i], b) < 1e-7, (i, s)


class TestMultiSource:
    def test_batch_matches_individual(self):
        d = _dirac(13, kind="twisted-mass", kappa=0.115, mu=0.05)
        bs = jnp.stack([rng.random_spinor(jax.random.PRNGKey(20 + i), GEOM)[0]
                        for i in range(3)])
        res = jax.jit(lambda bs: msrc_cg(jax.vmap(d.matpc_dagm), bs,
                                         tol=1e-10, maxiter=600))(bs)
        for i in range(3):
            assert _relres(d.matpc_dagm, res.x[i], bs[i]) < 1e-8
