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

    def test_mixed_precision_reaches_1e10(self):
        """Mixed f64-outer / f32-sloppy-inner BiCGstab converges to
        1e-10 true residual — BASELINE parity config 2's solver
        (reference lib/inv_bicgstab_quda.cpp reliable-update form)."""
        from quda_qkxtm_multigrid_tpu.solvers import bicgstab_mixed
        d = _dirac(1, kind="twisted-clover", kappa=0.115, mu=0.05,
                   csw=1.0)
        d_lo = jax.tree.map(
            lambda a: a.astype(jnp.complex64)
            if jnp.issubdtype(a.dtype, jnp.complexfloating) else a, d)
        b = rng.random_spinor(jax.random.PRNGKey(2), GEOM)[0]
        res = jax.jit(lambda b: bicgstab_mixed(
            d.matpc, d_lo.matpc, b, tol=1e-10, maxiter=500,
            inner_tol=1e-4))(b)
        assert _relres(d.matpc, res.x, b) < 1e-10
        assert not bool(res.stats.diverged)

    def test_invert_bicgstab_mixed(self):
        """invert(solver='bicgstab-mixed') returns a full-lattice
        solution at the requested tolerance."""
        from quda_qkxtm_multigrid_tpu.invert import invert
        d = _dirac(1, kind="twisted-mass", kappa=0.115, mu=0.05)
        b = rng.random_spinor(jax.random.PRNGKey(7), GEOM)
        out = invert(d, b, tol=1e-9, maxiter=400, solver="bicgstab-mixed")
        assert float(out.true_res) < 1e-8


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

    def test_refinement_matches_direct_solves(self):
        """Loose shifted pass + per-shift CG refinement reaches what a
        direct 1e-10 CG on each (A + sigma) reaches (reference
        interface_quda.cpp:3083-3112 refinement stage)."""
        from quda_qkxtm_multigrid_tpu.solvers import multishift_cg_refined
        from quda_qkxtm_multigrid_tpu.solvers.cg import cg

        d = _dirac(11, kind="twisted-mass", kappa=0.115, mu=0.05)
        b = rng.random_spinor(jax.random.PRNGKey(12), GEOM)[0]
        shifts = [0.0, 0.05, 0.2, 1.0]
        res = jax.jit(lambda b: multishift_cg_refined(
            d.matpc_dagm, b, shifts, tol=1e-4, maxiter=200,
            refine_tol=1e-10, refine_maxiter=300))(b)
        for i, s in enumerate(shifts):
            mv = lambda v: d.matpc_dagm(v) + s * v
            direct = cg(mv, b, tol=1e-10, maxiter=600)
            got = _relres(mv, res.x[i], b)
            want = _relres(mv, direct.x, b)
            assert got < 5 * max(want, 1e-10), (i, s, got, want)
        # refinement started from the shifted-pass guess, so the easy
        # shifts must cost (far) fewer refine iterations than maxiter
        assert int(res.refine_iters[-1]) < 100


class TestMultiSource:
    def test_batch_matches_individual(self):
        d = _dirac(13, kind="twisted-mass", kappa=0.115, mu=0.05)
        bs = jnp.stack([rng.random_spinor(jax.random.PRNGKey(20 + i), GEOM)[0]
                        for i in range(3)])
        res = jax.jit(lambda bs: msrc_cg(jax.vmap(d.matpc_dagm), bs,
                                         tol=1e-10, maxiter=600))(bs)
        for i in range(3):
            assert _relres(d.matpc_dagm, res.x[i], bs[i]) < 1e-8
