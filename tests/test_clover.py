"""Clover sector tests: field-strength properties, gauge covariance,
clover/twisted-clover operator consistency (Schur identities + solves)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu import fields
from quda_qkxtm_multigrid_tpu.dirac import DiracParams, make_dirac
from quda_qkxtm_multigrid_tpu.invert import invert
from quda_qkxtm_multigrid_tpu.ops import clover as cl
from quda_qkxtm_multigrid_tpu.ops.gauge import gauge_transform
from quda_qkxtm_multigrid_tpu.utils import rng

GEOM = Geometry(4, 4, 4, 8)


def _gauge(seed=0):
    return rng.random_gauge(jax.random.PRNGKey(seed), GEOM)


class TestFieldStrength:
    def test_unit_gauge_zero(self):
        f = cl.field_strength(rng.unit_gauge(GEOM), GEOM)
        assert float(jnp.max(jnp.abs(f))) < 1e-14

    def test_antihermitian(self):
        f = cl.field_strength(_gauge(1), GEOM)   # [6,2,3,3,T,Z,W]
        fh = jnp.conj(jnp.swapaxes(f, 2, 3))
        np.testing.assert_allclose(np.asarray(f), -np.asarray(fh), atol=1e-13)

    def test_gauge_covariance(self):
        """F'(x) = g(x) F(x) g^dag(x) under gauge transformation."""
        u = _gauge(2)
        g = jnp.moveaxis(
            rng.random_su3(jax.random.PRNGKey(9), (2,) + GEOM.lat_shape),
            (0, 1), (1, 2))                      # [2,3,3,T,Z,W]
        u2 = gauge_transform(u, g, GEOM)
        f1 = cl.field_strength(u, GEOM)
        f2 = cl.field_strength(u2, GEOM)
        expect = jnp.einsum("pab...,mpbc...,pdc...->mpad...",
                            g, f1, jnp.conj(g))
        np.testing.assert_allclose(np.asarray(f2), np.asarray(expect),
                                   atol=1e-11)


class TestCloverTerm:
    def test_csw_zero_is_identity(self):
        clov = cl.make_clover(_gauge(3), GEOM, 0.0)   # [2,2,6,6,T,Z,W]
        eye = np.eye(6).reshape(1, 1, 6, 6, 1, 1, 1)
        np.testing.assert_allclose(
            np.asarray(clov), np.broadcast_to(eye, clov.shape), atol=1e-14)

    def test_hermitian(self):
        clov = cl.make_clover(_gauge(4), GEOM, 0.2)
        ch = np.asarray(clov)
        np.testing.assert_allclose(ch, ch.conj().swapaxes(2, 3), atol=1e-13)

    def test_inverse(self):
        clov = cl.make_clover(_gauge(5), GEOM, 0.15)
        inv = cl.invert_clover(clov)
        prod = np.asarray(jnp.einsum("pcij...,pcjk...->pcik...", clov, inv))
        eye = np.eye(6).reshape(1, 1, 6, 6, 1, 1, 1)
        np.testing.assert_allclose(prod, np.broadcast_to(eye, prod.shape),
                                   atol=1e-11)

    def test_apply_matches_matvec(self):
        clov = cl.make_clover(_gauge(6), GEOM, 0.15)
        psi = rng.random_spinor(jax.random.PRNGKey(7), GEOM)
        out = cl.clover_apply(clov[0], psi[0])
        chi = np.asarray(psi[0]).reshape((2, 6) + GEOM.lat_shape)
        m = np.asarray(clov[0])
        expect = np.einsum("cij...,cj...->ci...", m, chi).reshape(
            (4, 3) + GEOM.lat_shape)
        np.testing.assert_allclose(np.asarray(out), expect, atol=1e-12)


class TestCloverOperator:
    @pytest.mark.parametrize("kind,mu", [("clover", 0.0),
                                         ("twisted-clover", 0.05)])
    @pytest.mark.parametrize("asym", [False, True])
    def test_schur_identity(self, kind, mu, asym):
        d = make_dirac(_gauge(8), DiracParams(
            kind=kind, kappa=0.12, mu=mu, csw=1.0, asymmetric=asym), GEOM)
        x = rng.random_spinor(jax.random.PRNGKey(11), GEOM)
        b = d.m(x)
        np.testing.assert_allclose(np.asarray(d.matpc(x[0])),
                                   np.asarray(d.prepare(b)), atol=1e-11)
        x_back = d.reconstruct(x[0], b)
        np.testing.assert_allclose(np.asarray(x_back), np.asarray(x),
                                   atol=1e-11)

    def test_clover_gamma5_hermiticity(self):
        from quda_qkxtm_multigrid_tpu.ops.gamma import apply_gamma5
        d = make_dirac(_gauge(12), DiracParams(kind="clover", kappa=0.12,
                                               csw=1.0), GEOM)
        psi = rng.random_spinor(jax.random.PRNGKey(13), GEOM)
        lhs = apply_gamma5(d.m(apply_gamma5(psi)))
        rhs = d.m(psi, dagger=True)
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                   atol=1e-11)

    def test_matpc_dagger_adjoint_tmc(self):
        d = make_dirac(_gauge(14), DiracParams(
            kind="twisted-clover", kappa=0.12, mu=0.06, csw=1.2), GEOM)
        x = rng.random_spinor(jax.random.PRNGKey(15), GEOM)
        y = rng.random_spinor(jax.random.PRNGKey(16), GEOM)
        lhs = jnp.vdot(y[0], d.matpc(x[0]))
        rhs = jnp.vdot(d.matpc(y[0], dagger=True), x[0])
        np.testing.assert_allclose(complex(lhs), complex(rhs), rtol=1e-11)

    def test_invert_twisted_clover(self):
        d = make_dirac(_gauge(17), DiracParams(
            kind="twisted-clover", kappa=0.115, mu=0.08, csw=1.0), GEOM)
        b = fields.point_source(GEOM, (1, 1, 1, 1), 0, 0)
        out = jax.jit(lambda d, b: invert(d, b, tol=1e-10, maxiter=800))(d, b)
        assert float(out.true_res) < 1e-8, float(out.true_res)

    def test_unit_gauge_clover_equals_wilson(self):
        u = rng.unit_gauge(GEOM)
        d_cl = make_dirac(u, DiracParams(kind="clover", kappa=0.12, csw=1.0),
                          GEOM)
        d_w = make_dirac(u, DiracParams(kind="wilson", kappa=0.12), GEOM)
        psi = rng.random_spinor(jax.random.PRNGKey(18), GEOM)
        np.testing.assert_allclose(np.asarray(d_cl.m(psi)),
                                   np.asarray(d_w.m(psi)), atol=1e-13)
