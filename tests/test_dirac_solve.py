"""Dirac layer + CG tests: TM operator vs oracle, Schur consistency,
end-to-end inversion with true-residual check (mirrors reference
tests/invert_test.cpp:419-449)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu import fields
from quda_qkxtm_multigrid_tpu.dirac import Dirac, DiracParams, make_dirac
from quda_qkxtm_multigrid_tpu.invert import invert
from quda_qkxtm_multigrid_tpu.solvers.cg import cg
from quda_qkxtm_multigrid_tpu.utils import rng

from tests.oracles import numpy_lattice as oracle

GEOM = Geometry(4, 4, 4, 8)


def _setup(seed=0, **kw):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    u = rng.random_gauge(k1, GEOM)
    psi = rng.random_spinor(k2, GEOM)
    params = DiracParams(**kw)
    return make_dirac(u, params, GEOM), psi


class TestTwistedMass:
    @pytest.mark.parametrize("dagger", [False, True])
    @pytest.mark.parametrize("flavor", [+1, -1])
    def test_tm_mat_vs_oracle(self, flavor, dagger):
        d, psi = _setup(1, kind="twisted-mass", kappa=0.12, mu=0.05,
                        flavor=flavor)
        u_full = np.asarray(fields.gauge_to_full(d.u, GEOM))
        psi_full = np.asarray(fields.spinor_to_full(psi, GEOM))
        # tm_mat: out = twist_direct(in) - kappa*D in (reference tm_mat)
        tw = oracle.twist_full(psi_full, 0.12, 0.05, flavor, dagger)
        ref = tw - 0.12 * oracle.dslash_full(u_full, psi_full, dagger)
        got = np.asarray(fields.spinor_to_full(d.m(psi, dagger), GEOM))
        np.testing.assert_allclose(got, ref, atol=1e-11)

    def test_twist_inverse(self):
        from quda_qkxtm_multigrid_tpu.ops.twist import twist_apply
        psi = rng.random_spinor(jax.random.PRNGKey(3), GEOM)
        t = twist_apply(psi, 0.12, 0.07, +1)
        back = twist_apply(t, 0.12, 0.07, +1, inverse=True)
        np.testing.assert_allclose(np.asarray(back), np.asarray(psi), atol=1e-13)


class TestSchur:
    @pytest.mark.parametrize("kind,mu", [("wilson", 0.0), ("twisted-mass", 0.05)])
    @pytest.mark.parametrize("asym", [False, True])
    @pytest.mark.parametrize("parity", [0, 1])
    def test_schur_identity(self, kind, mu, asym, parity):
        """If M x = b then M_pc x_p = prepare(b)."""
        d, x = _setup(4, kind=kind, kappa=0.12, mu=mu,
                      matpc_parity=parity, asymmetric=asym)
        b = d.m(x)
        src = d.prepare(b)
        lhs = d.matpc(x[parity])
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(src), atol=1e-11)

    @pytest.mark.parametrize("kind,mu", [("wilson", 0.0), ("twisted-mass", 0.05)])
    def test_reconstruct(self, kind, mu):
        d, x = _setup(5, kind=kind, kappa=0.12, mu=mu)
        b = d.m(x)
        x_back = d.reconstruct(x[0], b)
        np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-11)

    def test_matpc_dagger_is_adjoint(self):
        d, x = _setup(6, kind="twisted-mass", kappa=0.12, mu=0.05)
        _, y = _setup(7)
        lhs = jnp.vdot(y[0], d.matpc(x[0]))
        rhs = jnp.vdot(d.matpc(y[0], dagger=True), x[0])
        np.testing.assert_allclose(complex(lhs), complex(rhs), rtol=1e-12)


class TestInvert:
    @pytest.mark.parametrize("kind,mu", [("wilson", 0.0), ("twisted-mass", 0.08)])
    def test_invert_true_residual(self, kind, mu):
        d, _ = _setup(8, kind=kind, kappa=0.115, mu=mu)
        b = fields.point_source(GEOM, (0, 0, 0, 0), 0, 0)
        out = jax.jit(lambda d, b: invert(d, b, tol=1e-10, maxiter=500))(d, b)
        assert float(out.true_res) < 1e-8, float(out.true_res)
        assert int(out.iters) < 500

    def test_invert_asymmetric_matches_symmetric(self):
        d_sym, _ = _setup(9, kind="twisted-mass", kappa=0.115, mu=0.08)
        d_asym, _ = _setup(9, kind="twisted-mass", kappa=0.115, mu=0.08,
                           asymmetric=True)
        b = rng.random_spinor(jax.random.PRNGKey(10), GEOM)
        x1 = invert(d_sym, b, tol=1e-11, maxiter=1000).x
        x2 = invert(d_asym, b, tol=1e-11, maxiter=1000).x
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-8)

    def test_cg_simple_spd(self):
        # sanity: CG solves a small SPD system
        key = jax.random.PRNGKey(11)
        a = jax.random.normal(key, (20, 20))
        spd = a @ a.T + 20 * jnp.eye(20)
        b = jax.random.normal(jax.random.PRNGKey(12), (20,))
        res = cg(lambda v: spd @ v, b, tol=1e-12, maxiter=100)
        np.testing.assert_allclose(np.asarray(spd @ res.x), np.asarray(b),
                                   atol=1e-9)
