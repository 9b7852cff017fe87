"""Möbius domain-wall tests (reference mdw_* oracles,
tests/domain_wall_dslash_reference.cpp:624-880): exact dslash5inv,
Shamir limit, operator adjointness, and an even-odd preconditioned
solve."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu.ops import domain_wall as dw
from quda_qkxtm_multigrid_tpu.utils import rng

pytestmark = pytest.mark.slow  # full-pipeline tier; smoke: -m 'not slow'

GEOM = Geometry(4, 4, 4, 8)
LS = 8
MFERM = 0.1
M5 = -1.5
B5, C5 = 1.5, 0.5


@pytest.fixture(scope="module")
def fields():
    u = rng.random_gauge(jax.random.PRNGKey(0), GEOM)
    ks = jax.random.split(jax.random.PRNGKey(1), LS)
    psi5 = jnp.stack([rng.random_spinor(k, GEOM) for k in ks])  # [Ls,2,...]
    return u, psi5


def _vdot(a, b):
    return complex(jnp.vdot(a, b))


class TestDslash5Inv:
    @pytest.mark.parametrize("dagger", [False, True])
    def test_exact_inverse(self, fields, dagger):
        _, psi5 = fields
        v = psi5[:, 0]
        _, _, k5 = dw.mdw_kappas(B5, C5, M5, LS)
        w = dw.mdw_dslash5(v, k5, MFERM, dagger)
        back = dw.mdw_dslash5_inv(w, k5, MFERM, dagger)
        np.testing.assert_allclose(np.asarray(back), np.asarray(v),
                                   atol=1e-10)

    def test_zmobius_per_s_coefficients(self, fields):
        """Per-s varying b5/c5 (zMöbius layout) round-trips too."""
        _, psi5 = fields
        v = psi5[:, 1]
        b5 = np.linspace(1.2, 1.8, LS)
        c5 = np.linspace(0.2, 0.8, LS)
        _, _, k5 = dw.mdw_kappas(b5, c5, M5, LS)
        w = dw.mdw_dslash5(v, k5, MFERM)
        back = dw.mdw_dslash5_inv(w, k5, MFERM)
        np.testing.assert_allclose(np.asarray(back), np.asarray(v),
                                   atol=1e-10)


class TestMdwMat:
    def test_shamir_limit(self, fields):
        """b5=1, c5=0 reduces Möbius to the Shamir 4D-PC operator with
        kappa = 1/(2(5+m5)) (reference kappa relations,
        tests/dslash_test.cpp:877)."""
        u, psi5 = fields
        m5 = -1.8
        kappa = 1.0 / (2.0 * (5.0 + m5))
        got = dw.mdw_mat(u, psi5, m5, MFERM, 1.0, 0.0, GEOM)
        want = dw.dw4d_mat(u, psi5, kappa, MFERM, GEOM)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-10)

    def test_adjoint(self, fields):
        u, psi5 = fields
        x = psi5
        y = jnp.roll(psi5, 1, axis=-1)
        mx = dw.mdw_mat(u, x, M5, MFERM, B5, C5, GEOM)
        mdy = dw.mdw_mat(u, y, M5, MFERM, B5, C5, GEOM, dagger=True)
        assert abs(_vdot(y, mx) - _vdot(mdy, x)) < 1e-8

    def test_adjoint_per_s(self, fields):
        """Adjoint consistency with s-dependent b5/c5 exercises the
        K_b-ordering subtlety of the dagger path."""
        u, psi5 = fields
        b5 = np.linspace(1.2, 1.8, LS)
        c5 = np.linspace(0.2, 0.8, LS)
        x = psi5
        y = jnp.roll(psi5, 1, axis=-1)
        mx = dw.mdw_mat(u, x, M5, MFERM, b5, c5, GEOM)
        mdy = dw.mdw_mat(u, y, M5, MFERM, b5, c5, GEOM, dagger=True)
        assert abs(_vdot(y, mx) - _vdot(mdy, x)) < 1e-8


class TestMdwMatPC:
    def test_adjoint(self, fields):
        u, psi5 = fields
        x = psi5[:, 0]
        y = jnp.roll(x, 1, axis=-1)
        mx = dw.mdw_matpc(u, x, M5, MFERM, B5, C5, GEOM)
        mdy = dw.mdw_matpc(u, y, M5, MFERM, B5, C5, GEOM, dagger=True)
        assert abs(_vdot(y, mx) - _vdot(mdy, x)) < 1e-8

    def test_normal_equation_solve(self, fields):
        """CG on M_pc† M_pc converges — the production Möbius solve path
        (reference invert_test.cpp QUDA_MOBIUS_DWF_DSLASH)."""
        from quda_qkxtm_multigrid_tpu.solvers.cg import cg
        u, psi5 = fields
        b = psi5[:, 0]
        mat = lambda v: dw.mdw_matpc(u, v, M5, MFERM, B5, C5, GEOM)
        matd = lambda v: dw.mdw_matpc(u, v, M5, MFERM, B5, C5, GEOM,
                                      dagger=True)
        rhs = matd(b)
        res = cg(lambda v: matd(mat(v)), rhs, tol=1e-10, maxiter=800)
        r = b - mat(res.x)
        rel = float(jnp.sqrt(jnp.real(jnp.vdot(r, r))
                             / jnp.real(jnp.vdot(b, b))))
        assert rel < 1e-8
