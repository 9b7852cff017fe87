"""Non-degenerate twisted-mass doublet Dirac tests (reference
tm_ndeg_mat / tm_ndeg_matpc oracles, tests/wilson_dslash_reference.cpp,
and the DiracTwistedMass doublet path, lib/dslash_ndeg_twisted_mass.cu)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu.dirac import (DiracParams, make_dirac,
                                            make_dirac_ndeg)
from quda_qkxtm_multigrid_tpu.utils import rng

GEOM = Geometry(4, 4, 4, 8)
KAPPA, MU, EPS = 0.115, 0.05, 0.02


@pytest.fixture(scope="module")
def fields():
    u = rng.random_gauge(jax.random.PRNGKey(0), GEOM)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    psi = jnp.stack([rng.random_spinor(k1, GEOM),
                     rng.random_spinor(k2, GEOM)])   # [2f, 2p, 4, 3, ...]
    return u, psi


def _nd(u, eps=EPS, **kw):
    return make_dirac_ndeg(u, DiracParams(kind="twisted-mass", kappa=KAPPA,
                                          mu=MU, epsilon=eps, **kw), GEOM)


class TestDoublet:
    def test_degenerate_limit(self, fields):
        """ε→0: the doublet decouples into the two single-flavor
        twisted-mass operators with flavor = ±1."""
        u, psi = fields
        d = make_dirac_ndeg(u, DiracParams(kind="twisted-mass",
                                           kappa=KAPPA, mu=MU,
                                           epsilon=1e-30), GEOM)
        got = d.m(psi)
        for fl, sign in ((0, +1), (1, -1)):
            dsingle = make_dirac(u, DiracParams(kind="twisted-mass",
                                                kappa=KAPPA, mu=MU,
                                                flavor=sign), GEOM)
            want = dsingle.m(psi[fl])
            np.testing.assert_allclose(np.asarray(got[fl]),
                                       np.asarray(want), atol=1e-12)

    def test_adjoint(self, fields):
        u, psi = fields
        d = _nd(u)
        y = jnp.roll(psi, 1, axis=-1)
        assert abs(complex(jnp.vdot(y, d.m(psi)))
                   - complex(jnp.vdot(d.mdag(y), psi))) < 1e-8

    def test_tau1_gamma5_hermiticity(self, fields):
        """M† = τ1 γ5 M γ5 τ1 — the doublet analogue of
        γ5-hermiticity (ε τ1 is real-symmetric, the μ term flips under
        both γ5 and τ1)."""
        u, psi = fields
        d = _nd(u)
        g5 = jnp.asarray([1, 1, -1, -1], psi.dtype).reshape(4, 1, 1, 1, 1)

        def t1g5(v):
            return (g5 * v)[::-1]   # γ5 then τ1 (flavor swap)

        want = d.mdag(psi)
        got = t1g5(d.m(t1g5(psi)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-10)

    def test_matpc_adjoint(self, fields):
        u, psi = fields
        d = _nd(u)
        x = psi[:, 0]
        y = jnp.roll(x, 1, axis=-1)
        assert abs(complex(jnp.vdot(y, d.matpc(x)))
                   - complex(jnp.vdot(d.matpc(y, dagger=True), x))) < 1e-8

    def test_schur_identity(self, fields):
        """prepare/solve/reconstruct consistency: if x solves the full
        system, its solve-parity part solves the Schur system built by
        prepare (the reference's prepare/reconstruct contract,
        dirac_quda.h:132-143)."""
        u, psi = fields
        d = _nd(u)
        x = psi
        b = d.m(x)
        src = d.prepare(b)
        got = d.matpc(x[:, 0])
        np.testing.assert_allclose(np.asarray(got), np.asarray(src),
                                   atol=1e-10)
        rec = d.reconstruct(x[:, 0], b)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x),
                                   atol=1e-10)

    def test_cg_solve(self, fields):
        from quda_qkxtm_multigrid_tpu.solvers.cg import cg
        u, psi = fields
        d = _nd(u)
        b = psi
        src = d.prepare(b)
        rhs = d.matpc(src, dagger=True)
        res = cg(d.matpc_dagm, rhs, tol=1e-10, maxiter=800)
        x = d.reconstruct(res.x, b)
        r = b - d.m(x)
        rel = float(jnp.sqrt(jnp.real(jnp.vdot(r, r))
                             / jnp.real(jnp.vdot(b, b))))
        assert rel < 1e-8
