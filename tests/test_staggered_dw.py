"""Staggered and domain-wall operator tests vs loop oracles and
structural identities."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quda_qkxtm_multigrid_tpu.lattice import (
    Geometry, spinor_to_lex, spinor_from_lex)
from quda_qkxtm_multigrid_tpu import fields
from quda_qkxtm_multigrid_tpu.ops import staggered as st
from quda_qkxtm_multigrid_tpu.ops import domain_wall as dw
from quda_qkxtm_multigrid_tpu.ops import dslash as dsl
from quda_qkxtm_multigrid_tpu.solvers.cg import cg
from quda_qkxtm_multigrid_tpu.utils import rng

GEOM = Geometry(4, 4, 4, 8)


def _u(seed=0):
    return rng.random_gauge(jax.random.PRNGKey(seed), GEOM)


def _stag_field(seed):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    shape = (2, 3) + GEOM.lat_shape
    return (jax.random.normal(k1, shape) + 1j * jax.random.normal(k2, shape))


def _stag_to_lex(v):
    """[2,3,T,Z,W] → [T,Z,Y,X,3] via the spinor converter (fake spins)."""
    v4 = jnp.stack([v] * 4, axis=1)          # [2,4,3,T,Z,W]
    lex = spinor_to_lex(v4, GEOM)            # [T,Z,Y,X,4,3]
    return lex[..., 0, :]


class TestStaggered:
    def test_antihermitian(self):
        u = st.apply_staggered_phases(_u(0), GEOM)
        x, y = _stag_field(1), _stag_field(2)
        dx = st.staggered_mat(u, x, 0.0, GEOM)     # pure D
        dy = st.staggered_mat(u, y, 0.0, GEOM)
        lhs = jnp.vdot(y, dx)
        rhs = jnp.vdot(dy, x)
        np.testing.assert_allclose(complex(lhs), complex(-rhs), rtol=1e-11)

    def test_oracle_free_field(self):
        """Unit gauge + phases: D psi = sum eta_mu (psi(x+mu)-psi(x-mu))."""
        u = st.apply_staggered_phases(rng.unit_gauge(GEOM), GEOM,
                                      antiperiodic_t=False)
        x = _stag_field(3)
        got = st.staggered_mat(u, x, 0.0, GEOM)
        lex = np.asarray(_stag_to_lex(x))
        eta = [np.ones((GEOM.T, GEOM.Z, GEOM.Y, GEOM.X, 1))]
        xs = np.arange(GEOM.X).reshape(1, 1, 1, -1, 1)
        ys = np.arange(GEOM.Y).reshape(1, 1, -1, 1, 1)
        zs = np.arange(GEOM.Z).reshape(1, -1, 1, 1, 1)
        eta.append((-1.0) ** xs * np.ones_like(eta[0]))
        eta.append((-1.0) ** (xs + ys) * np.ones_like(eta[0]))
        eta.append((-1.0) ** (xs + ys + zs) * np.ones_like(eta[0]))
        axes = {0: 3, 1: 2, 2: 1, 3: 0}
        ref = np.zeros_like(lex)
        for mu in range(4):
            ref += eta[mu] * (np.roll(lex, -1, axis=axes[mu])
                              - np.roll(lex, 1, axis=axes[mu]))
        got_lex = np.asarray(_stag_to_lex(got))
        np.testing.assert_allclose(got_lex, ref, atol=1e-11)

    def test_improved_runs_and_antihermitian(self):
        u = st.apply_staggered_phases(_u(4), GEOM)
        ll = st.apply_staggered_phases(_u(5), GEOM)   # stand-in long links
        x, y = _stag_field(6), _stag_field(7)
        dx = st.staggered_mat(u, x, 0.0, GEOM, long_links=ll)
        dy = st.staggered_mat(u, y, 0.0, GEOM, long_links=ll)
        np.testing.assert_allclose(complex(jnp.vdot(y, dx)),
                                   complex(-jnp.vdot(dy, x)), rtol=1e-10)

    def test_matpc_cg_solve(self):
        u = st.apply_staggered_phases(_u(8), GEOM)
        b = _stag_field(9)[0]
        mv = lambda v: st.staggered_matpc(u, v, 0.1, GEOM)
        res = cg(mv, b, tol=1e-10, maxiter=1000)
        r = b - mv(res.x)
        assert float(jnp.linalg.norm(r.ravel())
                     / jnp.linalg.norm(b.ravel())) < 1e-8


class TestDomainWall:
    LS = 6

    def _psi5(self, seed):
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        shape = (self.LS, 2, 4, 3) + GEOM.lat_shape
        return (jax.random.normal(k1, shape)
                + 1j * jax.random.normal(k2, shape))

    def test_dslash5_structure(self):
        """PR/PL chiral structure + mass boundary."""
        psi = self._psi5(0)[:, 0]
        out = dw.dslash5(psi, mferm=0.3)
        # upper two spin components come only from the PL (s-1) hop
        bwd = np.roll(np.asarray(psi), 1, axis=0)
        bwd[0] *= -0.3
        np.testing.assert_allclose(np.asarray(out)[:, :2], 2 * bwd[:, :2],
                                   atol=1e-12)
        fwd = np.roll(np.asarray(psi), -1, axis=0)
        fwd[-1] *= -0.3
        np.testing.assert_allclose(np.asarray(out)[:, 2:], 2 * fwd[:, 2:],
                                   atol=1e-12)

    def test_mat_reduces_to_wilson_per_slice_when_decoupled(self):
        """mferm=-1... simpler: the 4D part alone must equal the Wilson
        dslash applied slice-wise."""
        u = _u(1)
        psi5 = self._psi5(2)
        d4 = dw.dslash4(u, psi5[:, 1], 0, GEOM)
        for s in (0, self.LS - 1):
            ref = dsl.dslash_parity(u, psi5[s, 1], 0, GEOM)
            np.testing.assert_allclose(np.asarray(d4[s]), np.asarray(ref),
                                       atol=1e-12)

    def test_dagger_adjoint(self):
        u = _u(3)
        x, y = self._psi5(4), self._psi5(5)
        k = dw.kappa5(1.5)
        mx = dw.dw4d_mat(u, x, k, 0.1, GEOM)
        mdy = dw.dw4d_mat(u, y, k, 0.1, GEOM, dagger=True)
        np.testing.assert_allclose(complex(jnp.vdot(y, mx)),
                                   complex(jnp.vdot(mdy, x)), rtol=1e-11)

    def test_cg_on_normal_equations(self):
        u = _u(6)
        k = dw.kappa5(1.5)
        b = self._psi5(7)
        mat = lambda v: dw.dw4d_mat(u, v, k, 0.1, GEOM)
        matd = lambda v: dw.dw4d_mat(u, v, k, 0.1, GEOM, dagger=True)
        mv = lambda v: matd(mat(v))
        res = cg(mv, matd(b), tol=1e-10, maxiter=800)
        r = b - mat(res.x)
        assert float(jnp.linalg.norm(r.ravel())
                     / jnp.linalg.norm(b.ravel())) < 1e-7


class TestAsqtadLinks:
    """Asqtad fat/long construction (computeKSLinkQuda analogue,
    reference interface_quda.cpp:4401, lib/llfat_quda.cu)."""

    def test_unit_gauge_coefficients(self):
        """On unit gauge every path product is the identity, so
        fat = [c1 + 6 c3 + 12 c_lep + 24 c5 + 48 c7] I = -1/4 I and
        long = c_naik I (each gen_staple doubles: up+down)."""
        u = rng.unit_gauge(GEOM)
        fat, lng = st.asqtad_links(u, GEOM)
        c = st.ASQTAD_COEFFS
        expect = (c["one_link"] + 6 * c["three_staple"] + 12 * c["lepage"]
                  + 24 * c["five_staple"] + 48 * c["seven_staple"])
        assert abs(expect - (-0.25)) < 1e-14
        eye = np.eye(3)
        got = np.asarray(fat)
        want = expect * np.broadcast_to(
            eye.reshape(1, 1, 3, 3, 1, 1, 1), got.shape)
        np.testing.assert_allclose(got, want, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(lng),
            c["naik"] * np.broadcast_to(
                eye.reshape(1, 1, 3, 3, 1, 1, 1), got.shape), atol=1e-12)

    @pytest.mark.slow
    def test_gauge_covariance(self):
        """fat(U^g)_mu(x) = g(x) fat(U)_mu(x) g^dag(x+mu), and the same
        for the Naik links with g^dag(x+3mu) — the defining structural
        property of any smeared-link construction."""
        from quda_qkxtm_multigrid_tpu.ops.gauge import gauge_transform
        from quda_qkxtm_multigrid_tpu.lattice import gather_neighbor
        from quda_qkxtm_multigrid_tpu.ops.smallmat import mat_mul, mat_dag
        u = _u(11)
        g = jnp.moveaxis(
            rng.random_su3(jax.random.PRNGKey(12), (2,) + GEOM.lat_shape),
            (0, 1), (1, 2))                      # [2,3,3,T,Z,W]
        ug = gauge_transform(u, g, GEOM)
        fat_g, lng_g = st.asqtad_links(ug, GEOM)
        fat, lng = st.asqtad_links(u, GEOM)
        for mu in range(4):
            for p in (0, 1):
                g_f = gather_neighbor(g[1 - p], mu, True, p, GEOM)
                want = mat_mul(mat_mul(g[p], fat[mu, p]), mat_dag(g_f))
                np.testing.assert_allclose(np.asarray(fat_g[mu, p]),
                                           np.asarray(want), atol=1e-11)
                # g(x+3mu) at parity-p sites: psi(x+3mu) with the field
                # stored on the opposite parity — exactly shift3's job
                g3 = st.shift3(g[1 - p], mu, True, p, GEOM)
                want_l = mat_mul(mat_mul(g[p], lng[mu, p]), mat_dag(g3))
                np.testing.assert_allclose(np.asarray(lng_g[mu, p]),
                                           np.asarray(want_l), atol=1e-11)

    def test_improved_operator_antihermitian(self):
        """The improved (fat+long) D is anti-hermitian after phases."""
        u = _u(13)
        fat, lng = st.asqtad_links(u, GEOM)
        fat = st.apply_staggered_phases(fat, GEOM)
        lng = st.apply_staggered_phases(lng, GEOM)
        x, y = _stag_field(14), _stag_field(15)
        dx = st.staggered_mat(fat, x, 0.0, GEOM, long_links=lng)
        dy = st.staggered_mat(fat, y, 0.0, GEOM, long_links=lng)
        np.testing.assert_allclose(complex(jnp.vdot(y, dx)),
                                   complex(-jnp.vdot(dy, x)), rtol=1e-10)
