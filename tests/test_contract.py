"""Contraction-engine tests vs a NumPy site-loop oracle that mirrors the
reference kernels' accumulation formulas literally
(contractMesons_core_Kepler.h, contractBaryons_core_Kepler.h), plus
physics sanity checks (pion positivity, smearing norms)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu import fields
from quda_qkxtm_multigrid_tpu.dirac import DiracParams, make_dirac
from quda_qkxtm_multigrid_tpu.invert import invert
from quda_qkxtm_multigrid_tpu.physics import contract as con
from quda_qkxtm_multigrid_tpu.physics.propagator import (
    forward_propagator, rotate_to_physical)
from quda_qkxtm_multigrid_tpu.ops.smear import (
    ape_smear, gaussian_smear, covdev_apply)
from quda_qkxtm_multigrid_tpu.utils import rng

pytestmark = pytest.mark.slow  # full-pipeline tier; smoke: -m 'not slow'

GEOM = Geometry(4, 4, 4, 8)


def _random_prop(seed):
    k = jax.random.PRNGKey(seed)
    shape = (2, 4, 4, 3, 3) + GEOM.lat_shape
    kr, ki = jax.random.split(k)
    return (jax.random.normal(kr, shape) + 1j * jax.random.normal(ki, shape))


def _prop_to_lex(prop):
    """[2,4,4,3,3,T,Z,W] → [T,Z,Y,X,4,4,3,3] via the spinor converter."""
    p = jnp.moveaxis(prop, (1, 2, 3, 4), (-4, -3, -2, -1))  # [2,T,Z,W,4,4,3,3]
    from quda_qkxtm_multigrid_tpu.lattice import _join_parity_sites
    r = p.reshape((2, GEOM.T, GEOM.Z, GEOM.Y, GEOM.Xh, 4, 4, 3, 3))
    return np.asarray(_join_parity_sites(r))


class TestMesonOracle:
    def test_meson_vs_loop_oracle(self):
        prop = _random_prop(0)
        got = con.meson_correlators(prop, prop)     # [10,2,2,T,Z,W]
        got_lex = np.asarray(con.corr_to_lex(got, GEOM))  # [10,2,T,Z,Y,X]
        s = _prop_to_lex(prop)
        G = con.MESON_G
        # oracle: loop over sites, contract with the G (x) G structure
        for ip in range(10):
            ref = np.einsum("da,bg,tzyxabuv,tzyxdguv->tzyx",
                            G[ip], G[ip], s, s.conj())
            np.testing.assert_allclose(got_lex[ip, 0], ref, rtol=1e-10)

    def test_pion_positive(self):
        prop = _random_prop(1)
        c = con.meson_correlators(prop, prop)
        pion = np.asarray(con.corr_to_lex(c, GEOM))[0, 0]  # pseudoscalar
        # C_pi(x) = sum |S|^2 >= 0 site-wise
        assert np.all(pion.real >= -1e-10)
        assert np.max(np.abs(pion.imag)) < 1e-9 * np.max(pion.real)


class TestBaryonOracle:
    def test_ntn_vs_loop_oracle(self):
        up, dn = _random_prop(2), _random_prop(3)
        got = con.baryon_correlators(up, dn)        # [10,2,2,4,4,T,Z,W]
        got_lex = np.asarray(con.corr_to_lex(got, GEOM))  # [10,2,4,4,T,Z,Y,X]
        u = _prop_to_lex(up)
        d = _prop_to_lex(dn)
        A = -con._G13
        B = con._G13
        eps = con._EPS
        # oracle NTN: direct transcription of the ip==0 accumulation
        t1 = np.einsum("ab,ed,uvc,xjk,TZYXbevj,TZYXadux,TZYXghck->TZYXgh",
                       A, B, eps, eps, d, u, u)
        t2 = np.einsum("ab,ed,uvc,xjk,TZYXbevj,TZYXahuk,TZYXgdcx->TZYXgh",
                       A, B, eps, eps, d, u, u)
        # overall sign follows the REFERENCE convention established by
        # tests/test_reference_contract.py (the round-2 global-sign fix
        # of the NTN correlator; goldens regenerated to match)
        ref = t1 - t2
        np.testing.assert_allclose(got_lex[0, 0].transpose(2, 3, 4, 5, 0, 1),
                                   ref, rtol=1e-9)


class TestMomentum:
    def test_zero_momentum_is_spatial_sum(self):
        prop = _random_prop(4)
        c = con.meson_correlators(prop, prop)
        lex = con.corr_to_lex(c, GEOM)
        moms = np.asarray([[0, 0, 0], [1, 0, 0]])
        proj = np.asarray(con.momentum_project(lex, GEOM, moms))
        np.testing.assert_allclose(proj[..., 0],
                                   np.asarray(lex).sum(axis=(-3, -2, -1)),
                                   rtol=1e-10)

    def test_fft_matches_momentum_project(self):
        prop = _random_prop(5)
        c = con.meson_correlators(prop, prop)[0, 0]  # [2,T,Z,W]
        lex = con.corr_to_lex(c, GEOM)               # [T,Z,Y,X]
        fft = np.asarray(con.fft_project(lex))
        moms = np.asarray([[1, 0, 0], [0, 2, 0], [1, 1, 1]])
        proj = np.asarray(con.momentum_project(lex, GEOM, moms))
        for i, (px, py, pz) in enumerate(moms):
            np.testing.assert_allclose(proj[..., i], fft[:, pz, py, px],
                                       rtol=1e-8)

    def test_momentum_list(self):
        moms = con.momentum_list(2)
        assert (moms == [0, 0, 0]).all(1).any()
        assert len(moms) == 19   # 1 + 6 + 12


class TestSmearing:
    def test_ape_preserves_su3(self):
        u = rng.random_gauge(jax.random.PRNGKey(6), GEOM)
        us = ape_smear(u, GEOM, alpha=0.5, n_steps=2)
        un = np.moveaxis(np.asarray(us), (2, 3), (-2, -1))
        eye = np.broadcast_to(np.eye(3), un.shape)
        np.testing.assert_allclose(un @ un.conj().swapaxes(-1, -2), eye,
                                   atol=1e-10)
        np.testing.assert_allclose(np.linalg.det(un), np.ones(un.shape[:-2]),
                                   atol=1e-10)

    def test_ape_increases_plaquette(self):
        from quda_qkxtm_multigrid_tpu.ops.gauge import plaquette
        u = rng.random_gauge(jax.random.PRNGKey(7), GEOM)
        us = ape_smear(u, GEOM, alpha=0.5, n_steps=3)
        _, sp0, _ = plaquette(u, GEOM)
        _, sp1, _ = plaquette(us, GEOM)
        assert float(sp1) > float(sp0)

    def test_gaussian_smear_point_source_spreads(self):
        u = rng.unit_gauge(GEOM)
        src = fields.point_source(GEOM, (0, 0, 0, 0), 0, 0)
        sm = gaussian_smear(src, u, GEOM, alpha=4.0, n=5)
        full = np.asarray(fields.spinor_to_full(sm, GEOM))
        # support spreads spatially but stays on the source timeslice
        assert np.abs(full[0]).sum() > 0
        assert np.abs(full[1:]).sum() < 1e-10
        assert np.abs(full[0, :, :, 1:]).sum() > 0   # off-origin support

    def test_covdev_unit_gauge_is_shift(self):
        u = rng.unit_gauge(GEOM)
        psi = rng.random_spinor(jax.random.PRNGKey(8), GEOM)
        out = covdev_apply(u, psi, 3, True, GEOM)
        full_in = np.asarray(fields.spinor_to_full(psi, GEOM))
        full_out = np.asarray(fields.spinor_to_full(out, GEOM))
        np.testing.assert_allclose(full_out, np.roll(full_in, -1, axis=0),
                                   atol=1e-13)


class TestEndToEnd:
    def test_pion_correlator_from_solves(self):
        """Small end-to-end: 12 solves → propagator → pion 2pt decays."""
        u = rng.random_gauge(jax.random.PRNGKey(9), GEOM)
        d = make_dirac(u, DiracParams(kind="twisted-mass", kappa=0.115,
                                      mu=0.05), GEOM)
        solve = lambda b: invert(d, b, tol=1e-9, maxiter=400).x
        prop = forward_propagator(solve, GEOM, (0, 0, 0, 0),
                                  dtype=jnp.complex128)
        prop = rotate_to_physical(prop, +1)
        c = con.meson_correlators(prop, prop)
        lex = con.corr_to_lex(c, GEOM)
        pion = np.asarray(lex)[0, 0].sum(axis=(1, 2, 3)).real  # [T]
        assert pion[0] > 0
        assert np.all(pion > 0)
        # decays away from the source and is t-reflection symmetric
        assert pion[1] < pion[0] and pion[-1] < pion[0]
        np.testing.assert_allclose(pion[1:], pion[1:][::-1], rtol=0.3)
