"""Core tests: gamma algebra, lane-major layout conversions, plaquette,
Wilson dslash vs the NumPy site-loop oracle (mirrors reference
tests/dslash_test.cpp)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quda_qkxtm_multigrid_tpu.lattice import (
    Geometry, spinor_to_lex, spinor_from_lex, site_index)
from quda_qkxtm_multigrid_tpu import fields
from quda_qkxtm_multigrid_tpu.ops import gamma as g
from quda_qkxtm_multigrid_tpu.ops import dslash as dsl
from quda_qkxtm_multigrid_tpu.ops.gauge import plaquette
from quda_qkxtm_multigrid_tpu.utils import rng

from tests.oracles import numpy_lattice as oracle

GEOM = Geometry(4, 4, 4, 8)


def _rand_fields(seed=0, geom=GEOM):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    u = rng.random_gauge(k1, geom)
    psi = rng.random_spinor(k2, geom)
    return u, psi


class TestGamma:
    def test_clifford(self):
        for mu in range(4):
            for nu in range(4):
                anti = g.GAMMA[mu] @ g.GAMMA[nu] + g.GAMMA[nu] @ g.GAMMA[mu]
                np.testing.assert_allclose(anti, 2 * (mu == nu) * np.eye(4), atol=1e-14)

    def test_hermitian(self):
        for mu in range(4):
            np.testing.assert_allclose(g.GAMMA[mu], g.GAMMA[mu].conj().T, atol=1e-14)

    def test_gamma5(self):
        np.testing.assert_allclose(g.GAMMA5, np.diag([1, 1, -1, -1]), atol=1e-14)

    def test_projectors_match_reference_table(self):
        # spot-check PROJ[0,0] against the reference's projector[0]
        # (tests/wilson_dslash_reference.cpp:22-27)
        expect = np.array([[1, 0, 0, -1j], [0, 1, -1j, 0], [0, 1j, 1, 0], [1j, 0, 0, 1]])
        np.testing.assert_allclose(g.PROJ[0, 0], expect, atol=1e-14)


class TestLayout:
    def test_lex_roundtrip(self):
        full = np.random.RandomState(0).randn(GEOM.T, GEOM.Z, GEOM.Y, GEOM.X, 4, 3)
        s = spinor_from_lex(jnp.asarray(full), GEOM)
        assert s.shape == (2, 4, 3) + GEOM.lat_shape
        back = spinor_to_lex(s, GEOM)
        np.testing.assert_allclose(np.asarray(back), full)

    def test_site_index_semantics(self):
        full = np.random.RandomState(1).randn(GEOM.T, GEOM.Z, GEOM.Y, GEOM.X, 4, 3)
        s = np.asarray(spinor_from_lex(jnp.asarray(full), GEOM))
        for coords in [(0, 0, 0, 0), (1, 0, 0, 0), (3, 2, 1, 5), (2, 3, 3, 7)]:
            x, y, z, t = coords
            p, ti, zi, w = site_index(GEOM, coords)
            np.testing.assert_allclose(s[p, :, :, ti, zi, w], full[t, z, y, x])

    def test_gauge_roundtrip(self):
        full = np.random.RandomState(2).randn(4, GEOM.T, GEOM.Z, GEOM.Y, GEOM.X, 3, 3)
        s = fields.gauge_from_full(jnp.asarray(full), GEOM)
        assert s.shape == (4, 2, 3, 3) + GEOM.lat_shape
        back = fields.gauge_to_full(s, GEOM)
        np.testing.assert_allclose(np.asarray(back), full)

    def test_point_source(self):
        src = fields.point_source(GEOM, (1, 2, 3, 5), spin=2, color=1)
        full = np.asarray(fields.spinor_to_full(src, GEOM))
        assert full[5, 3, 2, 1, 2, 1] == 1.0
        assert np.sum(np.abs(full)) == 1.0


class TestGauge:
    def test_random_su3_unitary(self):
        u = rng.random_su3(jax.random.PRNGKey(1), (10,))
        un = np.moveaxis(np.asarray(u), (0, 1), (1, 2))   # [10,3,3]
        np.testing.assert_allclose(un @ un.conj().transpose(0, 2, 1),
                                   np.broadcast_to(np.eye(3), (10, 3, 3)), atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(un), np.ones(10), atol=1e-12)

    def test_unit_gauge_plaquette(self):
        u = rng.unit_gauge(GEOM)
        total, sp, tm = plaquette(u, GEOM)
        assert np.allclose([total, sp, tm], 1.0)

    def test_plaquette_vs_oracle(self):
        u, _ = _rand_fields(2)
        u_full = np.asarray(fields.gauge_to_full(u, GEOM))
        ref = oracle.plaquette_full(u_full)
        got = plaquette(u, GEOM)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-12)


class TestDslash:
    @pytest.mark.parametrize("dagger", [False, True])
    @pytest.mark.parametrize("parity", [0, 1])
    def test_dslash_vs_oracle(self, parity, dagger):
        u, psi = _rand_fields(3)
        u_full = np.asarray(fields.gauge_to_full(u, GEOM))
        psi_full = np.asarray(fields.spinor_to_full(psi, GEOM))
        ref_full = oracle.dslash_full(u_full, psi_full, dagger)
        ref = np.asarray(spinor_from_lex(jnp.asarray(ref_full), GEOM))[parity]
        got = dsl.dslash_parity(u, psi[1 - parity], parity, GEOM, dagger)
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-11)

    def test_wilson_mat_vs_oracle(self):
        u, psi = _rand_fields(4)
        kappa = 0.124
        u_full = np.asarray(fields.gauge_to_full(u, GEOM))
        psi_full = np.asarray(fields.spinor_to_full(psi, GEOM))
        ref = oracle.wilson_mat_full(u_full, psi_full, kappa)
        got = fields.spinor_to_full(dsl.wilson_mat(u, psi, kappa, GEOM), GEOM)
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-11)

    def test_matpc_consistent_with_full(self):
        u, psi = _rand_fields(5)
        kappa = 0.13
        tmp = dsl.dslash_parity(u, psi[0], 1, GEOM)
        ref = psi[0] - kappa ** 2 * dsl.dslash_parity(u, tmp, 0, GEOM)
        got = dsl.wilson_matpc(u, psi[0], kappa, GEOM, parity=0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-12)

    def test_dagger_is_adjoint(self):
        u, psi = _rand_fields(6)
        _, chi = _rand_fields(7)
        kappa = 0.11
        m_psi = dsl.wilson_mat(u, psi, kappa, GEOM)
        mdag_chi = dsl.wilson_mat(u, chi, kappa, GEOM, dagger=True)
        lhs = jnp.vdot(chi, m_psi)
        rhs = jnp.vdot(mdag_chi, psi)
        np.testing.assert_allclose(complex(lhs), complex(rhs), rtol=1e-12)

    def test_gamma5_hermiticity(self):
        u, psi = _rand_fields(8)
        kappa = 0.12
        lhs = g.apply_gamma5(dsl.wilson_mat(u, g.apply_gamma5(psi), kappa, GEOM))
        rhs = dsl.wilson_mat(u, psi, kappa, GEOM, dagger=True)
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-11)


def test_memory_accountant():
    """Live-buffer byte accounting (reference malloc.cpp peak
    tracking / assertAllMemFree analogues)."""
    import gc
    import jax.numpy as jnp
    from quda_qkxtm_multigrid_tpu.utils.memory import (
        live_bytes, PeakTracker, assert_no_leak)
    base = live_bytes()
    with PeakTracker() as pt:
        a = jnp.ones((256, 1024), jnp.float32) * 2.0
        a.block_until_ready()
        pt.sample()
    assert pt.peak >= base + 1024 * 1024
    del a
    gc.collect()
    with assert_no_leak(tol_bytes=1 << 20):
        b = jnp.ones((8, 8)) + 1
        b.block_until_ready()
        del b
        gc.collect()


def test_verbosity_stack(capsys):
    from quda_qkxtm_multigrid_tpu.utils.logging import (
        Verbosity, log, push_verbosity, output_prefix, get_verbosity,
        print_params)
    from quda_qkxtm_multigrid_tpu.dirac import DiracParams
    log("summary-level", Verbosity.SUMMARIZE)
    log("debug-level", Verbosity.DEBUG_VERBOSE)
    out = capsys.readouterr().out
    assert "summary-level" in out and "debug-level" not in out
    with push_verbosity(Verbosity.DEBUG_VERBOSE):
        assert get_verbosity() == Verbosity.DEBUG_VERBOSE
        with output_prefix("MG: "):
            log("inner", Verbosity.DEBUG_VERBOSE)
    assert get_verbosity() == Verbosity.SUMMARIZE
    assert "MG: inner" in capsys.readouterr().out
    with push_verbosity(Verbosity.VERBOSE):
        print_params(DiracParams(kind="wilson", kappa=0.12))
    out = capsys.readouterr().out
    assert "kappa = 0.12" in out


def test_nan_guards():
    import pytest as _pt
    import jax.numpy as jnp
    from quda_qkxtm_multigrid_tpu.utils.guards import assert_finite
    assert_finite({"a": jnp.ones(4), "b": jnp.ones(3) + 1j}, "ok")
    with _pt.raises(FloatingPointError):
        assert_finite({"a": jnp.asarray([1.0, jnp.nan])}, "bad")
    with _pt.raises(FloatingPointError):
        assert_finite(jnp.asarray([1.0 + 1j * jnp.inf]), "badc")


def test_policy_tunecache_roundtrip(tmp_path, monkeypatch):
    """The matpc overlap-policy tunecache persists and reads back per
    (device, geom, nt, operator) — the dslash_policy autotune cache
    analogue (reference lib/tune.cpp tunecache.tsv)."""
    monkeypatch.setenv("QKXTM_RESOURCE_PATH", str(tmp_path))
    import json as _json
    from quda_qkxtm_multigrid_tpu.lattice import Geometry
    from quda_qkxtm_multigrid_tpu.utils import tunecache as tc
    from quda_qkxtm_multigrid_tpu.dirac import DiracParams, make_dirac
    from quda_qkxtm_multigrid_tpu.parallel import make_lattice_mesh
    from quda_qkxtm_multigrid_tpu.utils import rng
    import jax, jax.numpy as jnp

    geom = Geometry(8, 4, 4, 8)
    u = rng.random_gauge(jax.random.PRNGKey(0), geom,
                         dtype=jnp.complex64)
    d = make_dirac(u, DiracParams(kind="twisted-mass", kappa=0.115,
                                  mu=0.05), geom)
    mesh = make_lattice_mesh((2, 1, 1))
    assert tc.cached_matpc_policy(d, mesh) is None
    key = tc._policy_key(geom, 2, "twisted-mass", False)
    with open(tc._cache_path(), "w") as f:
        _json.dump({key: True}, f)
    assert tc.cached_matpc_policy(d, mesh) is True
