"""End-to-end workflow tests (tiny lattice, loose tolerances): the
analogue of running the reference's physics executables."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu import workflows as wf
from quda_qkxtm_multigrid_tpu.physics import threept as tp
from quda_qkxtm_multigrid_tpu.utils import rng

pytestmark = pytest.mark.slow  # full-pipeline tier; smoke: -m 'not slow'

GEOM = Geometry(4, 4, 4, 8)


@pytest.fixture(scope="module")
def twop():
    u = rng.random_gauge(jax.random.PRNGKey(0), GEOM)
    out = wf.run_twop(u, GEOM, kappa=0.115, mu=0.05, csw=1.0,
                      q_sq_max=1, ape_n=2, gauss_n=3, tol=1e-8,
                      maxiter=500)
    return u, out


class TestTwop:
    def test_pion_properties(self, twop):
        _, out = twop
        mes = np.asarray(out["mesons"])          # [10,2,T,nmom]
        izero = int(np.where((out["moms"] == 0).all(1))[0][0])
        pion = mes[0, 0, :, izero].real
        assert np.all(pion > 0)
        assert pion[1] < pion[0]

    def test_baryon_shape(self, twop):
        _, out = twop
        assert np.asarray(out["baryons"]).shape[:4] == (10, 2, 4, 4)
        assert np.isfinite(np.asarray(out["baryons"])).all()


class TestTwopMG:
    def test_mg_pair_matches_cg(self, twop):
        """MG-preconditioned UP/DN column solves reproduce the CG-based
        pion correlator (reference preconditionerUP/DN pair,
        interface_quda.cpp:6432/6502)."""
        from quda_qkxtm_multigrid_tpu.mg.multigrid import MGParams
        u, out_cg = twop
        mgp = MGParams(block=(2, 2, 2, 2), nvec=6, setup_tol=1e-4,
                       setup_maxiter=200, nu_post=4)
        out_mg = wf.run_twop(u, GEOM, kappa=0.115, mu=0.05, csw=1.0,
                             q_sq_max=1, ape_n=2, gauss_n=3, tol=1e-8,
                             maxiter=500, mg_params=mgp,
                             mg_key=jax.random.PRNGKey(3))
        assert out_mg["mg_pair"] is not None
        np.testing.assert_allclose(np.asarray(out_mg["mesons"]),
                                   np.asarray(out_cg["mesons"]),
                                   rtol=1e-4, atol=1e-8)

    def test_threep_mg(self, twop):
        from quda_qkxtm_multigrid_tpu.mg.multigrid import (
            MGParams, setup_mg_pair)
        from quda_qkxtm_multigrid_tpu.dirac import DiracParams, make_dirac
        u, out = twop
        mgp = MGParams(block=(2, 2, 2, 2), nvec=6, setup_tol=1e-4,
                       setup_maxiter=200, nu_post=4)
        d_up = make_dirac(u, DiracParams(kind="twisted-clover", kappa=0.115,
                                         mu=0.05, csw=1.0, flavor=+1), GEOM)
        d_dn = make_dirac(u, DiracParams(kind="twisted-clover", kappa=0.115,
                                         mu=0.05, csw=1.0, flavor=-1), GEOM)
        pair = setup_mg_pair(d_up, d_dn, mgp, jax.random.PRNGKey(4))
        res_mg = wf.run_threep(u, GEOM, kappa=0.115, mu=0.05, csw=1.0,
                               prop_up=out["prop_up"], prop_dn=out["prop_dn"],
                               u_ape=out["u_ape"], tsink=4,
                               projectors=("G4",), gauss_n=3, tol=1e-8,
                               maxiter=500, mg_pair=pair)
        res_cg = wf.run_threep(u, GEOM, kappa=0.115, mu=0.05, csw=1.0,
                               prop_up=out["prop_up"], prop_dn=out["prop_dn"],
                               u_ape=out["u_ape"], tsink=4,
                               projectors=("G4",), gauss_n=3, tol=1e-8,
                               maxiter=500)
        a = np.asarray(res_mg["thrp"]["G4"]["part1"]["ultra_local"])
        b = np.asarray(res_cg["thrp"]["G4"]["part1"]["ultra_local"])
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-8)


class TestThreep:
    def test_threep_runs(self, twop):
        u, out = twop
        res = wf.run_threep(u, GEOM, kappa=0.115, mu=0.05, csw=1.0,
                            prop_up=out["prop_up"], prop_dn=out["prop_dn"],
                            u_ape=out["u_ape"], tsink=4,
                            projectors=("G4",), gauss_n=3, tol=1e-8,
                            maxiter=500)
        t = res["thrp"]["G4"]
        for part in ("part1", "part2"):
            assert t[part]["ultra_local"].shape[0] == 16
            assert t[part]["noether"].shape[0] == 4
            assert t[part]["oneD"].shape[:2] == (16, 4)
            for k in t[part]:
                assert np.isfinite(np.asarray(t[part][k])).all()


class TestLoops:
    def test_loops_run(self):
        u = rng.random_gauge(jax.random.PRNGKey(5), GEOM)
        out = wf.run_loops(u, GEOM, kappa=0.115, mu=0.05, csw=0.0,
                           n_stoch=2, key=jax.random.PRNGKey(6),
                           tol=1e-7, maxiter=300)
        assert set(out) == {"Scalar", "dOp", "LpsDw", "LpsDwCv",
                            "Loops", "LoopsCv"}
        for k, v in out.items():
            assert np.isfinite(np.asarray(v)).all(), k


class TestCorrSpace:
    def test_position_space_projects_to_momentum(self, twop):
        """corr_space='position' (CORR_SPACE = POSITION_SPACE, reference
        interface_quda.cpp:6117-6151) returns full lexicographic fields
        whose momentum projection equals the momentum-space run."""
        from quda_qkxtm_multigrid_tpu.physics import contract as con
        u, out_m = twop
        out_p = wf.run_twop(u, GEOM, kappa=0.115, mu=0.05, csw=1.0,
                            q_sq_max=1, ape_n=2, gauss_n=3, tol=1e-8,
                            maxiter=500, corr_space="position")
        assert out_p["corr_space"] == "position"
        mes_lex = out_p["mesons"]                  # [10,2,T,Z,Y,X]
        assert mes_lex.shape[-4:] == (GEOM.T, GEOM.Z, GEOM.Y, GEOM.X)
        proj = con.momentum_project_dyn(
            mes_lex, GEOM, out_m["moms"],
            jnp.asarray((0, 0, 0, 0), jnp.int32))
        np.testing.assert_allclose(np.asarray(proj),
                                   np.asarray(out_m["mesons"]),
                                   rtol=2e-4, atol=2e-4)
