"""Golden-file regression tests for the contraction engine.

The reference has no automated QKXTM tests (SURVEY.md §4: physics
executables validated offline against known correlators); here the 2pt
meson/baryon and 3pt contraction outputs on a FIXED seeded tiny lattice
are frozen to disk the first time and compared bit-for-near on every
later run — any change to gamma tables, spin factorisations, projector
algebra, or momentum phases trips these before physics users do.

Regenerate intentionally with: QKXTM_REGEN_GOLDEN=1 pytest tests/test_golden.py
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu import workflows as wf
from quda_qkxtm_multigrid_tpu.utils import rng

pytestmark = pytest.mark.slow  # full-pipeline tier; smoke: -m 'not slow'

GEOM = Geometry(4, 4, 4, 8)
GOLDEN = os.path.join(os.path.dirname(__file__), "oracles",
                      "golden_contractions.npz")
REGEN = os.environ.get("QKXTM_REGEN_GOLDEN") == "1"


@pytest.fixture(scope="module")
def results():
    u = rng.random_gauge(jax.random.PRNGKey(42), GEOM)
    out = wf.run_twop(u, GEOM, kappa=0.115, mu=0.05, csw=1.0,
                      q_sq_max=1, ape_n=2, gauss_n=3, tol=1e-10,
                      maxiter=600)
    thrp = wf.run_threep(u, GEOM, kappa=0.115, mu=0.05, csw=1.0,
                         prop_up=out["prop_up"], prop_dn=out["prop_dn"],
                         u_ape=out["u_ape"], tsink=4, projectors=("G4",),
                         gauss_n=3, tol=1e-10, maxiter=600)
    return {
        "mesons": np.asarray(out["mesons"]),
        "baryons": np.asarray(out["baryons"]),
        "thrp_ul": np.asarray(thrp["thrp"]["G4"]["part1"]["ultra_local"]),
        "thrp_noe": np.asarray(thrp["thrp"]["G4"]["part1"]["noether"]),
        "thrp_oneD": np.asarray(thrp["thrp"]["G4"]["part1"]["oneD"]),
    }


def _check(results, key):
    if REGEN:
        np.savez(GOLDEN, **results)
        pytest.skip("golden file regenerated (QKXTM_REGEN_GOLDEN=1)")
    if not os.path.exists(GOLDEN):
        pytest.fail(
            f"golden file {GOLDEN} is missing — the regression tripwire "
            "cannot run.  Restore it from git, or regenerate DELIBERATELY "
            "with QKXTM_REGEN_GOLDEN=1 after verifying the physics.")
    ref = np.load(GOLDEN)
    np.testing.assert_allclose(results[key], ref[key], rtol=1e-6,
                               atol=1e-10)


@pytest.mark.parametrize("key", ["mesons", "baryons", "thrp_ul",
                                 "thrp_noe", "thrp_oneD"])
def test_golden(results, key):
    _check(results, key)
