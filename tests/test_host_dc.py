"""Host-canonical defect correction + HBM-gated MG setup (the 48³×96
single-chip architecture, solvers/host_dc.py + mg/hbm_setup.py),
exercised at oracle volume on CPU: the inner tier runs the bf16
compact kernels in interpret mode, the outer certifies against the
c128 canonical operator — reference double-outer discipline
(interface_quda.cpp precision ladder, inv_xsd_quda.cpp)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu.dirac import DiracParams
from quda_qkxtm_multigrid_tpu.utils import rng


GEOM = Geometry(8, 8, 8, 16)
PARAMS = DiracParams(kind="twisted-clover", kappa=0.115, mu=0.05,
                     csw=1.0, use_pallas=True, pallas_bf16=True)


@pytest.fixture(scope="module")
def u_np():
    u = rng.random_gauge(jax.random.PRNGKey(7), GEOM,
                         dtype=jnp.complex64)
    return np.asarray(u)


@pytest.fixture(scope="module")
def b_np():
    from quda_qkxtm_multigrid_tpu import fields
    b = fields.point_source(GEOM, (0, 0, 0, 0), 0, 0,
                            dtype=jnp.complex128)
    return np.asarray(b)


def test_host_residual_matches_oracle(u_np, b_np):
    from quda_qkxtm_multigrid_tpu.solvers.host_dc import (
        make_host_residual)
    resid = make_host_residual(u_np, PARAMS, GEOM)
    x = np.zeros_like(b_np)
    r, rel = resid(x, b_np)
    assert rel == pytest.approx(1.0, rel=1e-12)   # x=0 → r=b
    np.testing.assert_allclose(r, b_np, rtol=0, atol=0)


def test_host_dc_compact_cg_reaches_f64_depth():
    """bf16-gauge inner CG + f64 host outer: the true residual must
    pass BELOW the bf16 operator-consistency floor (~1e-3) and the c64
    matvec floor (~3e-8) — the whole point of the architecture.
    Own small geometry (interpret-mode kernels price each restart in
    Python time — r5 smoke diet)."""
    from quda_qkxtm_multigrid_tpu import fields
    from quda_qkxtm_multigrid_tpu.compact import make_compact
    from quda_qkxtm_multigrid_tpu.solvers.host_dc import (
        make_host_residual, invert_host_dc, device_inner_compact)

    geom = Geometry(8, 4, 4, 8)
    u_np = np.asarray(rng.random_gauge(jax.random.PRNGKey(7), geom,
                                       dtype=jnp.complex64))
    b_np = np.asarray(fields.point_source(geom, (0, 0, 0, 0), 0, 0,
                                          dtype=jnp.complex128))
    cd = make_compact(jnp.asarray(u_np), PARAMS, geom, bf16=True,
                      cinv_bf16=True, interpret=True)
    resid = make_host_residual(u_np, PARAMS, geom)
    out = invert_host_dc(resid, device_inner_compact(cd, tol=1e-5,
                                                     maxiter=400),
                         b_np, tol=1e-9, max_restarts=10)
    assert out.true_res < 1e-9, out.history
    assert out.restarts <= 8
    # monotone contraction across restarts
    assert all(b < a for a, b in zip(out.history, out.history[1:]))


@pytest.mark.slow
def test_hbm_setup_mg_plus_host_dc(u_np, b_np):
    """The full 48³×96 architecture end-to-end at oracle volume:
    device-tier null vectors → host CholQR² → host canonical coarse
    build → compact-tier MG-GCR inner → f64 host-certified outer."""
    from quda_qkxtm_multigrid_tpu.mg.multigrid import MGParams
    from quda_qkxtm_multigrid_tpu.mg.hbm_setup import setup_mg_hbm
    from quda_qkxtm_multigrid_tpu.solvers.host_dc import (
        make_host_residual, invert_host_dc, device_inner_mg)

    mgp = MGParams(block=(4, 4, 4, 4), nvec=4, setup_tol=1e-3,
                   setup_maxiter=40, smoother_pc=True, nu_post=2,
                   vec_dtype="bf16")
    mg, cd, timings = setup_mg_hbm(u_np, PARAMS, GEOM, mgp,
                                   jax.random.PRNGKey(3))
    assert set(timings) >= {"build_compact_secs", "null_vectors_secs",
                            "host_ortho_secs", "host_coarse_secs",
                            "upload_secs"}
    resid = make_host_residual(u_np, PARAMS, GEOM)
    out = invert_host_dc(
        resid, device_inner_mg(mg, tol=1e-4, max_restarts=10),
        b_np, tol=1e-8, max_restarts=12)
    assert out.true_res < 1e-8, out.history
