"""Compact channel-storage operator bundle (compact.py): the 48³×96
single-chip path — prepare/CG/reconstruct/full-residual composed from
the fused channel kernels only, no complex64 gauge/clover field on
device (the sloppy-resident-gauge idea, reference
interface_quda.cpp:1039)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu.dirac import DiracParams, make_dirac
from quda_qkxtm_multigrid_tpu.compact import make_compact, invert_compact
from quda_qkxtm_multigrid_tpu.invert import invert
from quda_qkxtm_multigrid_tpu.ops.dslash_pallas import (
    _to_channels, _from_channels)
from quda_qkxtm_multigrid_tpu.utils import rng

pytestmark = pytest.mark.slow  # interpret-mode CG chains; smoke skips

GEOM = Geometry(8, 4, 4, 8)


@pytest.fixture(scope="module")
def fields():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    u = rng.random_gauge(k1, GEOM, dtype=jnp.complex64)
    b = rng.random_spinor(k2, GEOM, dtype=jnp.complex64)
    return u, b


def test_compact_tm_full_solve(fields):
    u, b = fields
    params = DiracParams(kind="twisted-mass", kappa=0.115, mu=0.05)
    d = make_dirac(u, params, GEOM)
    ref = invert(d, b, tol=1e-7, maxiter=400)
    cd = make_compact(u, params, GEOM, bf16=False)
    be = _to_channels(b[0]).astype(jnp.float32)
    bo = _to_channels(b[1]).astype(jnp.float32)
    (xe, xo), iters, (re_, ro_) = invert_compact(
        cd, be, bo, tol=1e-7, maxiter=400, interpret=True)
    x = jnp.stack([_from_channels(xe, (4, 3)),
                   _from_channels(xo, (4, 3))]).astype(b.dtype)
    rel = float(jnp.linalg.norm((x - ref.x).ravel())
                / jnp.linalg.norm(ref.x.ravel()))
    assert rel < 5e-5, rel
    rres = float(np.sqrt(np.linalg.norm(np.asarray(re_)) ** 2
                         + np.linalg.norm(np.asarray(ro_)) ** 2)
                 / np.sqrt(np.linalg.norm(np.asarray(be)) ** 2
                           + np.linalg.norm(np.asarray(bo)) ** 2))
    assert rres < 5e-6, rres


def test_compact_tmc_fixed_iters(fields):
    """tmc compact chain vs the regular fused chain at fixed maxiter
    (full convergence in interpret mode is too slow for CI; the chain
    algebra is what's under test)."""
    u, b = fields
    params = DiracParams(kind="twisted-clover", kappa=0.115, mu=0.05,
                         csw=1.0)
    d = make_dirac(u, params, GEOM)
    ref = invert(d, b, tol=1e-12, maxiter=3)
    cd = make_compact(u, params, GEOM, bf16=False)
    be = _to_channels(b[0]).astype(jnp.float32)
    bo = _to_channels(b[1]).astype(jnp.float32)
    (xe, xo), iters, _ = invert_compact(cd, be, bo, tol=1e-12,
                                        maxiter=3, interpret=True)
    x = jnp.stack([_from_channels(xe, (4, 3)),
                   _from_channels(xo, (4, 3))]).astype(b.dtype)
    rel = float(jnp.linalg.norm((x - ref.x).ravel())
                / jnp.linalg.norm(ref.x.ravel()))
    assert rel < 5e-5, rel
