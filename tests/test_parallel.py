"""Multi-device tests on the 8-virtual-CPU-device mesh: sharded results
must match single-device bit-for-bit semantics (the analogue of the
reference's --partition testing, tests/test_util.cpp)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu import fields
from quda_qkxtm_multigrid_tpu.dirac import DiracParams, make_dirac
from quda_qkxtm_multigrid_tpu.invert import invert
from quda_qkxtm_multigrid_tpu.parallel import (
    make_lattice_mesh, shard_spinor, shard_gauge)
from quda_qkxtm_multigrid_tpu.parallel.mesh import shard_dirac
from quda_qkxtm_multigrid_tpu.ops import dslash as dsl
from quda_qkxtm_multigrid_tpu.utils import rng

GEOM = Geometry(4, 4, 4, 8)

GRIDS = [(8, 1, 1), (2, 2, 2), (1, 1, 8), (2, 1, 2)]
GEOM_X = Geometry(4, 8, 4, 8)    # Y=8 -> W divisible by 8 for w-grids


def _fields(seed=0, geom=GEOM):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    return rng.random_gauge(k1, geom), rng.random_spinor(k2, geom)


@pytest.mark.parametrize("grid", GRIDS)
def test_sharded_dslash_matches(grid):
    geom = GEOM_X if grid[2] > 2 else GEOM
    u, psi = _fields(0, geom)
    ref = dsl.dslash_parity(u, psi[1], 0, geom)
    mesh = make_lattice_mesh(grid)
    u_s = shard_gauge(u, mesh)
    psi_s = shard_spinor(psi, mesh)
    with jax.set_mesh(mesh):
        got = jax.jit(lambda u, p: dsl.dslash_parity(u, p[1], 0, geom))(u_s, psi_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-13)


@pytest.mark.parametrize("grid", [(2, 2, 2)])
def test_sharded_invert_matches(grid):
    u, _ = _fields(1)
    d = make_dirac(u, DiracParams(kind="twisted-clover", kappa=0.115,
                                  mu=0.08, csw=1.0), GEOM)
    b = fields.point_source(GEOM, (0, 0, 0, 0), 0, 0)
    ref = invert(d, b, tol=1e-10, maxiter=500)
    mesh = make_lattice_mesh(grid)
    d_s = shard_dirac(d, mesh)
    b_s = shard_spinor(b, mesh)
    with jax.set_mesh(mesh):
        got = jax.jit(lambda d, b: invert(d, b, tol=1e-10, maxiter=500))(d_s, b_s)
    assert float(got.true_res) < 1e-8
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x), atol=1e-9)


@pytest.mark.parametrize("grid", [(2, 2, 1)])
@pytest.mark.parametrize("solver", ["gcr", "gcr-pc"])
def test_sharded_mg_solve_matches(grid, solver):
    """MG outer solve with the replicated-coarse V-cycle on a mesh
    matches the single-device solve (coarse-level resharding,
    SURVEY.md §7 hard-part 3) — both the full-operator GCR outer and
    the production even-odd gcr-pc outer (_gcr_step_pc_sharded)."""
    from quda_qkxtm_multigrid_tpu.mg.multigrid import (MGParams, setup_mg,
                                                       mg_solve)
    u, b = _fields(3)
    d = make_dirac(u, DiracParams(kind="twisted-mass", kappa=0.122,
                                  mu=0.03), GEOM)
    params = MGParams(block=(2, 2, 2, 2), nvec=6, setup_tol=1e-4,
                      setup_maxiter=200, nu_post=4)
    mg = setup_mg(d, params, jax.random.PRNGKey(7))
    ref = mg_solve(mg, b, tol=1e-8, max_restarts=30, solver=solver)

    mesh = make_lattice_mesh(grid)
    import dataclasses as _dc
    mg_s = _dc.replace(mg, dirac=shard_dirac(d, mesh))
    b_s = shard_spinor(b, mesh)
    with jax.set_mesh(mesh):
        got = mg_solve(mg_s, b_s, tol=1e-8, max_restarts=30, mesh=mesh,
                       solver=solver)
    r = b - d.m(got.x)
    relres = float(jnp.linalg.norm(r.ravel()) / jnp.linalg.norm(b.ravel()))
    assert relres < 1e-6, relres
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               atol=1e-7)


@pytest.mark.parametrize("grid", [(2, 2, 1)])
def test_schwarz_preconditioned_gcr(grid):
    """Additive-Schwarz DD preconditioner (reference quda.h:250 Schwarz
    types): shard-local MR blocks, zero comms in the preconditioner —
    GCR with it must converge and beat unpreconditioned GCR."""
    from quda_qkxtm_multigrid_tpu.parallel.schwarz import schwarz_precond
    from quda_qkxtm_multigrid_tpu.solvers.gcr import gcr
    u, b = _fields(5)
    d = make_dirac(u, DiracParams(kind="twisted-mass", kappa=0.12,
                                  mu=0.04), GEOM)
    mesh = make_lattice_mesh(grid)
    d_s = shard_dirac(d, mesh)
    b_s = shard_spinor(b, mesh)
    with jax.set_mesh(mesh):
        out = jax.jit(lambda d, b: gcr(d.m, b, tol=1e-8, n_krylov=10,
                                       max_restarts=40,
                                       precond=schwarz_precond(d, mesh,
                                                               niter=4))
                      )(d_s, b_s)
        plain = jax.jit(lambda d, b: gcr(d.m, b, tol=1e-8, n_krylov=10,
                                         max_restarts=40))(d_s, b_s)
    r = b - d.m(out.x)
    rel = float(jnp.linalg.norm(r.ravel()) / jnp.linalg.norm(b.ravel()))
    assert rel < 1e-6, rel
    assert int(out.iters) < int(plain.iters)


def test_mesh_too_large_raises():
    with pytest.raises(ValueError):
        make_lattice_mesh((4, 4, 4))


@pytest.mark.parametrize("grid", [(2, 2, 1)])
def test_multiplicative_schwarz(grid):
    """Multiplicative (two-color) Schwarz (reference quda.h:250
    QUDA_MULTIPLICATIVE_SCHWARZ): converges under GCR and needs no more
    iterations than the additive sweep."""
    from quda_qkxtm_multigrid_tpu.parallel.schwarz import (
        schwarz_precond, schwarz_precond_multiplicative)
    from quda_qkxtm_multigrid_tpu.solvers.gcr import gcr
    u, b = _fields(5)
    d = make_dirac(u, DiracParams(kind="twisted-mass", kappa=0.12,
                                  mu=0.04), GEOM)
    mesh = make_lattice_mesh(grid)
    d_s = shard_dirac(d, mesh)
    b_s = shard_spinor(b, mesh)
    with jax.set_mesh(mesh):
        out_m = jax.jit(lambda d, b: gcr(
            d.m, b, tol=1e-8, n_krylov=10, max_restarts=40,
            precond=schwarz_precond_multiplicative(d, mesh, niter=4))
        )(d_s, b_s)
        out_a = jax.jit(lambda d, b: gcr(
            d.m, b, tol=1e-8, n_krylov=10, max_restarts=40,
            precond=schwarz_precond(d, mesh, niter=4)))(d_s, b_s)
    r = b - d.m(out_m.x)
    rel = float(jnp.linalg.norm(r.ravel()) / jnp.linalg.norm(b.ravel()))
    assert rel < 1e-6, rel
    assert int(out_m.iters) <= int(out_a.iters)


def test_fused_invert_sharded():
    """Production sharded solve on the FUSED Pallas path (invert with
    mesh=...): matches the single-device fused solve iterate-for-
    iterate at fixed maxiter (VERDICT r1 next-step 5)."""
    import dataclasses as _dc
    from quda_qkxtm_multigrid_tpu.invert import invert
    from quda_qkxtm_multigrid_tpu.ops import dslash as _dsl
    u, b = _fields(3)
    u = u.astype(jnp.complex64)
    b = b.astype(jnp.complex64)
    d = make_dirac(u, DiracParams(kind="twisted-mass", kappa=0.115,
                                  mu=0.05, use_pallas=True), GEOM)
    d = _dc.replace(d, u_doubled=_dsl.double_gauge(u, GEOM))
    mesh = make_lattice_mesh((2, 1, 1))
    d_s = shard_dirac(d, mesh)
    b_s = shard_spinor(b, mesh)
    # single-device reference on the XLA path (the CPU tier cannot run
    # the single-chip Pallas kernels outside interpret mode; the fused
    # shmap matpc itself is asserted against the XLA matpc in
    # test_pallas.test_fused_matpc_shmap)
    d_ref = _dc.replace(d, params=_dc.replace(d.params, use_pallas=False))
    ref = invert(d_ref, b, tol=1e-12, maxiter=2)
    with jax.set_mesh(mesh):
        got = invert(d_s, b_s, tol=1e-12, maxiter=2, mesh=mesh)
    np.testing.assert_allclose(np.asarray(jnp.real(got.x)),
                               np.asarray(jnp.real(ref.x)), atol=1e-5)
    np.testing.assert_allclose(float(got.true_res), float(ref.true_res),
                               rtol=1e-3)


@pytest.mark.slow
def test_run_loops_sharded():
    """Sharded disconnected-loops workflow: run_loops on a (2,2,1)
    virtual mesh equals the single-device result (the Z4 noise is
    key-deterministic, so the sharded solve chain + one-end trick +
    FFT momentum projection must reproduce bit-equivalent loops)."""
    from quda_qkxtm_multigrid_tpu.workflows import run_loops
    from quda_qkxtm_multigrid_tpu.utils import rng
    geom = Geometry(4, 4, 4, 8)
    u = rng.random_gauge(jax.random.PRNGKey(11), geom,
                         dtype=jnp.complex128)
    kw = dict(kappa=0.115, mu=0.05, csw=0.0, n_stoch=1,
              key=jax.random.PRNGKey(12), tol=1e-8, maxiter=300)
    ref = run_loops(u, geom, **kw)
    mesh = make_lattice_mesh((2, 2, 1))
    with jax.set_mesh(mesh):
        got = run_loops(u, geom, mesh=mesh, **kw)
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]),
                                   np.asarray(ref[k]), atol=1e-9,
                                   err_msg=k)


@pytest.mark.slow
def test_run_threep_sharded():
    """Sharded fixed-sink 3pt workflow: run_threep on a (2,2,1) virtual
    mesh equals the single-device result (sequential solves, fixSink
    local/noether/oneD insertions, spatial momentum reduction)."""
    from quda_qkxtm_multigrid_tpu.workflows import run_threep
    from quda_qkxtm_multigrid_tpu.ops.smear import ape_smear
    from quda_qkxtm_multigrid_tpu.utils import rng
    geom = Geometry(4, 4, 4, 8)
    key = jax.random.PRNGKey(13)
    k1, k2, k3 = jax.random.split(key, 3)
    u = rng.random_gauge(k1, geom, dtype=jnp.complex128)
    u_ape = ape_smear(u, geom, 0.5, 2)
    # random forward propagators suffice for an equality check of the
    # sequential-source/solve/contraction chain
    shape = (2, 4, 4, 3, 3, geom.T, geom.Z, geom.W)
    pu = (jax.random.normal(k2, shape) +
          1j * jax.random.normal(k3, shape)) * 0.1
    pd = jnp.conj(pu)
    kw = dict(kappa=0.115, mu=0.05, csw=0.0, prop_up=pu, prop_dn=pd,
              u_ape=u_ape, tsink=4, projectors=("G4",), gauss_n=2,
              tol=1e-7, maxiter=300)
    ref = run_threep(u, geom, **kw)
    mesh = make_lattice_mesh((2, 2, 1))
    with jax.set_mesh(mesh):
        got = run_threep(u, geom, mesh=mesh, **kw)
    for part in ("part1", "part2"):
        for k in ("ultra_local", "noether", "oneD"):
            np.testing.assert_allclose(
                np.asarray(got["thrp"]["G4"][part][k]),
                np.asarray(ref["thrp"]["G4"][part][k]),
                atol=1e-8, err_msg=f"{part}/{k}")


@pytest.mark.slow
def test_run_twop_sharded():
    """Sharded 2pt workflow (VERDICT r1 next-step 8): run_twop on a
    (2,2,1) virtual mesh equals the single-device result — exercises
    sharded solves, timeslice contraction maps and the spatial-axes
    momentum reduction (time-slice communicator analogue, reference
    qudaQKXTM_Kepler_utils.cpp:40-61)."""
    from quda_qkxtm_multigrid_tpu.workflows import run_twop
    from quda_qkxtm_multigrid_tpu.utils import rng
    geom = Geometry(4, 4, 4, 8)
    u = rng.random_gauge(jax.random.PRNGKey(9), geom,
                         dtype=jnp.complex128)
    kw = dict(kappa=0.115, mu=0.05, csw=0.0, q_sq_max=0, ape_n=2,
              gauss_n=2, tol=1e-9, maxiter=300)
    ref = run_twop(u, geom, **kw)
    mesh = make_lattice_mesh((2, 2, 1))
    with jax.set_mesh(mesh):
        got = run_twop(u, geom, mesh=mesh, **kw)
    np.testing.assert_allclose(np.asarray(got["mesons"]),
                               np.asarray(ref["mesons"]), atol=1e-9)
    np.testing.assert_allclose(np.asarray(got["baryons"]),
                               np.asarray(ref["baryons"]), atol=1e-9)
