"""Multigrid tests: transfer orthonormality & adjointness, Galerkin
consistency of the explicit coarse operator (Dc == R M P), and the
2-level MG-GCR solve beating unpreconditioned GCR (mirrors reference
tests/multigrid_invert_test.cpp)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu.dirac import DiracParams, make_dirac
from quda_qkxtm_multigrid_tpu.mg.transfer import (
    BlockGeometry, Transfer, to_blocked, from_blocked, block_orthonormalize)
from quda_qkxtm_multigrid_tpu.mg.multigrid import (
    MGParams, setup_mg, mg_solve)
from quda_qkxtm_multigrid_tpu.solvers.gcr import gcr
from quda_qkxtm_multigrid_tpu.utils import rng

GEOM = Geometry(4, 4, 4, 8)
BG = BlockGeometry(GEOM, 2, 2, 2, 2, nvec=4)


def _dirac(seed=0, **kw):
    u = rng.random_gauge(jax.random.PRNGKey(seed), GEOM)
    return make_dirac(u, DiracParams(**kw), GEOM)


def _transfer(seed=1):
    from quda_qkxtm_multigrid_tpu.mg.transfer import (
        to_blocked_flat, block_orthonormalize_flat)
    vs = [rng.random_spinor(jax.random.PRNGKey(seed + i), GEOM)
          for i in range(BG.nvec)]
    v = block_orthonormalize_flat(
        jnp.stack([to_blocked_flat(x, BG) for x in vs]))
    return Transfer(v=v, bg=BG)


class TestBlocking:
    def test_blocked_roundtrip(self):
        psi = rng.random_spinor(jax.random.PRNGKey(0), GEOM)
        blk = to_blocked(psi, BG)
        assert blk.shape == BG.coarse_shape + (BG.block_volume, 4, 3)
        back = from_blocked(blk, BG)
        np.testing.assert_allclose(np.asarray(back), np.asarray(psi),
                                   atol=1e-14)

    def test_block_orthonormal(self):
        t = _transfer()
        # aggregate-major flat layout [2(ch), XC..., nvec, bdof]: inner
        # products within each (aggregate, chirality) over bdof only
        v = np.asarray(t.v_complex)
        gram = np.einsum("c...md,c...nd->cmn...", v.conj(), v)
        eye = np.eye(BG.nvec).reshape(1, BG.nvec, BG.nvec, 1, 1, 1, 1)
        np.testing.assert_allclose(gram, np.broadcast_to(eye, gram.shape),
                                   atol=1e-10)

    def test_blocked_flat_roundtrip(self):
        from quda_qkxtm_multigrid_tpu.mg.transfer import (
            to_blocked_flat, from_blocked_flat)
        psi = rng.random_spinor(jax.random.PRNGKey(4), GEOM)
        flat = to_blocked_flat(psi, BG)
        assert flat.shape == (2,) + BG.coarse_shape + (BG.block_volume * 6,)
        back = from_blocked_flat(flat, BG)
        np.testing.assert_allclose(np.asarray(back), np.asarray(psi),
                                   atol=1e-14)

    def test_restrict_prolong_adjoint(self):
        """<R psi, vc> == <psi, P vc>."""
        t = _transfer(2)
        psi = rng.random_spinor(jax.random.PRNGKey(9), GEOM)
        vc = (jax.random.normal(jax.random.PRNGKey(10),
                                (2, BG.nvec) + BG.coarse_shape)
              + 1j * jax.random.normal(jax.random.PRNGKey(11),
                                       (2, BG.nvec) + BG.coarse_shape))
        lhs = jnp.vdot(t.restrict(psi), vc)
        rhs = jnp.vdot(psi, t.prolong(vc))
        np.testing.assert_allclose(complex(lhs), complex(rhs), rtol=1e-11)

    def test_p_then_r_is_identity(self):
        """R P = identity on the coarse space (V orthonormal)."""
        t = _transfer(3)
        vc = (jax.random.normal(jax.random.PRNGKey(12),
                                (2, BG.nvec) + BG.coarse_shape)
              + 1j * jax.random.normal(jax.random.PRNGKey(13),
                                       (2, BG.nvec) + BG.coarse_shape))
        back = t.restrict(t.prolong(vc))
        np.testing.assert_allclose(np.asarray(back), np.asarray(vc),
                                   atol=1e-10)


class TestCoarseOp:
    def test_direct_build_matches_probing(self):
        """build_coarse_op_direct (calculateY analogue) reproduces the
        bipartite-probing oracle X and Y exactly."""
        from quda_qkxtm_multigrid_tpu.mg.coarse_op import (
            build_coarse_op, build_coarse_op_direct)
        from quda_qkxtm_multigrid_tpu.mg.multigrid import _level1_terms
        d = _dirac(7, kind="twisted-clover", kappa=0.12, mu=0.06, csw=1.0)
        t = _transfer(8)
        diag, hops = _level1_terms(d)
        ref = build_coarse_op(t, diag, hops, d.u.dtype)
        got = build_coarse_op_direct(t, diag, hops, d.u.dtype, batch=3)
        np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                                   atol=1e-11)
        np.testing.assert_allclose(np.asarray(got.y), np.asarray(ref.y),
                                   atol=1e-11)

    @pytest.mark.parametrize("kind,mu,csw", [
        ("wilson", 0.0, 0.0), ("twisted-clover", 0.06, 1.0)])
    def test_galerkin_consistency(self, kind, mu, csw):
        """Dc vc == R(M(P(vc))) for random vc — validates X, Y and the
        direct V†(op)V construction used by setup_mg."""
        d = _dirac(4, kind=kind, kappa=0.12, mu=mu, csw=csw)
        params = MGParams(block=(2, 2, 2, 2), nvec=4, setup_maxiter=50,
                          setup_tol=1e-3)
        mg = setup_mg(d, params, jax.random.PRNGKey(5))
        vc = (jax.random.normal(jax.random.PRNGKey(14),
                                (2, 4) + BG.coarse_shape)
              + 1j * jax.random.normal(jax.random.PRNGKey(15),
                                       (2, 4) + BG.coarse_shape))
        lhs = mg.coarse.apply(vc)
        rhs = mg.transfer.restrict(d.m(mg.transfer.prolong(vc)))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                   atol=1e-10)


class TestThreeLevel:
    def test_galerkin_level2(self):
        """coarse2 vc2 == R2(Dc(P2(vc2))) — validates the dof-generic
        CoarseTransfer and the recursive probing (reference
        lib/coarsecoarse_op.cu)."""
        d = _dirac(4, kind="twisted-mass", kappa=0.12, mu=0.05)
        params = MGParams(block=(2, 2, 2, 2), nvec=4, setup_maxiter=50,
                          setup_tol=1e-3, n_level=3,
                          block2=(1, 1, 1, 2), nvec2=3, setup2_maxiter=50)
        mg = setup_mg(d, params, jax.random.PRNGKey(21))
        assert mg.transfer2 is not None and mg.coarse2 is not None
        c2shape = (2, params.nvec2) + mg.transfer2.bg.coarse_shape
        vc2 = (jax.random.normal(jax.random.PRNGKey(22), c2shape)
               + 1j * jax.random.normal(jax.random.PRNGKey(23), c2shape))
        lhs = mg.coarse2.apply(vc2)
        rhs = mg.transfer2.restrict(mg.coarse.apply(mg.transfer2.prolong(vc2)))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                   atol=1e-10)

    def test_three_level_solve_converges(self):
        d = _dirac(6, kind="twisted-mass", kappa=0.122, mu=0.03)
        params = MGParams(block=(2, 2, 2, 2), nvec=6, setup_tol=1e-4,
                          setup_maxiter=200, nu_post=4, n_level=3,
                          block2=(1, 1, 1, 2), nvec2=4,
                          setup2_maxiter=100, coarse2_nkrylov=6)
        mg = setup_mg(d, params, jax.random.PRNGKey(7))
        b = rng.random_spinor(jax.random.PRNGKey(8), GEOM)
        out = mg_solve(mg, b, tol=1e-8, n_krylov=10, max_restarts=30)
        r = b - d.m(out.x)
        relres = float(jnp.linalg.norm(r.ravel()) / jnp.linalg.norm(b.ravel()))
        assert relres < 1e-6, relres


class TestMGSolve:
    def test_mg_gcr_converges_and_beats_plain(self):
        d = _dirac(6, kind="twisted-mass", kappa=0.122, mu=0.03)
        params = MGParams(block=(2, 2, 2, 2), nvec=6, setup_tol=1e-4,
                          setup_maxiter=200, nu_post=4)
        mg = setup_mg(d, params, jax.random.PRNGKey(7))
        b = rng.random_spinor(jax.random.PRNGKey(8), GEOM)
        out = mg_solve(mg, b, tol=1e-8, n_krylov=10, max_restarts=30)
        r = b - d.m(out.x)
        relres = float(jnp.linalg.norm(r.ravel()) / jnp.linalg.norm(b.ravel()))
        assert relres < 1e-6, relres
        plain = gcr(d.m, b, tol=1e-8, n_krylov=10, max_restarts=30)
        assert int(out.iters) <= int(plain.iters)

    @pytest.mark.parametrize("kind,mu,csw", [
        ("twisted-mass", 0.03, 0.0), ("twisted-clover", 0.03, 1.0)])
    def test_mg_gcr_pc_outer(self, kind, mu, csw):
        """The production outer (solver="gcr-pc": GCR on the even-odd
        Schur system, MG V-cycle wrapped through the Schur embedding —
        the reference's DIRECT_PC + PreconditionedSolver path,
        interface_quda.cpp:2257 / include/multigrid.h:177) reaches the
        same full-system residual as the full-operator outer, in no
        more cycles."""
        d = _dirac(6, kind=kind, kappa=0.122, mu=mu, csw=csw)
        params = MGParams(block=(2, 2, 2, 2), nvec=6, setup_tol=1e-4,
                          setup_maxiter=200, nu_post=4)
        mg = setup_mg(d, params, jax.random.PRNGKey(7))
        b = rng.random_spinor(jax.random.PRNGKey(8), GEOM)
        out = mg_solve(mg, b, tol=1e-8, n_krylov=10, max_restarts=30,
                       solver="gcr-pc")
        r = b - d.m(out.x)
        relres = float(jnp.linalg.norm(r.ravel())
                       / jnp.linalg.norm(b.ravel()))
        assert relres < 1e-6, relres
        out_full = mg_solve(mg, b, tol=1e-8, n_krylov=10,
                            max_restarts=30)
        assert int(out.iters) <= int(out_full.iters)

    def test_pc_smoother_converges(self):
        """Even-odd preconditioned smoothing (the production
        smoother_solve_type = QUDA_DIRECT_PC_SOLVE,
        CalcMG_2pt3pt_EvenOdd.cpp:419) converges at least as fast per
        V-cycle as full-operator smoothing."""
        d = _dirac(6, kind="twisted-mass", kappa=0.122, mu=0.03)
        base = dict(block=(2, 2, 2, 2), nvec=6, setup_tol=1e-4,
                    setup_maxiter=200, nu_post=4)
        b = rng.random_spinor(jax.random.PRNGKey(8), GEOM)
        mg_pc = setup_mg(d, MGParams(smoother_pc=True, **base),
                         jax.random.PRNGKey(7))
        out = mg_solve(mg_pc, b, tol=1e-8, n_krylov=10, max_restarts=30)
        r = b - d.m(out.x)
        relres = float(jnp.linalg.norm(r.ravel())
                       / jnp.linalg.norm(b.ravel()))
        assert relres < 1e-6, relres
        mg_full = setup_mg(d, MGParams(**base), jax.random.PRNGKey(7))
        out_full = mg_solve(mg_full, b, tol=1e-8, n_krylov=10,
                            max_restarts=30)
        assert int(out.iters) <= int(out_full.iters) + 2


def test_delta_mu_coarse_exact_shift():
    """The delta_mu coarse-twist knob (reference quda.h:401-407,
    multigrid.cpp:166): the coarse diagonal X built from the mu-scaled
    operator must differ from the unscaled one by EXACTLY
    i 2kappa (mu'-mu) gamma5_c (chirality-compatible blocking maps the
    fine twist term to the coarse gamma5)."""
    import dataclasses as _dc
    from quda_qkxtm_multigrid_tpu.mg.multigrid import (
        MGParams, setup_mg, _build_level1, _delta_scaled)
    from quda_qkxtm_multigrid_tpu.mg.transfer import (
        BlockGeometry, Transfer)
    u = rng.random_gauge(jax.random.PRNGKey(11), GEOM)
    kappa, mu = 0.12, 0.05
    d = make_dirac(u, DiracParams(kind="twisted-mass", kappa=kappa,
                                  mu=mu), GEOM)
    params = MGParams(block=(2, 2, 2, 2), nvec=4, setup_tol=1e-3,
                      setup_maxiter=80)
    mg = setup_mg(d, params, jax.random.PRNGKey(1))
    delta = 1.5
    d_scaled = _delta_scaled(d, delta, 1.0, 1.0)
    coarse2 = _build_level1(mg.transfer, d_scaled)
    dof = mg.coarse.bg.coarse_dof
    nv = dof // 2
    diff = np.asarray(coarse2.x - mg.coarse.x)
    shift = 2j * kappa * mu * (delta - 1.0)
    expect = np.zeros((dof, dof), complex)
    expect[np.arange(nv), np.arange(nv)] = shift
    expect[np.arange(nv, dof), np.arange(nv, dof)] = -shift
    expect = expect.reshape(dof, dof, 1)
    np.testing.assert_allclose(diff, np.broadcast_to(diff * 0 + expect,
                                                     diff.shape),
                               atol=1e-10)


def test_delta_knobs_solve():
    """MG with modest PR/coarse deltas still solves the TRUE operator."""
    from quda_qkxtm_multigrid_tpu.mg.multigrid import (
        MGParams, setup_mg, mg_solve)
    u = rng.random_gauge(jax.random.PRNGKey(12), GEOM)
    b = rng.random_spinor(jax.random.PRNGKey(13), GEOM)
    d = make_dirac(u, DiracParams(kind="twisted-mass", kappa=0.12,
                                  mu=0.05), GEOM)
    params = MGParams(block=(2, 2, 2, 2), nvec=6, setup_tol=1e-4,
                      setup_maxiter=150, nu_post=4,
                      delta_mu_coarse=1.4, delta_mu_pr=1.1)
    mg = setup_mg(d, params, jax.random.PRNGKey(2))
    out = mg_solve(mg, b, tol=1e-8, max_restarts=40)
    r = b - d.m(out.x)
    rel = float(jnp.linalg.norm(r.ravel()) / jnp.linalg.norm(b.ravel()))
    assert rel < 1e-7, rel


def test_vec_dtype_bf16_storage_tier():
    """bf16 null-vector STORAGE (MGParams.vec_dtype, the reference
    precision_null HALF analogue, quda.h:351): the coarse op is built
    from f32 vectors, the V-cycle runs on the downcast planar pair, and
    the outer still certifies to full depth."""
    from quda_qkxtm_multigrid_tpu.mg.multigrid import (
        MGParams, setup_mg, mg_solve)
    u = rng.random_gauge(jax.random.PRNGKey(7), GEOM)
    b = rng.random_spinor(jax.random.PRNGKey(8), GEOM)
    d = make_dirac(u, DiracParams(kind="twisted-mass", kappa=0.11,
                                  mu=0.3), GEOM)
    params = MGParams(block=(2, 2, 2, 2), nvec=6, setup_tol=1e-4,
                      setup_maxiter=80, smoother_pc=True,
                      outer_solver="gcr-pc", vec_dtype="bf16")
    mg = setup_mg(d, params, jax.random.PRNGKey(3))
    assert mg.transfer.v[0].dtype == jnp.bfloat16
    assert mg.transfer.v[1].dtype == jnp.bfloat16
    out = mg_solve(mg, b, tol=1e-8, max_restarts=40)
    r = b - d.m(out.x)
    rel = float(jnp.linalg.norm(r.ravel()) / jnp.linalg.norm(b.ravel()))
    assert rel < 1e-7, rel


def test_cholqr_matches_mgs_oracle():
    """The production CholQR² block orthonormalisation equals the
    sequential modified-Gram-Schmidt oracle (both are the Q of the
    positive-diagonal QR; reference BlockOrthogonalize,
    lib/transfer_util.cu:567)."""
    from quda_qkxtm_multigrid_tpu.mg.transfer import (
        block_orthonormalize, block_orthonormalize_coarse, _block_gs,
        _chiral_split)
    k = jax.random.PRNGKey(0)
    shape = (5, 2, 2, 2, 2, 16, 4, 3)
    v = (jax.random.normal(k, shape)
         + 1j * jax.random.normal(jax.random.PRNGKey(1), shape)
         ).astype(jnp.complex128)
    new = block_orthonormalize(v)
    ref = _block_gs(_chiral_split(v), axes=(-4, -2, -1)).reshape(v.shape)
    assert float(jnp.max(jnp.abs(new - ref))) < 1e-10
    shape2 = (4, 2, 2, 2, 2, 8, 2, 6)
    v2 = (jax.random.normal(k, shape2)
          + 1j * jax.random.normal(jax.random.PRNGKey(2), shape2)
          ).astype(jnp.complex128)
    new2 = block_orthonormalize_coarse(v2)
    ref2 = _block_gs(v2, axes=(-3, -1))
    assert float(jnp.max(jnp.abs(new2 - ref2))) < 1e-10


class TestFourLevel:
    def test_galerkin_level3_and_solve(self):
        """4-level MG (QUDA_MAX_MG_LEVEL, quda_constants.h:44):
        coarse3 == R3(coarse2(P3)) Galerkin consistency, and the 4-level
        preconditioned solve converges."""
        d = _dirac(4, kind="twisted-mass", kappa=0.12, mu=0.05)
        params = MGParams(block=(2, 2, 2, 2), nvec=4, setup_maxiter=50,
                          setup_tol=1e-3, n_level=4,
                          block2=(1, 1, 1, 2), nvec2=3, setup2_maxiter=50,
                          block3=(2, 1, 1, 1), nvec3=2, setup3_maxiter=30)
        mg = setup_mg(d, params, jax.random.PRNGKey(31))
        assert mg.transfer3 is not None and mg.coarse3 is not None
        c3shape = (2, params.nvec3) + mg.transfer3.bg.coarse_shape
        vc3 = (jax.random.normal(jax.random.PRNGKey(32), c3shape)
               + 1j * jax.random.normal(jax.random.PRNGKey(33), c3shape))
        lhs = mg.coarse3.apply(vc3)
        rhs = mg.transfer3.restrict(
            mg.coarse2.apply(mg.transfer3.prolong(vc3)))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                   atol=1e-10)
        geom4 = d.geom
        b = rng.random_spinor(jax.random.PRNGKey(34), geom4)
        out = mg_solve(mg, b, tol=1e-7, n_krylov=8, max_restarts=30)
        r = b - d.m(out.x)
        relres = float(jnp.linalg.norm(r.ravel())
                       / jnp.linalg.norm(b.ravel()))
        assert relres < 1e-5, relres


def test_vec_infile_outfile_roundtrip(tmp_path, monkeypatch):
    """vec_outfile saves the blocked V after setup; vec_infile skips
    generation entirely and reproduces the same preconditioner
    (reference MG::loadVectors/saveVectors, quda.h:389-393)."""
    import quda_qkxtm_multigrid_tpu.mg.multigrid as mgmod
    d = _dirac(kind="twisted-mass", kappa=0.115, mu=0.1)
    b = rng.random_spinor(jax.random.PRNGKey(9), GEOM)
    path = str(tmp_path / "nullvecs.npz")
    p_save = MGParams(block=(2, 2, 2, 2), nvec=4, setup_tol=1e-4,
                      setup_maxiter=60, vec_outfile=path)
    mg1 = setup_mg(d, p_save, jax.random.PRNGKey(3))
    out1 = mg_solve(mg1, b, tol=1e-8)

    def _boom(*a, **kw):
        raise AssertionError("vec_infile must skip generation")

    monkeypatch.setattr(mgmod, "generate_null_vectors", _boom)
    p_load = MGParams(block=(2, 2, 2, 2), nvec=4, setup_tol=1e-4,
                      setup_maxiter=60, vec_infile=path)
    mg2 = setup_mg(d, p_load, jax.random.PRNGKey(99))
    out2 = mg_solve(mg2, b, tol=1e-8)
    np.testing.assert_allclose(np.asarray(out2.x), np.asarray(out1.x),
                               rtol=0, atol=1e-10)
