"""Pallas dslash kernels vs the XLA formulation (interpret mode on CPU;
the on-device numbers live in bench.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu.ops import dslash as dsl
from quda_qkxtm_multigrid_tpu.ops.dslash_pallas import dslash_parity_pallas
from quda_qkxtm_multigrid_tpu.ops.dslash_pallas2 import dslash_parity_pallas2
from quda_qkxtm_multigrid_tpu.utils import rng

GEOM = Geometry(8, 4, 4, 4)  # T=4 = 2 slabs at tb=2: halo boundary cases still crossed; interpret cost ~halved (smoke diet r5)


@pytest.fixture(scope="module")
def fields():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    u = rng.random_gauge(k1, GEOM, dtype=jnp.complex64)
    psi = rng.random_spinor(k2, GEOM, dtype=jnp.complex64)
    return u, dsl.double_gauge(u, GEOM), psi


# T=8 variant for the t-SHARDED shmap tests only: a (4,1,1) grid needs
# local T >= 2 (halo plane < local volume); everything single-device
# runs at the T=4 diet geometry above.
GEOM_T8 = Geometry(8, 4, 4, 8)


@pytest.fixture(scope="module")
def fields_t8():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    u = rng.random_gauge(k1, GEOM_T8, dtype=jnp.complex64)
    psi = rng.random_spinor(k2, GEOM_T8, dtype=jnp.complex64)
    return u, dsl.double_gauge(u, GEOM_T8), psi


@pytest.mark.parametrize("parity,dagger", [
    (0, False),
    pytest.param(0, True, marks=pytest.mark.slow),
    pytest.param(1, False, marks=pytest.mark.slow),
    pytest.param(1, True, marks=pytest.mark.slow),
])
def test_v1_matches_xla(fields, parity, dagger):
    u, ud, psi = fields
    ref = dsl.dslash_parity(u, psi[1 - parity], parity, GEOM, dagger)
    got = dslash_parity_pallas(ud, psi[1 - parity], parity, GEOM, dagger,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("parity,recon12", [
    (0, True),
    pytest.param(0, False, marks=pytest.mark.slow),
    pytest.param(1, False, marks=pytest.mark.slow),
    pytest.param(1, True, marks=pytest.mark.slow),
])
def test_v2_matches_xla(fields, parity, recon12):
    u, ud, psi = fields
    ref = dsl.dslash_parity(u, psi[1 - parity], parity, GEOM)
    got = dslash_parity_pallas2(ud, psi[1 - parity], parity, GEOM, zb=2,
                                interpret=True, recon12=recon12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("parity,recon12", [
    (0, True),
    (1, False),
    pytest.param(0, False, marks=pytest.mark.slow),
    pytest.param(1, True, marks=pytest.mark.slow),
])
def test_v5_matches_xla(fields, parity, recon12):
    from quda_qkxtm_multigrid_tpu.ops.dslash_pallas5 import (
        dslash_parity_pallas5)
    u, ud, psi = fields
    ref = dsl.dslash_parity(u, psi[1 - parity], parity, GEOM)
    got = dslash_parity_pallas5(ud, psi[1 - parity], parity, GEOM,
                                interpret=True, recon12=recon12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("dagger", [
    pytest.param(False, marks=pytest.mark.slow), True])
def test_v5_twist_xpay_epilogues(fields, dagger):
    """Fused b(1 + i a γ5) twist + xpay epilogues match the unfused
    composition (the reference's fused tm_dslash kernels,
    lib/dslash_core/tm_dslash_def.h)."""
    from quda_qkxtm_multigrid_tpu.ops.dslash_pallas5 import (
        dslash_parity_pallas5)
    from quda_qkxtm_multigrid_tpu.ops import twist as tw
    u, ud, psi = fields
    a, b = 0.17, 1.0 / (1.0 + 0.17 ** 2)
    d = dsl.dslash_parity(u, psi[1], 0, GEOM, dagger)
    g5 = jnp.asarray([1, 1, -1, -1], d.dtype).reshape(4, 1, 1, 1, 1)
    ref = psi[0] - 0.25 * (b * (d + 1j * a * g5 * d))
    got = dslash_parity_pallas5(ud, psi[1], 0, GEOM, dagger=dagger,
                                interpret=True, recon12=True,
                                twist=(a, b), xpay_coef=-0.25, x=psi[0])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("dagger", [
    pytest.param(False, marks=pytest.mark.slow), True])
def test_fused_tm_matpc(fields, dagger):
    """The fully-fused twisted-mass matpc (Dirac._matpc_pallas_tm
    composition) matches the XLA matpc, composed here with
    interpret-mode kernels."""
    from quda_qkxtm_multigrid_tpu.ops.dslash_pallas5 import (
        dslash_parity_pallas5 as v5)
    from quda_qkxtm_multigrid_tpu.ops import twist as _twist
    from quda_qkxtm_multigrid_tpu.dirac import DiracParams, make_dirac
    u, ud, psi = fields
    kappa, mu, flavor = 0.115, 0.05, +1
    d = make_dirac(u.astype(jnp.complex64),
                   DiracParams(kind="twisted-mass", kappa=kappa, mu=mu,
                               flavor=flavor), GEOM)
    ref = d.matpc(psi[0], dagger=dagger)
    # drive the PRODUCTION fused channel-domain path (interpret mode)
    from quda_qkxtm_multigrid_tpu.ops.dslash_pallas import (
        _to_channels, _from_channels)
    import dataclasses as _dc
    d_f = _dc.replace(d, u_doubled=ud,
                      params=_dc.replace(d.params, use_pallas=True))
    ch = _to_channels(psi[0]).astype(jnp.float32)
    got = _from_channels(d_f._matpc_tm_ch(ch, dagger, interpret=True),
                         (4, 3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("kind,mu,dagger", [
    ("clover", 0.0, True),
    ("twisted-clover", 0.05, False),
    pytest.param("clover", 0.0, False, marks=pytest.mark.slow),
    pytest.param("twisted-clover", 0.05, True, marks=pytest.mark.slow),
])
def test_fused_clover_matpc(fields, kind, mu, dagger):
    """Fused (twisted-)clover matpc — the chiral 6×6 A⁻¹ runs in the
    kernel epilogue (reference tmc_dslash_def.h fusion) — matches the
    XLA matpc."""
    from quda_qkxtm_multigrid_tpu.ops.dslash_pallas import (
        _to_channels, _from_channels)
    from quda_qkxtm_multigrid_tpu.dirac import DiracParams, make_dirac
    import dataclasses as _dc
    u, ud, psi = fields
    d = make_dirac(u.astype(jnp.complex64),
                   DiracParams(kind=kind, kappa=0.115, mu=mu, csw=1.0),
                   GEOM)
    ref = d.matpc(psi[0], dagger=dagger)
    d_f = _dc.replace(d, u_doubled=ud,
                      params=_dc.replace(d.params, use_pallas=True))
    ch = _to_channels(psi[0]).astype(jnp.float32)
    got = _from_channels(d_f._matpc_clover_ch(ch, dagger, interpret=True),
                         (4, 3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("grid", [(2, 1, 1), (4, 1, 1)])
def test_v5_shmap_matches_xla(fields_t8, grid):
    """Multi-chip v5 on a virtual CPU mesh: the single ppermute pair of
    t-faces must reproduce the single-device XLA result."""
    from quda_qkxtm_multigrid_tpu.ops.dslash_pallas5 import (
        dslash_parity_pallas5_shmap)
    from quda_qkxtm_multigrid_tpu.parallel import make_lattice_mesh
    u, ud, psi = fields_t8
    mesh = make_lattice_mesh(grid)
    ref = dsl.dslash_parity(u, psi[1], 0, GEOM_T8)
    got = dslash_parity_pallas5_shmap(ud, psi[1], 0, GEOM_T8, mesh,
                                      interpret=True, recon12=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_v2_bf16_close(fields):
    u, ud, psi = fields
    ref = dsl.dslash_parity(u, psi[1], 0, GEOM)
    got = dslash_parity_pallas2(ud, psi[1], 0, GEOM, zb=4, interpret=True,
                                bf16=True, recon12=True)
    rel = float(jnp.linalg.norm((got - ref).ravel())
                / jnp.linalg.norm(ref.ravel()))
    assert rel < 0.03, rel     # bf16 has ~3 decimal digits


# smoke tier keeps one (kind, dagger) representative of each; the full
# matrix runs in the slow tier (each interpret-mode case is ~3 min)
@pytest.mark.parametrize("kind,mu,dagger", [
    pytest.param("twisted-mass", 0.05, False, marks=pytest.mark.slow),
    pytest.param("twisted-clover", 0.05, False, marks=pytest.mark.slow),
    pytest.param("twisted-mass", 0.05, True, marks=pytest.mark.slow),
    ("twisted-clover", 0.05, True),
])
def test_msrc_matches_vmap_single(fields, kind, mu, dagger):
    """The multi-RHS fused matpc (dslash_ch_pallas5_msrc grid/index_map,
    source axis innermost) must equal a vmap of the single-RHS fused
    matpc column by column — this is the kernel forward_prop routes all
    production TPU propagator solves through (invertMultiSrcQuda parity,
    reference interface_quda.cpp:2546)."""
    from quda_qkxtm_multigrid_tpu.ops.dslash_pallas import (
        _to_channels, _from_channels)
    from quda_qkxtm_multigrid_tpu.dirac import DiracParams, make_dirac
    from quda_qkxtm_multigrid_tpu.utils import rng as _rng
    import dataclasses as _dc
    u, ud, psi = fields
    d = make_dirac(u.astype(jnp.complex64),
                   DiracParams(kind=kind, kappa=0.115, mu=mu,
                               csw=1.0 if kind == "twisted-clover" else 0.0),
                   GEOM)
    d_f = _dc.replace(d, u_doubled=ud,
                      params=_dc.replace(d.params, use_pallas=True))
    n_src = 3
    keys = jax.random.split(jax.random.PRNGKey(7), n_src)
    cols = jnp.stack([
        _to_channels(_rng.random_spinor(k, GEOM, dtype=jnp.complex64)[0])
        for k in keys]).astype(jnp.float32)          # [n_src, T, 24, Z, W]
    got = d_f._fused_matpc_ch_msrc(cols, dagger, interpret=True)
    ref = jnp.stack([d_f._fused_matpc_ch(cols[i], dagger, interpret=True)
                     for i in range(n_src)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5)


def test_slab_matches_v5(fields):
    """Slab-blocked grid (dslash_ch_pallas5_slab) == per-plane v5 in
    interpret mode (single config; the full epilogue matrix is asserted
    bitwise on-chip, see STATUS r2).  Also covers the t-halo plane
    index maps at the T boundary."""
    from quda_qkxtm_multigrid_tpu.ops.dslash_pallas import _to_channels
    from quda_qkxtm_multigrid_tpu.ops.dslash_pallas5 import (
        dslash_ch_pallas5, dslash_ch_pallas5_slab, gauge_channels)
    u, ud, psi = fields
    psi_ch = _to_channels(psi[1]).astype(jnp.float32)
    g_ch = gauge_channels(ud, 0, True, False)
    ref = dslash_ch_pallas5(g_ch, psi_ch, 0, GEOM, recon12=True,
                            interpret=True)
    got = dslash_ch_pallas5_slab(g_ch, psi_ch, 0, GEOM, recon12=True,
                                 interpret=True, tb=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_msrc_slab_matches_msrc(fields):
    """Multi-RHS slab grid (dslash_ch_pallas5_msrc_slab, source axis
    innermost + t-slab psi reuse) == the per-plane msrc kernel in
    interpret mode, covering the flattened [n*T] halo index maps and
    the source-invariant gauge/clover slab revisiting."""
    from quda_qkxtm_multigrid_tpu.ops.dslash_pallas import _to_channels
    from quda_qkxtm_multigrid_tpu.ops.dslash_pallas5 import (
        dslash_ch_pallas5_msrc, dslash_ch_pallas5_msrc_slab,
        gauge_channels)
    from quda_qkxtm_multigrid_tpu.utils import rng as _rng
    u, ud, psi = fields
    n_src = 2
    keys = jax.random.split(jax.random.PRNGKey(11), n_src)
    cols = jnp.stack([
        _to_channels(_rng.random_spinor(k, GEOM, dtype=jnp.complex64)[1])
        for k in keys]).astype(jnp.float32)
    g_ch = gauge_channels(ud, 0, True, False)
    kw = dict(recon12=True, interpret=True, twist=(0.2, 0.8),
              xpay_coef=-0.4, x_ch_b=cols)
    ref = dslash_ch_pallas5_msrc(g_ch, cols, 0, GEOM, **kw)
    got = dslash_ch_pallas5_msrc_slab(g_ch, cols, 0, GEOM, tb=2, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-6)


@pytest.mark.slow
def test_recon8_roundtrip(fields):
    """gauge_channels recon-8 encoding + in-kernel _mat8 decode matches
    the recon-12 kernel to f32 roundoff (closed-form derivation check,
    reference enum_quda.h:55-62 semantics)."""
    from quda_qkxtm_multigrid_tpu.ops.dslash_pallas import _to_channels
    from quda_qkxtm_multigrid_tpu.ops.dslash_pallas5 import (
        dslash_ch_pallas5, gauge_channels)
    u, ud, psi = fields
    psi_ch = _to_channels(psi[1]).astype(jnp.float32)
    g12 = gauge_channels(ud, 0, True, False)
    g8 = gauge_channels(ud, 0, False, False, recon8=True)
    ref = dslash_ch_pallas5(g12, psi_ch, 0, GEOM, recon12=True,
                            interpret=True)
    got = dslash_ch_pallas5(g8, psi_ch, 0, GEOM, recon8=True,
                            interpret=True)
    rel = float(jnp.linalg.norm((got - ref).ravel())
                / jnp.linalg.norm(ref.ravel()))
    assert rel < 1e-5, rel


# smoke tier: one projected-faces case + one epilogue case; the rest of
# the epilogue×projection matrix is slow-tier (interpret-mode cost)
@pytest.mark.parametrize("epilogue,project", [
    pytest.param("plain", False, marks=pytest.mark.slow),
    ("plain", True),
    ("twist-xpay", False),
    pytest.param("twist-xpay", True, marks=pytest.mark.slow),
    pytest.param("clover", False, marks=pytest.mark.slow),
])
def test_v5_overlap_matches_full(fields, epilogue, project):
    """Interior/exterior-split kernel (dslash_ch_pallas5_overlap_local)
    == the single t-extended kernel, faces fed from the periodic wrap
    (single-shard case).  Covers the interior parity-shift compensation
    and the static-row edge kernels for every epilogue family."""
    from quda_qkxtm_multigrid_tpu.ops.dslash_pallas import _to_channels
    from quda_qkxtm_multigrid_tpu.ops.dslash_pallas5 import (
        dslash_ch_pallas5, dslash_ch_pallas5_overlap_local,
        gauge_channels, clover_channels)
    u, ud, psi = fields
    psi_ch = _to_channels(psi[1]).astype(jnp.float32)
    g_ch = gauge_channels(ud, 0, True, False)
    kw = dict(recon12=True, interpret=True)
    if epilogue == "twist-xpay":
        kw.update(twist=(0.3, 0.9), xpay_coef=-0.5, x_ch=psi_ch)
    elif epilogue == "clover":
        from quda_qkxtm_multigrid_tpu.dirac import DiracParams, make_dirac
        d = make_dirac(u.astype(jnp.complex64),
                       DiracParams(kind="twisted-clover", kappa=0.115,
                                   mu=0.05, csw=1.0), GEOM)
        kw.update(clover="fwd", cinv_ch=clover_channels(d.clover_inv, 0,
                                                        False))
    ref = dslash_ch_pallas5(g_ch, psi_ch, 0, GEOM, **kw)
    fm, fp = psi_ch[-1:], psi_ch[:1]
    if project:
        from quda_qkxtm_multigrid_tpu.ops.dslash_pallas5 import (
            _project_face)
        fp = _project_face(fp, plus=False)          # dagger=False hop
        fm = _project_face(fm, plus=True)
    got = dslash_ch_pallas5_overlap_local(
        g_ch, psi_ch, fm, fp, 0, GEOM, faces_projected=project, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5)


# the overlap-split (2,1,1) cases are the most expensive interpret-mode
# tests in the suite (~3-4 min each) — slow tier; smoke keeps the
# single-kernel shmap form and the T_loc=2 degenerate fallback, and the
# split form is also exercised single-shard (test_v5_overlap_matches_
# full) and under shard_map by the driver dryrun (__graft_entry__).
@pytest.mark.parametrize("kind,overlap,grid", [
    ("twisted-mass", False, (2, 1, 1)),
    ("twisted-clover", True, (4, 1, 1)),
    pytest.param("twisted-clover", False, (2, 1, 1),
                 marks=pytest.mark.slow),
    pytest.param("twisted-mass", True, (4, 1, 1),
                 marks=pytest.mark.slow),
    pytest.param("twisted-mass", True, (2, 1, 1),
                 marks=pytest.mark.slow),
    pytest.param("twisted-clover", True, (2, 1, 1),
                 marks=pytest.mark.slow),
])
def test_fused_matpc_shmap(fields_t8, kind, overlap, grid):
    """Multi-chip fused matpc (whole Schur chain inside one shard_map,
    two t-face ppermute pairs per application) bit-matches the XLA
    matpc on a virtual 2-chip mesh.  overlap=True exercises the
    interior/exterior-split kernels under shard_map, incl. the
    T_loc=2 degenerate fallback at grid (4,1,1)."""
    from quda_qkxtm_multigrid_tpu.ops.dslash_pallas import (
        _to_channels, _from_channels)
    from quda_qkxtm_multigrid_tpu.dirac import DiracParams, make_dirac
    from quda_qkxtm_multigrid_tpu.parallel import make_lattice_mesh
    import dataclasses as _dc
    u, ud, psi = fields_t8
    d = make_dirac(u.astype(jnp.complex64),
                   DiracParams(kind=kind, kappa=0.115, mu=0.05,
                               csw=1.0 if kind == "twisted-clover" else 0.0),
                   GEOM_T8)
    d_f = _dc.replace(d, u_doubled=ud,
                      params=_dc.replace(d.params, use_pallas=True))
    mesh = make_lattice_mesh(grid)
    ref = d.matpc(psi[0])
    ch = _to_channels(psi[0]).astype(jnp.float32)
    got = _from_channels(
        d_f._fused_matpc_ch_shmap(ch, mesh, interpret=True,
                                  overlap=overlap), (4, 3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4)


@pytest.mark.parametrize("kind,mu,csw", [
    pytest.param("twisted-mass", 0.05, 0.0, marks=pytest.mark.slow),
    ("twisted-clover", 0.05, 1.0),
])
def test_fused_matpc_dagm(fields, kind, mu, csw):
    """4-kernel fused matpc†·matpc (the dagger pre-apply emitted as the
    forward half's second output, post_op epilogue) == XLA
    matpc(matpc(), dagger)."""
    from quda_qkxtm_multigrid_tpu.ops.dslash_pallas import (
        _to_channels, _from_channels)
    from quda_qkxtm_multigrid_tpu.dirac import DiracParams, make_dirac
    import dataclasses as _dc
    u, ud, psi = fields
    d = make_dirac(u.astype(jnp.complex64),
                   DiracParams(kind=kind, kappa=0.115, mu=mu, csw=csw),
                   GEOM)
    d_f = _dc.replace(d, u_doubled=ud,
                      params=_dc.replace(d.params, use_pallas=True))
    ref = d.matpc(d.matpc(psi[0]), dagger=True)
    ch = _to_channels(psi[0]).astype(jnp.float32)
    got = _from_channels(d_f._fused_matpc_dagm_ch(ch, interpret=True),
                         (4, 3))
    rel = float(jnp.linalg.norm((got - ref).ravel())
                / jnp.linalg.norm(ref.ravel()))
    assert rel < 2e-5, rel


@pytest.mark.slow
def test_zb_blocked_plane_kernel_matches_full_z():
    """Z-blocked per-plane kernel (grid (T, Z//zb) + 8-row z-halo
    operands — the VMEM gate for huge planes, 48³×96 measured 121.7 MB
    scoped vs the 120 MB limit on-chip r4) is bit-equal to the full-Z
    kernel across the epilogue zoo."""
    from quda_qkxtm_multigrid_tpu.lattice import Geometry
    from quda_qkxtm_multigrid_tpu.ops import dslash as dsl
    from quda_qkxtm_multigrid_tpu.ops.dslash_pallas import _to_channels
    from quda_qkxtm_multigrid_tpu.ops.dslash_pallas5 import (
        dslash_ch_pallas5, gauge_channels)
    from quda_qkxtm_multigrid_tpu.utils import rng

    geom = Geometry(8, 8, 16, 8)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    u = rng.random_gauge(k1, geom, dtype=jnp.complex64)
    g_ch = gauge_channels(dsl.double_gauge(u, geom), 0, True, False)
    psi = rng.random_spinor(k2, geom, dtype=jnp.complex64)
    p_ch = _to_channels(psi[1]).astype(jnp.float32)
    x_ch = _to_channels(rng.random_spinor(
        k3, geom, dtype=jnp.complex64)[0]).astype(jnp.float32)
    for kwargs in (dict(dagger=True),
                   dict(twist=(0.1, 0.9), xpay_coef=-0.013, x_ch=x_ch,
                        post_op=("twist", 0.1, 0.9))):
        ref = dslash_ch_pallas5(g_ch, p_ch, 0, geom, recon12=True,
                                interpret=True, **kwargs)
        got = dslash_ch_pallas5(g_ch, p_ch, 0, geom, recon12=True,
                                interpret=True, zb=8, **kwargs)
        ref = ref if isinstance(ref, tuple) else (ref,)
        got = got if isinstance(got, tuple) else (got,)
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))
