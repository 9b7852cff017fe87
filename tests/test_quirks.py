"""Backend-quirk contract tests (utils/backend_quirks.py): every
workaround helper is correct on ANY backend, so call sites carry no
branching; scripts/quirk_probe.py detects on the real chip when a
backend upgrade retires a quirk (VERDICT r2 weak #7)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quda_qkxtm_multigrid_tpu.utils.backend_quirks import (
    resid_with_norm, norm2, batched_normal_draw, jit_stack, jit_concat,
    fetch_complex, assert_split_programs)


def test_resid_with_norm_matches_numpy():
    v = (jax.random.normal(jax.random.PRNGKey(0), (16, 8))
         + 1j * jax.random.normal(jax.random.PRNGKey(1), (16, 8))
         ).astype(jnp.complex64)
    r, n2 = resid_with_norm(v)
    np.testing.assert_allclose(np.asarray(jnp.real(r)),
                               np.asarray(jnp.real(v)))
    ref = float(np.sum(np.abs(np.asarray(jnp.real(v))) ** 2
                       + np.abs(np.asarray(jnp.imag(v))) ** 2))
    assert abs(float(n2) - ref) < 1e-3 * ref
    assert abs(norm2(v) - ref) < 1e-3 * ref


def test_batched_normal_draw_layout_and_determinism():
    key = jax.random.PRNGKey(7)
    a = batched_normal_draw(key, (3, 4, 8), jnp.complex64)
    b = batched_normal_draw(key, (3, 4, 8), jnp.complex64)
    assert a.shape == (3, 4, 8) and a.dtype == jnp.complex64
    np.testing.assert_array_equal(fetch_complex(a), fetch_complex(b))
    # distinct keys -> distinct draws
    c = batched_normal_draw(jax.random.PRNGKey(8), (3, 4, 8),
                            jnp.complex64)
    assert not np.allclose(fetch_complex(a), fetch_complex(c))


def test_jit_structural_ops():
    v = batched_normal_draw(jax.random.PRNGKey(0), (4, 8), jnp.complex64)
    s = jit_stack([v, v])
    assert s.shape == (2, 4, 8)
    c = jit_concat([v, v])
    assert c.shape == (8, 8)
    assert jit_concat([v]).shape == (4, 8)


def test_fetch_complex_roundtrip():
    v = batched_normal_draw(jax.random.PRNGKey(3), (5, 6), jnp.complex64)
    host = fetch_complex(v)
    assert host.dtype == np.complex64 or host.dtype == np.complex128
    re, im = jax.jit(lambda x: (jnp.real(x), jnp.imag(x)))(v)
    np.testing.assert_allclose(host.real, np.asarray(re))
    np.testing.assert_allclose(host.imag, np.asarray(im))
    # real arrays pass through
    r = jnp.ones((3,), jnp.float32)
    np.testing.assert_array_equal(fetch_complex(r), np.ones((3,)))


def test_assert_split_programs():
    f = jax.jit(lambda x: x)
    g = jax.jit(lambda x: x + 1)
    assert assert_split_programs(f, g) == (f, g)
    with pytest.raises(ValueError, match="Q4"):
        assert_split_programs(f, f)


def test_mg_solve_keeps_q4_split():
    """The production MG outer must keep its residual and correction
    programs separate (the Q4 contract) — guard against a refactor
    fusing them."""
    from quda_qkxtm_multigrid_tpu.mg import multigrid as mgm
    assert_split_programs(mgm._mr_resid, mgm._gcr_step)
    assert_split_programs(mgm._pc_resid, mgm._gcr_step_pc)


def test_q5_tile_exact_contract():
    """Q5: big boundary arrays must be <= 3 axes with a tile-exact
    minor pair (mg/transfer cholqr_pass production shapes pass; the
    shapes that OOMed on-chip fail)."""
    import pytest
    from quda_qkxtm_multigrid_tpu.utils.backend_quirks import (
        assert_tile_exact)
    # production cholqr_pass shape at 32^3x64 (A, n, d)
    assert_tile_exact((16384, 24, 1536), min_bytes_hint=0)
    # small arrays exempt regardless of shape
    assert_tile_exact((3, 5, 7, 9), min_bytes_hint=1 << 30)
    # the 7-axis stacked form that kept acquiring 8x-padded layouts
    with pytest.raises(ValueError):
        assert_tile_exact((24, 2, 16, 8, 8, 8, 1536), min_bytes_hint=0)
    # a [..., 2, 1536] boundary pads the 2-axis to 8
    with pytest.raises(ValueError):
        assert_tile_exact((16384, 2, 1536), min_bytes_hint=0)
