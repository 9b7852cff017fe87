"""Three-point machinery tests: sequential sources and fixSink
contractions vs literal loop-transcription oracles of the reference
kernels (seqSourceFixSinkPart2, fixSinkContractions_local/oneD)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu import fields
from quda_qkxtm_multigrid_tpu.physics import threept as tp
from quda_qkxtm_multigrid_tpu.physics.contract import _EPS, _G13, corr_to_lex
from quda_qkxtm_multigrid_tpu.utils import rng

pytestmark = pytest.mark.slow  # full-pipeline tier; smoke: -m 'not slow'

GEOM = Geometry(4, 4, 4, 8)


def _rand_prop(seed):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    shape = (2, 4, 4, 3, 3) + GEOM.lat_shape
    return (jax.random.normal(k1, shape) + 1j * jax.random.normal(k2, shape))


def _rand_prop3d(seed):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    shape = (4, 4, 3, 3, GEOM.Z, GEOM.Y, GEOM.X)
    return (jax.random.normal(k1, shape) + 1j * jax.random.normal(k2, shape))


class TestProjectors:
    def test_projector_values_match_reference_listing(self):
        # spot-check G4 proton against projectors_tm_base.h literal values
        p = tp.projector("G4", tp.PROTON)
        expect = np.zeros((4, 4), complex)
        expect[0, 0] = expect[1, 1] = 0.25
        expect[2, 2] = expect[3, 3] = -0.25
        expect[0, 2] = expect[1, 3] = expect[2, 0] = expect[3, 1] = 0.25j
        np.testing.assert_allclose(p, expect, atol=1e-14)

    def test_g5g123_is_sum(self):
        s = sum(tp.projector(f"G5G{i}", tp.NEUTRON) for i in (1, 2, 3))
        np.testing.assert_allclose(tp.projector("G5G123", tp.NEUTRON), s,
                                   atol=1e-14)

    def test_insertion_op_g4_flip(self):
        # op0 ("1 -> ±i g5" in physical basis) flips with particle/part
        o_pp = tp.insertion_ops(tp.PROTON, 1)[0]
        o_np = tp.insertion_ops(tp.NEUTRON, 1)[0]
        np.testing.assert_allclose(o_pp, -o_np, atol=1e-14)
        # op1 (g1) does not flip
        np.testing.assert_allclose(tp.insertion_ops(tp.PROTON, 1)[1],
                                   tp.insertion_ops(tp.NEUTRON, 2)[1],
                                   atol=1e-14)


class TestSeqSource:
    def test_part2_vs_loop_oracle(self):
        t = np.asarray(_rand_prop3d(0))
        proj = tp.projector("G4", tp.PROTON)
        got = np.asarray(tp.seq_source_part2(jnp.asarray(t), proj))
        A, B = -_G13, _G13
        # literal transcription of seqSourceFixSinkPart2_core_Kepler.h
        ref = np.zeros_like(got)  # [q,s,n,c,Z,Y,X]
        eps_list = [(a, b, c, _EPS[a, b, c]) for a in range(3)
                    for b in range(3) for c in range(3) if _EPS[a, b, c]]
        idx = [(m, n, k, l) for m in range(4) for n in range(4)
               for k in range(4) for l in range(4)
               if abs(A[m, n] * B[k, l]) > 1e-12]
        for c1, c2, c3, s1 in eps_list:
            for c1p, c2p, c3p, s2 in eps_list:
                for (m, n, k, l) in idx:
                    val = A[m, n] * B[k, l]
                    for a in range(4):
                        for b in range(4):
                            pba = proj[b, a]
                            if abs(pba) < 1e-12:
                                continue
                            f = -s1 * s2 * val * pba
                            ref[l, c3p, n, c3] += f * (
                                t[m, b, c1, c1p] * t[a, k, c2, c2p]
                                + t[m, k, c1, c1p] * t[a, b, c2, c2p])
        np.testing.assert_allclose(got, ref, rtol=1e-9)

    def test_embed_timeslice(self):
        src = jnp.asarray(np.random.randn(4, 3, 4, 3, GEOM.Z, GEOM.Y, GEOM.X)
                          + 0j)
        full = tp.embed_timeslice(src, GEOM, 3, jnp.complex128)
        assert full.shape == (4, 3, 2, 4, 3) + GEOM.lat_shape
        # only timeslice 3 nonzero
        lex = np.asarray(fields.spinor_to_full(full[0, 0], GEOM))
        assert np.abs(lex[3]).sum() > 0
        assert np.abs(np.delete(lex, 3, axis=0)).sum() < 1e-12


class TestFixSink:
    def test_local_vs_loop_oracle(self):
        seq, fwd = _rand_prop(1), _rand_prop(2)
        got = np.asarray(corr_to_lex(
            tp.fixsink_local(seq, fwd, tp.PROTON, 1), GEOM))
        ops = tp.insertion_ops(tp.PROTON, 1)
        # oracle via independent einsum in lex layout
        def to_lex(p):
            q = jnp.moveaxis(p, (1, 2, 3, 4), (-4, -3, -2, -1))
            r = q.reshape((2, GEOM.T, GEOM.Z, GEOM.Y, GEOM.Xh, 4, 4, 3, 3))
            from quda_qkxtm_multigrid_tpu.lattice import _join_parity_sites
            return np.asarray(_join_parity_sites(r))
        s, f = to_lex(seq), to_lex(fwd)
        ref = np.einsum("onr,TZYXrmba,TZYXnmba->oTZYX", ops, f, s)
        np.testing.assert_allclose(got, ref, rtol=1e-9)

    def test_oneD_unit_gauge_is_plain_derivative(self):
        seq, fwd = _rand_prop(3), _rand_prop(4)
        u = rng.unit_gauge(GEOM)
        got = tp.fixsink_oneD(seq, fwd, u, GEOM, tp.PROTON, 1)
        assert got.shape == (16, 4, 2) + GEOM.lat_shape
        # dir = t (mu=3): D FWD = FWD(t+1) - FWD(t-1) in lex
        def to_lex(p):
            q = jnp.moveaxis(p, (1, 2, 3, 4), (-4, -3, -2, -1))
            r = q.reshape((2, GEOM.T, GEOM.Z, GEOM.Y, GEOM.Xh, 4, 4, 3, 3))
            from quda_qkxtm_multigrid_tpu.lattice import _join_parity_sites
            return np.asarray(_join_parity_sites(r))
        s, f = to_lex(seq), to_lex(fwd)
        ops = tp.insertion_ops(tp.PROTON, 1)
        df = np.roll(f, -1, axis=0) - np.roll(f, 1, axis=0)
        ds = np.roll(s, -1, axis=0) - np.roll(s, 1, axis=0)
        ref = 0.25 * (np.einsum("okl,TZYXkmba,TZYXlmba->oTZYX", ops, s, df)
                      - np.einsum("okl,TZYXkmba,TZYXlmba->oTZYX", ops, ds, f))
        got_lex = np.asarray(corr_to_lex(got[:, 3], GEOM))
        np.testing.assert_allclose(got_lex, ref, rtol=1e-9)

    def test_noether_shape_and_unit_gauge(self):
        seq, fwd = _rand_prop(5), _rand_prop(6)
        u = rng.unit_gauge(GEOM)
        got = tp.fixsink_noether(seq, fwd, u, GEOM, tp.PROTON, 1)
        assert got.shape == (4, 2) + GEOM.lat_shape
        assert np.isfinite(np.asarray(got)).all()
