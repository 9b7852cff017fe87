"""Validation of the fixed-sink 3pt machinery against the reference's
index conventions: random propagator/gauge tensors contracted by
physics/threept.py (gamma-factorised) and by the independent site-loop
oracle transcribed from the reference cores
(tests/oracles/qkxtm_threept.py).  Covers the insertion-operator tables
(get_Operator 0-23), sink projectors, the local/noether/oneD fixSink
contractions, and both sequential-source kernels."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quda_qkxtm_multigrid_tpu.lattice import Geometry, gauge_to_lex
from quda_qkxtm_multigrid_tpu.physics import contract as C
from quda_qkxtm_multigrid_tpu.physics import threept as T3
from oracles import qkxtm_threept as R

GEOM = Geometry(4, 4, 4, 4)
PARTICLE = R.PROTON
PARTFLAG = 1


def _rnd_prop(key):
    shape = (2, 4, 4, 3, 3, GEOM.T, GEOM.Z, GEOM.W)
    a, b = jax.random.normal(key, (2,) + shape, jnp.float64)
    return (a + 1j * b).astype(jnp.complex128)


def _prop_lex(p):
    return np.asarray(C.corr_to_lex(jnp.moveaxis(p, 0, -4), GEOM))


@pytest.fixture(scope="module")
def fields():
    from quda_qkxtm_multigrid_tpu.utils import rng
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    seq, fwd = _rnd_prop(k1), _rnd_prop(k2)
    u = rng.random_gauge(k3, GEOM, dtype=jnp.complex128)
    u_lex = np.asarray(gauge_to_lex(u, GEOM))  # [4,T,Z,Y,X,3,3]
    u_lex = np.moveaxis(u_lex, (-2, -1), (1, 2))  # [4,3,3,T,Z,Y,X]
    return seq, fwd, u, _prop_lex(seq), _prop_lex(fwd), u_lex


@pytest.mark.parametrize("partflag", [1, 2])
@pytest.mark.parametrize("particle", [R.PROTON, R.NEUTRON])
def test_insertion_ops_match_tables(particle, partflag):
    ours = T3.insertion_ops(particle, partflag)
    for iop in range(16):
        ref = R.get_operator(iop, particle, partflag)
        np.testing.assert_allclose(np.asarray(ours[iop]), ref, atol=1e-12,
                                   err_msg=f"iop={iop}")


@pytest.mark.parametrize("pid", T3.PROJ_NAMES)
@pytest.mark.parametrize("particle", [R.PROTON, R.NEUTRON])
def test_projectors_match_tables(pid, particle):
    ours = np.asarray(T3.projector(pid, particle))
    ref = R.get_projector(pid, particle)
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_fixsink_local(fields):
    seq, fwd, u, seq_lex, fwd_lex, u_lex = fields
    ours = np.asarray(C.corr_to_lex(
        T3.fixsink_local(seq, fwd, PARTICLE, PARTFLAG), GEOM))
    ref = R.fixsink_local_ref(seq_lex, fwd_lex, PARTICLE, PARTFLAG)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-8)


def test_fixsink_noether(fields):
    seq, fwd, u, seq_lex, fwd_lex, u_lex = fields
    ours = np.asarray(C.corr_to_lex(
        T3.fixsink_noether(seq, fwd, u, GEOM, PARTICLE, PARTFLAG), GEOM))
    ref = R.fixsink_noether_ref(seq_lex, fwd_lex, u_lex, PARTICLE,
                                PARTFLAG)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-8)


def test_fixsink_oneD(fields):
    seq, fwd, u, seq_lex, fwd_lex, u_lex = fields
    ours = np.asarray(C.corr_to_lex(
        T3.fixsink_oneD(seq, fwd, u, GEOM, PARTICLE, PARTFLAG), GEOM))
    ref = R.fixsink_oneD_ref(seq_lex, fwd_lex, u_lex, PARTICLE, PARTFLAG)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-8)


@pytest.mark.parametrize("pid", ["G4", "G5G123"])
def test_seq_source_part1(fields, pid):
    seq, fwd, u, t1_full, t2_full, u_lex = fields
    t_sink = 2
    t1, t2 = t1_full[..., t_sink, :, :, :], t2_full[..., t_sink, :, :, :]
    proj = T3.projector(pid, PARTICLE)
    ours = np.asarray(T3.seq_source_part1(jnp.asarray(t1),
                                          jnp.asarray(t2), proj))
    for q in range(4):
        for s in range(3):
            ref = R.seq_source_part1_ref(t1, t2, PARTICLE, pid, q, s)
            np.testing.assert_allclose(
                ours[q, s], ref, rtol=1e-10, atol=1e-8,
                err_msg=f"column ({q},{s})")


@pytest.mark.parametrize("pid", ["G4", "G5G1"])
def test_seq_source_part2(fields, pid):
    seq, fwd, u, t1_full, t2_full, u_lex = fields
    t = t1_full[..., 2, :, :, :]
    proj = T3.projector(pid, PARTICLE)
    ours = np.asarray(T3.seq_source_part2(jnp.asarray(t), proj))
    for q in range(4):
        for s in range(3):
            ref = R.seq_source_part2_ref(t, PARTICLE, pid, q, s)
            np.testing.assert_allclose(
                ours[q, s], ref, rtol=1e-10, atol=1e-8,
                err_msg=f"column ({q},{s})")
