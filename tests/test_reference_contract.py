"""Term-by-term validation of the contraction engine against the
REFERENCE's index conventions: random 'propagator' tensors at 4^4 are
contracted both by physics/contract.py (gamma-factorised einsums) and
by the independent site-loop oracle transcribed from the reference core
loops + numeric spin tables (tests/oracles/qkxtm_contract.py,
qkxtm_tables.py).  Any sign/index divergence from the reference
gamma-structure tables fails these tests (VERDICT r1 weak-point 6)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu.physics import contract as C
from oracles import qkxtm_contract as R

GEOM = Geometry(4, 4, 4, 4)


@pytest.fixture(scope="module")
def props():
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    shape = (2, 4, 4, 3, 3, GEOM.T, GEOM.Z, GEOM.W)

    def rnd(k):
        a, b = jax.random.normal(k, (2,) + shape, jnp.float64)
        return (a + 1j * b).astype(jnp.complex128)

    up, dn = rnd(k1), rnd(k2)

    def to_lex(p):
        # [2(par),4,4,3,3,T,Z,W] -> [4,4,3,3,T,Z,Y,X]
        moved = jnp.moveaxis(p, 0, -4)
        return np.asarray(C.corr_to_lex(moved, GEOM))

    return up, dn, to_lex(up), to_lex(dn)


@pytest.fixture(scope="module")
def baryon_pair(props):
    up, dn, up_lex, dn_lex = props
    ours = np.asarray(C.corr_to_lex(C.baryon_correlators(up, dn), GEOM))
    ref = R.baryons_ref(up_lex, dn_lex)
    return ours, ref


def test_mesons_match_reference(props):
    up, dn, up_lex, dn_lex = props
    ours = np.asarray(C.corr_to_lex(C.meson_correlators(up, dn), GEOM))
    ref = R.mesons_ref(up_lex, dn_lex)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("ip", range(10))
def test_baryons_match_reference(baryon_pair, ip):
    ours, ref = baryon_pair
    scale = np.abs(ref[ip]).max()
    np.testing.assert_allclose(ours[ip], ref[ip], rtol=1e-10,
                               atol=1e-10 * scale,
                               err_msg=C.BARYON_NAMES[ip])
