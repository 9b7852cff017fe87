"""I/O tests: LIME/ILDG gauge roundtrip (+plaquette invariance), HDF5
correlator writer trees."""

import os

import numpy as np
import jax
import pytest

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu import fields
from quda_qkxtm_multigrid_tpu.io import lime
from quda_qkxtm_multigrid_tpu.ops.gauge import plaquette
from quda_qkxtm_multigrid_tpu.utils import rng

GEOM = Geometry(4, 4, 4, 8)


class TestLime:
    def test_roundtrip(self, tmp_path):
        u = rng.random_gauge(jax.random.PRNGKey(0), GEOM)
        u_full = np.asarray(fields.gauge_to_full(u, GEOM))
        p = tmp_path / "conf.lime"
        lime.write_ildg_gauge(str(p), u_full)
        back = lime.read_ildg_gauge(str(p))
        np.testing.assert_allclose(back, u_full, atol=1e-15)

    def test_dims_inferred_and_plaquette(self, tmp_path):
        u = rng.random_gauge(jax.random.PRNGKey(1), GEOM)
        u_full = np.asarray(fields.gauge_to_full(u, GEOM))
        p = tmp_path / "conf.lime"
        lime.write_ildg_gauge(str(p), u_full)
        back = lime.read_ildg_gauge(str(p))       # dims from ildg-format
        u2 = fields.gauge_from_full(back, GEOM)
        p1 = plaquette(u, GEOM)
        p2 = plaquette(u2, GEOM)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-13)

    def test_single_precision(self, tmp_path):
        u = rng.random_gauge(jax.random.PRNGKey(2), GEOM)
        u_full = np.asarray(fields.gauge_to_full(u, GEOM))
        p = tmp_path / "conf32.lime"
        lime.write_ildg_gauge(str(p), u_full, precision=32)
        back = lime.read_ildg_gauge(str(p))
        np.testing.assert_allclose(back, u_full, atol=1e-6)


class TestHDF5:
    def test_meson_tree(self, tmp_path):
        h5py = pytest.importorskip("h5py")
        from quda_qkxtm_multigrid_tpu.io import hdf5 as h5w
        corr = np.random.randn(10, 2, GEOM.T, 2) + 1j * np.random.randn(
            10, 2, GEOM.T, 2)
        moms = [(0, 0, 0), (1, 0, 0)]
        p = tmp_path / "twop.h5"
        h5w.write_twop_mesons_hdf5(str(p), corr, moms, 1234, (1, 2, 3, 4))
        with h5py.File(p) as f:
            d = f["conf_1234/sx01sy02sz03st04/pseudoscalar/mom_xyz_+1_+0_+0"]
            np.testing.assert_allclose(d[...],
                                       np.stack([corr[0, :, :, 1].real,
                                                 corr[0, :, :, 1].imag], -1))

    def test_threep_tree(self, tmp_path):
        h5py = pytest.importorskip("h5py")
        from quda_qkxtm_multigrid_tpu.io import hdf5 as h5w
        thrp = np.random.randn(16, GEOM.T, 1) + 0j
        p = tmp_path / "thrp.h5"
        h5w.write_threep_hdf5(str(p), thrp, [(0, 0, 0)], 1, (0, 0, 0, 0),
                              tsink=6, proj="G4", thrp_type="ultra_local",
                              particle="proton")
        with h5py.File(p) as f:
            assert ("conf_0001/sx00sy00sz00st00/tsink_06/proj_G4/proton/"
                    "ultra_local/mom_xyz_+0_+0_+0") in f
