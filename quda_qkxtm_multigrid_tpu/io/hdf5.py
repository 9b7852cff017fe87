"""HDF5 and ASCII correlator/loop writers with the reference's group
layout (reference qudaQKXTM_Contraction_Kepler.cpp writeTwop*HDF5
:260-460, writeThrpHDF5, loop writers qudaQKXTM_Loops_Kepler.cpp:502-700):

  /conf_%04d/sx%02dsy%02dsz%02dst%02d/<type>/mom_xyz_%+d_%+d_%+d
with per-momentum datasets [T, ...spin..., 2(re/im)] so downstream ETMC
analysis tooling finds the same tree.
"""

from __future__ import annotations

import numpy as np

try:
    import h5py
except ImportError:            # pragma: no cover
    h5py = None

from quda_qkxtm_multigrid_tpu.physics.contract import MESON_NAMES, BARYON_NAMES


def _src_tag(source):
    x, y, z, t = source
    return f"sx{x:02d}sy{y:02d}sz{z:02d}st{t:02d}"


def _ri(a):
    """complex [..] → float [.., 2]."""
    a = np.asarray(a)
    return np.stack([a.real, a.imag], axis=-1)


def write_twop_mesons_hdf5(path, corr, moms, traj: int, source):
    """corr [10(type), 2(flavor), T, nmom] complex."""
    corr = np.asarray(corr)
    with h5py.File(path, "w") as f:
        g = f.create_group(f"conf_{traj:04d}").create_group(_src_tag(source))
        for it, name in enumerate(MESON_NAMES):
            gt = g.create_group(name)
            for im, (px, py, pz) in enumerate(moms):
                gt.create_dataset(f"mom_xyz_{px:+d}_{py:+d}_{pz:+d}",
                                  data=_ri(corr[it, :, :, im]))


def write_twop_baryons_hdf5(path, corr, moms, traj: int, source):
    """corr [10(type), 2(flavor), 4, 4, T, nmom] complex."""
    corr = np.asarray(corr)
    with h5py.File(path, "w") as f:
        g = f.create_group(f"conf_{traj:04d}").create_group(_src_tag(source))
        for it, name in enumerate(BARYON_NAMES):
            gt = g.create_group(name)
            for im, (px, py, pz) in enumerate(moms):
                # [2(flavor), T, 4, 4, 2]
                block = np.moveaxis(corr[it, :, :, :, :, im], (1, 2), (2, 3))
                gt.create_dataset(f"mom_xyz_{px:+d}_{py:+d}_{pz:+d}",
                                  data=_ri(block))


def write_threep_hdf5(path, thrp, moms, traj: int, source, tsink: int,
                      proj: str, thrp_type: str, particle: str):
    """thrp: ultra_local [16, T, nmom] / noether [4, T, nmom] /
    oneD [16, 4, T, nmom] complex (reference writeThrpHDF5 tree)."""
    thrp = np.asarray(thrp)
    with h5py.File(path, "a") as f:
        root = f.require_group(f"conf_{traj:04d}").require_group(
            _src_tag(source))
        g = root.require_group(f"tsink_{tsink:02d}").require_group(
            f"proj_{proj}").require_group(particle).require_group(thrp_type)
        for im, (px, py, pz) in enumerate(moms):
            g.create_dataset(f"mom_xyz_{px:+d}_{py:+d}_{pz:+d}",
                             data=_ri(thrp[..., im]))


def write_loops_hdf5(path, loops, moms, traj: int, n_stoch: int,
                     loop_types=("Scalar", "dOp", "Loops", "LoopsCv",
                                 "LpsDw", "LpsDwCv")):
    """loops: dict name → [16(or 4,16), T, nmom] accumulated loop data
    (reference writeLoops_HDF5, qudaQKXTM_Loops_Kepler.cpp:620)."""
    with h5py.File(path, "w") as f:
        g = f.create_group(f"conf_{traj:04d}").create_group(
            f"Nstoch_{n_stoch:04d}")
        for name, arr in loops.items():
            gt = g.create_group(name)
            arr = np.asarray(arr)
            for im, (px, py, pz) in enumerate(moms):
                gt.create_dataset(f"mom_xyz_{px:+d}_{py:+d}_{pz:+d}",
                                  data=_ri(arr[..., im]))


def write_twop_ascii(path, corr, moms, kind: str):
    """Plain-text writer matching the reference's .dat layout
    (reference writeTwopMesons/BaryonsASCII): one line per
    (type, flavor, t, mom): ``it fl t px py pz re im``."""
    corr = np.asarray(corr)
    with open(path, "w") as f:
        nt = corr.shape[-2]
        for it in range(corr.shape[0]):
            for fl in range(corr.shape[1]):
                for t in range(nt):
                    for im, (px, py, pz) in enumerate(moms):
                        if corr.ndim == 4:
                            v = corr[it, fl, t, im]
                            f.write(f"{it} {fl} {t} {px:+d} {py:+d} {pz:+d} "
                                    f"{v.real:+.16e} {v.imag:+.16e}\n")
                        else:   # baryon [.., 4,4, T, nmom]
                            for s1 in range(4):
                                for s2 in range(4):
                                    v = corr[it, fl, s1, s2, t, im]
                                    f.write(
                                        f"{it} {fl} {t} {px:+d} {py:+d} "
                                        f"{pz:+d} {s1} {s2} "
                                        f"{v.real:+.16e} {v.imag:+.16e}\n")
