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


# --- High-Momenta Form ------------------------------------------------
# The ETMC "HighMomForm" layout (reference
# writeTwopBaryonsHDF5_MomSpace_HighMomForm,
# qudaQKXTM_Contraction_Kepler.cpp:550, meson variant :1284, threep
# :2361; loops writeLoops_HDF5_HighMomForm, qudaQKXTM_Loops_Kepler.cpp
# :776): instead of one small dataset per momentum, ONE dataset per
# correlator with the momentum list as a leading-after-time axis —
# [T, Nmoms, (Mel,) 2] — plus a root-level integer dataset
# ``Momenta_list_xyz`` [Nmoms, 3] and string attributes Nmoms / Qsq /
# Correlator-info / Ensemble-info.  The time axis is ROLLED so row 0 is
# the source time (the reference writes ranks starting at src_rank).


def _mom_list_and_attrs(f, moms, q_sq, corr_info: str, meta: dict):
    moms = np.asarray(moms, np.int32)
    f.create_dataset("Momenta_list_xyz", data=moms)
    f.attrs["Nmoms"] = str(len(moms))
    f.attrs["Qsq"] = str(q_sq)
    f.attrs["Correlator-info"] = corr_info
    kappa = meta.get("kappa", 0.0)
    mu = meta.get("mu", 0.0)
    csw = meta.get("csw", 0.0)
    f.attrs["Ensemble-info"] = (f"kappa = {kappa:10.8f}\nmu = {mu:8.6f}\n"
                                f"Csw = {csw:8.6f}")


def _roll_t(a, t_axis: int, t_src: int):
    return np.roll(a, -t_src, axis=t_axis)


def write_twop_mesons_hdf5_highmom(path, corr, moms, traj: int, source,
                                   q_sq: int = 0, meta: dict = {}):
    """corr [10(type), 2(flavor), T, nmom] complex → per-meson datasets
    twop_meson_{1,2} [T, nmom, 2], t=0 at the source time."""
    corr = _roll_t(np.asarray(corr), 2, source[3])
    with h5py.File(path, "w") as f:
        g = f.create_group(f"conf_{traj:04d}").create_group(_src_tag(source))
        for it, name in enumerate(MESON_NAMES):
            gt = g.create_group(name)
            for ip in range(2):
                gt.create_dataset(f"twop_meson_{ip + 1}",
                                  data=_ri(corr[it, ip]))
        _mom_list_and_attrs(
            f, moms, q_sq,
            "Momentum-space meson 2pt-correlator\n"
            "Quark field basis: Physical\n"
            "Index Order: [t, mom-index, real/imag]", meta)


def write_twop_baryons_hdf5_highmom(path, corr, moms, traj: int, source,
                                    q_sq: int = 0, meta: dict = {}):
    """corr [10(type), 2(flavor), 4, 4, T, nmom] complex → per-baryon
    datasets twop_baryon_{1,2} [T, nmom, 16, 2] (spin row-major)."""
    corr = _roll_t(np.asarray(corr), 4, source[3])
    nt, nmom = corr.shape[4], corr.shape[5]
    with h5py.File(path, "w") as f:
        g = f.create_group(f"conf_{traj:04d}").create_group(_src_tag(source))
        for it, name in enumerate(BARYON_NAMES):
            gt = g.create_group(name)
            for ip in range(2):
                # [4,4,T,nmom] → [T,nmom,16]
                block = corr[it, ip].reshape(16, nt, nmom)
                block = np.moveaxis(block, 0, 2)
                gt.create_dataset(f"twop_baryon_{ip + 1}", data=_ri(block))
        _mom_list_and_attrs(
            f, moms, q_sq,
            "Momentum-space baryon 2pt-correlator\n"
            "Quark field basis: Physical\n"
            "Index Order: [t, mom-index, spin, real/imag]\n"
            "Spin-index order: Row-major", meta)


def write_threep_hdf5_highmom(path, thrp_by_proj, moms, traj: int, source,
                              tsink: int, q_sq: int = 0, meta: dict = {}):
    """HighMomForm 3pt tree (reference writeThrpHDF5_MomSpace_HighMomForm,
    qudaQKXTM_Contraction_Kepler.cpp:2361):
      conf/src/tsink_%02d/proj_%s/{up,down}/<type>[/dir_%02d]/threep
    with datasets [tsink+1, nmom, Mel, 2] (Mel = 16 local/oneD, 4
    noether), t=0 at the source time.

    thrp_by_proj: {proj: {"up"|"down": {"ultra_local": [16,T,nmom],
    "noether": [4,T,nmom], "oneD": [16,4,T,nmom]}}}."""
    t_src = source[3]
    with h5py.File(path, "a") as f:
        root = f.require_group(f"conf_{traj:04d}").require_group(
            _src_tag(source))
        g3 = root.require_group(f"tsink_{tsink:02d}")
        for proj, parts in thrp_by_proj.items():
            g4 = g3.require_group(f"proj_{proj}")
            for part_name, types in parts.items():
                g5 = g4.require_group(part_name)
                for tname, arr in types.items():
                    g6 = g5.require_group(tname)
                    arr = _roll_t(np.asarray(arr), -2, t_src)[...,
                                                              :tsink + 1, :]
                    if tname == "oneD":
                        for mu in range(4):
                            g7 = g6.require_group(f"dir_{mu:02d}")
                            block = np.moveaxis(arr[:, mu], 0, 2)
                            g7.create_dataset("threep", data=_ri(block))
                    else:
                        block = np.moveaxis(arr, 0, 2)   # [T',nmom,Mel]
                        g6.create_dataset("threep", data=_ri(block))
        if "Momenta_list_xyz" not in f:
            _mom_list_and_attrs(
                f, moms, q_sq,
                "Momentum-space three-point function\n"
                "Quark field basis: Physical\n"
                "Index Order: [t, mom-index, op-index, real/imag]", meta)


def write_loops_hdf5_highmom(path, loops, moms, traj: int, n_stoch: int,
                             q_sq: int = 0, meta: dict = {},
                             exact_nev: int = None, low_prec: bool = None):
    """HighMomForm loop writer (reference writeLoops_HDF5_HighMomForm,
    qudaQKXTM_Loops_Kepler.cpp:776): conf/<Nstoch_%04d|NLP_|NHP_>/
    <loop_type>[/dir_%02d]/loop datasets [T, nmom, 16, 2]; exact
    (deflation) loops hang the types directly under conf (reference
    exact_loop branch).

    loops: dict name → [16, T, nmom] or [4(dir), 16, T, nmom]."""
    with h5py.File(path, "a") as f:
        root = f.require_group(f"conf_{traj:04d}")
        if exact_nev is not None:
            g = root                             # exact loops: no Nstoch
        elif low_prec is None:
            g = root.require_group(f"Nstoch_{n_stoch:04d}")
        else:
            tag = "NLP" if low_prec else "NHP"
            g = root.require_group(f"{tag}_{n_stoch:04d}")
        for name, arr in loops.items():
            arr = np.asarray(arr)
            gt = g.require_group(name)
            if arr.ndim == 4:                    # [dir, 16, T, nmom]
                for mu in range(arr.shape[0]):
                    block = np.moveaxis(arr[mu], 0, 2)
                    gt.require_group(f"dir_{mu:02d}").create_dataset(
                        "loop", data=_ri(block))
            else:
                block = np.moveaxis(arr, 0, 2)   # [T, nmom, 16]
                gt.create_dataset("loop", data=_ri(block))
        if "Momenta_list_xyz" not in f:
            _mom_list_and_attrs(
                f, moms, q_sq,
                "Disconnected quark loops\n"
                "Index Order: [t, mom-index, gamma-index, real/imag]",
                meta)


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


# --- Position-space (CORR_SPACE = POSITION_SPACE) writers ---------------
# The reference tags position-space trees "PosSpace" where momentum
# trees carry "Qsq%d" (reference interface_quda.cpp:6367-6368) and
# allocates the full local volume per correlator (:6150-6151); HDF5
# only (ASCII position-space is explicitly unsupported, :6128-6133).


def write_twop_hdf5_posspace(path, mesons, baryons, traj: int, source):
    """mesons [10, 2(flavor), T, Z, Y, X], baryons
    [10, 2, 4, 4, T, Z, Y, X] complex → conf/src/PosSpace/<kind>/<name>/
    twop_{meson,baryon}_{1,2} datasets [T, Z, Y, X, (16,) 2]."""
    mesons = np.asarray(mesons)
    baryons = np.asarray(baryons)
    with h5py.File(path, "w") as f:
        g = f.create_group(f"conf_{traj:04d}").create_group(
            _src_tag(source)).create_group("PosSpace")
        gm = g.create_group("mesons")
        for it, name in enumerate(MESON_NAMES):
            gt = gm.create_group(name)
            for ip in range(2):
                gt.create_dataset(f"twop_meson_{ip + 1}",
                                  data=_ri(mesons[it, ip]))
        gb = g.create_group("baryons")
        for it, name in enumerate(BARYON_NAMES):
            gt = gb.create_group(name)
            for ip in range(2):
                # [4,4,T,Z,Y,X] → [T,Z,Y,X,16]
                blk = baryons[it, ip].reshape((16,) + baryons.shape[-4:])
                gt.create_dataset(f"twop_baryon_{ip + 1}",
                                  data=_ri(np.moveaxis(blk, 0, -1)))


def write_threep_hdf5_posspace(path, thrp, traj: int, source, tsink: int,
                               proj: str, thrp_type: str, particle: str):
    """thrp: ultra_local [16, T, Z, Y, X] / noether [4, T, Z, Y, X] /
    oneD [16, 4, T, Z, Y, X] complex — PosSpace 3pt tree (reference
    writeThrpHDF5 PosSpace branch)."""
    thrp = np.asarray(thrp)
    with h5py.File(path, "a") as f:
        root = f.require_group(f"conf_{traj:04d}").require_group(
            _src_tag(source)).require_group("PosSpace")
        g = root.require_group(f"tsink_{tsink:02d}").require_group(
            f"proj_{proj}").require_group(particle).require_group(thrp_type)
        if thrp.ndim == 6:                        # oneD [16,4,T,Z,Y,X]
            for mu in range(4):
                blk = np.moveaxis(thrp[:, mu], 0, -1)   # [T,Z,Y,X,16]
                g.require_group(f"dir_{mu:02d}").create_dataset(
                    "threep", data=_ri(blk))
        else:
            g.create_dataset("threep", data=_ri(np.moveaxis(thrp, 0, -1)))


# --- ASCII 3pt / loop writers -------------------------------------------


def write_threep_ascii(path_prefix, thrp, moms, t_src: int = 0,
                       tsink: int = 0):
    """ASCII 3pt writer matching the reference line formats
    (reference qudaQKXTM_Contraction_Kepler.cpp:2940-2995):
    three files <prefix>.thrp.{ultra_local,neutron?...} — here one per
    type in ``thrp`` ({"ultra_local": [16,T,nmom], "noether":
    [4,T,nmom], "oneD": [16,4,T,nmom]}); lines
        local/noether:  'iop \\t it \\t +px +py +pz \\t +re +im'
        oneD:           'iop \\t dir \\t it \\t +px +py +pz \\t +re +im'
    with the source-shifted time index and the anti-periodic
    wrap-around sign flip of the reference."""
    paths = []
    for tname, arr in thrp.items():
        arr = np.asarray(arr)
        nt = arr.shape[-2]
        sign = -1.0 if (tsink + t_src) >= nt else 1.0
        path = f"{path_prefix}.thrp.{tname}.dat"
        paths.append(path)
        with open(path, "w") as f:
            if tname == "oneD":
                for iop in range(arr.shape[0]):
                    for mu in range(arr.shape[1]):
                        for it in range(nt):
                            its = (it + t_src) % nt
                            for im, (px, py, pz) in enumerate(moms):
                                v = sign * arr[iop, mu, its, im]
                                f.write(f"{iop} \t {mu} \t {it} \t "
                                        f"{px:+d} {py:+d} {pz:+d} \t "
                                        f"{v.real:+e} {v.imag:+e}\n")
            else:
                for iop in range(arr.shape[0]):
                    for it in range(nt):
                        its = (it + t_src) % nt
                        for im, (px, py, pz) in enumerate(moms):
                            v = sign * arr[iop, its, im]
                            f.write(f"{iop} \t {it} \t "
                                    f"{px:+d} {py:+d} {pz:+d} \t "
                                    f"{v.real:+e} {v.imag:+e}\n")
    return paths


def write_loops_ascii(path_prefix, loops, moms, oneD_factor: float = 0.25):
    """ASCII loop writer matching the reference's writeLoops_ASCII
    (reference qudaQKXTM_Loops_Kepler.cpp:502-560): one file per loop
    type '<prefix>_<type>.loop'; lines
        ultra-local: 't gm +px +py +pz +re +im'        (%02d ids)
        oneD:        't gm mu +px +py +pz +re +im'  with the 0.25
    derivative normalisation applied at write time exactly as the
    reference does.  loops: dict name → [16, T, nmom] or
    [4(dir), 16, T, nmom]."""
    paths = []
    for name, arr in loops.items():
        arr = np.asarray(arr)
        path = f"{path_prefix}_{name}.loop"
        paths.append(path)
        with open(path, "w") as f:
            if arr.ndim == 4:                       # [dir, 16, T, nmom]
                for im, (px, py, pz) in enumerate(moms):
                    for t in range(arr.shape[2]):
                        for gm in range(16):
                            for mu in range(arr.shape[0]):
                                v = oneD_factor * arr[mu, gm, t, im]
                                f.write(f"{t:02d} {gm:02d} {mu:02d} "
                                        f"{px:+d} {py:+d} {pz:+d} "
                                        f"{v.real:+16.15e} "
                                        f"{v.imag:+16.15e}\n")
            else:                                   # [16, T, nmom]
                for im, (px, py, pz) in enumerate(moms):
                    for t in range(arr.shape[1]):
                        for gm in range(16):
                            v = arr[gm, t, im]
                            f.write(f"{t:02d} {gm:02d} "
                                    f"{px:+d} {py:+d} {pz:+d} "
                                    f"{v.real:+16.15e} "
                                    f"{v.imag:+16.15e}\n")
    return paths
