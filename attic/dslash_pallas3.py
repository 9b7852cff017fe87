"""Pallas TPU Wilson-Dslash kernel, v3: pre-sliced z-edges + multi-chip.

Two changes over v2 (ops/dslash_pallas2.py):

  * the z±1 neighbour rows come from a dedicated pre-sliced edge array
    [T, 24, 2·nz, W] (2 rows per z-block) instead of two FULL z±1 psi
    blocks — HBM traffic drops from ~5 psi blocks/site to ~3 + 2/zb,
    i.e. ~-35% of the bandwidth-bound kernel's bytes
  * a `shard_map` wrapper (dslash_parity_pallas_shmap) that runs the
    SAME kernel on a ("t","z")-sharded lattice: the t-halo slices and
    the z boundary edge rows arrive by `lax.ppermute` over the mesh —
    the TPU-native form of the reference's pack/gather/MPI/scatter
    pipeline (reference lib/dslash_pack.cu, lib/face_buffer.cpp,
    lib/dslash_policy.cuh; SURVEY.md §2.10.1/3)

Operand conventions as v2: planar re/im channels, doubled gauge
(both hop directions resident per site, so gauge needs NO halo),
recon-12 / bf16 tiers.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu.ops.dslash_pallas import (
    _to_channels, _from_channels)
from quda_qkxtm_multigrid_tpu.ops.dslash_pallas2 import _proj_rank2


def _kernel_v3(geom: Geometry, dagger: bool, zb: int, parity: int,
               recon12: bool = False, bf16: bool = False):
    """Grid (T, Z/zb).  Inputs: psi center/t+1/t-1 blocks (index-mapped
    aliases), z-edge block [1, 24, 2, W] (row 0 = z+1 edge, row 1 = z-1
    edge), gauge block.  Masks computed in-kernel; valid for any even
    global offset of the local block (multi-chip shards)."""
    Xh, W = geom.Xh, geom.W

    def kernel(psi_c, psi_tp, psi_tm, zedge, g_ref, out_ref):
        jgrid = pl.program_id(1)
        t_idx = pl.program_id(0)
        zloc = jax.lax.broadcasted_iota(jnp.int32, (zb, W), 0)
        wlane = jax.lax.broadcasted_iota(jnp.int32, (zb, W), 1)
        z_glob = zloc + jgrid * zb
        y = wlane // Xh
        k = wlane - y * Xh
        s0 = ((t_idx + z_glob + y + parity) % 2) == 0
        k_last = k == Xh - 1
        k_first = k == 0

        def _ld(ref, idx):
            v = ref[0, idx]
            return v.astype(jnp.float32) if bf16 else v

        def psi(ref, s, c, ri):
            return _ld(ref, (s * 3 + c) * 2 + ri)

        nrows = 2 if recon12 else 3
        _row2_cache = {}

        def _gauge_row2(d, fb):
            key = (d, fb)
            if key not in _row2_cache:
                def g2(a, b, ri):
                    return _ld(g_ref, (((d * 2 + fb) * nrows + a) * 3 + b) * 2 + ri)
                row = []
                for c in range(3):
                    b1, b2 = (c + 1) % 3, (c + 2) % 3
                    ar, ai = g2(0, b1, 0), g2(0, b1, 1)
                    br, bi = g2(1, b2, 0), g2(1, b2, 1)
                    cr_, ci_ = g2(0, b2, 0), g2(0, b2, 1)
                    dr, di = g2(1, b1, 0), g2(1, b1, 1)
                    re = (ar * br - ai * bi) - (cr_ * dr - ci_ * di)
                    im = (ar * bi + ai * br) - (cr_ * di + ci_ * dr)
                    row.append((re, -im))
                _row2_cache[key] = row
            return _row2_cache[key]

        def gauge(d, fb, a, b, ri):
            if recon12 and a == 2:
                return _gauge_row2(d, fb)[b][ri]
            return _ld(g_ref, (((d * 2 + fb) * nrows + a) * 3 + b) * 2 + ri)

        def shift_y(v, forward):
            return pltpu.roll(v, (W - Xh) if forward else Xh, axis=1)

        def shift_x(v, forward):
            if forward:
                wrap = pltpu.roll(v, Xh - 1, axis=1)
                near = pltpu.roll(v, W - 1, axis=1)
                odd = jnp.where(k_last, wrap, near)
                return jnp.where(s0, v, odd)
            else:
                wrap = pltpu.roll(v, W - (Xh - 1), axis=1)
                near = pltpu.roll(v, 1, axis=1)
                even = jnp.where(k_first, wrap, near)
                return jnp.where(s0, even, v)

        def shift_z(ch, forward):
            s, c, ri = ch
            v = psi(psi_c, *ch)
            row = (s * 3 + c) * 2 + ri
            if forward:
                edge = zedge[0, 0:1, row]        # z+1 edge row, [1, W]
                if bf16:
                    edge = edge.astype(jnp.float32)
                return jnp.concatenate([v[1:], edge], axis=0)
            else:
                edge = zedge[0, 1:2, row]        # z-1 edge row, [1, W]
                if bf16:
                    edge = edge.astype(jnp.float32)
                return jnp.concatenate([edge, v[:zb - 1]], axis=0)

        def neighbor(mu, forward, s, c, ri):
            ch = (s, c, ri)
            if mu == 3:
                return psi(psi_tp if forward else psi_tm, *ch)
            if mu == 2:
                return shift_z(ch, forward)
            v = psi(psi_c, *ch)
            return shift_y(v, forward) if mu == 1 else shift_x(v, forward)

        def cmul_const(cr, ci, vr, vi):
            if ci == 0.0:
                if cr == 1.0:
                    return vr, vi
                if cr == -1.0:
                    return -vr, -vi
                return cr * vr, cr * vi
            if cr == 0.0:
                if ci == 1.0:
                    return -vi, vr
                if ci == -1.0:
                    return vi, -vr
                return -ci * vi, ci * vr
            return cr * vr - ci * vi, cr * vi + ci * vr

        acc = [[None, None] for _ in range(12)]
        for mu in range(4):
            for fb, (fwd, plus) in enumerate(((True, dagger),
                                              (False, not dagger))):
                upper, recon = _proj_rank2(mu, plus)
                nb = [[(neighbor(mu, fwd, t, c, 0),
                        neighbor(mu, fwd, t, c, 1))
                       for c in range(3)] for t in range(4)]
                h = [[None, None, None] for _ in range(2)]
                for s in (0, 1):
                    for (t, coef) in upper[s]:
                        for c in range(3):
                            term = cmul_const(coef.real, coef.imag,
                                              *nb[t][c])
                            cur = h[s][c]
                            h[s][c] = term if cur is None else (
                                cur[0] + term[0], cur[1] + term[1])
                uh = [[None, None, None] for _ in range(2)]
                for s in (0, 1):
                    for a in range(3):
                        tr = ti = None
                        for b in range(3):
                            if fb == 0:
                                ur = gauge(mu, 0, a, b, 0)
                                ui = gauge(mu, 0, a, b, 1)
                            else:
                                ur = gauge(mu, 1, b, a, 0)
                                ui = -gauge(mu, 1, b, a, 1)
                            vr, vi = h[s][b]
                            pr = ur * vr - ui * vi
                            pi = ur * vi + ui * vr
                            tr = pr if tr is None else tr + pr
                            ti = pi if ti is None else ti + pi
                        uh[s][a] = (tr, ti)
                for s in range(4):
                    if s < 2:
                        src_row, coef = s, 1.0 + 0j
                    else:
                        src_row, coef = recon[s - 2]
                    for a in range(3):
                        vr, vi = uh[src_row][a]
                        tr, ti = cmul_const(coef.real, coef.imag, vr, vi)
                        kk = s * 3 + a
                        if acc[kk][0] is None:
                            acc[kk] = [tr, ti]
                        else:
                            acc[kk][0] = acc[kk][0] + tr
                            acc[kk][1] = acc[kk][1] + ti

        for kk in range(12):
            out_ref[0, 2 * kk] = acc[kk][0]
            out_ref[0, 2 * kk + 1] = acc[kk][1]

    return kernel


def _zedge_rows(psi_ch, zb, recv_p=None, recv_m=None):
    """Build [T, 2*nz, 24, W] edge rows for nz z-blocks of height zb
    (block j occupies rows [2j, 2j+1]: its z+1 edge then its z-1 edge;
    the 24-channel axis sits second-to-last to satisfy the Mosaic
    sublane-divisibility constraint on the (1, 2, 24, W) block).
    recv_p / recv_m replace the wrap rows at the shard boundary (from
    the z±1 neighbour shards via ppermute)."""
    Z = psi_ch.shape[2]
    nz = Z // zb
    idx_p = [((j + 1) * zb) % Z for j in range(nz)]
    idx_m = [(j * zb - 1) % Z for j in range(nz)]
    rows_p = psi_ch[:, :, jnp.asarray(idx_p)]          # [T,24,nz,W]
    rows_m = psi_ch[:, :, jnp.asarray(idx_m)]
    if recv_p is not None:
        rows_p = jnp.concatenate([rows_p[:, :, :-1], recv_p], axis=2)
    if recv_m is not None:
        rows_m = jnp.concatenate([recv_m, rows_m[:, :, 1:]], axis=2)
    rows_p = jnp.swapaxes(rows_p, 1, 2)                # [T,nz,24,W]
    rows_m = jnp.swapaxes(rows_m, 1, 2)
    inter = jnp.stack([rows_p, rows_m], axis=2)        # [T,nz,2,24,W]
    return inter.reshape(inter.shape[0], 2 * nz, *inter.shape[3:])


def _call_kernel(psi_ch, zedges, g_ch, geom_local: Geometry, parity: int,
                 dagger: bool, zb: int, recon12: bool, bf16: bool,
                 interpret: bool, psi_tp=None, psi_tm=None):
    """Invoke the v3 pallas kernel on LOCAL blocks.  psi_tp/psi_tm
    default to wrap-around aliases of psi_ch (single chip); the sharded
    path passes slices of the t-extended array."""
    T, Z, W = geom_local.T, geom_local.Z, geom_local.W
    nz = Z // zb
    ng = 96 if recon12 else 144
    kernel = _kernel_v3(geom_local, dagger, zb, parity, recon12, bf16)

    if psi_tp is None:
        ins = (psi_ch, psi_ch, psi_ch)
        im_tp = lambda i, j: ((i + 1) % T, 0, j, 0)
        im_tm = lambda i, j: ((i - 1) % T, 0, j, 0)
    else:
        ins = (psi_ch, psi_tp, psi_tm)
        im_tp = lambda i, j: (i, 0, j, 0)
        im_tm = lambda i, j: (i, 0, j, 0)

    im_c = lambda i, j: (i, 0, j, 0)
    im_edge = lambda i, j: (i, j, 0, 0)
    pspec = lambda im: pl.BlockSpec((1, 24, zb, W), im,
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(T, nz),
        in_specs=[pspec(im_c), pspec(im_tp), pspec(im_tm),
                  pl.BlockSpec((1, 2, 24, W), im_edge,
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, ng, zb, W), im_c,
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 24, zb, W), im_c,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 24, Z, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*ins, zedges, g_ch)


@partial(jax.jit, static_argnames=("parity", "geom", "dagger", "zb",
                                   "interpret", "recon12", "bf16"))
def dslash_parity_pallas3(ud, psi_opp, parity: int, geom: Geometry,
                          dagger: bool = False, zb: int = 8,
                          interpret: bool = False, recon12: bool = False,
                          bf16: bool = False):
    """Single-chip v3: same semantics as dslash_parity_pallas2."""
    Z = geom.Z
    if bf16 and zb < 16:
        zb = 16
    if Z % zb:
        zb = Z
    cdt = jnp.bfloat16 if bf16 else jnp.float32
    psi_ch = _to_channels(psi_opp).astype(cdt)
    g = ud[:, parity][:, :, :2] if recon12 else ud[:, parity]
    g_ch = _to_channels(g).astype(cdt)
    zedges = _zedge_rows(psi_ch, zb)
    out = _call_kernel(psi_ch, zedges, g_ch, geom, parity, dagger, zb,
                       recon12, bf16, interpret)
    return _from_channels(out, (4, 3))


def dslash_parity_pallas_shmap(ud, psi_opp, parity: int, geom: Geometry,
                               mesh, dagger: bool = False, zb: int = 8,
                               interpret: bool = False,
                               recon12: bool = False, bf16: bool = False):
    """Multi-chip v3 under shard_map over mesh axes ("t", "z").

    Halo exchange: one ppermute per partitioned axis direction — the
    t±1 psi slices (full [1,24,Z_loc,W] faces) and the z boundary edge
    rows ([T_loc,24,1,W]).  The w mesh axis must be 1 for this path
    (x/y shifts are intra-block lane rolls).  Local T and Z extents must
    be even so the in-kernel checkerboard masks stay valid at any shard
    offset.  The reference analogue is the interior/exterior dslash
    policy pipeline (lib/dslash_policy.cuh); here XLA schedules the
    ppermutes against the surrounding program.
    """
    from jax.sharding import PartitionSpec as P

    nt = mesh.shape.get("t", 1)
    nzsh = mesh.shape.get("z", 1)
    if mesh.shape.get("w", 1) != 1:
        raise ValueError("pallas shmap path requires w mesh axis == 1")
    T_loc, Z_loc = geom.T // nt, geom.Z // nzsh
    if T_loc % 2 or Z_loc % 2:
        raise ValueError("local T/Z extents must be even")
    zb_eff = zb if Z_loc % zb == 0 else Z_loc
    if bf16 and zb_eff < 16:
        zb_eff = 16 if Z_loc % 16 == 0 else Z_loc

    geom_local = Geometry(geom.X, geom.Y, Z_loc, T_loc)
    cdt = jnp.bfloat16 if bf16 else jnp.float32

    def local(ud_l, psi_l):
        psi_ch = _to_channels(psi_l).astype(cdt)        # [T_loc,24,Z_loc,W]
        g = ud_l[:, parity][:, :, :2] if recon12 else ud_l[:, parity]
        g_ch = _to_channels(g).astype(cdt)

        # t halo: my first slice -> t-1 neighbour (their tp face);
        # my last slice -> t+1 neighbour (their tm face)
        if nt > 1:
            fwd = [(i, (i - 1) % nt) for i in range(nt)]
            bwd = [(i, (i + 1) % nt) for i in range(nt)]
            tp_face = jax.lax.ppermute(psi_ch[:1], "t", fwd)
            tm_face = jax.lax.ppermute(psi_ch[-1:], "t", bwd)
        else:
            tp_face = psi_ch[:1]
            tm_face = psi_ch[-1:]
        ext = jnp.concatenate([tm_face, psi_ch, tp_face], axis=0)
        psi_tp, psi_tm = ext[2:], ext[:-2]

        # z edge rows across the shard boundary
        recv_p = recv_m = None
        if nzsh > 1:
            fwd = [(i, (i - 1) % nzsh) for i in range(nzsh)]
            bwd = [(i, (i + 1) % nzsh) for i in range(nzsh)]
            recv_p = jax.lax.ppermute(psi_ch[:, :, :1], "z", fwd)
            recv_m = jax.lax.ppermute(psi_ch[:, :, -1:], "z", bwd)
        zedges = _zedge_rows(psi_ch, zb_eff, recv_p, recv_m)

        out = _call_kernel(psi_ch, zedges, g_ch, geom_local, parity,
                           dagger, zb_eff, recon12, bf16, interpret,
                           psi_tp=psi_tp, psi_tm=psi_tm)
        return _from_channels(out, (4, 3))

    spec_psi = P(None, None, "t", "z", None)
    # doubled gauge [4, 2(parity), 2(fb), 3, 3, T, Z, W]
    spec_g = P(None, None, None, None, None, "t", "z", None)
    return jax.shard_map(local, mesh=mesh,
                         in_specs=(spec_g, spec_psi),
                         out_specs=spec_psi,
                         check_vma=False)(ud, psi_opp)
