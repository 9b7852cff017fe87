"""Pallas TPU Wilson-Dslash kernel, v5: full-Z blocks, 3-operand psi.

v2's grid tiles Z into zb-row blocks, paying FIVE psi block fetches per
output block (center, t±1, z±1).  v5 sets the block to the FULL Z
extent: the z±1 neighbours become in-register sublane rolls (with the
global periodic wrap coming for free from pltpu.roll), so only center
and t±1 remain — psi traffic drops 5→3 blocks (960→768 B/site in f32
recon-12), with no edge machinery at all.  Costs VMEM: at 32³×64 the
working set is ~25 MB, which fits this generation's VMEM comfortably.

Everything else (gamma algebra, recon-12, x/y lane rolls, bf16 tier) is
shared with v2 via the same kernel body, parameterised by full_z.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu.ops.dslash_pallas import (
    _to_channels, _from_channels)
from quda_qkxtm_multigrid_tpu.ops.dslash_pallas2 import _proj_rank2


def _plane_body(geom: Geometry, dagger: bool, parity: int,
                recon12: bool, bf16: bool, twist, xpay_coef, clover,
                t_idx, ld_c, ld_tp, ld_tm, ld_g, ld_cinv, ld_x, store,
                recon8: bool = False, post_op=None, store2=None,
                tp_proj: bool = False, tm_proj: bool = False,
                ld_zp=None, ld_zm=None, zb: int | None = None,
                z_off=0):
    """One output t-plane of the fused Wilson-type stencil, abstracted
    over HOW channel planes are loaded/stored so both the per-plane (v5)
    and slab-blocked grids share one body.  ld_* : channel-index →
    (Z, W) f32 array; store(ch, value) writes the output channel.

    twist = (a, b): apply b·(1 + i a γ5) to the hop result IN the
    kernel epilogue — the fused twist/A⁻¹ of the twisted-mass matpc
    (the role of the reference's fused tm_dslash_def.h kernels,
    reference lib/dslash_core/tm_dslash_def.h:633) at zero extra HBM
    traffic.  xpay_coef: fused out = x + coef·(hop result) with x as an
    extra operand (the reference's Xpay fusion, wilson_dslash*Xpay).
    clover = "fwd"|"dag": apply the chiral-block 6×6 matrix field (an
    extra [T,144,Z,W] operand, e.g. the twisted-clover A⁻¹) to the hop
    result — the fused clover epilogue of the reference's tmc_dslash
    kernels (lib/dslash_core/tmc_dslash_def.h:726); "dag" applies the
    conjugate transpose.  Mutually exclusive with twist."""
    assert not (twist is not None and clover is not None)
    Xh, W, Z = geom.Xh, geom.W, geom.Z
    if zb is None:
        zb = Z
    zloc = jax.lax.broadcasted_iota(jnp.int32, (zb, W), 0)
    wlane = jax.lax.broadcasted_iota(jnp.int32, (zb, W), 1)
    y = wlane // Xh
    k = wlane - y * Xh
    s0 = ((t_idx + z_off + zloc + y + parity) % 2) == 0
    k_last = k == Xh - 1
    k_first = k == 0

    def psi(ld, s, c, ri):
        return ld((s * 3 + c) * 2 + ri)

    nrows = 2 if recon12 else 3
    _row2_cache = {}

    def _gauge_row2(d, fb):
        key = (d, fb)
        if key not in _row2_cache:
            def g2(a, b, ri):
                return ld_g((((d * 2 + fb) * nrows + a) * 3 + b) * 2 + ri)
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

    _mat8_cache = {}

    def _mat8(d, fb):
        """Reconstruct the full SU(3) link from the 8-real encoding
        [Re/Im a2, Re/Im a3, Re/Im b1, arg(a1), arg(c1)] (the
        reconstruct-8 of reference include/enum_quda.h:55-62; closed
        form from row-0/column-0 unitarity, verified to 5e-16 against
        random SU(3) in tests).  ~50 extra VPU flops per link — free on
        the DMA-rate-bound kernel, and saves 128 B/site of gauge
        traffic vs recon-12."""
        key = (d, fb)
        if key in _mat8_cache:
            return _mat8_cache[key]
        base = (d * 2 + fb) * 8
        a2r, a2i, a3r, a3i, b1r, b1i, th1, th2 = (
            ld_g(base + j) for j in range(8))
        n = a2r * a2r + a2i * a2i + a3r * a3r + a3i * a3i
        a1m2 = jnp.maximum(1.0 - n, 0.0)
        a1m = jnp.sqrt(a1m2)
        c1m = jnp.sqrt(jnp.maximum(
            1.0 - a1m2 - (b1r * b1r + b1i * b1i), 0.0))
        a1r = a1m * jnp.cos(th1)
        a1i = a1m * jnp.sin(th1)
        c1r = c1m * jnp.cos(th2)
        c1i = c1m * jnp.sin(th2)
        rn = 1.0 / n
        # t = conj(a1) * b1
        tr_ = a1r * b1r + a1i * b1i
        ti_ = a1r * b1i - a1i * b1r
        # b2 = -(t a2 + conj(a3) conj(c1)) / n
        b2r = -(tr_ * a2r - ti_ * a2i + (a3r * c1r - a3i * c1i)) * rn
        b2i = -(tr_ * a2i + ti_ * a2r - (a3r * c1i + a3i * c1r)) * rn
        # b3 = -(t a3 - conj(a2) conj(c1)) / n
        b3r = -(tr_ * a3r - ti_ * a3i - (a2r * c1r - a2i * c1i)) * rn
        b3i = -(tr_ * a3i + ti_ * a3r + (a2r * c1i + a2i * c1r)) * rn
        # c2 = conj(a3 b1 - a1 b3), c3 = conj(a1 b2 - a2 b1)
        c2r = (a3r * b1r - a3i * b1i) - (a1r * b3r - a1i * b3i)
        c2i = -((a3r * b1i + a3i * b1r) - (a1r * b3i + a1i * b3r))
        c3r = (a1r * b2r - a1i * b2i) - (a2r * b1r - a2i * b1i)
        c3i = -((a1r * b2i + a1i * b2r) - (a2r * b1i + a2i * b1r))
        mat = [[(a1r, a1i), (a2r, a2i), (a3r, a3i)],
               [(b1r, b1i), (b2r, b2i), (b3r, b3i)],
               [(c1r, c1i), (c2r, c2i), (c3r, c3i)]]
        _mat8_cache[key] = mat
        return mat

    def gauge(d, fb, a, b, ri):
        if recon8:
            return _mat8(d, fb)[a][b][ri]
        if recon12 and a == 2:
            return _gauge_row2(d, fb)[b][ri]
        return ld_g((((d * 2 + fb) * nrows + a) * 3 + b) * 2 + ri)

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

    def neighbor(mu, forward, s, c, ri):
        ch = (s, c, ri)
        if mu == 3:
            return psi(ld_tp if forward else ld_tm, *ch)
        v = psi(ld_c, *ch)
        if mu == 2:
            # z±1 is a sublane roll (wrap included for the full-Z
            # block); in the zb-blocked grid the wrapped edge row is
            # patched from the 8-row z-halo block of the neighbouring
            # grid step (row 0 of the z+ halo / row 7 of the z− halo)
            rolled = pltpu.roll(v, zb - 1 if forward else 1, axis=0)
            if ld_zp is None:
                return rolled
            if forward:
                edge = psi(ld_zp, *ch)[0:1]
                return jnp.where(zloc == zb - 1, edge, rolled)
            edge = psi(ld_zm, *ch)[7:8]
            return jnp.where(zloc == 0, edge, rolled)
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
            if mu == 3 and (tp_proj if fwd else tm_proj):
                # t-face arrives PRE-PROJECTED (12 channels, idx
                # (s*3+c)*2+ri) — the sender applied 1±γ4 before the
                # ppermute (the reference's spin-projected face pack,
                # halving comm bytes; lib/dslash_pack.cuh semantics)
                ldf = ld_tp if fwd else ld_tm
                h = [[(ldf((s * 3 + c) * 2), ldf((s * 3 + c) * 2 + 1))
                      for c in range(3)] for s in range(2)]
            else:
                nb = [[(neighbor(mu, fwd, tt, c, 0),
                        neighbor(mu, fwd, tt, c, 1))
                       for c in range(3)] for tt in range(4)]
                h = [[None, None, None] for _ in range(2)]
                for s in (0, 1):
                    for (tt, coef) in upper[s]:
                        for c in range(3):
                            term = cmul_const(coef.real, coef.imag,
                                              *nb[tt][c])
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

    res = [[acc[kk][0], acc[kk][1]] for kk in range(12)]
    if clover is not None:
        # chiral 6x6 complex matvec on the hop result; channel
        # idx(h, r, c, ri) = ((h*6+r)*6+c)*2+ri; spin-color kk maps
        # to (h = kk//6, r = kk%6)
        def cm(h, r, c, ri):
            return ld_cinv(((h * 6 + r) * 6 + c) * 2 + ri)

        new = []
        for kk in range(12):
            h, r = kk // 6, kk % 6
            tr = ti = None
            for c in range(6):
                vr, vi = res[h * 6 + c]
                if clover == "fwd":
                    mr, mi = cm(h, r, c, 0), cm(h, r, c, 1)
                else:                      # dag: conj transpose
                    mr, mi = cm(h, c, r, 0), -cm(h, c, r, 1)
                pr_ = mr * vr - mi * vi
                pi_ = mr * vi + mi * vr
                tr = pr_ if tr is None else tr + pr_
                ti = pi_ if ti is None else ti + pi_
            new.append([tr, ti])
        res = new
    final = []
    for kk in range(12):
        re, im = res[kk]
        if twist is not None:
            a, b = twist
            g5s = 1.0 if kk < 6 else -1.0   # spins 0,1 vs 2,3
            re, im = b * (re - (a * g5s) * im), b * (im + (a * g5s) * re)
        if xpay_coef is not None:
            re = ld_x(2 * kk) + xpay_coef * re
            im = ld_x(2 * kk + 1) + xpay_coef * im
        final.append((re, im))
        store(2 * kk, re)
        store(2 * kk + 1, im)
    if post_op is not None and store2 is not None:
        # SECOND output: the A⁻¹†-transformed final result — fuses the
        # leading pre-apply of a following dagger matpc into this
        # kernel (matpc_dagm chains), saving the standalone
        # _ch_clover_apply / _ch_twist HBM pass (~10% of matpc_dagm).
        if post_op[0] == "clover":
            def cmd(h, r, c, ri):          # cinv dagger (conj transp.)
                return ld_cinv(((h * 6 + c) * 6 + r) * 2 + ri)
            for kk in range(12):
                h, r = kk // 6, kk % 6
                tr = ti = None
                for c in range(6):
                    vr, vi = final[h * 6 + c]
                    mr, mi = cmd(h, r, c, 0), -cmd(h, r, c, 1)
                    pr_ = mr * vr - mi * vi
                    pi_ = mr * vi + mi * vr
                    tr = pr_ if tr is None else tr + pr_
                    ti = pi_ if ti is None else ti + pi_
                store2(2 * kk, tr)
                store2(2 * kk + 1, ti)
        else:                               # ("twist", a, b)
            _, ta, tb = post_op
            for kk in range(12):
                re, im = final[kk]
                g5s = 1.0 if kk < 6 else -1.0
                store2(2 * kk, tb * (re - (ta * g5s) * im))
                store2(2 * kk + 1, tb * (im + (ta * g5s) * re))


def _kernel_v5(geom: Geometry, dagger: bool, parity: int,
               recon12: bool, bf16: bool,
               twist: tuple | None = None, xpay_coef: float | None = None,
               clover: str | None = None, recon8: bool = False,
               post_op=None, zb: int | None = None):
    """Per-t-plane grid: one output plane per step, t± neighbours as
    separate plane operands (see _plane_body for the epilogue zoo).
    zb: Z-blocked form — grid (T, Z//zb), two extra 8-row z-halo
    operands, the VMEM gate for huge planes (48³×96: a full
    Z×W = 48×1152 operand set exceeds the 120 MB scoped limit)."""

    def kernel(*refs):
        refs = list(refs)
        psi_c, psi_tp, psi_tm = refs[:3]
        pos = 3
        psi_zp = psi_zm = None
        if zb is not None:
            psi_zp, psi_zm = refs[3:5]
            pos = 5
        g_ref = refs[pos]
        pos += 1
        cinv_ref = None
        if clover is not None:
            cinv_ref = refs[pos]
            pos += 1
        x_ref = None
        if xpay_coef is not None:
            x_ref = refs[pos]
            pos += 1
        out_ref = refs[pos]
        out2_ref = refs[pos + 1] if post_op is not None else None

        def _mk(ref):
            if ref is None:
                return None
            if bf16:
                return lambda idx: ref[0, idx].astype(jnp.float32)
            return lambda idx: ref[0, idx]

        def store(idx, val):
            out_ref[0, idx] = val.astype(out_ref.dtype)

        def store2(idx, val):
            out2_ref[0, idx] = val.astype(out2_ref.dtype)

        z_off = pl.program_id(1) * zb if zb is not None else 0
        _plane_body(geom, dagger, parity, recon12, bf16, twist, xpay_coef,
                    clover, pl.program_id(0), _mk(psi_c), _mk(psi_tp),
                    _mk(psi_tm), _mk(g_ref), _mk(cinv_ref),
                    (lambda idx: x_ref[0, idx].astype(jnp.float32))
                    if x_ref is not None else None, store, recon8=recon8,
                    post_op=post_op,
                    store2=store2 if post_op is not None else None,
                    ld_zp=_mk(psi_zp), ld_zm=_mk(psi_zm), zb=zb,
                    z_off=z_off)

    return kernel


def _kernel_slab(geom: Geometry, dagger: bool, parity: int,
                 recon12: bool, bf16: bool, tb: int,
                 twist: tuple | None = None, xpay_coef: float | None = None,
                 clover: str | None = None, recon8: bool = False,
                 post_op=None):
    """Slab grid: each step computes tb output planes from a
    (tb, ch, Z, W) slab plus ONE halo plane on each t side.  Interior
    t-hops stay inside the slab, so psi center traffic drops from 3
    fetches per plane (v5) to (tb+2)/tb — the BlockSpec-only form of the
    t-slab reuse that manual-DMA ring buffers would give (those hang on
    this backend, see ops/dslash_pallas4.py)."""

    def kernel(*refs):
        refs = list(refs)
        psi_s, psi_tp, psi_tm, g_ref = refs[:4]
        pos = 4
        cinv_ref = None
        if clover is not None:
            cinv_ref = refs[pos]
            pos += 1
        x_ref = None
        if xpay_coef is not None:
            x_ref = refs[pos]
            pos += 1
        out_ref = refs[pos]
        out2_ref = refs[pos + 1] if post_op is not None else None
        t_base = pl.program_id(0) * tb

        def _mk(ref, row):
            if ref is None:
                return None
            if bf16:
                return lambda idx: ref[row, idx].astype(jnp.float32)
            return lambda idx: ref[row, idx]

        for tt in range(tb):
            ld_tp = _mk(psi_s, tt + 1) if tt + 1 < tb else _mk(psi_tp, 0)
            ld_tm = _mk(psi_s, tt - 1) if tt - 1 >= 0 else _mk(psi_tm, 0)

            def store(idx, val, tt=tt):
                out_ref[tt, idx] = val.astype(out_ref.dtype)

            def store2(idx, val, tt=tt):
                out2_ref[tt, idx] = val.astype(out2_ref.dtype)

            _plane_body(
                geom, dagger, parity, recon12, bf16, twist, xpay_coef,
                clover, t_base + tt, _mk(psi_s, tt), ld_tp, ld_tm,
                _mk(g_ref, tt), _mk(cinv_ref, tt),
                (lambda idx, tt=tt: x_ref[tt, idx].astype(jnp.float32))
                if x_ref is not None else None, store, recon8=recon8,
                post_op=post_op,
                store2=store2 if post_op is not None else None)

    return kernel


def dslash_ch_pallas5(g_ch, psi_ch, parity: int, geom: Geometry,
                      dagger: bool = False, interpret: bool = False,
                      recon12: bool = False, bf16: bool = False,
                      twist: tuple | None = None,
                      xpay_coef: float | None = None, x_ch=None,
                      clover: str | None = None, cinv_ch=None,
                      recon8: bool = False, post_op=None,
                      out_dtype=jnp.float32, zb: int | None = None):
    """Channel-domain v5: psi_ch/g_ch/x_ch already in planar-channel
    layout ([T, 24, Z, W] / [T, 96|144, Z, W]), output [T, 24, Z, W]
    f32.  Solver hot loops stay in this layout end-to-end — the
    complex↔planar conversions are real HBM passes (~384 B/site per
    call) that put the naive wrapper at the DMA floor; keeping the
    chain in channel form removes them entirely.

    out_dtype=jnp.bfloat16 (with bf16 psi_ch/x_ch and bf16=True) is the
    bf16-SPINOR storage tier — the QUDA-half spinor analogue
    (enum_quda.h:55-62) without the per-site norm array (bf16 shares
    f32's exponent range, so fixed-point scaling is unnecessary);
    compute stays f32 inside the kernel.

    zb: Z-block the grid into (T, Z//zb) steps with 8-row z-halo
    operands — the VMEM gate for huge planes (48³×96 CompactDirac: one
    full 48×1152 operand set is 121.7 MB scoped vs the 120 MB limit —
    measured on-chip r4).  Requires zb % 8 == 0 and Z % zb == 0; the
    halo patch costs (zb+16)/zb psi fetch traffic."""
    T, Z, W = geom.T, geom.Z, geom.W
    ng = 64 if recon8 else (96 if recon12 else 144)
    if zb is not None and (zb % 8 or Z % zb or zb >= Z):
        raise ValueError(f"invalid zb={zb} for Z={Z}")

    kernel = _kernel_v5(geom, dagger, parity, recon12, bf16, twist,
                        xpay_coef, clover, recon8=recon8, post_op=post_op,
                        zb=zb)
    if zb is None:
        grid = (T,)
        pspec = lambda im: pl.BlockSpec((1, 24, Z, W), im,
                                        memory_space=pltpu.VMEM)
        ins = [psi_ch, psi_ch, psi_ch, g_ch]
        in_specs = [pspec(lambda i: (i, 0, 0, 0)),
                    pspec(lambda i: ((i + 1) % T, 0, 0, 0)),
                    pspec(lambda i: ((i - 1) % T, 0, 0, 0)),
                    pl.BlockSpec((1, ng, Z, W), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)]
        cspec = pl.BlockSpec((1, 144, Z, W), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
        xspec = pspec(lambda i: (i, 0, 0, 0))
        ospec = pl.BlockSpec((1, 24, Z, W), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    else:
        nzb = Z // zb
        hb = zb // 8            # halo block index stride (8-row units)
        grid = (T, nzb)
        pspec = lambda im: pl.BlockSpec((1, 24, zb, W), im,
                                        memory_space=pltpu.VMEM)
        hspec = lambda im: pl.BlockSpec((1, 24, 8, W), im,
                                        memory_space=pltpu.VMEM)
        ins = [psi_ch, psi_ch, psi_ch, psi_ch, psi_ch, g_ch]
        in_specs = [
            pspec(lambda i, j: (i, 0, j, 0)),
            pspec(lambda i, j: ((i + 1) % T, 0, j, 0)),
            pspec(lambda i, j: ((i - 1) % T, 0, j, 0)),
            # z+ halo: first 8 rows of the next z block
            hspec(lambda i, j: (i, 0, ((j + 1) % nzb) * hb, 0)),
            # z− halo: last 8 rows of the previous z block
            hspec(lambda i, j: (i, 0, ((j - 1) % nzb) * hb + hb - 1, 0)),
            pl.BlockSpec((1, ng, zb, W), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM)]
        cspec = pl.BlockSpec((1, 144, zb, W), lambda i, j: (i, 0, j, 0),
                             memory_space=pltpu.VMEM)
        xspec = pspec(lambda i, j: (i, 0, j, 0))
        ospec = pl.BlockSpec((1, 24, zb, W), lambda i, j: (i, 0, j, 0),
                             memory_space=pltpu.VMEM)
    if clover is not None:
        ins.append(cinv_ch)
        in_specs.append(cspec)
    if xpay_coef is not None:
        ins.append(x_ch)
        in_specs.append(xspec)
    oshape = jax.ShapeDtypeStruct((T, 24, Z, W), out_dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(ospec, ospec) if post_op is not None else ospec,
        out_shape=(oshape, oshape) if post_op is not None else oshape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(*ins)


def dslash_ch_pallas5_slab(g_ch, psi_ch, parity: int, geom: Geometry,
                           dagger: bool = False, interpret: bool = False,
                           recon12: bool = False, bf16: bool = False,
                           twist: tuple | None = None,
                           xpay_coef: float | None = None, x_ch=None,
                           clover: str | None = None, cinv_ch=None,
                           tb: int = 4, recon8: bool = False,
                           post_op=None, out_dtype=jnp.float32):
    """Slab-blocked v5 (same semantics/operands as dslash_ch_pallas5):
    grid of T/tb steps, each computing a (tb, 24, Z, W) output slab from
    the matching psi/gauge/clover slabs plus ONE t-halo plane per side.
    psi center traffic drops 3 → (tb+2)/tb fetches per plane, which on
    the DMA-rate-bound v5e kernel is worth ~25-60% depending on the
    epilogue mix.  VMEM grows ~tb×, so tb must satisfy the geometry
    gate (pick_slab_tb)."""
    T, Z, W = geom.T, geom.Z, geom.W
    if T % tb:
        raise ValueError(f"T={T} not divisible by slab tb={tb}")
    ng = 64 if recon8 else (96 if recon12 else 144)
    nslab = T // tb

    kernel = _kernel_slab(geom, dagger, parity, recon12, bf16, tb, twist,
                          xpay_coef, clover, recon8=recon8,
                          post_op=post_op)
    plane = lambda im: pl.BlockSpec((1, 24, Z, W), im,
                                    memory_space=pltpu.VMEM)
    slab = lambda nch: pl.BlockSpec((tb, nch, Z, W), lambda i: (i, 0, 0, 0),
                                    memory_space=pltpu.VMEM)
    ins = [psi_ch, psi_ch, psi_ch, g_ch]
    in_specs = [slab(24),
                plane(lambda i: ((i * tb + tb) % T, 0, 0, 0)),
                plane(lambda i: ((i * tb - 1) % T, 0, 0, 0)),
                slab(ng)]
    if clover is not None:
        ins.append(cinv_ch)
        in_specs.append(slab(144))
    if xpay_coef is not None:
        ins.append(x_ch)
        in_specs.append(slab(24))
    oshape = jax.ShapeDtypeStruct((T, 24, Z, W), out_dtype)
    return pl.pallas_call(
        kernel,
        grid=(nslab,),
        in_specs=in_specs,
        out_specs=(slab(24), slab(24)) if post_op is not None else slab(24),
        out_shape=(oshape, oshape) if post_op is not None else oshape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(*ins)


def slab_vmem_bytes(geom: Geometry, tb: int, recon12: bool, bf16: bool,
                    clover: bool, xpay: bool, recon8: bool = False) -> int:
    """Double-buffered VMEM footprint estimate of the slab kernel."""
    plane = geom.Z * geom.W * 4
    opsz = 2 if bf16 else 4
    ng = 64 if recon8 else (96 if recon12 else 144)
    tot = tb * 24 * plane            # psi slab (f32)
    tot += 2 * 24 * plane            # halo planes
    tot += tb * ng * geom.Z * geom.W * opsz      # gauge
    if clover:
        tot += tb * 144 * geom.Z * geom.W * opsz
    if xpay:
        tot += tb * 24 * plane
    tot += tb * 24 * plane           # out
    return 2 * tot                   # pallas double-buffers each operand


def plane_vmem_bytes(geom: Geometry, zb: int | None, recon12: bool,
                     bf16: bool, clover: bool, xpay: bool,
                     recon8: bool = False, post_op: bool = False,
                     clover_opsz: int | None = None) -> int:
    """Double-buffered VMEM footprint estimate of the per-plane kernel
    (optionally Z-blocked to zb rows + two 8-row halos).  clover_opsz:
    bytes/element of the cinv operand (the compact bundle keeps cinv
    f32 beside bf16 gauge for Schur consistency)."""
    Z = geom.Z if zb is None else zb
    halo_rows = 0 if zb is None else 16
    row = geom.W * 4
    opsz = 2 if bf16 else 4
    ng = 64 if recon8 else (96 if recon12 else 144)
    tot = 3 * 24 * Z * row                   # psi + t± planes (f32)
    tot += 24 * halo_rows * row              # z halos
    tot += ng * Z * geom.W * opsz            # gauge
    if clover:
        tot += 144 * Z * geom.W * (clover_opsz or opsz)
    if xpay:
        tot += 24 * Z * row
    tot += 24 * Z * row                      # out
    if post_op:
        tot += 24 * Z * row                  # second output
    return 2 * tot                           # double-buffering


def pick_plane_zb(geom: Geometry, recon12: bool, bf16: bool,
                  clover: bool, xpay: bool, recon8: bool = False,
                  post_op: bool = False,
                  budget: int = 88 * 1024 * 1024,
                  clover_opsz: int | None = None) -> int | None:
    """Smallest-count Z-blocking that fits the plane kernel in VMEM:
    None (full Z) when it already fits, else the largest zb (multiple
    of 8, divisor of Z, < Z).  The budget leaves headroom under the
    120 MB scoped limit for Mosaic scratch (~26 MB observed in the r4
    on-chip compile report: 121.7 MB scoped for a ~95 MB operand
    model)."""
    if plane_vmem_bytes(geom, None, recon12, bf16, clover, xpay,
                        recon8=recon8, post_op=post_op,
                        clover_opsz=clover_opsz) <= budget:
        return None
    for zb in range(geom.Z - 8, 7, -8):
        if geom.Z % zb == 0 and plane_vmem_bytes(
                geom, zb, recon12, bf16, clover, xpay, recon8=recon8,
                post_op=post_op, clover_opsz=clover_opsz) <= budget:
            return zb
    raise ValueError(f"no Z-blocking fits VMEM at geom {geom.dims}")


def pick_slab_tb(geom: Geometry, recon12: bool, bf16: bool, clover: bool,
                 xpay: bool, budget: int = 80 * 1024 * 1024,
                 recon8: bool = False) -> int:
    """Largest tb (divisor of T, ≤ 8) whose slab working set fits the
    VMEM budget; 0 if even tb=1 does not fit (caller falls back to the
    per-plane v5 kernel or a z-blocked variant).  This is the geometry
    gate that lets 48³×96 run (STATUS r1 known-issue #1) — the
    tunecache analogue for block shapes (reference lib/tune.cpp).
    Budget default 80 MB measured best on v5e: pushing the working set
    to ~110 MB (tb=4 with clover operands) degrades DMA pipelining and
    loses the slab gain (7.28 vs 7.07 ms tmc matpc_dagm at 32³×64)."""
    # tb capped at 4: the tb=8 slab gains only (1.5→1.25)× psi traffic
    # but the 8×-unrolled Mosaic kernel takes minutes to compile.
    for tb in (4, 3, 2):
        if geom.T % tb == 0 and slab_vmem_bytes(
                geom, tb, recon12, bf16, clover, xpay,
                recon8=recon8) <= budget:
            return tb
    return 0


def dslash_ch_auto(g_ch, psi_ch, parity: int, geom: Geometry,
                   tb: int | None = None, **kw):
    """Production dispatch: slab grid when the geometry gate says it
    fits VMEM (largest valid tb), per-plane v5 otherwise — the
    block-shape selection role of the reference autotuner
    (lib/tune.cpp tuneLaunch), decided analytically from the calibrated
    VMEM model instead of an empirical search."""
    if tb is None:
        if kw.get("interpret"):
            # interpret-mode cost scales with the tb-unrolled op count;
            # the CPU tier exercises the shared _plane_body through the
            # per-plane grid (slab==v5 is asserted bitwise on-chip and
            # by the dedicated slab interpret test).
            tb = 1
        else:
            args = (geom, kw.get("recon12", False), kw.get("bf16", False),
                    kw.get("clover") is not None,
                    kw.get("xpay_coef") is not None)
            r8 = kw.get("recon8", False)
            # persisted empirical tune first (utils/tunecache.tune_slab,
            # the tunecache.tsv analogue), analytic VMEM model otherwise
            from quda_qkxtm_multigrid_tpu.utils.tunecache import (
                cached_slab_tb)
            tb = cached_slab_tb(*args, recon8=r8)
            if tb is None:
                tb = pick_slab_tb(*args, recon8=r8)
    if tb and tb > 1:
        return dslash_ch_pallas5_slab(g_ch, psi_ch, parity, geom, tb=tb,
                                      **kw)
    zb = None
    if not kw.get("interpret"):
        # huge planes (48³×96: Z×W = 48×1152) overflow scoped VMEM even
        # per-plane — Z-block with halo rows (measured on-chip r4)
        cinv = kw.get("cinv_ch")
        zb = pick_plane_zb(geom, kw.get("recon12", False),
                           kw.get("bf16", False),
                           kw.get("clover") is not None,
                           kw.get("xpay_coef") is not None,
                           recon8=kw.get("recon8", False),
                           post_op=kw.get("post_op") is not None,
                           clover_opsz=None if cinv is None
                           else cinv.dtype.itemsize)
    return dslash_ch_pallas5(g_ch, psi_ch, parity, geom, zb=zb, **kw)


def gauge_channels(ud, parity: int, recon12: bool, bf16: bool,
                   recon8: bool = False):
    """Doubled gauge → channel layout for one parity (hoist out of
    solver loops: loop-invariant, so XLA CSEs it, but precomputing makes
    the invariance explicit).  recon8 emits the 8-real encoding
    [Re/Im a2, Re/Im a3, Re/Im b1, arg(a1), arg(c1)] per link
    ([T, 64, Z, W]) decoded on the fly in the kernel (_mat8)."""
    cdt = jnp.bfloat16 if bf16 else jnp.float32
    if recon8:
        m = ud[:, parity]            # [4(mu), 2(fb), 3, 3, T, Z, W]
        a1, a2, a3 = m[:, :, 0, 0], m[:, :, 0, 1], m[:, :, 0, 2]
        b1, c1 = m[:, :, 1, 0], m[:, :, 2, 0]
        comps = jnp.stack(
            [a2.real, a2.imag, a3.real, a3.imag, b1.real, b1.imag,
             jnp.angle(a1), jnp.angle(c1)], axis=2)  # [4, 2, 8, T, Z, W]
        flat = comps.reshape((64,) + comps.shape[3:])
        return jnp.moveaxis(flat, 0, 1).astype(cdt)  # [T, 64, Z, W]
    g = ud[:, parity][:, :, :2] if recon12 else ud[:, parity]
    return _to_channels(g).astype(cdt)


def clover_channels(clover_field, parity: int, bf16: bool):
    """Chiral-block clover (or its inverse) [2p,2ch,6,6,T,Z,W] →
    channel layout [T, 144, Z, W] for one parity."""
    cdt = jnp.bfloat16 if bf16 else jnp.float32
    return _to_channels(clover_field[parity]).astype(cdt)


def dslash_ch_pallas5_local(g_ch, psi_ext_ch, parity: int,
                            geom_local: Geometry, dagger: bool = False,
                            interpret: bool = False, recon12: bool = False,
                            bf16: bool = False, twist: tuple | None = None,
                            xpay_coef: float | None = None, x_ch=None,
                            clover: str | None = None, cinv_ch=None,
                            recon8: bool = False):
    """v5 kernel on a t-extended LOCAL block: psi_ext_ch is
    [T_loc+2, 24, Z, W] with halo slices at rows 0 and T_loc+1 (from the
    t∓1 neighbour shards).  The shard's t-offset must be even so the
    in-kernel checkerboard masks stay valid (guaranteed by even T_loc).
    """
    T, Z, W = geom_local.T, geom_local.Z, geom_local.W
    ng = 64 if recon8 else (96 if recon12 else 144)
    kernel = _kernel_v5(geom_local, dagger, parity, recon12, bf16, twist,
                        xpay_coef, clover, recon8=recon8)
    pspec = lambda im: pl.BlockSpec((1, 24, Z, W), im,
                                    memory_space=pltpu.VMEM)
    ins = [psi_ext_ch, psi_ext_ch, psi_ext_ch, g_ch]
    in_specs = [pspec(lambda i: (i + 1, 0, 0, 0)),
                pspec(lambda i: (i + 2, 0, 0, 0)),
                pspec(lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((1, ng, Z, W), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    if clover is not None:
        ins.append(cinv_ch)
        in_specs.append(pl.BlockSpec((1, 144, Z, W),
                                     lambda i: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
    if xpay_coef is not None:
        ins.append(x_ch)
        in_specs.append(pspec(lambda i: (i + 1, 0, 0, 0)))
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 24, Z, W), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 24, Z, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(*ins)


def dslash_ch_pallas5_overlap_local(g_ch, psi_ch, face_m, face_p,
                                    parity: int, geom_local: Geometry,
                                    dagger: bool = False,
                                    interpret: bool = False,
                                    recon12: bool = False,
                                    bf16: bool = False,
                                    twist: tuple | None = None,
                                    xpay_coef: float | None = None,
                                    x_ch=None, clover: str | None = None,
                                    cinv_ch=None,
                                    faces_projected: bool = False):
    """Interior/exterior-SPLIT local dslash — the TPU form of the
    reference dslash policy engine's overlap structure
    (lib/dslash_policy.cuh:148-299: interior kernel ‖ comms ‖ per-dim
    exterior kernels).

    The interior kernel (t rows 1..T-2) depends only on the LOCAL
    psi_ch, not on the ppermute'd faces — so under shard_map XLA's
    scheduler is free to run the face collective concurrently with it;
    the two 1-plane edge kernels consume the arrived faces afterwards.
    Contrast dslash_ch_pallas5_local, whose single kernel reads the
    t-extended array and therefore serialises after the collective."""
    T, Z, W = geom_local.T, geom_local.Z, geom_local.W
    ng = 96 if recon12 else 144
    if T <= 2:
        if faces_projected:
            raise ValueError("projected faces need T_loc > 2 "
                             "(no interior/edge split at T_loc<=2)")
        # no interior rows — degenerate to the t-extended single kernel
        ext = jnp.concatenate([face_m, psi_ch, face_p], axis=0)
        xp = None
        if xpay_coef is not None:
            zrow = jnp.zeros_like(x_ch[:1])
            xp = jnp.concatenate([zrow, x_ch, zrow], axis=0)
        return dslash_ch_pallas5_local(
            g_ch, ext, parity, geom_local, dagger=dagger,
            interpret=interpret, recon12=recon12, bf16=bf16, twist=twist,
            xpay_coef=xpay_coef, x_ch=xp, clover=clover, cinv_ch=cinv_ch)

    # ---- interior rows 1..T-2 (grid T-2, out rows offset by 1) -----
    pspec = lambda im: pl.BlockSpec((1, 24, Z, W), im,
                                    memory_space=pltpu.VMEM)
    ins = [psi_ch, psi_ch, psi_ch, g_ch]
    in_specs = [pspec(lambda i: (i + 1, 0, 0, 0)),
                pspec(lambda i: (i + 2, 0, 0, 0)),
                pspec(lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((1, ng, Z, W), lambda i: (i + 1, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    if clover is not None:
        ins.append(cinv_ch)
        in_specs.append(pl.BlockSpec((1, 144, Z, W),
                                     lambda i: (i + 1, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
    if xpay_coef is not None:
        ins.append(x_ch)
        in_specs.append(pspec(lambda i: (i + 1, 0, 0, 0)))
    # NOTE: the interior kernel computes t_idx = program_id(0), i.e.
    # rows 0..T-3, while it WRITES rows 1..T-2; compensate the
    # checkerboard phase by passing parity flipped by one t unit.
    kernel_i = _kernel_v5(geom_local, dagger, (parity + 1) % 2, recon12,
                          bf16, twist, xpay_coef, clover)
    interior = pl.pallas_call(
        kernel_i,
        grid=(T - 2,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 24, Z, W), lambda i: (i + 1, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 24, Z, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(*ins)

    # ---- edge rows (two 1-plane kernels consuming the faces) -------
    def edge(row, tm_arr, tm_row, tp_arr, tp_row,
             tm_proj=False, tp_proj=False):
        # _kernel_v5 takes the t phase from program_id(0), but a grid-(1,)
        # edge call needs the TRUE row phase — inline a kernel with the
        # static row as t_idx instead:
        def kern2(*refs):
            refs = list(refs)
            psi_c, psi_tp, psi_tm, g_ref = refs[:4]
            pos = 4
            cinv_ref = None
            if clover is not None:
                cinv_ref = refs[pos]; pos += 1
            x_ref = None
            if xpay_coef is not None:
                x_ref = refs[pos]; pos += 1
            out_ref = refs[pos]

            def _mk(ref):
                if ref is None:
                    return None
                if bf16:
                    return lambda idx: ref[0, idx].astype(jnp.float32)
                return lambda idx: ref[0, idx]

            def store(idx, val):
                out_ref[0, idx] = val

            _plane_body(geom_local, dagger, parity, recon12, bf16,
                        twist, xpay_coef, clover, row, _mk(psi_c),
                        _mk(psi_tp), _mk(psi_tm), _mk(g_ref),
                        _mk(cinv_ref),
                        (lambda idx: x_ref[0, idx].astype(jnp.float32))
                        if x_ref is not None else None, store,
                        tp_proj=tp_proj, tm_proj=tm_proj)

        one = lambda arr, r: pl.BlockSpec((1,) + arr.shape[1:],
                                          lambda i, r=r: (r,) + (0,) * (arr.ndim - 1),
                                          memory_space=pltpu.VMEM)
        e_ins = [psi_ch, tp_arr, tm_arr, g_ch]
        e_specs = [one(psi_ch, row), one(tp_arr, tp_row),
                   one(tm_arr, tm_row), one(g_ch, row)]
        if clover is not None:
            e_ins.append(cinv_ch)
            e_specs.append(one(cinv_ch, row))
        if xpay_coef is not None:
            e_ins.append(x_ch)
            e_specs.append(one(x_ch, row))
        return pl.pallas_call(
            kern2,
            grid=(1,),
            in_specs=e_specs,
            out_specs=pl.BlockSpec((1, 24, Z, W),
                                   lambda i: (0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 24, Z, W), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
            interpret=interpret,
        )(*e_ins)

    edge0 = edge(0, face_m, 0, psi_ch, 1, tm_proj=faces_projected)
    edgeT = edge(T - 1, psi_ch, T - 2, face_p, 0,
                 tp_proj=faces_projected)
    out = interior.at[0:1].set(edge0)
    return out.at[T - 1:T].set(edgeT)


def dslash_ch_pallas5_msrc(g_ch, psi_ch_b, parity: int, geom: Geometry,
                           dagger: bool = False, interpret: bool = False,
                           recon12: bool = False, bf16: bool = False,
                           twist: tuple | None = None,
                           xpay_coef: float | None = None, x_ch_b=None,
                           clover: str | None = None, cinv_ch=None,
                           recon8: bool = False):
    """Multi-RHS v5: psi_ch_b [n_src, T, 24, Z, W] (flattened to
    [n_src*T, ...] internally), grid (T, n_src) with the SOURCE axis
    innermost so the gauge (and clover) block for a given t is fetched
    ONCE and revisited across all sources — the gauge bytes amortise
    by n_src, which roughly doubles (tm) to triples (tmc) the
    bandwidth-bound throughput per solve (the MRHS idea of the
    batched-RHS literature and SURVEY.md §2.10.4's batchable axis).
    """
    n = psi_ch_b.shape[0]
    T, Z, W = geom.T, geom.Z, geom.W
    ng = 64 if recon8 else (96 if recon12 else 144)
    psi_flat = psi_ch_b.reshape(n * T, 24, Z, W)

    kernel = _kernel_v5(geom, dagger, parity, recon12, bf16, twist,
                        xpay_coef, clover, recon8=recon8)
    pspec = lambda im: pl.BlockSpec((1, 24, Z, W), im,
                                    memory_space=pltpu.VMEM)
    ins = [psi_flat, psi_flat, psi_flat, g_ch]
    in_specs = [pspec(lambda i, s: (s * T + i, 0, 0, 0)),
                pspec(lambda i, s: (s * T + (i + 1) % T, 0, 0, 0)),
                pspec(lambda i, s: (s * T + (i - 1) % T, 0, 0, 0)),
                pl.BlockSpec((1, ng, Z, W), lambda i, s: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    if clover is not None:
        ins.append(cinv_ch)
        in_specs.append(pl.BlockSpec((1, 144, Z, W),
                                     lambda i, s: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
    if xpay_coef is not None:
        ins.append(x_ch_b.reshape(n * T, 24, Z, W))
        in_specs.append(pspec(lambda i, s: (s * T + i, 0, 0, 0)))
    out = pl.pallas_call(
        kernel,
        grid=(T, n),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 24, Z, W),
                               lambda i, s: (s * T + i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * T, 24, Z, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(*ins)
    return out.reshape(n, T, 24, Z, W)


def dslash_ch_pallas5_msrc_slab(g_ch, psi_ch_b, parity: int,
                                geom: Geometry, dagger: bool = False,
                                interpret: bool = False,
                                recon12: bool = False, bf16: bool = False,
                                twist: tuple | None = None,
                                xpay_coef: float | None = None,
                                x_ch_b=None, clover: str | None = None,
                                cinv_ch=None, tb: int = 4,
                                recon8: bool = False):
    """Multi-RHS slab kernel: grid (T/tb, n_src) with the source axis
    innermost — combines the msrc gauge/clover amortisation (operand
    index maps don't move across the inner source steps, so Pallas
    revisits the resident VMEM block instead of re-fetching) with the
    slab psi-reuse (3 → (tb+2)/tb fetches per plane).  Since msrc
    already amortises the gauge bytes by n_src, psi traffic DOMINATES
    the msrc byte budget — the slab cut applies to exactly the
    dominant term, compounding the two reuse axes (reference analogue:
    the MRHS dslash of the multi-RHS literature; SURVEY §2.10.4)."""
    n = psi_ch_b.shape[0]
    T, Z, W = geom.T, geom.Z, geom.W
    if T % tb:
        raise ValueError(f"T={T} not divisible by slab tb={tb}")
    ng = 64 if recon8 else (96 if recon12 else 144)
    nslab = T // tb
    psi_flat = psi_ch_b.reshape(n * T, 24, Z, W)

    kernel = _kernel_slab(geom, dagger, parity, recon12, bf16, tb, twist,
                          xpay_coef, clover, recon8=recon8)
    plane = lambda im: pl.BlockSpec((1, 24, Z, W), im,
                                    memory_space=pltpu.VMEM)
    slab_s = lambda nch: pl.BlockSpec(
        (tb, nch, Z, W), lambda i, s: (s * nslab + i, 0, 0, 0),
        memory_space=pltpu.VMEM)
    slab_g = lambda nch: pl.BlockSpec(
        (tb, nch, Z, W), lambda i, s: (i, 0, 0, 0),
        memory_space=pltpu.VMEM)
    ins = [psi_flat, psi_flat, psi_flat, g_ch]
    in_specs = [slab_s(24),
                plane(lambda i, s: (s * T + (i * tb + tb) % T, 0, 0, 0)),
                plane(lambda i, s: (s * T + (i * tb - 1) % T, 0, 0, 0)),
                slab_g(ng)]
    if clover is not None:
        ins.append(cinv_ch)
        in_specs.append(slab_g(144))
    if xpay_coef is not None:
        ins.append(x_ch_b.reshape(n * T, 24, Z, W))
        in_specs.append(slab_s(24))
    out = pl.pallas_call(
        kernel,
        grid=(nslab, n),
        in_specs=in_specs,
        out_specs=slab_s(24),
        out_shape=jax.ShapeDtypeStruct((n * T, 24, Z, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(*ins)
    return out.reshape(n, T, 24, Z, W)


def dslash_ch_msrc_auto(g_ch, psi_ch_b, parity: int, geom: Geometry,
                        tb: int | None = None, **kw):
    """Production multi-RHS dispatch: slab msrc grid when the geometry
    gate says the working set fits VMEM, per-plane msrc otherwise
    (mirrors dslash_ch_auto; the per-step operands are identical to the
    single-RHS slab so the same VMEM model applies)."""
    if tb is None:
        if kw.get("interpret"):
            # interpret-mode cost scales with the tb-unrolled op count;
            # equality slab==per-plane is asserted by the dedicated
            # interpret test
            tb = 0
        else:
            tb = pick_slab_tb(geom, kw.get("recon12", False),
                              kw.get("bf16", False),
                              kw.get("clover") is not None,
                              kw.get("xpay_coef") is not None,
                              recon8=kw.get("recon8", False))
    if tb and tb > 1:
        return dslash_ch_pallas5_msrc_slab(g_ch, psi_ch_b, parity, geom,
                                           tb=tb, **kw)
    return dslash_ch_pallas5_msrc(g_ch, psi_ch_b, parity, geom, **kw)


def _t_extend(psi_ch, nt: int):
    """Attach t-halo rows by ppermute over the "t" mesh axis (inside
    shard_map): [T_loc, ...] → [T_loc+2, ...]."""
    if nt > 1:
        fwd = [(i, (i - 1) % nt) for i in range(nt)]
        bwd = [(i, (i + 1) % nt) for i in range(nt)]
        tp_face = jax.lax.ppermute(psi_ch[:1], "t", fwd)
        tm_face = jax.lax.ppermute(psi_ch[-1:], "t", bwd)
    else:
        tp_face, tm_face = psi_ch[:1], psi_ch[-1:]
    return jnp.concatenate([tm_face, psi_ch, tp_face], axis=0)


def _project_face(plane, plus: bool):
    """Spin-project a 24-channel t-face plane to the 12-channel
    2-spinor of 1±γ4 (channel idx (s*3+c)*2+ri, s∈{0,1}) — applied
    BEFORE the ppermute so the ICI transfer carries half the bytes
    (the reference's spin-projected ghost pack, lib/dslash_pack.cuh /
    include/color_spinor.h projection)."""
    upper, _ = _proj_rank2(3, plus)
    outs = []
    for s in range(2):
        for c in range(3):
            re = im = None
            for (tt, coef) in upper[s]:
                vr = plane[:, (tt * 3 + c) * 2]
                vi = plane[:, (tt * 3 + c) * 2 + 1]
                tr = coef.real * vr - coef.imag * vi
                ti = coef.real * vi + coef.imag * vr
                re = tr if re is None else re + tr
                im = ti if im is None else im + ti
            outs += [re, im]
    return jnp.stack(outs, axis=1)


def _t_faces(psi_ch, nt: int, project: bool = False,
             dagger: bool = False):
    """The two t-halo planes by ppermute over the "t" mesh axis — the
    SPLIT form of _t_extend for the overlap kernel: returned as separate
    arrays so the interior pallas_call has no data dependence on the
    collective and XLA is free to overlap the ICI transfer with the
    interior compute (the role of the reference's
    interior-kernel‖comms stage, lib/dslash_policy.cuh:148-299).

    project=True spin-projects the planes BEFORE the permute (12
    channels on the wire instead of 24); the receiving hop's projector
    is fixed by (direction, dagger), so the sender can apply it."""
    send_p, send_m = psi_ch[:1], psi_ch[-1:]
    if project:
        send_p = _project_face(send_p, plus=dagger)
        send_m = _project_face(send_m, plus=not dagger)
    if nt > 1:
        fwd = [(i, (i - 1) % nt) for i in range(nt)]
        bwd = [(i, (i + 1) % nt) for i in range(nt)]
        tp_face = jax.lax.ppermute(send_p, "t", fwd)
        tm_face = jax.lax.ppermute(send_m, "t", bwd)
    else:
        tp_face, tm_face = send_p, send_m
    return tm_face, tp_face


def dslash_parity_pallas5_shmap(ud, psi_opp, parity: int, geom: Geometry,
                                mesh, dagger: bool = False,
                                interpret: bool = False,
                                recon12: bool = False, bf16: bool = False):
    """Multi-chip v5 under shard_map over the ("t",) mesh axis: the ONLY
    comms per application is one ppermute pair of t-faces over ICI (the
    TPU-native form of the reference's pack/MPI/scatter pipeline,
    lib/dslash_policy.cuh).  z/w mesh axes must be 1 (the full-Z kernel
    keeps z-hops in-register); t is the cheapest axis to cut anyway
    (largest extent, smallest faces in this layout)."""
    from jax.sharding import PartitionSpec as P

    nt = mesh.shape.get("t", 1)
    if mesh.shape.get("z", 1) != 1 or mesh.shape.get("w", 1) != 1:
        raise ValueError("pallas5 shmap path shards only the t axis")
    T_loc = geom.T // nt
    if T_loc % 2:
        raise ValueError("local T extent must be even")
    geom_local = Geometry(geom.X, geom.Y, geom.Z, T_loc)
    cdt = jnp.bfloat16 if bf16 else jnp.float32

    def local(ud_l, psi_l):
        psi_ch = _to_channels(psi_l).astype(cdt)
        g_ch = gauge_channels(ud_l, parity, recon12, bf16)
        ext = _t_extend(psi_ch, nt)
        out = dslash_ch_pallas5_local(g_ch, ext, parity, geom_local,
                                      dagger, interpret, recon12, bf16)
        return _from_channels(out, (4, 3))

    spec_psi = P(None, None, "t", None, None)
    spec_g = P(None, None, None, None, None, "t", None, None)
    return jax.shard_map(local, mesh=mesh,
                         in_specs=(spec_g, spec_psi),
                         out_specs=spec_psi,
                         check_vma=False)(ud, psi_opp)


@partial(jax.jit, static_argnames=("parity", "geom", "dagger",
                                   "interpret", "recon12", "bf16",
                                   "twist", "xpay_coef"))
def dslash_parity_pallas5(ud, psi_opp, parity: int, geom: Geometry,
                          dagger: bool = False, interpret: bool = False,
                          recon12: bool = False, bf16: bool = False,
                          twist: tuple | None = None,
                          xpay_coef: float | None = None, x=None):
    """v5 full-Z dslash: same semantics as dslash_parity_pallas2, plus
    fused epilogues:
      twist=(a, b)  → out = b (1 + i a γ5) (D ψ)   [A±¹ fusion]
      xpay_coef, x  → out = x + xpay_coef · (epilogue result)
    (compose: twist applies first, then xpay)."""
    cdt = jnp.bfloat16 if bf16 else jnp.float32
    psi_ch = _to_channels(psi_opp).astype(cdt)           # [T, 24, Z, W]
    g_ch = gauge_channels(ud, parity, recon12, bf16)
    x_ch = _to_channels(x).astype(cdt) if xpay_coef is not None else None
    out = dslash_ch_pallas5(g_ch, psi_ch, parity, geom, dagger, interpret,
                            recon12, bf16, twist, xpay_coef, x_ch)
    return _from_channels(out, (4, 3))
