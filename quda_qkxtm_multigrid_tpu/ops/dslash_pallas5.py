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


def _kernel_v5(geom: Geometry, dagger: bool, parity: int,
               recon12: bool, bf16: bool,
               twist: tuple | None = None, xpay_coef: float | None = None,
               clover: str | None = None):
    """twist = (a, b): apply b·(1 + i a γ5) to the hop result IN the
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
    Xh, W, Z, T = geom.Xh, geom.W, geom.Z, geom.T
    zb = Z

    def kernel(*refs):
        refs = list(refs)
        psi_c, psi_tp, psi_tm, g_ref = refs[:4]
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
        t_idx = pl.program_id(0)
        zloc = jax.lax.broadcasted_iota(jnp.int32, (zb, W), 0)
        wlane = jax.lax.broadcasted_iota(jnp.int32, (zb, W), 1)
        y = wlane // Xh
        k = wlane - y * Xh
        s0 = ((t_idx + zloc + y + parity) % 2) == 0
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
                    return _ld(g_ref,
                               (((d * 2 + fb) * nrows + a) * 3 + b) * 2 + ri)
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

        def neighbor(mu, forward, s, c, ri):
            ch = (s, c, ri)
            if mu == 3:
                return psi(psi_tp if forward else psi_tm, *ch)
            v = psi(psi_c, *ch)
            if mu == 2:
                # full-Z block: z±1 is a sublane roll, wrap included
                return pltpu.roll(v, Z - 1 if forward else 1, axis=0)
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
                return _ld(cinv_ref, ((h * 6 + r) * 6 + c) * 2 + ri)

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
        for kk in range(12):
            re, im = res[kk]
            if twist is not None:
                a, b = twist
                g5s = 1.0 if kk < 6 else -1.0   # spins 0,1 vs 2,3
                re, im = b * (re - (a * g5s) * im), b * (im + (a * g5s) * re)
            if xpay_coef is not None:
                re = x_ref[0, 2 * kk].astype(jnp.float32) + xpay_coef * re
                im = x_ref[0, 2 * kk + 1].astype(jnp.float32) + xpay_coef * im
            out_ref[0, 2 * kk] = re
            out_ref[0, 2 * kk + 1] = im

    return kernel


def dslash_ch_pallas5(g_ch, psi_ch, parity: int, geom: Geometry,
                      dagger: bool = False, interpret: bool = False,
                      recon12: bool = False, bf16: bool = False,
                      twist: tuple | None = None,
                      xpay_coef: float | None = None, x_ch=None,
                      clover: str | None = None, cinv_ch=None):
    """Channel-domain v5: psi_ch/g_ch/x_ch already in planar-channel
    layout ([T, 24, Z, W] / [T, 96|144, Z, W]), output [T, 24, Z, W]
    f32.  Solver hot loops stay in this layout end-to-end — the
    complex↔planar conversions are real HBM passes (~384 B/site per
    call) that put the naive wrapper at the DMA floor; keeping the
    chain in channel form removes them entirely."""
    T, Z, W = geom.T, geom.Z, geom.W
    ng = 96 if recon12 else 144

    kernel = _kernel_v5(geom, dagger, parity, recon12, bf16, twist,
                        xpay_coef, clover)
    pspec = lambda im: pl.BlockSpec((1, 24, Z, W), im,
                                    memory_space=pltpu.VMEM)
    ins = [psi_ch, psi_ch, psi_ch, g_ch]
    in_specs = [pspec(lambda i: (i, 0, 0, 0)),
                pspec(lambda i: ((i + 1) % T, 0, 0, 0)),
                pspec(lambda i: ((i - 1) % T, 0, 0, 0)),
                pl.BlockSpec((1, ng, Z, W), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    if clover is not None:
        ins.append(cinv_ch)
        in_specs.append(pl.BlockSpec((1, 144, Z, W),
                                     lambda i: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
    if xpay_coef is not None:
        ins.append(x_ch)
        in_specs.append(pspec(lambda i: (i, 0, 0, 0)))
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


def gauge_channels(ud, parity: int, recon12: bool, bf16: bool):
    """Doubled gauge → channel layout for one parity (hoist out of
    solver loops: loop-invariant, so XLA CSEs it, but precomputing makes
    the invariance explicit)."""
    cdt = jnp.bfloat16 if bf16 else jnp.float32
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
                            clover: str | None = None, cinv_ch=None):
    """v5 kernel on a t-extended LOCAL block: psi_ext_ch is
    [T_loc+2, 24, Z, W] with halo slices at rows 0 and T_loc+1 (from the
    t∓1 neighbour shards).  The shard's t-offset must be even so the
    in-kernel checkerboard masks stay valid (guaranteed by even T_loc).
    """
    T, Z, W = geom_local.T, geom_local.Z, geom_local.W
    ng = 96 if recon12 else 144
    kernel = _kernel_v5(geom_local, dagger, parity, recon12, bf16, twist,
                        xpay_coef, clover)
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


def dslash_ch_pallas5_msrc(g_ch, psi_ch_b, parity: int, geom: Geometry,
                           dagger: bool = False, interpret: bool = False,
                           recon12: bool = False, bf16: bool = False,
                           twist: tuple | None = None,
                           xpay_coef: float | None = None, x_ch_b=None,
                           clover: str | None = None, cinv_ch=None):
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
    ng = 96 if recon12 else 144
    psi_flat = psi_ch_b.reshape(n * T, 24, Z, W)

    kernel = _kernel_v5(geom, dagger, parity, recon12, bf16, twist,
                        xpay_coef, clover)
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
