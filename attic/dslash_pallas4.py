"""Pallas TPU Wilson-Dslash kernel, v4: manual-DMA t-slab ring buffer.

The v2 kernel's traffic is 5 psi blocks per output block (center, t±1,
z±1 all re-fetched every grid step) — psi dominates after recon-12
compresses the gauge.  v4 keeps a 4-slot ring of t-slabs resident in
VMEM and marches t innermost, so each grid step DMAs ONE new slab
(center rows + 2 z-edge rows): psi traffic drops to (zb+2)/zb blocks,
a ~30% cut of total bytes at zb=8 (more with bf16).  This is the TPU
analogue of the reference's interior-reuse scheduling in the dslash
policy engine (reference lib/dslash_policy.cuh) — except the resource
being orchestrated is VMEM residency, not CUDA streams.

Structure:
  grid (nz, T), t innermost; T % 4 == 0 required (slot = t mod 4 keeps
  the live slabs {t-1, t, t+1} in distinct slots across the wrap)
  psi input: ANY (HBM) ref, hand-copied by make_async_copy:
    center [24, zb, W] -> slab_c[slot], z-edges [24, 1, W] x2 -> slab_e
  gauge + out: normal BlockSpec pipelining (Pallas double-buffers)
  warm-up (t == 0): fetch slabs T-1, 0, 1 and prefetch 2;
  steady state: wait slab t+1 (started two steps ago), prefetch t+2.

Gamma algebra, recon-12, and the x/y lane-roll shifts are v2's
(ops/dslash_pallas2.py); operand conventions unchanged (planar
channels, doubled gauge)."""

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


def _kernel_v4(geom: Geometry, dagger: bool, zb: int, parity: int,
               recon12: bool, bf16: bool):
    Xh, W, Z, T = geom.Xh, geom.W, geom.Z, geom.T
    nz = Z // zb

    def kernel(psi_hbm, g_ref, out_ref, slab_c, slab_e, sems):
        j = pl.program_id(0)
        t = pl.program_id(1)

        zc = j * zb
        zlo = (zc - 1) % Z
        zhi = (zc + zb) % Z

        def slab_dmas(tt, slot):
            return (
                pltpu.make_async_copy(
                    psi_hbm.at[tt, :, pl.ds(zc, zb)],
                    slab_c.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(
                    psi_hbm.at[tt, :, pl.ds(zlo, 1)],
                    slab_e.at[slot, :, pl.ds(0, 1)], sems.at[slot, 1]),
                pltpu.make_async_copy(
                    psi_hbm.at[tt, :, pl.ds(zhi, 1)],
                    slab_e.at[slot, :, pl.ds(1, 1)], sems.at[slot, 2]),
            )

        def start(tt):
            for d in slab_dmas(tt, tt % 4):
                d.start()

        def wait(tt):
            for d in slab_dmas(tt, tt % 4):
                d.wait()

        @pl.when(t == 0)
        def _():
            start(T - 1)
            start(0)
            start(1)
            if T > 3:
                start(2)
            wait(T - 1)
            wait(0)
            wait(1)

        @pl.when(jnp.logical_and(t >= 1, t <= T - 2))
        def _():
            tt = jax.lax.rem(t + 2, jnp.int32(T))
            # at t == T-2 this refetches slab 0 into slot 0 (dead since
            # t-3); at every other step it is the fresh t+2 slab

            @pl.when(t <= T - 3)
            def _():
                for d in slab_dmas(tt, jax.lax.rem(tt, jnp.int32(4))):
                    d.start()

            @pl.when(t == T - 2)
            def _():
                for d in slab_dmas(0, 0):
                    d.start()
            for d in slab_dmas(jax.lax.rem(t + 1, jnp.int32(T)),
                               jax.lax.rem(t + 1, jnp.int32(4))):
                d.wait()

        slot_c = jax.lax.rem(t, jnp.int32(4))
        slot_tp = jax.lax.rem(t + 1, jnp.int32(4))
        slot_tm = jax.lax.rem(t + 3, jnp.int32(4))

        # ---- checkerboard masks (as v2) ------------------------------
        zloc = jax.lax.broadcasted_iota(jnp.int32, (zb, W), 0)
        wlane = jax.lax.broadcasted_iota(jnp.int32, (zb, W), 1)
        z_glob = zloc + j * zb
        y = wlane // Xh
        k = wlane - y * Xh
        s0 = ((t + z_glob + y + parity) % 2) == 0
        k_last = k == Xh - 1
        k_first = k == 0

        def _f32(v):
            return v.astype(jnp.float32) if bf16 else v

        def psi(slot, s, c, ri):
            return _f32(slab_c[slot, (s * 3 + c) * 2 + ri])

        nrows = 2 if recon12 else 3
        _row2_cache = {}

        def _gauge_row2(d, fb):
            key = (d, fb)
            if key not in _row2_cache:
                def g2(a, b, ri):
                    return _f32(g_ref[0, (((d * 2 + fb) * nrows + a) * 3
                                          + b) * 2 + ri])
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
            return _f32(g_ref[0, (((d * 2 + fb) * nrows + a) * 3 + b) * 2
                              + ri])

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
            row = (s * 3 + c) * 2 + ri
            v = psi(slot_c, *ch)
            if forward:
                edge = _f32(slab_e[slot_c, row, 1:2])
                return jnp.concatenate([v[1:], edge], axis=0)
            else:
                edge = _f32(slab_e[slot_c, row, 0:1])
                return jnp.concatenate([edge, v[:zb - 1]], axis=0)

        def neighbor(mu, forward, s, c, ri):
            ch = (s, c, ri)
            if mu == 3:
                return psi(slot_tp if forward else slot_tm, *ch)
            if mu == 2:
                return shift_z(ch, forward)
            v = psi(slot_c, *ch)
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

        for kk in range(12):
            out_ref[0, 2 * kk] = acc[kk][0]
            out_ref[0, 2 * kk + 1] = acc[kk][1]

    return kernel


@partial(jax.jit, static_argnames=("parity", "geom", "dagger", "zb",
                                   "interpret", "recon12", "bf16"))
def dslash_parity_pallas4(ud, psi_opp, parity: int, geom: Geometry,
                          dagger: bool = False, zb: int = 8,
                          interpret: bool = False, recon12: bool = False,
                          bf16: bool = False):
    """v4 ring-buffer dslash: same semantics as dslash_parity_pallas2.

    Requires T % 4 == 0 and T >= 4 (slot arithmetic); falls back to the
    caller to pick v2 otherwise."""
    T, Z, W = geom.T, geom.Z, geom.W
    if not interpret:
        # The ring buffer uses traced-destination DMA slots
        # (slab.at[slot]) and DMAs under multiple pl.when branches —
        # both documented to HANG the axon TPU backend (see module
        # docstring / .claude/skills/verify/SKILL.md).  Refuse to lower
        # on hardware until the backend fix lands; the kernel remains
        # runnable (and tested) in interpret mode.
        raise NotImplementedError(
            "dslash_parity_pallas4 hangs on the TPU backend "
            "(traced-destination/conditional DMA); use interpret=True "
            "for semantics, or dslash_parity_pallas5 in production")
    if T % 4 or T < 4:
        raise ValueError("v4 kernel requires T % 4 == 0 and T >= 4")
    if not interpret and W % 128:
        # Mosaic constraint: DMA slices of an HBM memref must be
        # lane-aligned, so the merged Y*X/2 axis must fill whole
        # 128-lane tiles (every production lattice does; tiny test
        # lattices use interpret mode or the v2 kernel)
        raise ValueError(f"v4 kernel requires W % 128 == 0, got W={W}")
    if bf16 and zb < 16:
        zb = 16
    if Z % zb:
        zb = Z
    nz = Z // zb
    cdt = jnp.bfloat16 if bf16 else jnp.float32
    psi_ch = _to_channels(psi_opp).astype(cdt)           # [T, 24, Z, W]
    g = ud[:, parity][:, :, :2] if recon12 else ud[:, parity]
    g_ch = _to_channels(g).astype(cdt)
    ng = 96 if recon12 else 144

    kernel = _kernel_v4(geom, dagger, zb, parity, recon12, bf16)

    out = pl.pallas_call(
        kernel,
        grid=(nz, T),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((1, ng, zb, W), lambda j, i: (i, 0, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 24, zb, W), lambda j, i: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 24, Z, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((4, 24, zb, W), cdt),
            pltpu.VMEM((4, 24, 2, W), cdt),
            pltpu.SemaphoreType.DMA((4, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(psi_ch, g_ch)
    return _from_channels(out, (4, 3))
