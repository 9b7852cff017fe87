"""Aggregation transfer operators: geometric blocking, chirality-preserving
spin blocking, block orthonormalisation, restrict (R) and prolongate (P).

The analogue of the reference Transfer class (reference include/transfer.h:30,
lib/transfer.cpp; kernels lib/restrictor.cu:161, lib/prolongator.cu:119;
BlockOrthogonalize lib/transfer_util.cu).

Conventions:
  * geometric blocks (bx,by,bz,bt), default 4^4 (reference
    tests/multigrid_invert_test.cpp:227)
  * spin block size 2 at the fine level: coarse spin = 2 chiralities,
    which gamma5 = diag(+,+,-,-) makes exact chirality blocks in the
    DeGrand-Rossi basis (reference spin_block_size,
    CalcMG_2pt3pt_EvenOdd.cpp:435)
  * coarse dof per site = 2 (chirality) x n_vec

Blocked intermediate layout: [Tc, Zc, Yc, Xc, bv, 4, 3] with bv the
intra-block site index (t-major, x-minor).  Conversions go through the
lexicographic layout; transfers run once per V-cycle level so this is
not the hot path (the coarse stencil is).

Coarse field layout: [2(chir), nvec, Tc, Zc, Yc, Xc].
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from quda_qkxtm_multigrid_tpu.utils.precision import heinsum

from quda_qkxtm_multigrid_tpu.lattice import (
    Geometry, spinor_to_lex, spinor_from_lex)


@dataclasses.dataclass(frozen=True)
class BlockGeometry:
    fine: Geometry
    bx: int = 4
    by: int = 4
    bz: int = 4
    bt: int = 4
    nvec: int = 24

    def __post_init__(self):
        for d, b in zip(self.fine.dims, (self.bx, self.by, self.bz, self.bt)):
            if d % b:
                raise ValueError(f"block {b} does not divide dim {d}")

    @property
    def coarse_dims(self):
        f = self.fine
        return (f.X // self.bx, f.Y // self.by, f.Z // self.bz, f.T // self.bt)

    @property
    def block_volume(self) -> int:
        return self.bx * self.by * self.bz * self.bt

    @property
    def coarse_shape(self):
        xc, yc, zc, tc = self.coarse_dims
        return (tc, zc, yc, xc)

    @property
    def coarse_dof(self) -> int:
        return 2 * self.nvec


def to_blocked(psi, bg: BlockGeometry):
    """[2,4,3,T,Z,W] → [Tc,Zc,Yc,Xc, bv, 4, 3]."""
    g = bg.fine
    lex = spinor_to_lex(psi, g)                        # [T,Z,Y,X,4,3]
    xc, yc, zc, tc = bg.coarse_dims
    r = lex.reshape(tc, bg.bt, zc, bg.bz, yc, bg.by, xc, bg.bx, 4, 3)
    r = r.transpose(0, 2, 4, 6, 1, 3, 5, 7, 8, 9)
    return r.reshape(tc, zc, yc, xc, bg.block_volume, 4, 3)


def from_blocked(blk, bg: BlockGeometry):
    g = bg.fine
    xc, yc, zc, tc = bg.coarse_dims
    r = blk.reshape(tc, zc, yc, xc, bg.bt, bg.bz, bg.by, bg.bx, 4, 3)
    r = r.transpose(0, 4, 1, 5, 2, 6, 3, 7, 8, 9)
    lex = r.reshape(g.T, g.Z, g.Y, g.X, 4, 3)
    return spinor_from_lex(lex, g)


# chirality halves of the spin axis in the blocked layout (axis -2)
def _chiral_split(blk):
    """[..., 4, 3] → [..., 2(ch), 2(s), 3]."""
    return blk.reshape(blk.shape[:-2] + (2, 2, 3))


# --- flat (chirality-LEADING, lane-aligned) blocked layout --------------
# The PRODUCTION blocked layout: [2(ch), Tc,Zc,Yc,Xc, bdof] with
# bdof = block_volume*2*3 flattened (bv-major, spin, color minor).  Two
# layout rules both matter on TPU:
#   (1) the minor dim (1536 at 4⁴ blocking) is an exact lane multiple,
#       so restrict/prolong become MXU-shaped [nvec × bdof] contractions
#       (the [.., bv, 4, 3] form gives XLA (4,3)/16-wide minor dims it
#       pads to the (8,128) tile — an 8-28x HBM expansion);
#   (2) the chirality axis must NOT sit second-minor: program-BOUNDARY
#       arrays get the default descending layout, and a [..., 2, 1536]
#       boundary tile-pads the 2-axis to 8 — a 4x expansion that OOMed
#       the 32³×64 conversion program outright (bisected on-chip r3,
#       /tmp/ortho_probe variants a-d all failing in the map-convert).
#       Leading ch gives boundary minor dims (Xc, bdof) = (8, 1536):
#       tile-exact.


def to_blocked_flat(psi, bg: BlockGeometry):
    """[2,4,3,T,Z,W] → [2(ch), Tc,Zc,Yc,Xc, bv*6].

    STAGED pad-free route (r4 on-chip compile report: the direct
    transpose materialised the [.., bv, 4, 3]-minor intermediate at
    32x tile padding — 3.0 GB for a 96 MB field inside the V-cycle):
      1. dof-leading lex (every minor a site dim),
      2. move (s, r) inboard while (Y, X) = (32, 32) is still the
         minor pair — tile-exact copy,
      3. aggregate transpose whose output merges the
         (bt,bz,by,bx,s,r) = 1536 tail — tile-exact copy.
    Every materialised array here has a (≥8, ≥128-multiple) minor
    pair; XLA fuses each transpose+merge into one unpadded copy."""
    from quda_qkxtm_multigrid_tpu.lattice import spinor_to_lex_dof_leading
    g = bg.fine
    xc, yc, zc, tc = bg.coarse_dims
    lexd = spinor_to_lex_dof_leading(psi, g)        # [4,3,T,Z,Y,X]
    s1 = lexd.reshape(2, 2, 3, g.T, g.Z, g.Y, g.X)  # free: 4→(ch,s)
    s1 = s1.transpose(0, 3, 4, 1, 2, 5, 6)          # [ch,T,Z,s,r,Y,X]
    s2 = s1.reshape(2, tc, bg.bt, zc, bg.bz, 2, 3,
                    yc, bg.by, xc, bg.bx)           # free splits
    s2 = s2.transpose(0, 1, 3, 7, 9, 2, 4, 8, 10, 5, 6)
    #                 [ch,tc,zc,yc,xc,bt,bz,by,bx,s,r]
    return s2.reshape(2, tc, zc, yc, xc, bg.block_volume * 6)


def from_blocked_flat(flat, bg: BlockGeometry):
    """[2(ch), Tc,Zc,Yc,Xc, bv*6] → [2,4,3,T,Z,W] — the staged pad-free
    reverse of to_blocked_flat (same two tile-exact copies)."""
    from quda_qkxtm_multigrid_tpu.lattice import (
        spinor_from_lex_dof_leading)
    g = bg.fine
    xc, yc, zc, tc = bg.coarse_dims
    s2 = flat.reshape(2, tc, zc, yc, xc, bg.bt, bg.bz, bg.by, bg.bx,
                      2, 3)                          # free split
    # → [ch, tc,bt, zc,bz, s, r, yc,by, xc,bx]
    s2 = s2.transpose(0, 1, 5, 2, 6, 9, 10, 3, 7, 4, 8)
    s1 = s2.reshape(2, g.T, g.Z, 2, 3, g.Y, g.X)     # free merges
    s1 = s1.transpose(0, 3, 4, 1, 2, 5, 6)           # [ch,s,r,T,Z,Y,X]
    lexd = s1.reshape(4, 3, g.T, g.Z, g.Y, g.X)      # free merge
    return spinor_from_lex_dof_leading(lexd, g)


def block_orthonormalize_flat(v_stacked):
    """CholQR² of stacked flat null vectors: [nvec, 2, Tc,Zc,Yc,Xc, bdof]
    → the PRODUCTION aggregate-major PLANAR V storage: a (vr, vi) pair
    of REAL arrays [2, Tc,Zc,Yc,Xc, nvec, bdof] (every (aggregate,
    chirality) an independent orthonormalisation block).

    Aggregate-major with the (nvec, bdof) = (24, 1536) minor pair is
    tile-exact under any layout XLA picks at a program boundary — the
    vector-major form kept acquiring transposed 8x-padded copies
    on-chip (r3 bisect).  PLANAR (split re/im) because every program
    consuming a COMPLEX V re-materialises X64SplitHigh/Low copies of
    the full 4.8 GB array as HLO temps at 32³×64 (r4 on-chip compile
    report: 2 × 2.25 GB per column program of the coarse build, the
    final 0.7 GB of the north-star OOM); planar storage feeds the
    real-arithmetic einsums directly in storage layout."""
    v = jnp.moveaxis(v_stacked, 0, -2)        # [2, XC.., n, d]
    pair = (jnp.real(v), jnp.imag(v))
    return cholqr_pass_ri(cholqr_pass_ri(pair))


def cholqr_pass_ri(pair):
    """cholqr_pass on the planar (vr, vi) pair: the gram and the
    L^{-dag} application run as real einsums on storage-layout
    operands; only the tiny [A, n, n] complex factors reach the
    Cholesky/TriangularSolve custom calls."""
    vr, vi = pair
    shp = vr.shape
    n, d = shp[-2], shp[-1]
    vr = vr.reshape(-1, n, d)
    vi = vi.reshape(-1, n, d)
    # G[m,n] = sum_d conj(V[m,d]) V[n,d]
    g_re = heinsum("amd,and->amn", vr, vr) \
        + heinsum("amd,and->amn", vi, vi)
    g_im = heinsum("amd,and->amn", vr, vi) \
        - heinsum("amd,and->amn", vi, vr)
    g = jax.lax.complex(g_re, g_im)
    l = jnp.linalg.cholesky(g)
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
           ).astype(g.dtype)
    linv = jax.scipy.linalg.solve_triangular(
        l, jnp.broadcast_to(eye, l.shape), lower=True)
    lc = jnp.conj(linv)
    lr, li = jnp.real(lc), jnp.imag(lc)
    # (V L^{-dag})[n] = sum_m V[m] conj(L^{-1})[n, m]
    nr = heinsum("amd,anm->and", vr, lr) \
        - heinsum("amd,anm->and", vi, li)
    ni = heinsum("amd,anm->and", vr, li) \
        + heinsum("amd,anm->and", vi, lr)
    return nr.reshape(shp), ni.reshape(shp)


def _block_gs(v, axes):
    """Modified Gram-Schmidt over the leading (nvec) axis, inner product
    summed over ``axes``; all other axes (aggregate site, chirality) are
    independent orthonormalisation blocks.  KEPT AS THE TEST ORACLE for
    the production CholQR² path (_cholqr): both produce the Q factor of
    the positive-diagonal QR, so they agree to roundoff."""
    nvec = v.shape[0]
    ortho = []
    for k in range(nvec):
        vk = v[k]
        for j in range(k):
            ip = jnp.sum(jnp.conj(ortho[j]) * vk, axis=axes, keepdims=True)
            vk = vk - ip * ortho[j]
        nrm = jnp.sqrt(jnp.sum(jnp.abs(vk) ** 2, axis=axes, keepdims=True))
        vk = vk / jnp.where(nrm > 0, nrm, 1.0)
        ortho.append(vk)
    return jnp.stack(ortho)


def cholqr_pass(v):
    """One CholQR pass over the aggregate-major stack [..., n, d]:
    G = V†V per batch row, V ← V L^{-dag}.  All big operands stay 3D
    [A, n, d] with tile-exact dims; only [A, n, n] factors reach the
    Cholesky/TriangularSolve custom calls (the full-size-operand and
    7-axis forms both acquire 8x tile-padded layout copies on this
    backend — bisected on-chip r3, /tmp/probe4-5)."""
    shp = v.shape
    n, d = shp[-2], shp[-1]
    v = v.reshape(-1, n, d)
    g = heinsum("amd,and->amn", jnp.conj(v), v)
    l = jnp.linalg.cholesky(g)
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
           ).astype(v.dtype)
    linv = jax.scipy.linalg.solve_triangular(
        l, jnp.broadcast_to(eye, l.shape), lower=True)
    # (V L^{-dag})[n] = sum_m V[m] conj(L^{-1})[n, m]
    v = heinsum("amd,anm->and", v, jnp.conj(linv))
    return v.reshape(shp)


def _cholqr(v, passes: int = 2):
    """CholQR² block orthonormalisation of v [n, ..., d] over the
    leading axis, inner products over the LAST axis: G = V†V = L L†,
    V ← V L^{-†} — the Q of the positive-diagonal QR, identical to
    modified Gram-Schmidt up to roundoff, in one einsum + one batched
    24×24 Cholesky + one triangular solve instead of n sequential
    projection sweeps.  Two passes recover MGS-level orthogonality
    (standard CholQR2).  Production choice for TPU: the d axis stays
    minor-most and lane-aligned, where the sequential MGS holds O(n)
    full-size temporaries and its tiny-minor-dims einsums get padded
    to the (8,128) tile (a 32³×64 HBM OOM, bisected on-chip r3)."""
    shp = v.shape
    n, d = shp[0], shp[-1]
    # Flatten every batch axis to ONE: with the 7-axis blocked shape,
    # XLA's TPU layout assignment picks a transposed operand layout for
    # the gram dot whose (8,128) tile padding is an 8x HBM expansion
    # (38 GB at 32³×64 nvec=24, bisected on-chip r3); as a plain 3D
    # batched matmul the operand copy target is the natural
    # (nvec, bdof)-minor layout, which is tile-exact.
    v = v.reshape(n, -1, d)
    for _ in range(passes):
        g = heinsum("mad,nad->amn", jnp.conj(v), v)
        l = jnp.linalg.cholesky(g)
        # Invert L on the SMALL [a, n, n] system and apply it to V as a
        # batched matmul: feeding the full-size V into the
        # TriangularSolve custom call materialises another bad-layout
        # copy; here only [a, 24, 24] factors reach the custom call.
        eye = jnp.broadcast_to(jnp.eye(n, dtype=l.dtype), l.shape)
        linv = jax.scipy.linalg.solve_triangular(l, eye, lower=True)
        # (V L^{-dag})[n] = sum_m V[m] conj(L^{-1})[n, m]
        v = heinsum("mad,anm->nad", v, jnp.conj(linv))
    return v.reshape(shp)


def block_orthonormalize(v_blocked):
    """Orthonormalise the n_vec vectors within every (aggregate,
    chirality) independently (reference BlockOrthogonalize,
    lib/transfer_util.cu:567) via CholQR² in a chirality-major layout
    whose flattened block-dof axis (bv*2*3 = 1536 at 4⁴ blocking) is
    exactly lane-aligned.

    v_blocked [nvec, Tc,Zc,Yc,Xc, bv, 4, 3] → same, orthonormal per
    (aggregate, chirality)."""
    n = v_blocked.shape[0]
    lead = v_blocked.shape[1:5]
    bv = v_blocked.shape[5]
    v = v_blocked.reshape(v_blocked.shape[:-2] + (2, 2, 3))
    v = jnp.moveaxis(v, -3, -4)               # [n, ..., ch, bv, s, 3]
    v = v.reshape((n,) + lead + (2, bv * 6))
    v = _cholqr(v)
    v = v.reshape((n,) + lead + (2, bv, 2, 3))
    v = jnp.moveaxis(v, -4, -3)               # [n, ..., bv, ch, s, 3]
    return v.reshape(v_blocked.shape)


# NOTE: there is deliberately NO lex-view (12-axis einsum) restrict or
# prolong: both spellings make XLA's layout assignment treat V as the
# matrix side of a mat-vec whose FREE/CONTRACT nvec axis goes MINOR —
# a 24 → 128 lane tile-padded copy of the whole V (25.7 GB at 32³×64,
# isolated per-op with scripts/ns_bisect.py on-chip r3).  The flat-form
# einsums below keep V in its natural [batch, n, bdof] layout (proven
# pad-free in the same bisect); the to/from_blocked_flat conversion
# costs ~1 padded field copy per call, which the coarse-op build bounds
# by serialising hops (lax.scan) at small column batch.


@partial(jax.tree_util.register_dataclass, data_fields=["v"],
         meta_fields=["bg"])
@dataclasses.dataclass(frozen=True)
class Transfer:
    """Packed aggregate matrix V (orthonormal per aggregate+chirality),
    stored AGGREGATE-MAJOR in the flat blocked layout (see
    block_orthonormalize_flat): the (nvec, bdof) minor pair is
    tile-exact at every program boundary and restrict/prolong are
    MXU-shaped [nvec × bdof] contractions per aggregate."""

    v: Any    # PLANAR pair (vr, vi), each [2(ch), Tc,Zc,Yc,Xc, nvec, bv*6]
    bg: BlockGeometry

    @property
    def v_complex(self):
        """Complex view of the planar pair (test/oracle tier; never in
        production programs — it would re-materialise the full V)."""
        return jax.lax.complex(*self.v)

    def _ein(self, spec, a, b):
        """Planar contraction against a V plane.  In the bf16 storage
        tier (MGParams.vec_dtype, reference precision_null quda.h:351)
        the FIELD side is cast down to match: a mixed bf16×f32 einsum
        would be promoted by jnp, re-materialising an f32 copy of the
        whole V plane in-program — the exact HBM copy planar storage
        exists to avoid.  bf16×bf16 contracts natively on the MXU;
        preferred_element_type keeps the accumulation/output f32."""
        if a.dtype == jnp.bfloat16:
            out_dt = jnp.float32 if b.dtype == jnp.bfloat16 else b.dtype
            return jnp.einsum(spec, a, b.astype(jnp.bfloat16),
                              preferred_element_type=out_dt)
        return heinsum(spec, a, b)

    @property
    def _bg_slab(self):
        """BlockGeometry of ONE tc slab (fine T = bt, coarse tc = 1)."""
        bg = self.bg
        g = bg.fine
        from quda_qkxtm_multigrid_tpu.lattice import Geometry as _G
        return BlockGeometry(_G(g.X, g.Y, g.Z, bg.bt), bg.bx, bg.by,
                             bg.bz, bg.bt, bg.nvec)

    def restrict(self, psi):
        """fine [2,4,3,T,Z,W] → coarse [2(ch), nvec, Tc,Zc,Yc,Xc]
        (reference Transfer::R, transfer.h:188).  Real-arithmetic
        STORAGE-LAYOUT einsums on the planar V (bdof-minor contraction
        on both operands — an interleaved-view formulation made XLA
        re-lay the whole V nvec-minor, 2 × 12 GB at 32³×64, r4 on-chip
        report), executed as a lax.map over tc SLABS: the
        canonical→blocked layout conversion unavoidably materialises a
        tile-padded transposed copy, so it runs per slab to bound the
        arena at 1/Tc of the field (3.0 GB → ~0.2 GB per V-cycle at
        32³×64, r4 on-chip compile report).
        S = conj(V)·f: S_re = vr·fr + vi·fi, S_im = vr·fi − vi·fr."""
        vr, vi = self.v
        bg = self.bg
        bgs = self._bg_slab
        tc = bg.coarse_shape[0]
        # [2,4,3,T,Z,W] → [2,4,3, tc, bt, Z, W] (free view; slabs are
        # dynamic tc-slices, never a moved-axis copy)
        psi_r = psi.reshape(psi.shape[:3] + (tc, bg.bt) + psi.shape[4:])

        def one(a):
            # dynamic tc-slice of V in place (a moveaxis'd V copy would
            # double its residency); the slab field slice likewise
            ps = jax.lax.dynamic_index_in_dim(psi_r, a, 3, False)
            vr_a = jax.lax.dynamic_index_in_dim(vr, a, 1, False)
            vi_a = jax.lax.dynamic_index_in_dim(vi, a, 1, False)
            flat = to_blocked_flat(ps, bgs)[:, 0]      # [ch, ZC.., d]
            fr, fi = jnp.real(flat), jnp.imag(flat)
            s_re = self._ein("c...nd,c...d->cn...", vr_a, fr) \
                + self._ein("c...nd,c...d->cn...", vi_a, fi)
            s_im = self._ein("c...nd,c...d->cn...", vr_a, fi) \
                - self._ein("c...nd,c...d->cn...", vi_a, fr)
            return jax.lax.complex(s_re, s_im)         # [ch, n, ZC..]

        out = jax.lax.map(one, jnp.arange(tc))
        return jnp.moveaxis(out, 0, 2)    # [ch, n, tc, Zc, Yc, Xc]

    def prolong(self, vc):
        """coarse [2, nvec, Tc,Zc,Yc,Xc] → fine [2,4,3,T,Z,W]
        (reference Transfer::P, transfer.h:181); storage-layout einsums
        per tc slab (see restrict)."""
        bg = self.bg
        bgs = self._bg_slab
        vr, vi = self.v

        def one(a):
            w = jax.lax.dynamic_index_in_dim(vc, a, 2, False)
            vr_a = jax.lax.dynamic_index_in_dim(vr, a, 1, False)
            vi_a = jax.lax.dynamic_index_in_dim(vi, a, 1, False)
            wr, wi = jnp.real(w), jnp.imag(w)          # [ch, n, ZC..]
            fr = self._ein("c...nd,cn...->c...d", vr_a, wr) \
                - self._ein("c...nd,cn...->c...d", vi_a, wi)
            fi = self._ein("c...nd,cn...->c...d", vr_a, wi) \
                + self._ein("c...nd,cn...->c...d", vi_a, wr)
            return from_blocked_flat(
                jax.lax.complex(fr, fi)[:, None], bgs)  # [2,4,3,bt,Z,W]

        tc = bg.coarse_shape[0]
        out = jax.lax.map(one, jnp.arange(tc))
        # [tc, 2,4,3, bt, Z, W] → [2,4,3,T,Z,W]
        out = jnp.moveaxis(out, 0, 3)
        return out.reshape(out.shape[:3] + (-1,) + out.shape[5:])

    def flops(self) -> int:
        """8 * nvec * fine-dof per site (reference transfer.cpp R flops)."""
        return 8 * self.bg.nvec * 12 * self.bg.fine.volume


# ---------------------------------------------------------------------
# dof-generic transfer between coarse levels (MG level >= 2)
#
# The analogue of the reference's coarse-to-coarse Transfer used by
# CoarseCoarseOp (reference lib/coarsecoarse_op.cu, transfer.cpp with
# Nc = n_vec): fields live in the coarse layout [ns=2, nc, T,Z,Y,X]
# with ns the preserved coarse spin (spin_block_size = 1 at level >= 1,
# i.e. each coarse spin is its own chirality block).
# ---------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CoarseBlockGeometry:
    """Geometric blocking of a coarse lattice (dims given as
    (T, Z, Y, X) of the level being coarsened)."""

    fine_shape: tuple           # (T1, Z1, Y1, X1)
    fine_ns: int                # coarse spin (2)
    fine_nc: int                # nvec of the level being coarsened
    bx: int = 2
    by: int = 2
    bz: int = 2
    bt: int = 2
    nvec: int = 24

    def __post_init__(self):
        t1, z1, y1, x1 = self.fine_shape
        for d, b in ((x1, self.bx), (y1, self.by), (z1, self.bz),
                     (t1, self.bt)):
            if d % b:
                raise ValueError(
                    f"block does not divide coarse dim: {self.fine_shape} "
                    f"/ ({self.bt},{self.bz},{self.by},{self.bx})")

    @property
    def coarse_shape(self):
        t1, z1, y1, x1 = self.fine_shape
        return (t1 // self.bt, z1 // self.bz, y1 // self.by, x1 // self.bx)

    @property
    def block_volume(self) -> int:
        return self.bx * self.by * self.bz * self.bt

    @property
    def coarse_dof(self) -> int:
        return self.fine_ns * self.nvec


def to_blocked_coarse(vc, bg: CoarseBlockGeometry):
    """[ns, nc, T1, Z1, Y1, X1] → [T2, Z2, Y2, X2, bv, ns, nc]."""
    ns, nc = bg.fine_ns, bg.fine_nc
    tc, zc, yc, xc = bg.coarse_shape
    r = jnp.moveaxis(vc, (0, 1), (-2, -1))      # [T1,Z1,Y1,X1,ns,nc]
    r = r.reshape(tc, bg.bt, zc, bg.bz, yc, bg.by, xc, bg.bx, ns, nc)
    r = r.transpose(0, 2, 4, 6, 1, 3, 5, 7, 8, 9)
    return r.reshape(tc, zc, yc, xc, bg.block_volume, ns, nc)


def from_blocked_coarse(blk, bg: CoarseBlockGeometry):
    ns, nc = bg.fine_ns, bg.fine_nc
    tc, zc, yc, xc = bg.coarse_shape
    r = blk.reshape(tc, zc, yc, xc, bg.bt, bg.bz, bg.by, bg.bx, ns, nc)
    r = r.transpose(0, 4, 1, 5, 2, 6, 3, 7, 8, 9)
    t1, z1, y1, x1 = bg.fine_shape
    r = r.reshape(t1, z1, y1, x1, ns, nc)
    return jnp.moveaxis(r, (-2, -1), (0, 1))


def block_orthonormalize_coarse(v_blocked):
    """v_blocked [nvec2, T2,Z2,Y2,X2, bv, ns, nc] → orthonormal per
    (aggregate site, coarse spin): inner-product axes bv and nc
    (CholQR² in the ns-major flattened layout, as block_orthonormalize)."""
    n = v_blocked.shape[0]
    lead = v_blocked.shape[1:5]
    bv, ns, nc = v_blocked.shape[-3:]
    v = jnp.moveaxis(v_blocked, -2, -3)       # [n, ..., ns, bv, nc]
    v = v.reshape((n,) + lead + (ns, bv * nc))
    v = _cholqr(v)
    v = v.reshape((n,) + lead + (ns, bv, nc))
    return jnp.moveaxis(v, -3, -2)


@partial(jax.tree_util.register_dataclass, data_fields=["v"],
         meta_fields=["bg"])
@dataclasses.dataclass(frozen=True)
class CoarseTransfer:
    """Aggregation transfer between coarse layouts: restrict
    [ns, nc1, T1...] → [ns, nvec2, T2...] (coarse spin preserved)."""

    v: Any                      # [nvec2, T2,Z2,Y2,X2, bv, ns, nc1]
    bg: CoarseBlockGeometry

    def restrict(self, vc):
        blk = to_blocked_coarse(vc, self.bg)           # [...,bv,ns,nc]
        return heinsum("n...bsc,...bsc->sn...", jnp.conj(self.v), blk)

    def prolong(self, vc2):
        blk = heinsum("n...bsc,sn...->...bsc", self.v, vc2)
        return from_blocked_coarse(blk, self.bg)
