"""Explicit coarse operator: X (clover-like diagonal) + 8 directional
links Y, built by probing the fine operator through the transfer.

The analogue of CoarseOp/calculateY (reference lib/coarse_op.cu:17-118,
coarse stencil lib/dslash_coarse.cu:336-660, dispatch
lib/dirac_coarse.cpp:118-154).

Construction (probing with coarse 2-colouring): prolongate a unit coarse
basis vector placed on all coarse sites of one colour, apply one fine
hop direction, restrict.  Because every fine hop couples only adjacent
aggregates and the coarse lattice is bipartite (even coarse dims
required), the restriction separates cleanly:
  same-colour sites   → intra-aggregate (diagonal X) contribution
  other-colour sites  → the coarse link Y for that direction.
The diagonal fine term (A) probes X directly.

Coarse layouts:
  field  vc [2(chir), nvec, Tc, Zc, Yc, Xc]  (dof = 2*nvec flattened for
         matrix application)
  X      [dof, dof, Tc, Zc, Yc, Xc]
  Y      [8(dir: 2*mu+ (0 fwd | 1 bwd)), dof, dof, Tc, Zc, Yc, Xc]

Coarse dslash flops: (8*(8n^2) - 2n)/site, n = 2*nvec
(reference lib/dirac_coarse.cpp:154).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from quda_qkxtm_multigrid_tpu.utils.precision import heinsum
import numpy as np

from quda_qkxtm_multigrid_tpu.mg.transfer import BlockGeometry, Transfer


def _coarse_parity_mask(coarse_shape):
    tc, zc, yc, xc = coarse_shape
    t = np.arange(tc).reshape(-1, 1, 1, 1)
    z = np.arange(zc).reshape(1, -1, 1, 1)
    y = np.arange(yc).reshape(1, 1, -1, 1)
    x = np.arange(xc).reshape(1, 1, 1, -1)
    return (t + z + y + x) % 2    # [Tc,Zc,Yc,Xc]


# coarse roll axis for mu (coarse field trailing axes [Tc,Zc,Yc,Xc])
def _axis_of_mu(mu):
    return {0: -1, 1: -2, 2: -3, 3: -4}[mu]


@partial(jax.tree_util.register_dataclass, data_fields=["x", "y"],
         meta_fields=["bg"])
@dataclasses.dataclass(frozen=True)
class CoarseOperator:
    """Coarse links/clover with the site axis FLAT: x [dof, dof, cvol],
    y [8, dof, dof, cvol].  The flat minor pair (dof, cvol) is
    tile-exact under TPU T(8,128) tiling; the [.., Tc,Zc,Yc,Xc] form's
    minor pair (Yc, Xc) tile-pads 8-32x at rest (Y alone would be
    9.7 GB at 32³×64 — bisected on-chip r4)."""
    x: Any                       # [dof, dof, cvol]
    y: Any                       # [8, dof, dof, cvol]
    bg: BlockGeometry

    def apply(self, vc):
        """vc [2, nvec, Tc,Zc,Yc,Xc] → Dc vc (same shape)."""
        dof = self.bg.coarse_dof
        v = vc.reshape((dof,) + vc.shape[2:])
        out = heinsum("abs,bs->as", self.x, v.reshape(dof, -1))
        for mu in range(4):
            ax = _axis_of_mu(mu)
            fwd = jnp.roll(v, -1, axis=ax).reshape(dof, -1)  # v(xc+mu)
            bwd = jnp.roll(v, 1, axis=ax).reshape(dof, -1)
            out = out + heinsum("abs,bs->as", self.y[2 * mu], fwd)
            out = out + heinsum("abs,bs->as", self.y[2 * mu + 1], bwd)
        return out.reshape(vc.shape)

    def flops_per_apply(self) -> int:
        n = self.bg.coarse_dof
        vc = int(np.prod(self.bg.coarse_shape))
        return (8 * (8 * n * n) - 2 * n) * vc


def coarse_diag_hops(op: CoarseOperator):
    """Split a CoarseOperator into (diag_apply, hop_terms) over the
    coarse field layout [2, nc, T,Z,Y,X] — the probe inputs for
    constructing the NEXT level (the role of CoarseCoarseOp,
    reference lib/coarsecoarse_op.cu)."""
    dof = op.bg.coarse_dof

    def diag_apply(vc):
        v = vc.reshape((dof,) + vc.shape[2:])
        out = heinsum("abs,bs->as", op.x, v.reshape(dof, -1))
        return out.reshape(vc.shape)

    hop_terms = []
    for d in range(8):
        def h(vc, d=d):
            mu = d // 2
            shift = -1 if d % 2 == 0 else 1   # fwd hop reads v(x+mu)
            v = vc.reshape((dof,) + vc.shape[2:])
            nb = jnp.roll(v, shift, axis=_axis_of_mu(mu))
            out = heinsum("abs,bs->as", op.y[d], nb.reshape(dof, -1))
            return out.reshape(vc.shape)
        hop_terms.append(h)
    return diag_apply, hop_terms


def _face_masks(bt: int, bz: int, by: int, bx: int) -> np.ndarray:
    """[8, block_volume] float masks selecting, per hop direction
    d = 2*mu + (0 fwd | 1 bwd), the intra-block sites whose hop operand
    lives in the NEIGHBOURING aggregate: fwd reads psi(x+mu) so the
    forward-mu face (coord == b-1) crosses; bwd reads psi(x-mu) so the
    coord == 0 face crosses.  bv ordering is t-major, x-minor
    (mg/transfer.to_blocked)."""
    it, iz, iy, ix = np.meshgrid(np.arange(bt), np.arange(bz),
                                 np.arange(by), np.arange(bx),
                                 indexing="ij")
    coords = {0: (ix, bx), 1: (iy, by), 2: (iz, bz), 3: (it, bt)}
    masks = []
    for mu in range(4):
        c, b = coords[mu]
        masks.append((c == b - 1).reshape(-1))   # fwd
        masks.append((c == 0).reshape(-1))       # bwd
    return np.stack(masks).astype(np.float64)


def build_coarse_op_direct(transfer: "Transfer", diag_apply=None,
                           hop_terms=None, dtype=None,
                           batch: int | None = None,
                           terms_fn: Callable | None = None,
                           ctx: Any = None,
                           diag_fn: Callable | None = None,
                           hops_fn: Callable | None = None,
                           ctx_diag: Any = None,
                           ctx_hops: Any = None) -> CoarseOperator:
    """Direct V†(op)V coarse-op construction — the TPU form of the
    reference's calculateY (reference lib/coarse_op.cu:17-118), replacing
    the bipartite probing build.

    For every coarse column j = (chirality c, vector b): the source is
    the chirality-c-masked null vector w = P_c v_b (what prolongating a
    unit coarse vector at EVERY coarse site yields).  Each fine hop term
    h_d(w)(x) depends only on w at the single shifted site x ± mu, so in
    blocked layout the restriction splits EXACTLY by the intra-block
    face masks: contributions from block-face sites came from the
    neighbouring aggregate (the coarse link Y_d), interior sites from
    the same aggregate (the X part).  No prolongations, no coarse
    2-colouring, no even-coarse-dims restriction.

    The dof columns run as ONE traced program dispatched per column
    with DONATED [dof, dof, cvol] accumulators (the
    _ortho_blocked_batched pattern): the round-3 lax.map form stacked a
    [dof, 17, 2, n, cvol] temp whose layout-assignment copy tile-padded
    nvec 24 → 128 lanes (2×6.38 GB at 32³×64 — the r3/r4 north-star
    OOM, bisected on-chip).  The accumulators ARE the final flat
    storage, so no post-assembly reshape/copy exists at all.

    Production callers pass ``diag_fn(ctx_diag) -> diag_apply`` and
    ``hops_fn(ctx_hops) -> hop_terms`` with each ctx a pytree jit
    ARGUMENT (axon backend: device-array closures become IR constants →
    forced host transfer), split so the DIAG program carries only the
    clover-term arrays and the HOPS program only the gauge field: the
    combined-ctx form passed the whole Dirac bundle into every column
    program — 7.45 GB of arguments beside a 10.8 GB program at 32³×64,
    2.5 GB past HBM (r4 on-chip compile report).  ``terms_fn(ctx) ->
    (diag_apply, hop_terms)`` and eager closures (diag_apply,
    hop_terms) remain supported for CPU oracles/tests.  ``batch`` is
    accepted for API compatibility and ignored."""
    from quda_qkxtm_multigrid_tpu.mg.transfer import (
        to_blocked_flat, from_blocked_flat)

    bg = transfer.bg
    n, dof = bg.nvec, bg.coarse_dof
    cshape = bg.coarse_shape
    cvol = int(np.prod(cshape))
    if terms_fn is not None:
        diag_fn = lambda c: terms_fn(c)[0]           # noqa: E731
        hops_fn = lambda c: terms_fn(c)[1]           # noqa: E731
        ctx_diag = ctx_hops = ctx
    elif diag_fn is None:
        if len(hop_terms) != 8:
            raise ValueError(f"expected 8 hop terms, got {len(hop_terms)}")
        _d, _h = diag_apply, tuple(hop_terms)
        diag_fn = lambda _c: _d                      # noqa: E731
        hops_fn = lambda _c: list(_h)                # noqa: E731
        ctx_diag = ctx_hops = 0
    # Face masks kept as NumPy IR constants: a device-array closure
    # lowers through the MLIR constant handler, whose d2h fetch is the
    # first op to die when HBM is at the edge (the r4 32³×64
    # north-star failure signature); a host constant embeds directly.
    # (Lex/interleaved-view restrict einsums are deliberately ABSENT:
    # XLA's layout assignment turns V into the mat-vec matrix side with
    # the nvec axis minor — a 24 → 128 lane tile-padded copy of the
    # whole V, 2 × 12.0 GB at 32³×64, measured in the r4 on-chip
    # compile report; see the matching note in mg/transfer.py.)
    masks = np.repeat(_face_masks(bg.bt, bg.bz, bg.by, bg.bx),
                      6, axis=1).astype(np.float32)

    def _column_source(vr, vi, j):
        # column source = chirality-masked null vector, computed as a
        # mask+reduce over V's n axis: BOTH the dynamic-slice
        # v[..., j % n, :] and the equivalent one-hot prolong einsum
        # make XLA materialise a transposed/slice-major V copy whose
        # tile padding is 2.25-38.6 GB at 32³×64 (bisected on-chip r3,
        # scripts/ns_bisect.py); the fused mask+sum reads V once in its
        # natural layout with no copy.  The n-reduce runs FIRST so the
        # chirality mask touches only the reduced [2, ..., bdof] field.
        c, b = j // n, j % n
        nmask = (jnp.arange(n) == b).astype(vr.dtype).reshape(
            1, 1, 1, 1, 1, n, 1)
        cmask = (jnp.arange(2) == c).astype(vr.dtype).reshape(
            2, 1, 1, 1, 1, 1)
        wr = from_blocked_flat((vr * nmask).sum(axis=5) * cmask, bg)
        wi = from_blocked_flat((vi * nmask).sum(axis=5) * cmask, bg)
        return jax.lax.complex(wr, wi).astype(dtype)

    def restrict_quad(vr, vi, hw, m=None):
        """Restrict a fine field (and, when m is given, its face-masked
        part) against the planar V with FOUR stacked real einsums per
        V plane — V read once per plane in STORAGE layout (d-minor
        contraction on both operands, no transposed/pad copies; the
        complex form additionally re-split V per program, 2 × 2.25 GB
        of X64Split temps — r4 on-chip report).

        Returns (tot, face) complex [2, n, coarse…]; face is None when
        m is None.  S = conj(V)·f: S_re = vr·fr + vi·fi,
        S_im = vr·fi − vi·fr."""
        flat = to_blocked_flat(hw, bg)
        fr, fi = jnp.real(flat), jnp.imag(flat)
        if m is None:
            stack = jnp.stack([fr, fi])
        else:
            mm = m.astype(fr.dtype)
            stack = jnp.stack([fr, fi, fr * mm, fi * mm])
        rr = heinsum("c...nd,kc...d->kcn...", vr, stack)
        ri = heinsum("c...nd,kc...d->kcn...", vi, stack)
        tot = jax.lax.complex(rr[0] + ri[1], rr[1] - ri[0])
        if m is None:
            return tot, None
        face = jax.lax.complex(rr[2] + ri[3], rr[3] - ri[2])
        return tot, face

    def _col_diag(vr, vi, ctx, xacc, j):
        diag_apply = diag_fn(ctx)
        w = _column_source(vr, vi, j)
        xdiag, _ = restrict_quad(vr, vi, diag_apply(w))
        return jax.lax.dynamic_update_slice(
            xacc, xdiag.reshape(dof, 1, cvol), (0, j, 0))

    def _col_hops(vr, vi, ctx, xacc, yacc, j):
        hop_terms = hops_fn(ctx)
        if len(hop_terms) != 8:
            raise ValueError(f"expected 8 hop terms, got {len(hop_terms)}")
        w = _column_source(vr, vi, j)

        def restrict_split(hw, d):
            """fine hop output → (intra-aggregate part, cross-aggregate
            part) coarse columns, split by the direction-d face mask."""
            tot, face = restrict_quad(vr, vi, hw, masks[d])
            return ((tot - face).reshape(2, n, cvol),
                    face.reshape(2, n, cvol))

        # hops SERIALISED by lax.scan (one live blocked-layout
        # conversion at a time; an unrolled loop keeps all 8 hop
        # temporaries live at once — a 71 GB compile-time HBM OOM at
        # 32³×64, bisected on-chip r3); X accumulates in the carry
        def body(xsum, d):
            xpart, ypart = jax.lax.switch(
                d, [lambda w, h=h, d=d: restrict_split(h(w), d)
                    for d, h in enumerate(hop_terms)], w)
            return xsum + xpart, ypart

        xsum, yh = jax.lax.scan(
            body, jnp.zeros((2, n, cvol), dtype), jnp.arange(8))
        xcol = jax.lax.dynamic_slice(xacc, (0, j, 0), (dof, 1, cvol))
        xacc = jax.lax.dynamic_update_slice(
            xacc, xcol + xsum.reshape(dof, 1, cvol), (0, j, 0))
        yacc = jax.lax.dynamic_update_slice(
            yacc, yh.reshape(8, dof, 1, cvol), (0, 0, j, 0))
        return xacc, yacc

    upd_diag = jax.jit(_col_diag, donate_argnums=(3,))
    upd_hops = jax.jit(_col_hops, donate_argnums=(3, 4))
    xacc = jax.jit(lambda: jnp.zeros((dof, dof, cvol), dtype))()
    yacc = jax.jit(lambda: jnp.zeros((8, dof, dof, cvol), dtype))()
    vr, vi = transfer.v
    for j in range(dof):
        xacc = upd_diag(vr, vi, ctx_diag, xacc, jnp.asarray(j))
    for j in range(dof):
        xacc, yacc = upd_hops(vr, vi, ctx_hops, xacc, yacc,
                              jnp.asarray(j))
    return CoarseOperator(x=xacc, y=yacc, bg=bg)


def build_coarse_op_direct_coarse(transfer2, diag_apply: Callable,
                                  hop_terms: list[Callable], dtype,
                                  batch: int = 16) -> CoarseOperator:
    """build_coarse_op_direct for a coarse→coarser level: same masked-
    source face-split construction over the dof-generic blocked layout
    (the analogue of CoarseCoarseOp, reference lib/coarsecoarse_op.cu).
    The preserved coarse spin (ns = 2) plays the chirality role."""
    from quda_qkxtm_multigrid_tpu.mg.transfer import (
        to_blocked_coarse, from_blocked_coarse)

    bg = transfer2.bg
    n, ns = bg.nvec, bg.fine_ns
    dof = bg.coarse_dof
    cshape = bg.coarse_shape
    if len(hop_terms) != 8:
        raise ValueError(f"expected 8 hop terms, got {len(hop_terms)}")
    v = transfer2.v                               # [n, XC..., bv, ns, nc]
    vc = jnp.conj(v)
    masks = jnp.asarray(_face_masks(bg.bt, bg.bz, bg.by, bg.bx))

    def restrict_blk(hb):
        return heinsum("n...bsc,...bsc->sn...", vc, hb)

    def cols_one(j):
        s0 = j // n
        smask = (jnp.arange(ns) == s0).astype(v.dtype)
        w_blk = v[j % n] * smask[:, None]
        w = from_blocked_coarse(w_blk, bg).astype(dtype)
        out = [restrict_blk(to_blocked_coarse(diag_apply(w), bg))]
        faces = []
        for d, h in enumerate(hop_terms):
            hb = to_blocked_coarse(h(w), bg)
            fb = hb * masks[d][:, None, None].astype(hb.dtype)
            tot = restrict_blk(hb)
            face = restrict_blk(fb)
            out.append(tot - face)
            faces.append(face)
        return jnp.stack(out + faces)

    cols = jax.lax.map(cols_one, jnp.arange(dof),
                       batch_size=min(batch, dof))
    cvol = int(np.prod(cshape))
    x_cols = cols[:, 0] + cols[:, 1:9].sum(axis=1)
    x = jnp.moveaxis(x_cols.reshape(dof, dof, cvol), 0, 1)
    y = jnp.stack([
        jnp.moveaxis(cols[:, 9 + d].reshape(dof, dof, cvol), 0, 1)
        for d in range(8)])
    return CoarseOperator(x=x, y=y, bg=bg)


def build_coarse_op(transfer, diag_apply: Callable,
                    hop_terms: list[Callable], dtype) -> CoarseOperator:
    """Probe the fine operator into coarse X and Y.

    diag_apply(fine) — the site-diagonal fine term (A for Wilson-type).
    hop_terms[d](fine) — the d-th directional hop INCLUDING its -kappa
    factor, d = 2*mu + (0 fwd | 1 bwd); fwd means the term reading
    psi(x+mu).
    """
    bg = transfer.bg
    cshape = bg.coarse_shape
    if len(hop_terms) != 8:
        raise ValueError(f"expected 8 hop terms, got {len(hop_terms)}")
    for d in cshape:
        if d % 2:
            raise ValueError(
                f"coarse dims {cshape} must be even for bipartite probing")
    dof = bg.coarse_dof
    nvec = bg.nvec
    cpar = jnp.asarray(_coarse_parity_mask(cshape))

    def basis_vc(idx, color):
        """Unit coarse vector (chir c, vec k) on all coarse sites of
        ``color``."""
        c, k = idx // nvec, idx % nvec
        vc = jnp.zeros((2, nvec) + cshape, dtype)
        return vc.at[c, k].set(jnp.where(cpar == color, 1.0, 0.0).astype(dtype))

    def probe(idx_color):
        idx, color = idx_color
        fine = transfer.prolong(basis_vc(idx, color))
        cols = [transfer.restrict(diag_apply(fine))]
        for h in hop_terms:
            cols.append(transfer.restrict(h(fine)))
        return jnp.stack(cols)    # [9, 2, nvec, Tc,Zc,Yc,Xc]

    idxs = jnp.arange(2 * dof)
    pairs = (idxs % dof, idxs // dof)   # color = 0 for first dof, 1 after
    probes = jax.lax.map(probe, pairs)  # [2*dof, 9, 2, nvec, ...]
    probes = probes.reshape(2, dof, 9, dof, *cshape)  # [color, b, term, a, site]

    same = jnp.stack([(cpar == c).astype(dtype) for c in (0, 1)])  # [2, site]
    other = jnp.stack([(cpar != c).astype(dtype) for c in (0, 1)])

    # X[a,b,site] = diag probe on same-colour sites + intra-aggregate
    # pieces of every hop on same-colour sites
    sm = same[:, None, None, None]      # [2,1,1,1,site...]
    ot = other[:, None, None, None]
    terms = probes                       # [color, b, term, a, site]
    x = (terms * sm).sum(axis=0)         # [b, term, a, site]
    x_total = x.sum(axis=1)              # diag + all intra-hop parts
    x_total = jnp.moveaxis(x_total, 0, 1)  # [a, b, site]

    ys = []
    yparts = (terms * ot).sum(axis=0)    # [b, term, a, site]
    for d in range(8):
        yd = yparts[:, 1 + d]            # [b, a, site]
        ys.append(jnp.moveaxis(yd, 0, 1))
    y = jnp.stack(ys)

    cvol = int(np.prod(cshape))
    return CoarseOperator(x=x_total.reshape(dof, dof, cvol),
                          y=y.reshape(8, dof, dof, cvol), bg=bg)
