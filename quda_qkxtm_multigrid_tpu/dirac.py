"""Dirac operator layer: the analogue of the reference's Dirac class
hierarchy (reference include/dirac_quda.h:88-720, lib/dirac*.cpp).

A `Dirac` bundles the gauge (and clover) fields with static operator
parameters and exposes:
  m / mdag / mdagm            — the full even+odd operator
  matpc / matpc_dag / matpc_dagm — even-odd (Schur) preconditioned op
  prepare / reconstruct       — source prep & solution rebuild
                                (reference dirac_quda.h:132-143)

Operator kinds and conventions (kappa normalisation):
  wilson:          M = ψ − κ D ψ
  twisted-mass:    M = (1 + i 2κμ f γ5) ψ − κ D ψ
  clover:          M = A ψ − κ D ψ,  A = 1 − (κ c_sw /2?) … see ops/clover
  twisted-clover:  M = (A + i 2κμ f γ5) ψ − κ D ψ
matching the reference CPU oracles wil_mat/tm_mat/clover_mat/tmc_mat
(reference tests/wilson_dslash_reference.cpp:295-330,
tests/clover_reference.cpp:149-282).

Even-odd preconditioning (parity p = solve parity):
  symmetric:  M_pc = 1 − κ² A_p⁻¹ D_{p,1-p} A_{1-p}⁻¹ D_{1-p,p}
  asymmetric: M_pc = A_p − κ² D_{p,1-p} A_{1-p}⁻¹ D_{1-p,p}
  prepare:    src = [A_p⁻¹](b_p + κ D_{p,1-p} A_{1-p}⁻¹ b_{1-p})
  reconstruct: x_{1-p} = A_{1-p}⁻¹ (b_{1-p} + κ D_{1-p,p} x_p)
(reference tm_matpc, tests/wilson_dslash_reference.cpp:357-404;
 DiracTwistedCloverPC, include/dirac_quda.h:580-617).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu.ops import dslash as _dsl
from quda_qkxtm_multigrid_tpu.ops import twist as _twist

# Trace-time path counters (see _fused_matpc_ch_shmap): routing tests
# reset and read these to assert WHICH operator path a workflow reached
# — the analogue of checking which policy the reference's
# DslashPolicyTune selected (lib/dslash_policy.cuh:1056).
PATH_COUNTERS = {"shmap_matpc": 0}


def _ch_clover_apply(v_ch, cinv_ch, dag: bool = False):
    """Chiral-block 6×6 matrix field applied to a planar-channel spinor
    (standalone XLA pass, used only for the leading A⁻¹† of the dagger
    ordering — the other applications are fused into the kernels).

    The 6×6 contraction is UNROLLED into elementwise multiply-adds on
    [T,2,Z,W] slices on purpose: an einsum over the block dims makes
    XLA lay (6,6) minor-most and pad them to the (8,128) tile — a 28×
    HBM expansion (144 MB → 4 GB per temp) that OOMs the 32³×64 msrc
    setup solve (bisected on-chip, round 3).  Unrolled, every temp
    keeps (Z,W) minor and tiles perfectly."""
    t, _, z, w = v_ch.shape
    vr = v_ch[:, 0::2].reshape(t, 2, 6, z, w).astype(jnp.float32)
    vi = v_ch[:, 1::2].reshape(t, 2, 6, z, w).astype(jnp.float32)
    m = cinv_ch.reshape(t, 2, 6, 6, 2, z, w)
    rows_r, rows_i = [], []
    for r in range(6):
        acc_r = acc_i = None
        for c in range(6):
            i, j = (c, r) if dag else (r, c)
            mr = m[:, :, i, j, 0].astype(jnp.float32)
            mi = m[:, :, i, j, 1].astype(jnp.float32)
            if dag:
                mi = -mi
            tr = mr * vr[:, :, c] - mi * vi[:, :, c]
            ti = mr * vi[:, :, c] + mi * vr[:, :, c]
            acc_r = tr if acc_r is None else acc_r + tr
            acc_i = ti if acc_i is None else acc_i + ti
        rows_r.append(acc_r)
        rows_i.append(acc_i)
    out = jnp.stack([jnp.stack(rows_r, axis=2),
                     jnp.stack(rows_i, axis=2)], axis=3)  # [T,2,6,2,Z,W]
    return out.reshape(v_ch.shape[0], 24, z, w)


def _ch_twist(psi_ch, a: float, b: float):
    """b (1 + i a γ5) on a planar-channel field [T, 24, Z, W]
    (channel (s*3+c)*2 + ri; γ5 = +1 for spins 0,1 and −1 for 2,3)."""
    re, im = psi_ch[:, 0::2], psi_ch[:, 1::2]
    g5 = jnp.asarray([1.0] * 6 + [-1.0] * 6,
                     psi_ch.dtype).reshape(1, 12, 1, 1)
    out_re = b * (re - (a * g5) * im)
    out_im = b * (im + (a * g5) * re)
    return jnp.stack([out_re, out_im], axis=2).reshape(psi_ch.shape)


@dataclasses.dataclass(frozen=True)
class DiracParams:
    """Static operator parameters (the role of QudaInvertParam's operator
    fields, reference include/quda.h:86)."""

    kind: str = "wilson"        # wilson | twisted-mass | clover | twisted-clover
    kappa: float = 0.12
    mu: float = 0.0             # twisted mass
    epsilon: float = 0.0        # non-degenerate twist splitting
    csw: float = 0.0            # clover coefficient
    flavor: int = +1            # twist sign (TWIST_PLUS / TWIST_MINUS)
    matpc_parity: int = 0       # 0 = even-even, 1 = odd-odd
    asymmetric: bool = False    # asymmetric Schur variant
    use_pallas: bool = False    # Pallas dslash fast path (c64, 1 chip)
    pallas_bf16: bool = False   # bf16 operand tier (the 'half' analogue)

    def __post_init__(self):
        # the role of checkInvertParam (reference lib/check_params.h)
        kinds = ("wilson", "twisted-mass", "clover", "twisted-clover")
        if self.kind not in kinds:
            raise ValueError(f"unknown operator kind {self.kind!r}; "
                             f"one of {kinds}")
        if not (0.0 < self.kappa < 1.0):
            raise ValueError(f"kappa={self.kappa} outside (0, 1)")
        if self.kind in ("clover", "twisted-clover") and self.csw == 0.0:
            raise ValueError(f"{self.kind} requires csw != 0")
        if self.kind in ("twisted-mass", "twisted-clover") and self.mu == 0.0:
            raise ValueError(f"{self.kind} requires mu != 0")
        if self.flavor not in (+1, -1):
            raise ValueError("flavor must be +1 or -1")
        if self.matpc_parity not in (0, 1):
            raise ValueError("matpc_parity must be 0 or 1")

    @property
    def has_twist(self) -> bool:
        return self.kind in ("twisted-mass", "twisted-clover")

    @property
    def has_clover(self) -> bool:
        return self.kind in ("clover", "twisted-clover")


@partial(jax.tree_util.register_dataclass,
         data_fields=["u", "clover", "clover_inv", "u_doubled"],
         meta_fields=["params", "geom"])
@dataclasses.dataclass(frozen=True)
class Dirac:
    """Operator bundle: fields + params. A pytree, so it passes through
    jit/grad/shard_map transparently."""

    u: Any                      # gauge [4,2,3,3,T,Z,W]
    params: DiracParams
    geom: Geometry
    clover: Optional[Any] = None      # [2,2,6,6,T,Z,W] (parity, chirality)
    clover_inv: Optional[Any] = None  # inverse incl. twist for tmc PC
    u_doubled: Optional[Any] = None   # precomputed links for the Pallas path

    # ---- hopping ----------------------------------------------------
    def dslash(self, psi_opp, parity: int, dagger: bool = False):
        if self.params.use_pallas and self.u_doubled is not None:
            from quda_qkxtm_multigrid_tpu.ops.dslash_pallas5 import (
                dslash_parity_pallas5)
            return dslash_parity_pallas5(self.u_doubled, psi_opp, parity,
                                         self.geom, dagger, recon12=True,
                                         bf16=self.params.pallas_bf16)
        return _dsl.dslash_parity(self.u, psi_opp, parity, self.geom, dagger)

    def _matpc_tm_ch(self, psi_ch, dagger: bool, interpret: bool = False):
        """Channel-domain fused twisted-mass symmetric matpc: the A⁻¹
        twists and the final −κ² xpay run in the dslash kernel epilogues
        (the role of the reference's fused tm_dslash_def.h kernels) and
        the whole chain stays in planar-channel layout — zero standalone
        elementwise or layout-conversion passes."""
        from quda_qkxtm_multigrid_tpu.ops.dslash_pallas5 import (
            dslash_ch_auto as v5ch, gauge_channels)
        p = self.params
        pr, k = p.matpc_parity, p.kappa
        a = 2.0 * p.kappa * p.mu * p.flavor
        if dagger:
            a = -a
        tw = (-a, 1.0 / (1.0 + a * a))
        kw = dict(recon12=True, bf16=p.pallas_bf16, interpret=interpret)
        g_p = gauge_channels(self.u_doubled, pr, True, p.pallas_bf16)
        g_o = gauge_channels(self.u_doubled, 1 - pr, True, p.pallas_bf16)
        if not dagger:
            t = v5ch(g_o, psi_ch, 1 - pr, self.geom, twist=tw, **kw)
            return v5ch(g_p, t, pr, self.geom, twist=tw,
                        xpay_coef=-(k * k), x_ch=psi_ch, **kw)
        # A⁻¹† first (channel-domain diagonal twist: per-spin rotation)
        t = _ch_twist(psi_ch, tw[0], tw[1])
        t = v5ch(g_o, t, 1 - pr, self.geom, dagger=True, twist=tw, **kw)
        return v5ch(g_p, t, pr, self.geom, dagger=True,
                    xpay_coef=-(k * k), x_ch=psi_ch, **kw)

    def _matpc_clover_ch(self, psi_ch, dagger: bool,
                         interpret: bool = False):
        """Channel-domain fused (twisted-)clover symmetric matpc: the
        A⁻¹ chiral 6×6 matvecs run in the dslash kernel epilogues (the
        role of the reference's fused tmc_dslash kernels,
        lib/dslash_core/tmc_dslash_def.h)."""
        from quda_qkxtm_multigrid_tpu.ops.dslash_pallas5 import (
            dslash_ch_auto as v5ch, gauge_channels, clover_channels)
        p = self.params
        pr, k = p.matpc_parity, p.kappa
        bf = p.pallas_bf16
        kw = dict(recon12=True, bf16=bf, interpret=interpret)
        g_p = gauge_channels(self.u_doubled, pr, True, bf)
        g_o = gauge_channels(self.u_doubled, 1 - pr, True, bf)
        ci_p = clover_channels(self.clover_inv, pr, bf)
        ci_o = clover_channels(self.clover_inv, 1 - pr, bf)
        if not dagger:
            t = v5ch(g_o, psi_ch, 1 - pr, self.geom, clover="fwd",
                     cinv_ch=ci_o, **kw)
            return v5ch(g_p, t, pr, self.geom, clover="fwd", cinv_ch=ci_p,
                        xpay_coef=-(k * k), x_ch=psi_ch, **kw)
        t = _ch_clover_apply(psi_ch, ci_p, dag=True)
        t = v5ch(g_o, t, 1 - pr, self.geom, dagger=True, clover="dag",
                 cinv_ch=ci_o, **kw)
        return v5ch(g_p, t, pr, self.geom, dagger=True,
                    xpay_coef=-(k * k), x_ch=psi_ch, **kw)

    def _fused_matpc_ch(self, psi_ch, dagger: bool,
                        interpret: bool = False):
        if self.params.has_clover:
            return self._matpc_clover_ch(psi_ch, dagger, interpret)
        return self._matpc_tm_ch(psi_ch, dagger, interpret)

    def _fused_matpc_ch_msrc(self, psi_ch_b, dagger: bool,
                             interpret: bool = False):
        """Multi-RHS fused matpc on [n_src, T, 24, Z, W]: the gauge and
        clover operands are fetched once per t and revisited across the
        source axis (dslash_ch_pallas5_msrc) — the MRHS amortisation of
        SURVEY.md §2.10.4."""
        from quda_qkxtm_multigrid_tpu.ops.dslash_pallas5 import (
            dslash_ch_msrc_auto as v5m, gauge_channels, clover_channels)
        p = self.params
        pr, k = p.matpc_parity, p.kappa
        bf = p.pallas_bf16
        kw = dict(recon12=True, bf16=bf, interpret=interpret)
        g_p = gauge_channels(self.u_doubled, pr, True, bf)
        g_o = gauge_channels(self.u_doubled, 1 - pr, True, bf)
        if p.has_clover:
            ci_p = clover_channels(self.clover_inv, pr, bf)
            ci_o = clover_channels(self.clover_inv, 1 - pr, bf)
            if not dagger:
                t = v5m(g_o, psi_ch_b, 1 - pr, self.geom, clover="fwd",
                        cinv_ch=ci_o, **kw)
                return v5m(g_p, t, pr, self.geom, clover="fwd",
                           cinv_ch=ci_p, xpay_coef=-(k * k),
                           x_ch_b=psi_ch_b, **kw)
            t = jax.vmap(lambda v: _ch_clover_apply(v, ci_p, dag=True))(
                psi_ch_b)
            t = v5m(g_o, t, 1 - pr, self.geom, dagger=True, clover="dag",
                    cinv_ch=ci_o, **kw)
            return v5m(g_p, t, pr, self.geom, dagger=True,
                       xpay_coef=-(k * k), x_ch_b=psi_ch_b, **kw)
        a = 2.0 * p.kappa * p.mu * p.flavor
        if dagger:
            a = -a
        tw = (-a, 1.0 / (1.0 + a * a))
        if not dagger:
            t = v5m(g_o, psi_ch_b, 1 - pr, self.geom, twist=tw, **kw)
            return v5m(g_p, t, pr, self.geom, twist=tw,
                       xpay_coef=-(k * k), x_ch_b=psi_ch_b, **kw)
        t = jax.vmap(lambda v: _ch_twist(v, tw[0], tw[1]))(psi_ch_b)
        t = v5m(g_o, t, 1 - pr, self.geom, dagger=True, twist=tw, **kw)
        return v5m(g_p, t, pr, self.geom, dagger=True,
                   xpay_coef=-(k * k), x_ch_b=psi_ch_b, **kw)

    def _matpc_pallas_tm(self, psi_p, dagger: bool):
        from quda_qkxtm_multigrid_tpu.ops.dslash_pallas import (
            _to_channels, _from_channels)
        out = self._fused_matpc_ch(
            _to_channels(psi_p).astype(jnp.float32), dagger)
        return _from_channels(out, (4, 3))

    def _fused_matpc_dagm_ch(self, psi_ch, interpret: bool = False):
        """matpc†·matpc as FOUR fused kernels: the leading A⁻¹† of the
        dagger half is emitted as a SECOND OUTPUT of the forward half's
        last kernel (post_op epilogue, reusing its already-loaded cinv
        block) — removing the standalone _ch_clover_apply/_ch_twist
        pass between the halves (~10% of the chain's HBM traffic)."""
        from quda_qkxtm_multigrid_tpu.ops.dslash_pallas5 import (
            dslash_ch_auto as v5ch, gauge_channels, clover_channels)
        p = self.params
        pr, k = p.matpc_parity, p.kappa
        bf = p.pallas_bf16
        kw = dict(recon12=True, bf16=bf, interpret=interpret)
        g_p = gauge_channels(self.u_doubled, pr, True, bf)
        g_o = gauge_channels(self.u_doubled, 1 - pr, True, bf)
        if p.has_clover:
            ci_p = clover_channels(self.clover_inv, pr, bf)
            ci_o = clover_channels(self.clover_inv, 1 - pr, bf)
            t = v5ch(g_o, psi_ch, 1 - pr, self.geom, clover="fwd",
                     cinv_ch=ci_o, **kw)
            m, m_pre = v5ch(g_p, t, pr, self.geom, clover="fwd",
                            cinv_ch=ci_p, xpay_coef=-(k * k),
                            x_ch=psi_ch, post_op=("clover",), **kw)
            t2 = v5ch(g_o, m_pre, 1 - pr, self.geom, dagger=True,
                      clover="dag", cinv_ch=ci_o, **kw)
            return v5ch(g_p, t2, pr, self.geom, dagger=True,
                        xpay_coef=-(k * k), x_ch=m, **kw)
        a = 2.0 * p.kappa * p.mu * p.flavor
        tw = (a, 1.0 / (1.0 + a * a))        # A⁻¹ for the fwd half
        tw_dag = (-tw[0], tw[1])
        # forward half applies b(1 - i a g5) = A⁻¹ with the sign
        # convention of _matpc_tm_ch (tw there is (-a, b))
        t = v5ch(g_o, psi_ch, 1 - pr, self.geom, twist=(-a, tw[1]), **kw)
        m, m_pre = v5ch(g_p, t, pr, self.geom, twist=(-a, tw[1]),
                        xpay_coef=-(k * k), x_ch=psi_ch,
                        post_op=("twist", a, tw[1]), **kw)
        t2 = v5ch(g_o, m_pre, 1 - pr, self.geom, dagger=True,
                  twist=(a, tw[1]), **kw)
        return v5ch(g_p, t2, pr, self.geom, dagger=True,
                    xpay_coef=-(k * k), x_ch=m, **kw)

    def _fused_matpc_ch_shmap(self, psi_ch, mesh, dagger: bool = False,
                              interpret: bool | None = None,
                              overlap: bool = False):
        # trace-time path counter: lets routing tests assert that a
        # meshed workflow actually reached the multi-chip fused matpc
        # (mis-routing to the single-chip kernels on sharded fields is
        # invisible on CPU where _auto_pallas is off)
        PATH_COUNTERS["shmap_matpc"] += 1
        """Multi-chip fused matpc: the WHOLE Schur chain (two fused
        dslash kernels + epilogues) runs inside one shard_map over the
        't' mesh axis — per application the only comms are two ppermute
        pairs of t-face planes over ICI (one per hop), the TPU-native
        form of the reference dslash pack/comms pipeline
        (lib/dslash_policy.cuh).  z/w axes must be 1 (the full-Z kernel
        keeps z/x/y hops on-chip); psi_ch is the t-sharded channel field
        [T, 24, Z, W].  Requires even local T so the in-kernel
        checkerboard masks stay valid on every shard.

        WHY t-only (vs the reference's any-subset per-dim partitioning,
        comm_quda.h:114-121): (1) t-faces are the smallest wire bytes
        (X·Y·Z/2 sites; a z or w face is T·Y·X/2 ≥ 2x larger at every
        production geometry here); (2) T is the grid axis of the slab
        kernel, so a t-halo is two extra BlockSpec rows — a z/w halo
        lands inside the (Z, W) lane/sublane tile and would either
        break the (8,128) tile-exact channel layout or force per-hop
        re-tiling copies; (3) nt ≤ T = 64 chips at 32³×64 covers the
        slice sizes a single ICI domain offers.  z/w-meshed solves are
        still CORRECT: invert(mesh=...) falls back to the XLA matpc,
        whose rolls lower to CollectivePermute on the sharded axes
        (tests/test_parallel.py covers (2,2,1) grids); only the fused-
        kernel fast path is t-gated.  MEASURED cost of that fallback
        (bench_matpc_ab, on-chip r4 at 32³×64): fused 7.47 ms vs XLA
        62.9 ms per matpc†·matpc = 8.4x — so shard t first, always;
        a z/w split only makes sense once nt == T is exhausted, and
        is then latency- not kernel-bound anyway.

        overlap=True uses the interior/exterior-SPLIT kernels
        (dslash_ch_pallas5_overlap_local): per hop the face ppermute and
        the (T_loc−2)-plane interior kernel have NO data dependence, so
        the XLA scheduler can run the ICI transfer concurrently with the
        interior compute — the explicit TPU form of the reference's
        policy-engine overlap (lib/dslash_policy.cuh:148-299)."""
        from jax.sharding import PartitionSpec as P
        from quda_qkxtm_multigrid_tpu.ops.dslash_pallas5 import (
            dslash_ch_pallas5_local as v5l,
            dslash_ch_pallas5_overlap_local as v5o,
            _t_extend, _t_faces, gauge_channels, clover_channels)
        from quda_qkxtm_multigrid_tpu.lattice import Geometry as _Geom

        if interpret is None:
            # virtual-device CPU meshes can only run Pallas in
            # interpret mode (test/dryrun tier)
            interpret = jax.default_backend() != "tpu"
        p = self.params
        nt = mesh.shape.get("t", 1)
        if mesh.shape.get("z", 1) != 1 or mesh.shape.get("w", 1) != 1:
            raise ValueError("fused shmap matpc shards only the t axis")
        T_loc = self.geom.T // nt
        if T_loc % 2:
            raise ValueError("local T extent must be even")
        geom_l = _Geom(self.geom.X, self.geom.Y, self.geom.Z, T_loc)
        pr, k = p.matpc_parity, p.kappa
        bf = p.pallas_bf16
        kw = dict(recon12=True, bf16=bf, interpret=interpret)
        g_p = gauge_channels(self.u_doubled, pr, True, bf)
        g_o = gauge_channels(self.u_doubled, 1 - pr, True, bf)
        if p.has_clover:
            ci_p = clover_channels(self.clover_inv, pr, bf)
            ci_o = clover_channels(self.clover_inv, 1 - pr, bf)
        else:
            a = 2.0 * p.kappa * p.mu * p.flavor
            if dagger:
                a = -a
            tw = (-a, 1.0 / (1.0 + a * a))

        def local(psi_l, g_p_l, g_o_l, ci_p_l, ci_o_l):
            if overlap:
                # spin-project the faces before the ppermute (half the
                # ICI bytes) whenever the split form is in play
                proj = geom_l.T > 2

                def ds(g_l, x, pr_l, dag=False, clv=None, ci=None,
                       tw_=None, xp=None, xc=None):
                    fm, fp = _t_faces(x, nt, project=proj, dagger=dag)
                    return v5o(g_l, x, fm, fp, pr_l, geom_l, dagger=dag,
                               clover=clv, cinv_ch=ci, twist=tw_,
                               xpay_coef=xp, x_ch=xc,
                               faces_projected=proj, **kw)
            else:
                def ds(g_l, x, pr_l, dag=False, clv=None, ci=None,
                       tw_=None, xp=None, xc=None):
                    xce = None
                    if xc is not None:
                        # xpay only reads rows 1..T of the extended
                        # operand — pad, don't permute
                        zrow = jnp.zeros_like(xc[:1])
                        xce = jnp.concatenate([zrow, xc, zrow], axis=0)
                    return v5l(g_l, _t_extend(x, nt), pr_l, geom_l,
                               dagger=dag, clover=clv, cinv_ch=ci,
                               twist=tw_, xpay_coef=xp, x_ch=xce, **kw)
            if p.has_clover:
                if not dagger:
                    t = ds(g_o_l, psi_l, 1 - pr, clv="fwd", ci=ci_o_l)
                    return ds(g_p_l, t, pr, clv="fwd", ci=ci_p_l,
                              xp=-(k * k), xc=psi_l)
                t0 = _ch_clover_apply(psi_l, ci_p_l, dag=True)
                t = ds(g_o_l, t0, 1 - pr, dag=True, clv="dag", ci=ci_o_l)
                return ds(g_p_l, t, pr, dag=True, xp=-(k * k), xc=psi_l)
            if not dagger:
                t = ds(g_o_l, psi_l, 1 - pr, tw_=tw)
                return ds(g_p_l, t, pr, tw_=tw, xp=-(k * k), xc=psi_l)
            t0 = _ch_twist(psi_l, tw[0], tw[1])
            t = ds(g_o_l, t0, 1 - pr, dag=True, tw_=tw)
            return ds(g_p_l, t, pr, dag=True, xp=-(k * k), xc=psi_l)

        spec = P("t", None, None, None)
        if p.has_clover:
            return jax.shard_map(
                local, mesh=mesh,
                in_specs=(spec, spec, spec, spec, spec),
                out_specs=spec, check_vma=False)(
                    psi_ch, g_p, g_o, ci_p, ci_o)
        local_nc = lambda psi_l, g_p_l, g_o_l: local(psi_l, g_p_l,
                                                     g_o_l, None, None)
        return jax.shard_map(
            local_nc, mesh=mesh, in_specs=(spec, spec, spec),
            out_specs=spec, check_vma=False)(psi_ch, g_p, g_o)

    # ---- parity-diagonal term A ------------------------------------
    def a_apply(self, psi_p, parity: int, dagger: bool = False):
        p = self.params
        out = psi_p
        if p.has_clover:
            from quda_qkxtm_multigrid_tpu.ops import clover as _cl
            out = _cl.clover_apply(self.clover[parity], out)
        if p.has_twist:
            if p.has_clover:
                # twisted-clover: A + i 2κμ γ5 (twist added to clover result)
                out = out + (_twist.twist_apply(psi_p, p.kappa, p.mu, p.flavor,
                                                dagger) - psi_p)
            else:
                out = _twist.twist_apply(out, p.kappa, p.mu, p.flavor, dagger)
        elif p.has_clover and dagger:
            pass  # clover term is hermitian
        return out

    def a_inv_apply(self, psi_p, parity: int, dagger: bool = False):
        p = self.params
        if p.has_clover:
            from quda_qkxtm_multigrid_tpu.ops import clover as _cl
            return _cl.clover_apply(self.clover_inv[parity], psi_p,
                                    dagger=dagger)
        if p.has_twist:
            return _twist.twist_apply(psi_p, p.kappa, p.mu, p.flavor,
                                      dagger, inverse=True)
        return psi_p

    # ---- full operator ----------------------------------------------
    def m(self, psi, dagger: bool = False):
        k = self.params.kappa
        out_e = self.a_apply(psi[0], 0, dagger) - k * self.dslash(psi[1], 0, dagger)
        out_o = self.a_apply(psi[1], 1, dagger) - k * self.dslash(psi[0], 1, dagger)
        return jnp.stack([out_e, out_o])

    def mdag(self, psi):
        return self.m(psi, dagger=True)

    def mdagm(self, psi):
        return self.mdag(self.m(psi))

    @property
    def _has_fused_matpc(self) -> bool:
        p = self.params
        return (p.use_pallas and self.u_doubled is not None
                and not p.asymmetric
                and p.kind in ("twisted-mass", "clover", "twisted-clover"))

    # ---- even-odd preconditioned operator ----------------------------
    def matpc(self, psi_p, dagger: bool = False):
        p = self.params
        if self._has_fused_matpc:
            return self._matpc_pallas_tm(psi_p, dagger)
        pr, k = p.matpc_parity, p.kappa
        if p.asymmetric:
            t = self.dslash(psi_p, 1 - pr, dagger)
            t = self.a_inv_apply(t, 1 - pr, dagger)
            t = self.dslash(t, pr, dagger)
            return self.a_apply(psi_p, pr, dagger) - (k * k) * t
        if not dagger:
            t = self.dslash(psi_p, 1 - pr)
            t = self.a_inv_apply(t, 1 - pr)
            t = self.dslash(t, pr)
            return psi_p - (k * k) * self.a_inv_apply(t, pr)
        else:
            t = self.a_inv_apply(psi_p, pr, dagger=True)
            t = self.dslash(t, 1 - pr, dagger=True)
            t = self.a_inv_apply(t, 1 - pr, dagger=True)
            t = self.dslash(t, pr, dagger=True)
            return psi_p - (k * k) * t

    def matpc_dagm(self, psi_p):
        if self._has_fused_matpc:
            from quda_qkxtm_multigrid_tpu.ops.dslash_pallas import (
                _to_channels, _from_channels)
            # spinors stay f32 through the chain even in the bf16 tier
            # (bf16 applies to the GAUGE operand; a bf16 intermediate
            # would cost a conversion pass and precision for no bytes)
            t = self._fused_matpc_dagm_ch(
                _to_channels(psi_p).astype(jnp.float32))
            return _from_channels(t, (4, 3))
        return self.matpc(self.matpc(psi_p), dagger=True)

    # ---- Schur source prep / solution rebuild ------------------------
    def prepare(self, b):
        """b [2,...] → preconditioned-system source on the solve parity."""
        p = self.params
        pr, k = p.matpc_parity, p.kappa
        src = b[pr] + k * self.dslash(self.a_inv_apply(b[1 - pr], 1 - pr), pr)
        if not p.asymmetric:
            src = self.a_inv_apply(src, pr)
        return src

    def reconstruct(self, x_p, b):
        """Solve-parity solution + original source → full solution."""
        p = self.params
        pr, k = p.matpc_parity, p.kappa
        x_other = self.a_inv_apply(b[1 - pr] + k * self.dslash(x_p, 1 - pr),
                                   1 - pr)
        parts = [None, None]
        parts[pr] = x_p
        parts[1 - pr] = x_other
        return jnp.stack(parts)

    # ---- bookkeeping --------------------------------------------------
    def flops_per_mat(self) -> int:
        """Analytic flops of one full-operator application
        (reference lib/dirac_wilson.cpp:60, dirac_clover.cpp:76)."""
        per_site = _dsl.WILSON_DSLASH_FLOPS_PER_SITE
        extra = 0
        if self.params.has_twist:
            extra += 48
        if self.params.has_clover:
            extra += 504
        return (per_site + 48 + extra) * self.geom.volume


def make_dirac_jit(u, params: DiracParams, geom: Geometry) -> Dirac:
    """jit-compiled make_dirac: clover construction and gauge doubling
    run on-device in one program (eager complex ops are unsupported on
    some TPU backends)."""
    import functools
    return jax.jit(make_dirac, static_argnames=("params", "geom"))(
        u, params, geom)


def make_dirac(u, params: DiracParams, geom: Geometry,
               clover=None, clover_inv=None) -> Dirac:
    """Factory, the analogue of Dirac::create (reference lib/dirac.cpp:140).
    For clover kinds, builds the clover term from the field strength if not
    supplied."""
    if params.has_clover and clover is None:
        from quda_qkxtm_multigrid_tpu.ops import clover as _cl
        clover, clover_inv = _cl.make_clover_pair(u, geom, params)
    u_doubled = _dsl.double_gauge(u, geom) if params.use_pallas else None
    return Dirac(u=u, params=params, geom=geom, clover=clover,
                 clover_inv=clover_inv, u_doubled=u_doubled)


@partial(jax.tree_util.register_dataclass,
         data_fields=["u"], meta_fields=["params", "geom"])
@dataclasses.dataclass(frozen=True)
class DiracNdeg:
    """Non-degenerate twisted-mass DOUBLET operator — two flavors
    coupled by the ε τ1 term (the reference's DiracTwistedMass doublet
    path, include/dirac_quda.h twisted ndeg classes and the
    ndeg_twisted_mass dslash, lib/dslash_ndeg_twisted_mass.cu; oracle
    tm_ndeg_mat/tm_ndeg_matpc, tests/wilson_dslash_reference.cpp).

    Fields are doublets [2(flavor), 2(parity), 4, 3, T, Z, W].  The
    hopping term is flavor-diagonal (one vmap over the Wilson dslash);
    the parity-diagonal term A = 1 + i 2κμ γ5 τ3 − 2κε τ1 mixes the
    flavors site-locally (ops/twist.ndeg_twist_apply).
    """

    u: Any
    params: DiracParams
    geom: Geometry

    def dslash(self, psi_f_opp, parity: int, dagger: bool = False):
        """Flavor-diagonal Wilson hop: psi_f_opp [2f, 4, 3, T, Z, W]."""
        return jax.vmap(
            lambda p: _dsl.dslash_parity(self.u, p, parity, self.geom,
                                         dagger))(psi_f_opp)

    def a_apply(self, psi_f_p, dagger: bool = False):
        p = self.params
        return _twist.ndeg_twist_apply(psi_f_p, p.kappa, p.mu, p.epsilon,
                                       dagger)

    def a_inv_apply(self, psi_f_p, dagger: bool = False):
        p = self.params
        return _twist.ndeg_twist_apply(psi_f_p, p.kappa, p.mu, p.epsilon,
                                       dagger, inverse=True)

    def m(self, psi, dagger: bool = False):
        k = self.params.kappa
        out = []
        for p in (0, 1):
            a = self.a_apply(psi[:, p], dagger)
            out.append(a - k * self.dslash(psi[:, 1 - p], p, dagger))
        return jnp.stack(out, axis=1)

    def mdag(self, psi):
        return self.m(psi, dagger=True)

    def mdagm(self, psi):
        return self.mdag(self.m(psi))

    def matpc(self, psi_f_p, dagger: bool = False):
        """Symmetric even-odd Schur operator on one parity of the
        doublet: 1 − κ² A_p⁻¹ D A_{1−p}⁻¹ D."""
        p = self.params
        pr, k = p.matpc_parity, p.kappa
        if not dagger:
            t = self.dslash(psi_f_p, 1 - pr)
            t = self.a_inv_apply(t)
            t = self.dslash(t, pr)
            return psi_f_p - (k * k) * self.a_inv_apply(t)
        t = self.a_inv_apply(psi_f_p, dagger=True)
        t = self.dslash(t, 1 - pr, dagger=True)
        t = self.a_inv_apply(t, dagger=True)
        t = self.dslash(t, pr, dagger=True)
        return psi_f_p - (k * k) * t

    def matpc_dagm(self, psi_f_p):
        return self.matpc(self.matpc(psi_f_p), dagger=True)

    def prepare(self, b):
        """b [2f, 2p, ...] → doublet source on the solve parity."""
        p = self.params
        pr, k = p.matpc_parity, p.kappa
        src = b[:, pr] + k * self.dslash(self.a_inv_apply(b[:, 1 - pr]), pr)
        return self.a_inv_apply(src)

    def reconstruct(self, x_f_p, b):
        p = self.params
        pr, k = p.matpc_parity, p.kappa
        x_other = self.a_inv_apply(b[:, 1 - pr]
                                   + k * self.dslash(x_f_p, 1 - pr))
        parts = [None, None]
        parts[pr] = x_f_p
        parts[1 - pr] = x_other
        return jnp.stack(parts, axis=1)

    def flops_per_mat(self) -> int:
        per_site = _dsl.WILSON_DSLASH_FLOPS_PER_SITE
        return 2 * (per_site + 96) * self.geom.volume


def make_dirac_ndeg(u, params: DiracParams, geom: Geometry) -> DiracNdeg:
    """Factory for the non-degenerate doublet (params.kind
    'twisted-mass' with ε != 0 — the ε τ1 coupling distinguishes it
    from two independent degenerate operators)."""
    if params.mu == 0.0 or params.epsilon == 0.0:
        raise ValueError("ndeg doublet requires mu != 0 and epsilon != 0")
    return DiracNdeg(u=u, params=params, geom=geom)


def as_sloppy(dirac: Dirac, **param_overrides) -> Dirac:
    """Sloppy-tier view of an operator SHARING its field arrays (no
    duplicate gauge/clover HBM; the bf16/precision change happens at the
    kernel operand level).  The analogue of the reference's
    dSloppy/dPre built over the sloppy resident gauge
    (reference interface_quda.cpp createDirac)."""
    params = dataclasses.replace(dirac.params, **param_overrides)
    return Dirac(u=dirac.u, params=params, geom=dirac.geom,
                 clover=dirac.clover, clover_inv=dirac.clover_inv,
                 u_doubled=dirac.u_doubled)
