"""Compact channel-storage operator bundle for HBM-limited volumes.

At 48³×96 the canonical complex64 bundle (gauge + doubled gauge +
clover pair ≈ 12 GB before any solver state) exceeds a single chip's
HBM.  The fused solve path only ever reads the planar-channel operands
(gauge recon-12 [T,96,Z,W], chiral clover blocks [T,144,Z,W]), which in
bf16 total ~8 GB at 48³×96 — so a CompactDirac stores ONLY those, built
on the host CPU backend (125 GB RAM) and transferred once, the analogue
of the reference's sloppy-resident gauge whose half-precision copies
are what the solver actually touches (reference loadSloppyGaugeQuda,
interface_quda.cpp:1039).

The whole solve — prepare, CG on the normal operator, reconstruct,
true residual — is composed from the fused channel kernels + the
channel-domain clover/twist helpers; no complex64 full-lattice field of
the gauge/clover sector ever exists on device.

Full-operator residuals use the identity (symmetric even-odd
preconditioning)
    r = b − M x  with  M_pp = A_p, M_po = −κ D_po
evaluated per parity with one dslash-with-xpay kernel + one clover
apply per parity.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu.dirac import (
    DiracParams, _ch_clover_apply, _ch_twist)


@partial(jax.tree_util.register_dataclass,
         data_fields=["g_ch", "cinv_ch", "cl_ch"],
         meta_fields=["params", "geom", "interpret"])
@dataclasses.dataclass(frozen=True)
class CompactDirac:
    """Channel-operand bundle: g_ch/cinv_ch/cl_ch are (even, odd)
    tuples of [T, ch, Z, W] arrays (bf16 or f32).

    interpret=True runs every kernel in Pallas interpret mode (CPU
    test tier); the full-field protocol adapters below thread it."""

    g_ch: Any
    cinv_ch: Any
    cl_ch: Any
    params: DiracParams
    geom: Geometry
    interpret: bool = False

    # Routing properties: workflows treat a CompactDirac as a solver
    # backend without the msrc/shmap fused extras (those need the full
    # Dirac bundle), so the _has_fused_matpc fast paths stay off.
    _has_fused_matpc = False
    field_dtype = jnp.complex64   # spinor I/O dtype of the compact path

    def flops_per_mat(self) -> int:
        """Analytic flops of one full-operator application — same
        ledger as Dirac.flops_per_mat (reference
        lib/dirac_wilson.cpp:60, dirac_clover.cpp:76)."""
        from quda_qkxtm_multigrid_tpu.ops.dslash import (
            WILSON_DSLASH_FLOPS_PER_SITE)
        extra = 0
        if self.params.has_twist:
            extra += 48
        if self.params.has_clover:
            extra += 504
        return (WILSON_DSLASH_FLOPS_PER_SITE + 48 + extra) \
            * self.geom.volume

    # ---- fused hot path (same chain as Dirac._fused_matpc_*_ch) ----
    def _v5(self, parity, psi_ch, **kw):
        from quda_qkxtm_multigrid_tpu.ops.dslash_pallas5 import (
            dslash_ch_auto)
        p = self.params
        return dslash_ch_auto(self.g_ch[parity], psi_ch, parity,
                              self.geom, recon12=True,
                              bf16=(self.g_ch[0].dtype == jnp.bfloat16),
                              interpret=kw.pop("interpret", False), **kw)

    def matpc_ch(self, psi_ch, dagger: bool = False,
                 interpret: bool = False, out_dtype=jnp.float32):
        """out_dtype=jnp.bfloat16 runs this matpc in the bf16-SPINOR
        storage tier (intermediate and output planes stored bf16,
        compute f32 in-kernel) — the QUDA-half spinor analogue without
        a norm array (enum_quda.h:55-62; bf16 keeps f32's exponent)."""
        p = self.params
        pr, k = p.matpc_parity, p.kappa
        kw = dict(interpret=interpret, out_dtype=out_dtype)
        if p.has_clover:
            ci_p, ci_o = self.cinv_ch[pr], self.cinv_ch[1 - pr]
            if not dagger:
                t = self._v5(1 - pr, psi_ch, clover="fwd", cinv_ch=ci_o,
                             **kw)
                return self._v5(pr, t, clover="fwd", cinv_ch=ci_p,
                                xpay_coef=-(k * k), x_ch=psi_ch, **kw)
            t = _ch_clover_apply(psi_ch, ci_p, dag=True)
            t = self._v5(1 - pr, t, dagger=True, clover="dag",
                         cinv_ch=ci_o, **kw)
            return self._v5(pr, t, dagger=True, xpay_coef=-(k * k),
                            x_ch=psi_ch, **kw)
        a = 2.0 * p.kappa * p.mu * p.flavor
        if dagger:
            a = -a
        tw = (-a, 1.0 / (1.0 + a * a))
        if not dagger:
            t = self._v5(1 - pr, psi_ch, twist=tw, **kw)
            return self._v5(pr, t, twist=tw, xpay_coef=-(k * k),
                            x_ch=psi_ch, **kw)
        t = _ch_twist(psi_ch, tw[0], tw[1])
        t = self._v5(1 - pr, t, dagger=True, twist=tw, **kw)
        return self._v5(pr, t, dagger=True, xpay_coef=-(k * k),
                        x_ch=psi_ch, **kw)

    def matpc_dagm_ch(self, psi_ch, interpret: bool = False,
                      storage_dtype=None):
        """Normal operator M† M; storage_dtype=jnp.bfloat16 keeps every
        intermediate spinor plane in bf16 storage (final output f32 for
        the solver reductions)."""
        mid = jnp.float32 if storage_dtype is None else storage_dtype
        t = self.matpc_ch(psi_ch, False, interpret, out_dtype=mid)
        return self.matpc_ch(t, True, interpret)

    # ---- diagonal A / A^-1 in channel domain -----------------------
    def _a_apply_ch(self, v_ch, parity, interpret=False, dag=False):
        """A_p = clover + i a γ5 (a = 2κμ·flavor); dag=True applies
        A_p† = clover† − i a γ5 (clover is hermitian, so the dagger
        only flips the twist sign and transposes the 6×6 blocks)."""
        p = self.params
        a = 2.0 * p.kappa * p.mu * p.flavor
        if dag:
            a = -a
        if p.has_clover:
            out = _ch_clover_apply(v_ch, self.cl_ch[parity], dag=dag)
            if p.has_twist:
                out = out + (_ch_twist(v_ch, a, 1.0) - v_ch)
            return out
        if p.has_twist:
            return _ch_twist(v_ch, a, 1.0)
        return v_ch

    def _a_inv_ch(self, v_ch, parity):
        p = self.params
        if p.has_clover:
            return _ch_clover_apply(v_ch, self.cinv_ch[parity])
        if p.has_twist:
            a = 2.0 * p.kappa * p.mu * p.flavor
            return _ch_twist(v_ch, -a, 1.0 / (1.0 + a * a))
        return v_ch

    # ---- Schur prepare / reconstruct / residual --------------------
    def prepare_ch(self, b_e, b_o, interpret: bool = False):
        """(b_e, b_o) channel fields → PC source on parity pr
        (symmetric Schur prepare, see dirac.py docstring)."""
        p = self.params
        pr = p.matpc_parity
        bp = b_e if pr == 0 else b_o
        bo = b_o if pr == 0 else b_e
        t = self._a_inv_ch(bo, 1 - pr)
        t = self._v5(pr, t, xpay_coef=p.kappa, x_ch=bp,
                     interpret=interpret)
        return self._a_inv_ch(t, pr)

    def reconstruct_ch(self, x_p, b_e, b_o, interpret: bool = False):
        """PC solution → (x_e, x_o) channel fields."""
        p = self.params
        pr = p.matpc_parity
        bo = b_o if pr == 0 else b_e
        t = self._v5(1 - pr, x_p, xpay_coef=p.kappa, x_ch=bo,
                     interpret=interpret)
        x_o = self._a_inv_ch(t, 1 - pr)
        return (x_p, x_o) if pr == 0 else (x_o, x_p)

    def m_ch(self, x_e, x_o, interpret: bool = False):
        """Full operator per parity: M x|_p = A_p x_p − κ D_{p,1-p}
        x_{1-p} — one xpay dslash (x = A_p x_p, coef = −κ) per parity."""
        k = self.params.kappa
        out_e = self._v5(0, x_o, xpay_coef=-k,
                         x_ch=self._a_apply_ch(x_e, 0),
                         interpret=interpret)
        out_o = self._v5(1, x_e, xpay_coef=-k,
                         x_ch=self._a_apply_ch(x_o, 1),
                         interpret=interpret)
        return out_e, out_o

    def mdag_ch(self, x_e, x_o, interpret: bool = False):
        """Daggered full operator per parity:
        M† x|_p = A_p† x_p − κ D†_{p,1−p} x_{1−p}."""
        k = self.params.kappa
        out_e = self._v5(0, x_o, dagger=True, xpay_coef=-k,
                         x_ch=self._a_apply_ch(x_e, 0, dag=True),
                         interpret=interpret)
        out_o = self._v5(1, x_e, dagger=True, xpay_coef=-k,
                         x_ch=self._a_apply_ch(x_o, 1, dag=True),
                         interpret=interpret)
        return out_e, out_o

    # ---- full-field Dirac-protocol adapters -------------------------
    # These let a CompactDirac drive ANY consumer of the Dirac protocol
    # (lanczos deflation, wexact loops, the invert() front end) at
    # HBM-limited volumes — the compact analogue of wrapping the
    # sloppy-resident gauge behind the full solver interface (reference
    # interface_quda.cpp:1039).  Channel conversions sit at the program
    # boundary of each call; hot loops should stay in _ch domain (the
    # solvers that matter do: invert() dispatches to the _ch CG chain).

    def _to_ch(self, x):
        from quda_qkxtm_multigrid_tpu.ops.dslash_pallas import _to_channels
        return _to_channels(x).astype(jnp.float32)

    def _from_ch(self, x_ch):
        from quda_qkxtm_multigrid_tpu.ops.dslash_pallas import (
            _from_channels)
        return _from_channels(x_ch, (4, 3)).astype(self.field_dtype)

    def m(self, psi, dagger: bool = False):
        fn = self.mdag_ch if dagger else self.m_ch
        e, o = fn(self._to_ch(psi[0]), self._to_ch(psi[1]),
                  interpret=self.interpret)
        return jnp.stack([self._from_ch(e), self._from_ch(o)])

    def mdag(self, psi):
        return self.m(psi, dagger=True)

    def mdagm(self, psi):
        return self.mdag(self.m(psi))

    def matpc(self, psi_p, dagger: bool = False):
        return self._from_ch(self.matpc_ch(self._to_ch(psi_p), dagger,
                                           self.interpret))

    def matpc_dagm(self, psi_p):
        return self._from_ch(self.matpc_dagm_ch(self._to_ch(psi_p),
                                                self.interpret))

    def a_apply(self, psi_p, parity, dagger: bool = False):
        """Full-field A_p adapter (canonical parity field) — needed by
        the MG gcr-pc Schur embedding when the V-cycle runs on the
        compact sloppy operator (multigrid._gcr_step_pc)."""
        return self._from_ch(self._a_apply_ch(self._to_ch(psi_p), parity,
                                              self.interpret, dagger))

    def prepare(self, b):
        return self._from_ch(self.prepare_ch(self._to_ch(b[0]),
                                             self._to_ch(b[1]),
                                             self.interpret))

    def reconstruct(self, x_p, b):
        x_e, x_o = self.reconstruct_ch(self._to_ch(x_p),
                                       self._to_ch(b[0]),
                                       self._to_ch(b[1]),
                                       self.interpret)
        return jnp.stack([self._from_ch(x_e), self._from_ch(x_o)])


def make_compact(u, params: DiracParams, geom: Geometry,
                 bf16: bool = True, host: bool = False,
                 interpret: bool = False,
                 cinv_bf16: bool = False) -> CompactDirac:
    """Build the channel bundle from a gauge field.

    host=True stages the c64 construction (clover from Fμν, gauge
    doubling, channel packing) on the CPU backend — required at volumes
    where the intermediate c64 fields exceed device HBM (48³×96) — and
    device_puts only the compact operands.

    cinv_bf16=True additionally stores the clover-INVERSE channels in
    bf16 (~1.5 GB saved at 48³×96).  This deliberately trades the
    A/A⁻¹ consistency floor (f32-kept inverse certifies ~1e-7; a
    bf16-rounded inverse floors the PC chain at ~4e-3) for residency —
    use ONLY under an outer that re-certifies at full precision
    (solvers/host_dc.py), where the floor costs restarts, not
    accuracy."""
    from quda_qkxtm_multigrid_tpu.dirac import make_dirac
    from quda_qkxtm_multigrid_tpu.ops.dslash_pallas5 import (
        gauge_channels, clover_channels)
    from quda_qkxtm_multigrid_tpu.ops import dslash as _dsl

    params = dataclasses.replace(params, use_pallas=True,
                                 pallas_bf16=bf16)

    def build(u):
        d = make_dirac(u, params, geom)
        ud = d.u_doubled if d.u_doubled is not None else _dsl.double_gauge(
            u, geom)
        g = tuple(gauge_channels(ud, p_, True, bf16) for p_ in (0, 1))
        if params.has_clover:
            clov, cinv = d.clover, d.clover_inv
            if bf16:
                # PRECISION CONSISTENCY (measured on-chip r4): storing
                # independently-rounded bf16 A and bf16 A⁻¹ breaks the
                # Schur identity at bf16 eps — reconstructed solutions
                # bottom out at ~4e-3 full-operator residual no matter
                # how far the PC system converges.  Round A to bf16
                # FIRST, invert the ROUNDED operator, and keep that
                # inverse in f32: the stored pair is then mutually
                # consistent to f32 eps and the compact solve certifies
                # to ~1e-7 (QUDA's half tier sidesteps this by applying
                # cloverInvert to the same stored field,
                # lib/clover_invert.cu).
                from quda_qkxtm_multigrid_tpu.ops import clover as _cl
                clov = jax.lax.complex(
                    jnp.real(clov).astype(jnp.bfloat16).astype(
                        jnp.float32),
                    jnp.imag(clov).astype(jnp.bfloat16).astype(
                        jnp.float32)).astype(clov.dtype)
                if params.kind == "twisted-clover" and params.mu != 0.0:
                    cinv = _cl.invert_clover(_cl.clover_with_twist(
                        clov, params.kappa, params.mu, params.flavor))
                else:
                    cinv = _cl.invert_clover(clov)
            # cinv stays f32-channel even in the bf16 tier (the kernel
            # astype is a no-op on f32 refs); cl is exactly bf16-valued
            ci = tuple(clover_channels(cinv, p_, cinv_bf16)
                       for p_ in (0, 1))
            cl = tuple(clover_channels(clov, p_, bf16)
                       for p_ in (0, 1))
        else:
            ci = cl = (None, None)
        return g, ci, cl

    if host:
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            host = False
    if host:
        if list(u.devices())[0].platform != "cpu":
            # complex d2h is unsupported on the axon backend — fetch
            # planes via jit (backend_quirks) and recombine on host
            import numpy as _np
            ur, ui = jax.jit(lambda v: (jnp.real(v), jnp.imag(v)))(u)
            uh = (_np.asarray(ur) + 1j * _np.asarray(ui)).astype(
                _np.dtype(u.dtype))
            u = jax.device_put(uh, cpu)
        with jax.default_device(cpu):
            g, ci, cl = jax.jit(build)(jax.device_put(u, cpu))
            jax.block_until_ready(g)
        dev = jax.devices()[0]
        put = lambda t: tuple(None if a is None else jax.device_put(a, dev)
                              for a in t)
        g, ci, cl = put(g), put(ci), put(cl)
    else:
        g, ci, cl = jax.jit(build)(u)
    return CompactDirac(g_ch=g, cinv_ch=ci, cl_ch=cl, params=params,
                        geom=geom, interpret=interpret)


@partial(jax.jit, static_argnames=("tol", "maxiter", "interpret"))
def invert_compact(cd: CompactDirac, b_e, b_o, tol: float = 1e-7,
                   maxiter: int = 2000, interpret: bool = False):
    """CG solve of M x = b entirely in channel storage; returns
    ((x_e, x_o), iters, loop r² of the normal system).  The caller
    holds b as channel fields (e.g. from a host-staged source).

    Deliberately does NOT recompute b − M x here: a jit program that
    combines the solver while_loop with a post-loop residual recompute
    miscompiles on the axon backend — XLA folds the recomputed residual
    back into the loop's recursed form, corrupting BOTH the reported
    residual and the loop's own convergence (observed on-chip r4:
    13 'converged' iterations with a 4e-3 true residual at every
    volume; the same chain certifies 7e-8 when the residual runs as
    its own program — utils/backend_quirks.py Q4, mg_solve pattern).
    Use compact_true_residual for certification."""
    from quda_qkxtm_multigrid_tpu.solvers.cg import cg

    src = cd.prepare_ch(b_e, b_o, interpret)
    rhs = cd.matpc_ch(src, dagger=True, interpret=interpret)
    res = cg(lambda v: cd.matpc_dagm_ch(v, interpret), rhs, tol=tol,
             maxiter=maxiter)
    x_e, x_o = cd.reconstruct_ch(res.x, b_e, b_o, interpret)
    rhs2 = jnp.sum(rhs * rhs)
    return (x_e, x_o), res.iters, res.r2 / rhs2


@partial(jax.jit, static_argnames=("tol", "maxiter", "interpret"))
def _invert_compact_x(cd: CompactDirac, b, tol, maxiter, interpret):
    from quda_qkxtm_multigrid_tpu.ops.dslash_pallas import (
        _to_channels, _from_channels)
    b_e = _to_channels(b[0]).astype(jnp.float32)
    b_o = _to_channels(b[1]).astype(jnp.float32)
    (x_e, x_o), iters, rel2 = invert_compact(
        cd, b_e, b_o, tol=tol, maxiter=maxiter, interpret=interpret)
    x = jnp.stack([_from_channels(x_e, (4, 3)),
                   _from_channels(x_o, (4, 3))]).astype(b.dtype)
    return x, iters, rel2


@partial(jax.jit, static_argnames=("interpret",))
def compact_true_residual_ch(cd: CompactDirac, x_e, x_o, b_e, b_o,
                             interpret: bool = False):
    """((r_e, r_o), |r|/|b|) entirely in CHANNEL storage — the HBM-lean
    certification program (no canonical complex fields staged: at
    48³×96 the canonical x+b alone are 4 GB beside the 7.6 GB operand
    bundle, which OOM'd the full-field form on-chip r4).  Returns the
    residual FIELDS beside the scalar (backend_quirks Q1 + Q4)."""
    m_e, m_o = cd.m_ch(x_e, x_o, interpret)
    r_e, r_o = b_e - m_e, b_o - m_o
    r2 = jnp.sum(r_e * r_e) + jnp.sum(r_o * r_o)
    b2 = jnp.sum(b_e * b_e) + jnp.sum(b_o * b_o)
    return (r_e, r_o), jnp.sqrt(r2 / b2)


@partial(jax.jit, static_argnames=("interpret",))
def compact_true_residual(cd: CompactDirac, x, b, interpret: bool = False):
    """(r, |r|/|b|) of the compact full operator as its OWN program,
    returning the residual FIELD beside the scalar (backend_quirks Q1 +
    Q4 — the in-solve-program recompute miscompiles).  Canonical-field
    convenience form (test/small-volume tier); the HBM-lean channel
    form is compact_true_residual_ch."""
    from quda_qkxtm_multigrid_tpu.ops.dslash_pallas import (
        _to_channels, _from_channels)
    x_e = _to_channels(x[0]).astype(jnp.float32)
    x_o = _to_channels(x[1]).astype(jnp.float32)
    b_e = _to_channels(b[0]).astype(jnp.float32)
    b_o = _to_channels(b[1]).astype(jnp.float32)
    (r_e, r_o), rel = compact_true_residual_ch(cd, x_e, x_o, b_e, b_o,
                                               interpret)
    r = jnp.stack([_from_channels(r_e, (4, 3)),
                   _from_channels(r_o, (4, 3))]).astype(b.dtype)
    return r, rel


@jax.jit
def _b_to_channels(b):
    """Canonical → channel planes as its own program: carries NO
    operand bundle, so the staged bytes are just b + the planes."""
    from quda_qkxtm_multigrid_tpu.ops.dslash_pallas import _to_channels
    return (_to_channels(b[0]).astype(jnp.float32),
            _to_channels(b[1]).astype(jnp.float32))


@partial(jax.jit, static_argnames=("dtype",))
def _x_from_channels(x_e, x_o, dtype):
    from quda_qkxtm_multigrid_tpu.ops.dslash_pallas import _from_channels
    return jnp.stack([_from_channels(x_e, (4, 3)),
                      _from_channels(x_o, (4, 3))]).astype(dtype)


def invert_compact_full(cd: CompactDirac, b, tol: float = 1e-7,
                        maxiter: int = 2000, interpret: bool = False):
    """Full-field front end: b is the canonical [2,4,3,T,Z,W] complex
    spinor.  EAGER four-program driver (the mg_solve pattern): layout
    conversion, the CG chain, the certified channel-domain residual,
    and the solution back-conversion each run as their OWN jit program
    — combining solve+residual corrupts both on the axon backend (see
    invert_compact docstring), and staging canonical fields beside the
    operand bundle OOMs 48³×96 (see compact_true_residual_ch).
    Returns an invert.InvertResult, so workflows can use a CompactDirac
    wherever they use a Dirac (the wiring of the reference's
    sloppy-resident gauge into invertQuda,
    interface_quda.cpp:1039/2276)."""
    from quda_qkxtm_multigrid_tpu.invert import InvertResult

    interpret = interpret or cd.interpret
    b_e, b_o = _b_to_channels(b)
    (x_e, x_o), iters, _ = invert_compact(cd, b_e, b_o, tol=tol,
                                          maxiter=maxiter,
                                          interpret=interpret)
    _, rel = compact_true_residual_ch(cd, x_e, x_o, b_e, b_o, interpret)
    x = _x_from_channels(x_e, x_o, jnp.dtype(b.dtype).name)
    return InvertResult(x, iters, rel)
