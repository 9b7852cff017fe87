"""Adaptive aggregation multigrid: null-vector setup, V-cycle
preconditioner, MG-preconditioned GCR solve.

The analogue of the reference MG class (reference include/multigrid.h:177,
lib/multigrid.cpp): setup at :11-285 (generateNullVectors → Transfer →
createCoarseOp → recurse → coarse_solver GCR(maxiter 11, nkrylov 10)
:229-272), V-cycle in MG::operator() (presmooth → residual → restrict →
coarse-solve → prolongate-add → postsmooth), used as the GCR
preconditioner (interface_quda.cpp:2257, quda.h:225).

Levels: 2 (default) through 4 — the reference's QUDA_MAX_MG_LEVEL
(quda_constants.h:44) — via the dof-generic CoarseTransfer recursion
(reference lib/coarsecoarse_op.cu, MG::MG recursion multigrid.cpp:220).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from quda_qkxtm_multigrid_tpu.dirac import Dirac
from quda_qkxtm_multigrid_tpu.mg.transfer import (
    BlockGeometry, Transfer, to_blocked, block_orthonormalize)
from quda_qkxtm_multigrid_tpu.mg.coarse_op import CoarseOperator, build_coarse_op
from quda_qkxtm_multigrid_tpu.ops import dslash as _dsl
from quda_qkxtm_multigrid_tpu.solvers.bicgstab import bicgstab
from quda_qkxtm_multigrid_tpu.solvers.gcr import gcr, gcr_cycle, gcr_restarted
from quda_qkxtm_multigrid_tpu.solvers.mr import mr
from quda_qkxtm_multigrid_tpu.utils import rng as _rng


@dataclasses.dataclass(frozen=True)
class MGParams:
    """Per-solve MG configuration (the analogue of QudaMultigridParam,
    reference include/quda.h:327-409)."""

    block: tuple = (4, 4, 4, 4)       # (bx,by,bz,bt)
    nvec: int = 24
    setup_tol: float = 5e-6           # quda.h:366-369
    setup_maxiter: int = 500
    nu_pre: int = 0
    nu_post: int = 4                  # MR smoother steps
    omega: float = 0.85               # CalcMG_2pt3pt_EvenOdd.cpp:429
    smoother_pc: bool = False         # even-odd PC smoothing (the ETMC
    # production smoother_solve_type = QUDA_DIRECT_PC_SOLVE,
    # CalcMG_2pt3pt_EvenOdd.cpp:419): MR runs on the Schur system via
    # prepare/reconstruct — half the sites, better conditioned
    outer_solver: str = "gcr"         # mg_solve default: "gcr" |
    # "gcr-pc" (DIRECT_PC production path) | "mr-richardson"
    coarse_nkrylov: int = 10          # multigrid.cpp:229-272
    coarse_maxiter_restarts: int = 1  # GCR restarts on the coarse level
    coarse_tol: float = 0.25
    # level >= 2 (n_level <= QUDA_MAX_MG_LEVEL = 4, quda_constants.h:44)
    n_level: int = 2
    block2: tuple = (2, 2, 2, 2)      # aggregation of the coarse lattice
    # ETMC coarse-twist rescaling knobs (reference quda.h:401-407,
    # threaded in CalcMG_2pt3pt_EvenOdd.cpp:360-363): MULTIPLICATIVE
    # factors, *_coarse scales the operator the coarse level is built
    # from (delta_muCG..., lib/multigrid.cpp:166), *_pr scales the
    # smoother operator (delta_muPR..., interface_quda.cpp:2207).
    delta_mu_coarse: float = 1.0
    delta_kappa_coarse: float = 1.0
    delta_csw_coarse: float = 1.0
    delta_mu_pr: float = 1.0
    delta_kappa_pr: float = 1.0
    delta_csw_pr: float = 1.0
    nvec2: int = 24
    coarse2_nkrylov: int = 8          # bottom-level GCR cycle length
    setup2_tol: float = 1e-4
    setup2_maxiter: int = 200
    # level 3 (n_level = 4 = QUDA_MAX_MG_LEVEL, quda_constants.h:44)
    block3: tuple = (2, 2, 2, 2)
    nvec3: int = 16
    coarse3_nkrylov: int = 8
    setup3_tol: float = 1e-4
    setup3_maxiter: int = 150
    # null-vector persistence (reference vec_infile/vec_outfile,
    # quda.h:389-393; MG::loadVectors lib/multigrid.cpp): infile skips
    # generation — the setup-cost amortiser across runs on one gauge
    vec_infile: str = ""
    vec_outfile: str = ""
    # V-cycle null-vector STORAGE precision (the analogue of the
    # reference's precision_null, quda.h:351: production runs keep null
    # vectors in HALF).  The Galerkin coarse operator is always built
    # from the f32 vectors; "bf16" downcasts the planar V afterwards,
    # halving its residency (4.8 → 2.4 GB at 32³×64) — it only shapes
    # the preconditioner, the outer GCR still certifies in f32/c64.
    vec_dtype: str = "f32"            # "f32" | "bf16"
    # operator tier for the SOLVE-STEP programs (the V-cycle + GCR
    # directions): "compact" swaps in a channel-storage CompactDirac —
    # no canonical c64 operands in the step programs' arguments, no
    # X64Split/clover-channel temps in their arenas (the reference's
    # sloppy-precision inner solve, invertQuda precision_sloppy +
    # inv_gcr_quda.cpp sloppy inner).  Outer residuals always certify
    # on the CANONICAL operator (_pc_resid/_mr_resid), so restarts are
    # defect-correction against full precision, exactly QUDA's
    # reliable-update discipline.
    solve_operator: str = "canonical"  # "canonical" | "compact"
    # HBM-squeeze knobs for the compact solve tiers at the north-star
    # volume (32³×64: the step program stages its whole argument pytree
    # — V + coarse + operands — beside its arena on this backend, r4/r5
    # on-chip compile reports):
    #   step_cinv_bf16: store the STEP tier's clover-inverse channels
    #     in bf16 (−1.2 GB at 32³×64).  Inner GCR quality floors at
    #     ~4e-3 per cycle, which the f32-resid restarts absorb as extra
    #     restarts — never as lost accuracy (QUDA's sloppy-precision
    #     trade, enum_quda.h:55-62).
    #   resid_drop_clover: the RESIDUAL tier keeps only what the PC
    #     restart programs touch (gauge + clover inverse; matpc/
    #     prepare/reconstruct) and drops the direct clover channels
    #     (−1.2 GB).  Requires mg_solve(final_resid=False) + an
    #     independent final certification (bench_mg rebuilds the
    #     canonical operator, host_dc certifies in f64).
    step_cinv_bf16: bool = False
    resid_drop_clover: bool = False


@partial(jax.tree_util.register_dataclass,
         data_fields=["transfer", "coarse", "dirac", "transfer2", "coarse2",
                      "dirac_pr", "transfer3", "coarse3",
                      "dirac_sloppy"],
         meta_fields=["params"])
@dataclasses.dataclass(frozen=True)
class MGPreconditioner:
    transfer: Transfer
    coarse: CoarseOperator
    dirac: Dirac
    params: MGParams
    transfer2: Optional[Any] = None   # CoarseTransfer (3-level runs)
    coarse2: Optional[CoarseOperator] = None
    dirac_pr: Optional[Dirac] = None  # delta-scaled smoother operator
    # (delta_*PR knobs); None = smooth with the outer operator
    transfer3: Optional[Any] = None   # CoarseTransfer (4-level runs,
    coarse3: Optional[CoarseOperator] = None   # quda_constants.h:44)
    dirac_sloppy: Optional[Any] = None  # CompactDirac solve-step tier
    # (MGParams.solve_operator="compact"); residuals stay canonical

    @property
    def _dirac_smooth(self):
        return self.dirac if self.dirac_pr is None else self.dirac_pr

    def _coarse2_vcycle(self, r2):
        """Level-2 V-cycle correcting through level 3 (the deepest
        recursion of the reference's 4-level MG, lib/multigrid.cpp:220,
        QUDA_MAX_MG_LEVEL = 4, quda_constants.h:44)."""
        p = self.params
        m2 = self.coarse2.apply
        r3 = self.transfer3.restrict(r2)
        x3 = gcr_cycle(self.coarse3.apply, r3, n_krylov=p.coarse3_nkrylov)
        x2 = self.transfer3.prolong(x3)
        rr = r2 - m2(x2)
        return x2 + mr(m2, rr, niter=max(p.nu_post, 1), omega=p.omega)

    def _coarse_vcycle(self, r1):
        """Level-1 V-cycle over the coarse operator, correcting through
        level 2 (the recursion of MG::operator(), lib/multigrid.cpp)."""
        p = self.params
        m1 = self.coarse.apply
        x1 = mr(m1, r1, niter=p.nu_pre, omega=p.omega) \
            if p.nu_pre > 0 else jnp.zeros_like(r1)
        rr = r1 - m1(x1) if p.nu_pre > 0 else r1
        r2 = self.transfer2.restrict(rr)
        precond2 = self._coarse2_vcycle if self.transfer3 is not None \
            else None
        x2 = gcr_cycle(self.coarse2.apply, r2, n_krylov=p.coarse2_nkrylov,
                       precond=precond2)
        x1 = x1 + self.transfer2.prolong(x2)
        rr = r1 - m1(x1)
        return x1 + mr(m1, rr, niter=max(p.nu_post, 1), omega=p.omega)

    def coarse_solve(self, rc):
        """The coarse_solver of the reference (GCR over the coarse op,
        preconditioned by the next MG level when there is one;
        multigrid.cpp:229-272)."""
        p = self.params
        precond = self._coarse_vcycle if self.transfer2 is not None else None
        return gcr_cycle(self.coarse.apply, rc, n_krylov=p.coarse_nkrylov,
                         precond=precond)

    def _smooth(self, r, niter: int):
        """Approximate M x ≈ r by ``niter`` MR steps — either directly
        on the full operator or on the even-odd Schur system via
        prepare/reconstruct (reference smoother_solve_type,
        QUDA_DIRECT_PC_SOLVE in the production executables)."""
        p = self.params
        d = self._dirac_smooth
        if not p.smoother_pc:
            return mr(d.m, r, niter=niter, omega=p.omega)
        src = d.prepare(r)
        x_p = mr(d.matpc, src, niter=niter, omega=p.omega)
        return d.reconstruct(x_p, r)

    def vcycle(self, r):
        """One V(nu_pre, nu_post)-cycle approximating M^{-1} r on the
        full field [2,4,3,T,Z,W]."""
        p = self.params
        m = self.dirac.m
        x = jnp.zeros_like(r)
        if p.nu_pre > 0:
            x = self._smooth(r, p.nu_pre)
        rr = r - m(x) if p.nu_pre > 0 else r
        rc = self.transfer.restrict(rr)
        xc = self.coarse_solve(rc)
        x = x + self.transfer.prolong(xc)
        if p.nu_post > 0:
            rr = r - m(x)
            x = x + self._smooth(rr, p.nu_post)
        return x

    def vcycle_resharded(self, r, mesh):
        """V-cycle for a mesh-sharded fine field with REPLICATED coarse
        levels.

        The coarse-grid latency wall (SURVEY.md §7 hard-part 3): with a
        4⁴ blocking the coarse lattice has a few sites per chip, so a
        sharded coarse solve is all latency.  The reference's only
        escape was running coarse levels on the CPU
        (mg_param.location, quda.h:378); the TPU-native answer is to
        GATHER the (tiny) coarse residual to every chip — one
        all-gather inserted by XLA at the sharding boundary — and run
        the whole coarse solve replicated (identical compute per chip,
        zero further comms), then scatter back implicitly when the
        prolongated correction joins the sharded smoother."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        rep = NamedSharding(mesh, P())
        fine = NamedSharding(mesh, P(None, None, None, "t", "z", "w"))
        p = self.params
        m = self.dirac.m
        x = jnp.zeros_like(r)
        if p.nu_pre > 0:
            x = self._smooth(r, p.nu_pre)
        rr = r - m(x) if p.nu_pre > 0 else r
        rc = jax.lax.with_sharding_constraint(self.transfer.restrict(rr),
                                              rep)
        xc = jax.lax.with_sharding_constraint(self.coarse_solve(rc), rep)
        corr = jax.lax.with_sharding_constraint(self.transfer.prolong(xc),
                                                fine)
        x = x + corr
        if p.nu_post > 0:
            rr = r - m(x)
            x = x + self._smooth(rr, p.nu_post)
        return x


# --- jitted setup pieces --------------------------------------------
# Every setup step runs as a jit program with the field bundles passed
# as ARGUMENTS (not closures): the axon TPU backend rejects eager
# complex reductions, and closures over device arrays become IR
# constants forcing host transfers (see .claude/skills/verify/SKILL.md).


@partial(jax.jit, static_argnames=("tol", "maxiter"))
def _null_solve(dirac, b, tol, maxiter):
    return bicgstab(dirac.m, b, tol=tol, maxiter=maxiter).x


@partial(jax.jit, static_argnames=("bg",))
def _ortho_blocked(vs, bg):
    """Null vectors → orthonormal V in the FLAT blocked layout
    (mg/transfer.to_blocked_flat — the production Transfer storage)."""
    from quda_qkxtm_multigrid_tpu.mg.transfer import (
        to_blocked_flat, block_orthonormalize_flat)
    return block_orthonormalize_flat(
        jnp.stack([to_blocked_flat(v, bg) for v in vs]))


def _ortho_blocked_batched(batches, bg, n: int | None = None):
    """As _ortho_blocked but over a list of [n_i, ...] batch arrays —
    the 32³×64-capable HOST-LEVEL sequence (the full 24-vector set is
    ~4.8 GB in c64 and every single-program formulation tried acquires
    an 8x tile-padded layout copy on this backend — bisected on-chip
    r3, /tmp/probe2-5):

      1. one zeros program allocates the aggregate-major accumulator
         V [2, XC.., nvec, bdof] (its (24, 1536) minor pair is
         tile-exact under any boundary layout);
      2. one small conversion program per vector (traced once) converts
         batch[j] → flat blocked and dynamic-update-slices it into the
         DONATED accumulator — per-vector transpose temporaries are
         ~200 MB even when the compiler pads them;
      3. two donated cholqr_pass programs (CholQR², 3D operands only).
    """
    from quda_qkxtm_multigrid_tpu.mg.transfer import (
        to_blocked_flat, cholqr_pass_ri)
    if n is None:
        batches = list(batches)
        n = sum(int(b.shape[0]) for b in batches)
    # batches may be a GENERATOR (generate_null_vectors streams each
    # msrc solve straight into the donated accumulator, so at most ONE
    # solution batch is live beside V instead of all nvec — a 4.4 GB
    # peak saving at 32³×64); n must then be passed explicitly.
    it = iter(batches)
    first = next(it)
    rdt = jnp.float64 if first.dtype == jnp.complex128 else jnp.float32
    shape = (2,) + bg.coarse_shape + (n, bg.block_volume * 6)

    Vr = jax.jit(lambda: jnp.zeros(shape, rdt))()
    Vi = jax.jit(lambda: jnp.zeros(shape, rdt))()

    def _conv(Vr, Vi, b, i, j):
        flat = to_blocked_flat(b[j], bg)
        return (jax.lax.dynamic_update_slice_in_dim(
                    Vr, jnp.real(flat)[..., None, :], i, axis=-2),
                jax.lax.dynamic_update_slice_in_dim(
                    Vi, jnp.imag(flat)[..., None, :], i, axis=-2))

    conv = jax.jit(_conv, donate_argnums=(0, 1))
    i = 0
    b = first
    while b is not None:
        for j in range(int(b.shape[0])):
            Vr, Vi = conv(Vr, Vi, b, i, j)
            i += 1
        b = next(it, None)
    qr = jax.jit(cholqr_pass_ri, donate_argnums=(0,))
    return qr(qr((Vr, Vi)))


@partial(jax.jit, static_argnames=("geom", "dtype"))
def _random_spinor(key, geom, dtype):
    return _rng.random_spinor(key, geom, dtype=dtype)


@partial(jax.jit, static_argnames=("geom", "n", "dtype"))
def _random_spinor_batch(key, geom, n, dtype):
    """n random sources drawn as ONE [n, ...] normal inside one jit
    program.  Neither an eager jnp.stack of complex fields nor a
    vmap'd per-key generation survives the axon TPU backend (both
    surface as deferred UNIMPLEMENTED at the next fetch); a single
    batched draw does."""
    return _rng.random_spinor(key, geom, dtype=dtype,
                              batch_shape=(n,))


def _level1_terms(dirac):
    geom = dirac.geom
    kappa = dirac.params.kappa

    def diag_apply(psi):
        return jnp.stack([dirac.a_apply(psi[0], 0),
                          dirac.a_apply(psi[1], 1)])

    hop_terms = []
    for mu in range(4):
        for sign in (+1, -1):
            def h(psi, mu=mu, sign=sign):
                return -kappa * _dsl.hop_apply(dirac.u, psi, mu, sign, geom)
            hop_terms.append(h)
    return diag_apply, hop_terms


def _level1_diag_fn(dirac_diag):
    return _level1_terms(dirac_diag)[0]


def _level1_hops_fn(dirac_hops):
    return _level1_terms(dirac_hops)[1]


def _build_level1(transfer, dirac):
    """Direct V†(op)V coarse construction (calculateY analogue,
    lib/coarse_op.cu:17-118) — the probing build is kept in
    mg/coarse_op.py as the test oracle.  Eager orchestration: the
    builder dispatches one donated-accumulator program per coarse
    column (r4 OOM fix), with STRIPPED Dirac pytrees threaded as the
    terms contexts so exactly the arrays each program touches enter as
    jit ARGUMENTS (axon backend: device-array closures become IR
    constants; the full bundle as a shared ctx put clover_inv +
    u_doubled — unused by both programs — into every column program's
    argument footprint, 2.5 GB past HBM at 32³×64)."""
    from quda_qkxtm_multigrid_tpu.mg.coarse_op import build_coarse_op_direct
    d_diag = dataclasses.replace(dirac, u=None, u_doubled=None,
                                 clover_inv=None)
    d_hops = dataclasses.replace(dirac, u_doubled=None, clover_inv=None,
                                 clover=None)
    return build_coarse_op_direct(transfer, dtype=dirac.u.dtype,
                                  diag_fn=_level1_diag_fn,
                                  hops_fn=_level1_hops_fn,
                                  ctx_diag=d_diag, ctx_hops=d_hops)


def generate_null_vectors(dirac: Dirac, bg: BlockGeometry, key,
                          params: MGParams, batch: int | None = None):
    """Near-kernel vectors: loose inverse iteration on random sources
    (reference MG::generateNullVectors, lib/multigrid.cpp — BiCGstab to
    setup_tol), then block-orthonormalisation.

    On the fused-Pallas operators the nvec solves are batched through
    the multi-RHS machinery (invert_msrc, the invertMultiSrcQuda
    analogue): the gauge/clover traffic amortises across the batch, so
    setup — the dominant MG bring-up cost — runs at the MRHS aggregate
    rate instead of nvec sequential solves.  batch=8 bounds HBM
    (~0.6 GB of channel-layout solver state per RHS at 32³×64)."""
    keys = jax.random.split(key, bg.nvec)
    if batch is None:
        # HBM-gated MRHS width: one msrc RHS costs ~4 GB of solver
        # state + vmap'd full-operator temps at 32³×64 (measured: batch
        # 8 compiles to 36.5 GB there), so scale the batch with volume.
        # The 32³×64 (2.1M sites) tier must be batch=1: TWO RHS of
        # solver state beside the planar-V accumulator (4.8 GB) and the
        # Dirac bundle (6 GB) OOM'd generation on-chip (bisected r4,
        # scripts/northstar_bisect.py)
        v = dirac.geom.volume
        batch = 8 if v <= 600_000 else (2 if v <= 1_100_000 else 1)
    if getattr(dirac, "_has_fused_matpc", False):
        from quda_qkxtm_multigrid_tpu.invert import invert_msrc

        @partial(jax.jit, static_argnames=("tol", "maxiter"))
        def _msrc_solve(d, bs, tol, maxiter):
            # jit-wrapped: invert_msrc is eager-hostile on the TPU
            # backend (vmap'd complex prepares outside jit raise
            # UNIMPLEMENTED)
            return invert_msrc(d, bs, tol=tol, maxiter=maxiter)

        def _solved_batches():
            for i0 in range(0, bg.nvec, batch):
                nb = min(batch, bg.nvec - i0)
                bs = _random_spinor_batch(keys[i0], dirac.geom, nb,
                                          dirac.u.dtype)
                yield _msrc_solve(dirac, bs, params.setup_tol,
                                  params.setup_maxiter).x
        # stream each solved batch straight into the donated V
        # accumulator (at most one batch live beside V; eager complex
        # stack/slice ops are unsupported on the axon TPU backend)
        return _ortho_blocked_batched(_solved_batches(), bg, n=bg.nvec)
    else:
        vs = [_null_solve(dirac, _random_spinor(k, dirac.geom,
                                                dirac.u.dtype),
                          params.setup_tol, params.setup_maxiter)
              for k in keys]
    return _ortho_blocked(vs, bg)


def _delta_scaled(dirac: Dirac, dmu: float, dkappa: float, dcsw: float):
    """Rebuild the operator with scaled (mu, kappa, csw) — clover term
    regenerated to keep A consistent (the reference reaches the same
    point by creating the internal Dirac from a scaled param copy)."""
    if dmu == 1.0 and dkappa == 1.0 and dcsw == 1.0:
        return dirac
    from quda_qkxtm_multigrid_tpu.dirac import make_dirac
    p = dirac.params
    newp = dataclasses.replace(
        p, mu=p.mu * dmu, kappa=p.kappa * dkappa, csw=p.csw * dcsw)
    return jax.jit(lambda u: make_dirac(u, newp, dirac.geom),
                   static_argnames=())(dirac.u)


def _null_vectors_for(dirac, bg, key, params: MGParams):
    """Generation with vec_infile/vec_outfile persistence (reference
    MG::loadVectors / saveVectors, lib/multigrid.cpp; quda.h:389-393):
    infile skips the nvec setup solves entirely — the amortiser for
    repeated solves on one gauge configuration."""
    from quda_qkxtm_multigrid_tpu.utils import checkpoint as ckpt
    import numpy as _np
    if params.vec_infile:
        a = ckpt.load_null_vectors(params.vec_infile)
        rdt = jnp.float64 if dirac.u.dtype == jnp.complex128 \
            else jnp.float32
        return (jnp.asarray(_np.ascontiguousarray(a.real), rdt),
                jnp.asarray(_np.ascontiguousarray(a.imag), rdt))
    v = generate_null_vectors(dirac, bg, key, params)
    if params.vec_outfile:
        # planar pair → complex on HOST (real d2h fetches are safe on
        # the axon backend; complex ones are not)
        ckpt.save_null_vectors(
            params.vec_outfile,
            _np.asarray(v[0]) + 1j * _np.asarray(v[1]))
    return v


def setup_mg(dirac: Dirac, params: MGParams, key,
             null_vectors=None) -> MGPreconditioner:
    """Build the MG preconditioner (reference MG::MG,
    lib/multigrid.cpp:11-285 and newMultigridQuda,
    interface_quda.cpp:2257); recursive for n_level >= 3."""
    bx, by, bz, bt = params.block
    bg = BlockGeometry(dirac.geom, bx, by, bz, bt, params.nvec)
    if null_vectors is None:
        v = _null_vectors_for(dirac, bg, key, params)
    else:
        v = _ortho_blocked(list(null_vectors), bg)
    # completion barrier: the generation's solver arenas must drain
    # BEFORE the coarse-build columns dispatch — overlapped, the two
    # residencies OOM'd the 32³×64 build at its first accumulator
    # alloc (bisected on-chip r4, scripts/northstar_bisect.py)
    jax.block_until_ready(v)
    transfer = Transfer(v=v, bg=bg)
    d_coarse_src = _delta_scaled(dirac, params.delta_mu_coarse,
                                 params.delta_kappa_coarse,
                                 params.delta_csw_coarse)
    coarse = _build_level1(transfer, d_coarse_src)

    transfer2 = coarse2 = transfer3 = coarse3 = None
    if params.n_level >= 3:
        transfer2, coarse2 = setup_coarse_level(coarse, params, key)
    if params.n_level >= 4:
        transfer3, coarse3 = setup_coarse_level(
            coarse2, params, jax.random.fold_in(key, 3),
            block=params.block3, nvec=params.nvec3,
            tol=params.setup3_tol, maxiter=params.setup3_maxiter)
    dirac_pr = _delta_scaled(dirac, params.delta_mu_pr,
                             params.delta_kappa_pr, params.delta_csw_pr)
    # phase barriers: the coarse-build columns, the V downcast, and the
    # solve-tier operand uploads must not pile up in flight — their
    # overlapped residencies (f32 V + bf16 V + build temps + 4.7 GB of
    # compact operands) OOM'd at 32³×64 (deferred, surfaced at the
    # post-setup fetch; bisected r4)
    jax.block_until_ready((coarse.x, coarse.y))
    transfer = _vec_storage_cast(transfer, params)
    jax.block_until_ready(transfer.v)
    d_resid, d_step = _solve_tier_operators(dirac, params)
    return MGPreconditioner(transfer=transfer, coarse=coarse,
                            dirac=d_resid,
                            params=params, transfer2=transfer2,
                            coarse2=coarse2,
                            dirac_pr=None if dirac_pr is dirac
                            else dirac_pr,
                            transfer3=transfer3, coarse3=coarse3,
                            dirac_sloppy=d_step)


def _solve_tier_operators(dirac, params: MGParams):
    """(residual operator, step operator) for the solve
    (MGParams.solve_operator).

    "compact": BOTH tiers are channel-storage CompactDiracs — residuals
    on f32 channels (== the c64 gauge to recon-12 reconstruction
    rounding), V-cycle/GCR directions on the bf16 sloppy tier — and the
    CANONICAL bundle (4.2 GB at 32³×64 plus 4 GB of per-program
    X64Split/clover-channel temps) is NOT stored on the preconditioner
    at all.  This is the reference's precision/precision_sloppy split
    (invertQuda, interface_quda.cpp:1039): the caller keeps u (0.6 GB)
    to rebuild a canonical operator for independent certification."""
    if getattr(params, "solve_operator", "canonical") != "compact":
        return dirac, None
    if getattr(dirac, "u", None) is None or not hasattr(dirac, "params"):
        return dirac, None
    from quda_qkxtm_multigrid_tpu.compact import make_compact
    interp = jax.default_backend() != "tpu"
    # host-staged builds: an on-device make_compact replays the whole
    # canonical construction (clover from F_munu + inversion, ~6 GB of
    # program temps) beside the live V + coarse + canonical bundle —
    # OOM'd at 32³×64 (bisected r4); the host build device_puts only
    # the finished channel operands
    host = not interp
    d_resid = make_compact(dirac.u, dirac.params, dirac.geom, bf16=False,
                           interpret=interp, host=host)
    if getattr(params, "resid_drop_clover", False):
        import dataclasses as _dc
        d_resid = _dc.replace(d_resid, cl_ch=(None, None))
    d_step = make_compact(dirac.u, dirac.params, dirac.geom, bf16=True,
                          interpret=interp, host=host,
                          cinv_bf16=getattr(params, "step_cinv_bf16",
                                            False))
    return d_resid, d_step


def _vec_storage_cast(transfer: Transfer, params: MGParams) -> Transfer:
    """Downcast the planar V to the requested STORAGE tier after every
    coarse operator has been built from the f32 vectors (reference
    precision_null, quda.h:351 — production null vectors live in HALF).
    Donated so the f32 planes are freed, not doubled."""
    if getattr(params, "vec_dtype", "f32") != "bf16":
        return transfer
    # donation cannot cross dtypes (f32 → bf16 halves the buffer), so
    # the f32 planes are freed EXPLICITLY once the casts complete —
    # left to GC they lingered beside the bf16 planes + the solve-tier
    # operand uploads and OOM'd setup at 32³×64 (bisected r4)
    cast = jax.jit(lambda a: a.astype(jnp.bfloat16))
    vr, vi = transfer.v
    out = (cast(vr), cast(vi))
    jax.block_until_ready(out)
    vr.delete()
    vi.delete()
    return dataclasses.replace(transfer, v=out)


def setup_mg_pair(dirac_up: Dirac, dirac_dn: Dirac, params: MGParams,
                  key) -> tuple:
    """Build the TWO MG preconditioners of a twisted-mass workflow — one
    per twist sign — sharing one set of null vectors (the analogue of
    preconditionerUP/DN, reference include/quda.h:227-228, built in
    CalcMG_2pt3pt_EvenOdd.cpp:719-726 and swapped per solve at
    interface_quda.cpp:6432/6502).  The coarse operators are re-probed
    per flavor, which carries the twist sign to every level (the role of
    the reference's delta_mu coarse-twist knobs, quda.h:401-407)."""
    bx, by, bz, bt = params.block
    bg = BlockGeometry(dirac_up.geom, bx, by, bz, bt, params.nvec)
    v = _null_vectors_for(dirac_up, bg, key, params)
    jax.block_until_ready(v)    # drain generation arenas (see setup_mg)
    transfer = Transfer(v=v, bg=bg)
    mgs = []
    for d in (dirac_up, dirac_dn):
        d_src = _delta_scaled(d, params.delta_mu_coarse,
                              params.delta_kappa_coarse,
                              params.delta_csw_coarse)
        coarse = _build_level1(transfer, d_src)
        transfer2 = coarse2 = transfer3 = coarse3 = None
        if params.n_level >= 3:
            transfer2, coarse2 = setup_coarse_level(coarse, params, key)
        if params.n_level >= 4:
            transfer3, coarse3 = setup_coarse_level(
                coarse2, params, jax.random.fold_in(key, 3),
                block=params.block3, nvec=params.nvec3,
                tol=params.setup3_tol, maxiter=params.setup3_maxiter)
        d_pr = _delta_scaled(d, params.delta_mu_pr, params.delta_kappa_pr,
                             params.delta_csw_pr)
        mgs.append(MGPreconditioner(
            transfer=transfer, coarse=coarse, dirac=d, params=params,
            transfer2=transfer2, coarse2=coarse2,
            dirac_pr=None if d_pr is d else d_pr,
            transfer3=transfer3, coarse3=coarse3))
    # storage cast AFTER both flavors' coarse builds read the f32 V
    tr_cast = _vec_storage_cast(transfer, params)
    if tr_cast is not transfer:
        mgs = [dataclasses.replace(m, transfer=tr_cast) for m in mgs]
    return tuple(mgs)


@partial(jax.jit, static_argnames=("tol", "maxiter"))
def _coarse_null_solve(coarse, b, tol, maxiter):
    return bicgstab(coarse.apply, b, tol=tol, maxiter=maxiter).x


def _random_coarse(key, shape, dtype):
    # Q2-safe batched draw (utils/backend_quirks.py)
    from quda_qkxtm_multigrid_tpu.utils.backend_quirks import (
        batched_normal_draw)
    return batched_normal_draw(key, shape, dtype)


@jax.jit
def _build_level2(transfer2, coarse):
    from quda_qkxtm_multigrid_tpu.mg.coarse_op import (
        coarse_diag_hops, build_coarse_op_direct_coarse)
    diag2, hops2 = coarse_diag_hops(coarse)
    return build_coarse_op_direct_coarse(transfer2, diag2, hops2,
                                         coarse.x.dtype)


def setup_coarse_level(coarse: CoarseOperator, params: MGParams, key,
                       block=None, nvec=None, tol=None, maxiter=None):
    """Build the next-level transfer + coarse-of-coarse operator by the
    same null-vector aggregation applied to the explicit coarse operator
    (reference lib/coarsecoarse_op.cu; null vectors per level,
    MG::MG recursion multigrid.cpp:220).  Dof-generic: works on ANY
    CoarseOperator level (the block/nvec/tol knobs default to the
    level-2 params; setup_mg passes the level-3 set for 4-level runs)."""
    from quda_qkxtm_multigrid_tpu.mg.transfer import (
        CoarseBlockGeometry, CoarseTransfer, to_blocked_coarse,
        block_orthonormalize_coarse)

    block = params.block2 if block is None else block
    nvec = params.nvec2 if nvec is None else nvec
    tol = params.setup2_tol if tol is None else tol
    maxiter = params.setup2_maxiter if maxiter is None else maxiter
    bg1 = coarse.bg
    dtype = coarse.x.dtype
    bx, by, bz, bt = block
    bg2 = CoarseBlockGeometry(
        fine_shape=bg1.coarse_shape, fine_ns=2, fine_nc=bg1.nvec,
        bx=bx, by=by, bz=bz, bt=bt, nvec=nvec)

    fshape = (2, bg1.nvec) + bg1.coarse_shape

    @partial(jax.jit, static_argnames=("bg2_",))
    def _ortho2(vs, bg2_):
        return block_orthonormalize_coarse(
            jnp.stack([to_blocked_coarse(v, bg2_) for v in vs]))

    vs = []
    for i in range(nvec):
        key, sub = jax.random.split(key)
        b = _random_coarse(sub, fshape, dtype)
        vs.append(_coarse_null_solve(coarse, b, tol, maxiter))
    transfer2 = CoarseTransfer(v=_ortho2(vs, bg2), bg=bg2)
    coarse2 = _build_level2(transfer2, coarse)
    return transfer2, coarse2


@partial(jax.jit, static_argnames=("n_krylov",))
def _gcr_step(mg, x, r, n_krylov):
    """One GCR(n_krylov) correction cycle on a PRECOMPUTED residual
    field: x += GCR-cycle(M, r, precond=V-cycle).

    r arrives as an ARGUMENT from the separate _mr_resid program — the
    backend miscompiles any single program that combines the b − M(x)
    recomputation with the V-cycle recursion (it evaluates the collapsed
    recursed form; see mg_solve).  Keeping the cycle residual-free makes
    the fully-jitted GCR outer correct on TPU, restart structure as in
    the reference (inv_gcr_quda.cpp:348-457)."""
    e = gcr_cycle(mg.dirac.m, r, n_krylov=n_krylov, precond=mg.vcycle)
    return x + e


@partial(jax.jit, static_argnames=("n_krylov", "mesh"))
def _gcr_step_sharded(mg, x, r, n_krylov, mesh):
    """_gcr_step with the replicated-coarse V-cycle (multi-chip path)."""
    e = gcr_cycle(mg.dirac.m, r, n_krylov=n_krylov,
                  precond=lambda rr: mg.vcycle_resharded(rr, mesh))
    return x + e


@partial(jax.jit, static_argnames=("n_krylov",))
def _gcr_step_pc(mg, x_p, r_p, n_krylov):
    """One GCR(n_krylov) cycle on the even-odd PC system M_pc x = src,
    preconditioned by the FULL-operator V-cycle through the Schur
    embedding: M_sym x = r ⇔ M_asym x = A_p r (M_asym = A_p·M_sym),
    and the full system with rhs (A_p r on parity p, 0 elsewhere)
    prepares to exactly that asymmetric PC system — so
    K(r) = [V-cycle((A_p r, 0))]_p.  This is the PreconditionedSolver
    wrapping of the reference (include/multigrid.h:177, used by the
    production DIRECT_PC outer, interface_quda.cpp:2257): the outer
    Krylov runs on half the dof with the better-conditioned Schur
    operator while MG cycles over the full operator it was built on."""
    pr = mg.dirac.params.matpc_parity

    def precond(rp):
        full = jnp.zeros((2,) + rp.shape, rp.dtype)
        full = full.at[pr].set(mg.dirac.a_apply(rp, pr))
        return mg.vcycle(full)[pr]

    e = gcr_cycle(mg.dirac.matpc, r_p, n_krylov=n_krylov,
                  precond=precond)
    return x_p + e


@partial(jax.jit, static_argnames=("n_krylov", "mesh"))
def _gcr_step_pc_sharded(mg, x_p, r_p, n_krylov, mesh):
    """_gcr_step_pc with the replicated-coarse V-cycle (multi-chip)."""
    pr = mg.dirac.params.matpc_parity

    def precond(rp):
        full = jnp.zeros((2,) + rp.shape, rp.dtype)
        full = full.at[pr].set(mg.dirac.a_apply(rp, pr))
        return mg.vcycle_resharded(full, mesh)[pr]

    e = gcr_cycle(mg.dirac.matpc, r_p, n_krylov=n_krylov,
                  precond=precond)
    return x_p + e


@jax.jit
def _pc_resid(dirac, x_p, src):
    """(r_p, |r_p|²) for the PC outer in its own program (field output
    alongside the scalar — see _mr_resid).

    Takes the DIRAC, not the whole MGPreconditioner: on the axon
    backend every array in a jit-argument pytree is staged into the
    program's HBM accounting even when unused, so carrying the planar V
    (4.8 GB at 32³×64) + coarse X/Y (1.4 GB) into the residual programs
    OOM'd the north-star solve (r4 on-chip; same lesson as the setup
    fix in commit abc653f)."""
    r = src - dirac.matpc(x_p)
    return r, jnp.real(jnp.vdot(r, r))


@jax.jit
def _pc_prepare(dirac, b):
    return dirac.prepare(b)


@jax.jit
def _pc_reconstruct(dirac, x_p, b):
    return dirac.reconstruct(x_p, b)


_zeros_like = jax.jit(jnp.zeros_like)
# NOTE: no bare jitted norm helper here on purpose — a program whose
# only output is a scalar reduction of a complex field raises
# UNIMPLEMENTED / miscompiles on the axon TPU backend; always obtain
# norms from a program that also returns a field (_mr_resid).


@jax.jit
def _mr_resid(dirac, x, b):
    """(r, |r|²) in its own program — see mg_solve docstring.

    MUST return the residual FIELD alongside the scalar: a jit program
    computing b − M(x) whose only outputs are reductions of it
    miscompiles on the axon TPU backend (observed r² = 123 where the
    true value, confirmed by host-side numpy on fetched arrays, is
    9.8e-10; adding r to the outputs yields the correct scalar).

    Takes the DIRAC, not the MGPreconditioner — see _pc_resid."""
    r = b - dirac.m(x)
    return r, jnp.real(jnp.vdot(r, r))


@jax.jit
def _mr_step(mg, x, r):
    """One minimal-residual Richardson step z = V-cycle(r),
    x += <Mz,r>/<Mz,Mz> z, with r as an INPUT (not recomputed here —
    fusing b − Mx with the V-cycle in one program triggers the backend
    miscompilation described in mg_solve)."""
    z = mg.vcycle(r)
    w = mg.dirac.m(z)
    denom = jnp.real(jnp.vdot(w, w))
    omega = jnp.where(denom > 0, jnp.vdot(w, r) / denom, 0.0).astype(r.dtype)
    return x + omega * z


@partial(jax.jit, static_argnames=("mesh",))
def _mr_step_sharded(mg, x, r, mesh):
    """_mr_step with the replicated-coarse V-cycle (multi-chip path)."""
    z = mg.vcycle_resharded(r, mesh)
    w = mg.dirac.m(z)
    denom = jnp.real(jnp.vdot(w, w))
    omega = jnp.where(denom > 0, jnp.vdot(w, r) / denom, 0.0).astype(r.dtype)
    return x + omega * z


def mg_solve(mg: MGPreconditioner, b, tol: float = 1e-8,
             n_krylov: int = 10, max_restarts: int = 50,
             solver: str | None = None, mesh=None,
             telemetry: bool = False, final_resid: bool = True):
    """MG-preconditioned outer solve of M x = b.

    Default "gcr": restarted GCR(n_krylov) — the reference's production
    outer (inv_gcr_quda.cpp:518) — structured for this backend as a
    host-paced restart loop over TWO jit programs per restart: (1)
    _mr_resid computes the true residual FIELD (+ norm; recomputed every
    restart = the reliable-update discipline), (2) _gcr_step runs the
    preconditioned GCR cycle on that residual.  The split is load-
    bearing: one program combining b − M(x) with the V-cycle recursion
    miscompiles on the axon TPU backend (it evaluates the collapsed
    recursed form; observed 2.8e-9 vs true 103 for the same x).  One
    host sync per n_krylov iterations is negligible.

    "mr-richardson": host-stepped minimal-residual Richardson, one
    V-cycle + true-residual per iteration — more syncs/residual
    recomputations, kept as the maximally-defensive fallback.

    "gcr-pc": the reference's PRODUCTION call path (DIRECT_PC solve
    type + MG, interface_quda.cpp:2257): the outer GCR runs on the
    even-odd Schur system (half the dof, better conditioned) with the
    full-operator V-cycle wrapped through the Schur embedding
    (_gcr_step_pc = PreconditionedSolver, include/multigrid.h:177);
    prepare/reconstruct bracket the solve, and convergence is checked
    on the PC residual then reported as the FULL-system true residual.

    telemetry=True: returns SolveTelemetry with secs/gflops per solve
    (quda.h:198-202 parity)."""
    from quda_qkxtm_multigrid_tpu.solvers.gcr import GCRResult
    import time as _time

    if solver is None:
        solver = getattr(mg.params, "outer_solver", None) or "gcr"
    if getattr(mg.dirac, "_has_fused_matpc", False) and mesh is None:
        # the fused tier never reads the PLAIN gauge (every dslash uses
        # u_doubled) — dropping it from the solve programs' argument
        # pytree saves its full footprint per program on this backend
        # (1.2 GB at 32³×64; same staging rule as _pc_resid)
        mg = dataclasses.replace(
            mg, dirac=dataclasses.replace(mg.dirac, u=None))
    # sloppy solve-step tier (solve_operator="compact"): the V-cycle +
    # GCR-direction programs run on channel-storage operands; every
    # residual/prepare/reconstruct program below certifies on the
    # CANONICAL mg.dirac (QUDA's sloppy-inner / true-outer split)
    mg_step = mg if mg.dirac_sloppy is None or mesh is not None else \
        dataclasses.replace(mg, dirac=mg.dirac_sloppy, dirac_sloppy=None)
    t0 = _time.perf_counter()
    if solver == "gcr-pc":
        src = _pc_prepare(mg.dirac, b)
        x_p = _zeros_like(src)
        r_p, r2 = _pc_resid(mg.dirac, x_p, src)
        b2 = float(r2)
        iters = 0
        for i in range(max_restarts):
            if float(r2) <= tol * tol * b2:
                break
            if mesh is not None:
                x_p = _gcr_step_pc_sharded(mg, x_p, r_p, n_krylov, mesh)
            else:
                x_p = _gcr_step_pc(mg_step, x_p, r_p, n_krylov)
            iters += n_krylov
            r_p, r2 = _pc_resid(mg.dirac, x_p, src)
        x = _pc_reconstruct(mg.dirac, x_p, b)
        if final_resid:
            r, r2_full = _mr_resid(mg.dirac, x, b)
        else:
            # final_resid=False (resid_drop_clover tier): the caller
            # certifies independently; report the converged PC r²
            r2_full = r2
        res = GCRResult(x, jnp.asarray(iters), r2_full)
        if telemetry:
            from quda_qkxtm_multigrid_tpu.utils.profiling import (
                solve_telemetry)
            return res, solve_telemetry(mg.dirac, iters,
                                        _time.perf_counter() - t0,
                                        mg_cycles=iters)
        return res

    x = _zeros_like(b)
    # |b|² from the first residual program (x = 0 ⇒ r² = |b|²): a
    # standalone scalar-only complex-reduction program raises
    # UNIMPLEMENTED on the axon backend; _mr_resid carries the field
    # output that makes the reduction well-formed.
    r, r2 = _mr_resid(mg.dirac, x, b)
    b2 = float(r2)
    iters = 0
    if solver == "mr-richardson":
        for i in range(max_restarts * n_krylov):
            if float(r2) <= tol * tol * b2:
                break
            if mesh is not None:
                x = _mr_step_sharded(mg, x, r, mesh)
            else:
                x = _mr_step(mg_step, x, r)
            iters += 1
            r, r2 = _mr_resid(mg.dirac, x, b)
    elif solver == "gcr":
        for i in range(max_restarts):
            if float(r2) <= tol * tol * b2:
                break
            if mesh is not None:
                x = _gcr_step_sharded(mg, x, r, n_krylov, mesh)
            else:
                x = _gcr_step(mg_step, x, r, n_krylov)
            iters += n_krylov
            r, r2 = _mr_resid(mg.dirac, x, b)
    else:
        raise ValueError(f"unknown mg_solve solver {solver!r}")
    res = GCRResult(x, jnp.asarray(iters), r2)
    if telemetry:
        from quda_qkxtm_multigrid_tpu.utils.profiling import solve_telemetry
        return res, solve_telemetry(mg.dirac, iters,
                                    _time.perf_counter() - t0,
                                    mg_cycles=iters)
    return res
