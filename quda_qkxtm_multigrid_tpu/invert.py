"""High-level solve driver — the analogue of invertQuda
(reference lib/interface_quda.cpp:2276).

Workflow (mirrors reference :2300-2500): factorise the solve
(even-odd preconditioned normal equations), prepare the Schur source,
run the Krylov solver, reconstruct the full-lattice solution, and
report the true residual computed with the full operator in the
source's precision (the role of invert_test.cpp's CPU-double residual
check, reference tests/invert_test.cpp:419-449).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from quda_qkxtm_multigrid_tpu.dirac import Dirac
from quda_qkxtm_multigrid_tpu.solvers.cg import cg, cg_mixed


class InvertResult(NamedTuple):
    x: jax.Array          # full solution [2,T,Z,Y,X/2,4,3]
    iters: jax.Array
    true_res: jax.Array   # |M x − b| / |b|


def _fused_tm(dirac: Dirac) -> bool:
    return dirac._has_fused_matpc


def _default_sloppy(dirac: Dirac) -> Dirac:
    """Demote every complex leaf one storage tier (f64→f32) — the
    default matSloppy when the caller supplies none (reference
    interface_quda.cpp:1039 loadSloppyGauge)."""
    lo = jnp.complex64
    return jax.tree.map(
        lambda a: a.astype(lo) if hasattr(a, "dtype") and
        jnp.issubdtype(a.dtype, jnp.complexfloating) else a, dirac)


def invert(dirac: Dirac, b, tol: float = 1e-10, maxiter: int = 1000,
           solver: str = "cg", sloppy_dirac: Dirac | None = None,
           inner_tol: float = 1e-2, mesh=None,
           overlap: bool | None = None) -> InvertResult:
    """Solve M x = b via CG on the even-odd preconditioned normal
    equations M_pc† M_pc x_p = M_pc† src (QUDA_NORMOP_PC_SOLVE).

    When the operator has the fused Pallas path (twisted-mass,
    use_pallas), the CG hot loop runs entirely in planar-channel f32
    layout — the matvec is 4 fused kernels with no elementwise or
    layout-conversion passes between them.

    mesh: with a t-sharded lattice mesh, the hot loop runs the
    MULTI-CHIP fused matpc (Dirac._fused_matpc_ch_shmap — two t-face
    ppermute pairs per application); prepare/reconstruct and the final
    true-residual run on the auto-partitioned XLA path (once per
    solve).

    overlap: use the interior/exterior-split kernels with
    spin-projected faces for the sharded matpc (the reference's policy
    choice, dslash_policy.cuh); None consults the persisted policy
    tunecache (tune_matpc_policy) and defaults to the single-kernel
    form if never tuned."""
    from quda_qkxtm_multigrid_tpu.compact import (
        CompactDirac, invert_compact_full)
    if isinstance(dirac, CompactDirac):
        # HBM-limited volumes (48³×96): the channel-bundle CG chain is
        # the only solve the compact operands support (the reference's
        # sloppy-resident-gauge path, interface_quda.cpp:1039)
        if mesh is not None:
            raise ValueError("CompactDirac is the single-chip HBM-"
                             "limited path; shard smaller volumes with "
                             "the full Dirac instead")
        if solver != "cg":
            raise ValueError(f"CompactDirac supports solver='cg' only, "
                             f"got {solver!r}")
        if isinstance(b, jax.core.Tracer):
            # traced caller (e.g. the jitted _solve_column): program
            # splitting is impossible here, and fusing the solve with a
            # post-loop residual recompute corrupts both on the axon
            # backend (compact.invert_compact docstring) — return the
            # loop-carried preconditioned-system residual instead of a
            # recomputed one (same convention as the fused-pallas path
            # inside one program).
            from quda_qkxtm_multigrid_tpu.compact import _invert_compact_x
            x, iters, rel2 = _invert_compact_x(
                dirac, b, tol, maxiter, dirac.interpret)
            return InvertResult(x, iters, jnp.sqrt(rel2))
        return invert_compact_full(dirac, b, tol=tol, maxiter=maxiter,
                                   interpret=dirac.interpret)
    if mesh is not None and solver == "cg" and _fused_tm(dirac):
        import dataclasses as _dc
        from quda_qkxtm_multigrid_tpu.ops.dslash_pallas import (
            _to_channels, _from_channels)

        if overlap is None:
            from quda_qkxtm_multigrid_tpu.utils.tunecache import (
                cached_matpc_policy)
            overlap = bool(cached_matpc_policy(dirac, mesh))

        d_xla = _dc.replace(dirac, params=_dc.replace(
            dirac.params, use_pallas=False))
        src = d_xla.prepare(b)
        rhs = d_xla.matpc(src, dagger=True)

        def matvec_ch(v_ch):
            t = dirac._fused_matpc_ch_shmap(v_ch, mesh, False,
                                            overlap=overlap)
            return dirac._fused_matpc_ch_shmap(t, mesh, True,
                                               overlap=overlap)

        rhs_ch = _to_channels(rhs).astype(jnp.float32)
        res_ch = cg(matvec_ch, rhs_ch, tol=tol, maxiter=maxiter)
        x_p = _from_channels(res_ch.x, (4, 3)).astype(rhs.dtype)
        x = d_xla.reconstruct(x_p, b)
        r = b - d_xla.m(x)
        true_res = jnp.sqrt(jnp.real(jnp.vdot(r, r))
                            / jnp.real(jnp.vdot(b, b)))
        return InvertResult(x, res_ch.iters, true_res)

    src = dirac.prepare(b)
    rhs = dirac.matpc(src, dagger=True)

    if solver == "cg" and _fused_tm(dirac):
        from quda_qkxtm_multigrid_tpu.ops.dslash_pallas import (
            _to_channels, _from_channels)

        def matvec_ch(v_ch):
            # 4-kernel fused normal operator with the dagger pre-apply
            # emitted by the forward half (post_op second output)
            return dirac._fused_matpc_dagm_ch(v_ch)

        rhs_ch = _to_channels(rhs).astype(jnp.float32)
        res_ch = cg(matvec_ch, rhs_ch, tol=tol, maxiter=maxiter)
        res = res_ch._replace(
            x=_from_channels(res_ch.x, (4, 3)).astype(rhs.dtype))
    elif solver == "cg":
        res = cg(dirac.matpc_dagm, rhs, tol=tol, maxiter=maxiter)
    elif solver == "cg-mixed":
        if sloppy_dirac is None:
            sloppy_dirac = _default_sloppy(dirac)
        res = cg_mixed(dirac.matpc_dagm, sloppy_dirac.matpc_dagm, rhs,
                       tol=tol, maxiter=maxiter, inner_tol=inner_tol)
    elif solver == "bicgstab":
        # non-hermitian solve of matpc(x) = src directly (no normal
        # equations) — reference lib/inv_bicgstab_quda.cpp
        from quda_qkxtm_multigrid_tpu.solvers.bicgstab import bicgstab
        res = bicgstab(dirac.matpc, src, tol=tol, maxiter=maxiter)
    elif solver == "bicgstab-mixed":
        # BASELINE parity config 2: mixed-precision BiCGstab
        from quda_qkxtm_multigrid_tpu.solvers.bicgstab import bicgstab_mixed
        if sloppy_dirac is None:
            sloppy_dirac = _default_sloppy(dirac)
        res = bicgstab_mixed(dirac.matpc, sloppy_dirac.matpc, src,
                             tol=tol, maxiter=maxiter, inner_tol=inner_tol)
    else:
        raise ValueError(f"unknown solver {solver}")

    x = dirac.reconstruct(res.x, b)
    r = b - dirac.m(x)
    true_res = jnp.sqrt(jnp.real(jnp.vdot(r, r)) / jnp.real(jnp.vdot(b, b)))
    from quda_qkxtm_multigrid_tpu.utils.guards import maybe_guard
    return InvertResult(maybe_guard(x, "invert.x"), res.iters, true_res)


def invert_msrc(dirac: Dirac, bs, tol: float = 1e-10,
                maxiter: int = 1000) -> InvertResult:
    """Multi-RHS solve of M x_i = b_i, bs [n_src, 2, 4, 3, T, Z, W] —
    the analogue of invertMultiSrcQuda (reference
    interface_quda.cpp:2546).  On the fused Pallas path the batched CG
    amortises the gauge/clover operand traffic across the sources
    (dslash_ch_pallas5_msrc); otherwise the matvec is a vmap."""
    from quda_qkxtm_multigrid_tpu.solvers.msrc import msrc_cg

    # once-per-solve stages run SEQUENTIALLY over the batch (lax.map):
    # vmapping the full-operator chains materialises per-RHS halo
    # temporaries for the whole batch at once (~4 GB/RHS at 32^3x64)
    src = jax.lax.map(dirac.prepare, bs)
    rhs = jax.lax.map(lambda s: dirac.matpc(s, dagger=True), src)

    if _fused_tm(dirac):
        from quda_qkxtm_multigrid_tpu.ops.dslash_pallas import (
            _to_channels, _from_channels)

        def matvec_b(v_ch_b):
            return dirac._fused_matpc_ch_msrc(
                dirac._fused_matpc_ch_msrc(v_ch_b, False), True)

        rhs_ch = jax.vmap(_to_channels)(rhs).astype(jnp.float32)
        res = msrc_cg(matvec_b, rhs_ch, tol=tol, maxiter=maxiter)
        x_p = jax.vmap(lambda v: _from_channels(v, (4, 3)))(
            res.x).astype(rhs.dtype)
    else:
        res = msrc_cg(jax.vmap(dirac.matpc_dagm), rhs, tol=tol,
                      maxiter=maxiter)
        x_p = res.x
    x = jax.lax.map(lambda a: dirac.reconstruct(a[0], a[1]), (x_p, bs))
    r = bs - jax.lax.map(dirac.m, x)
    # Per-source relative residuals (reference invertMultiSrcQuda
    # reports per-source true_res); report the WORST column so a badly
    # converged source cannot hide inside the batch norm.
    axes = tuple(range(1, r.ndim))
    per_src = jnp.sqrt(jnp.sum(jnp.abs(r) ** 2, axis=axes)
                       / jnp.sum(jnp.abs(bs) ** 2, axis=axes))
    return InvertResult(x, res.iters, jnp.max(per_src))


@jax.jit
def true_residual(dirac: Dirac, x, b):
    """(r, |r|/|b|) of the full operator in ONE safe jit program.

    Returns the residual FIELD alongside the scalar deliberately: on the
    axon TPU backend a program computing b − M(x) whose only outputs are
    scalar reductions miscompiles (reads a garbage norm); keeping r in
    the outputs produces the correct value.  Use this — not a bare
    jnp.vdot program — for convergence checks in drives and tests."""
    r = b - dirac.m(x)
    rel = jnp.sqrt(jnp.real(jnp.vdot(r, r)) / jnp.real(jnp.vdot(b, b)))
    return r, rel
