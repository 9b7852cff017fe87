"""Adaptive aggregation multigrid: null-vector setup, V-cycle
preconditioner, MG-preconditioned GCR solve.

The analogue of the reference MG class (reference include/multigrid.h:177,
lib/multigrid.cpp): setup at :11-285 (generateNullVectors → Transfer →
createCoarseOp → recurse → coarse_solver GCR(maxiter 11, nkrylov 10)
:229-272), V-cycle in MG::operator() (presmooth → residual → restrict →
coarse-solve → prolongate-add → postsmooth), used as the GCR
preconditioner (interface_quda.cpp:2257, quda.h:225).

Round-1 scope: 2-level MG over the full (non-preconditioned) fine
operator M; the recursive level structure is in place (coarse-of-coarse
construction needs a dof-generic Transfer — noted for the next round,
reference lib/coarsecoarse_op.cu).
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
    coarse_nkrylov: int = 10          # multigrid.cpp:229-272
    coarse_maxiter_restarts: int = 1  # GCR restarts on the coarse level
    coarse_tol: float = 0.25


@partial(jax.tree_util.register_dataclass,
         data_fields=["transfer", "coarse", "dirac"],
         meta_fields=["params"])
@dataclasses.dataclass(frozen=True)
class MGPreconditioner:
    transfer: Transfer
    coarse: CoarseOperator
    dirac: Dirac
    params: MGParams

    def vcycle(self, r):
        """One V(nu_pre, nu_post)-cycle approximating M^{-1} r on the
        full field [2,4,3,T,Z,W]."""
        p = self.params
        m = self.dirac.m
        x = jnp.zeros_like(r)
        if p.nu_pre > 0:
            x = mr(m, r, niter=p.nu_pre, omega=p.omega)
        rr = r - m(x) if p.nu_pre > 0 else r
        rc = self.transfer.restrict(rr)
        xc = gcr_cycle(self.coarse.apply, rc, n_krylov=p.coarse_nkrylov)
        x = x + self.transfer.prolong(xc)
        if p.nu_post > 0:
            rr = r - m(x)
            x = x + mr(m, rr, niter=p.nu_post, omega=p.omega)
        return x


def generate_null_vectors(dirac: Dirac, bg: BlockGeometry, key,
                          params: MGParams):
    """Near-kernel vectors: loose inverse iteration on random sources
    (reference MG::generateNullVectors, lib/multigrid.cpp — BiCGstab to
    setup_tol), then block-orthonormalisation."""
    vs = []
    for i in range(bg.nvec):
        key, sub = jax.random.split(key)
        b = _rng.random_spinor(sub, dirac.geom, dtype=dirac.u.dtype)
        res = bicgstab(dirac.m, b, tol=params.setup_tol,
                       maxiter=params.setup_maxiter)
        vs.append(res.x)
    v_blocked = jnp.stack([to_blocked(v, bg) for v in vs])
    return block_orthonormalize(v_blocked)


def setup_mg(dirac: Dirac, params: MGParams, key,
             null_vectors=None) -> MGPreconditioner:
    """Build the 2-level MG preconditioner (reference MG::MG,
    lib/multigrid.cpp:11-285 and newMultigridQuda,
    interface_quda.cpp:2257)."""
    bx, by, bz, bt = params.block
    bg = BlockGeometry(dirac.geom, bx, by, bz, bt, params.nvec)
    if null_vectors is None:
        v = generate_null_vectors(dirac, bg, key, params)
    else:
        v = block_orthonormalize(jnp.stack(
            [to_blocked(nv, bg) for nv in null_vectors]))
    transfer = Transfer(v=v, bg=bg)

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

    coarse = build_coarse_op(transfer, diag_apply, hop_terms, dirac.u.dtype)
    return MGPreconditioner(transfer=transfer, coarse=coarse, dirac=dirac,
                            params=params)


@partial(jax.jit, static_argnames=("n_krylov",))
def _mg_cycle(mg, x, b, n_krylov):
    """One GCR(n_krylov) cycle with V-cycle preconditioning; mg passed
    as a pytree ARGUMENT (a closure would inline the gauge/coarse arrays
    as IR constants, forcing host transfers that this backend rejects)."""
    r = b - mg.dirac.m(x)
    e = gcr_cycle(mg.dirac.m, r, n_krylov=n_krylov, precond=mg.vcycle)
    return x + e


_zeros_like = jax.jit(jnp.zeros_like)
_norm2 = jax.jit(lambda v: jnp.real(jnp.vdot(v, v)))


@jax.jit
def _true_r2(mg, x, b):
    """|b - M x|² in its OWN XLA program: if computed inside the cycle
    graph, XLA algebraically folds b - M(x+e) back into the recursed
    GCR residual, which collapses orders of magnitude below the true
    residual in complex64 (observed 2.8e-9 vs 103 for identical x) and
    falsely terminates the restart loop."""
    r = b - mg.dirac.m(x)
    return jnp.real(jnp.vdot(r, r))


@jax.jit
def _mr_resid(mg, x, b):
    """(r, |r|²) in its own program — see mg_solve docstring."""
    r = b - mg.dirac.m(x)
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


def mg_solve(mg: MGPreconditioner, b, tol: float = 1e-8,
             n_krylov: int = 10, max_restarts: int = 50,
             solver: str = "mr-richardson"):
    """MG-preconditioned outer solve of M x = b.

    Default "mr-richardson": host-stepped minimal-residual Richardson,
    x += ω V-cycle(b − Mx) with a line search — with a V-cycle
    contraction of ~0.06/iteration this converges as fast as the
    reference's GCR wrapper in practice, recomputes the TRUE residual
    every step (the reliable-update discipline), and sidesteps a TPU
    backend miscompilation where any in-graph combination of the
    preconditioned Krylov recursion with its own residual evaluates the
    collapsed recursed form (observed 2.8e-9 vs true 103 for the same x).

    "gcr-jit": the fully-jitted GCR(n_krylov) restart cycle (correct on
    CPU; affected by the above on the current TPU backend)."""
    from quda_qkxtm_multigrid_tpu.solvers.gcr import GCRResult

    x = _zeros_like(b)
    b2 = float(_norm2(b))
    iters = 0
    r2 = None
    if solver == "mr-richardson":
        for i in range(max_restarts * n_krylov):
            r, r2 = _mr_resid(mg, x, b)
            if float(r2) <= tol * tol * b2:
                break
            x = _mr_step(mg, x, r)
            iters += 1
        return GCRResult(x, jnp.asarray(iters), r2)
    for i in range(max_restarts):
        x = _mg_cycle(mg, x, b, n_krylov)
        r2 = _true_r2(mg, x, b)
        iters += n_krylov
        if float(r2) <= tol * tol * b2:
            break
    return GCRResult(x, jnp.asarray(iters), r2)
