"""Host-canonical defect correction — certified solves at volumes whose
CANONICAL operator exceeds device HBM.

At 48³×96 the c64 canonical bundle (gauge + doubled gauge + clover
pair ≈ 12 GB) cannot sit beside the bf16 channel solve tier
(~5-8 GB) on a 16 GB chip, so no on-device program can evaluate the
canonical residual during the solve.  The reference faces the same
wall differently — it distributes the volume over GPUs and runs its
production outer in double precision (interface_quda.cpp invertQuda
precision ladder; inv_xsd_quda.cpp).  The single-chip TPU answer is a
defect-correction outer whose TRUE residual r = b − M x is evaluated
on the HOST CPU backend in complex128 (125 GB RAM, f64 ALU):

    x_host (c128, host)  ── residual on CPU in f64 ──►  r
    r → f32 planes → device  ── inner solve (bf16/f32 channel tier,
                                CG or MG-GCR) ──►  e
    e → planes → host  ── x_host += e ──►  repeat

Each restart contracts the true residual by roughly the inner tier's
own consistency floor (bf16-gauge tier ~1e-3 per restart, measured),
so reference-depth tolerances (1e-9/1e-10 in f64) arrive in a handful
of restarts.  Transfers are REAL planes only (complex d2h/h2d is
unsupported on the axon backend — utils/backend_quirks.py).

This composes with ANY device inner solver:
  * invert_compact_full on a bf16 CompactDirac (CG tier), or
  * mg_solve on an HBM-gated MG preconditioner (mg/hbm_setup.py).
"""

from __future__ import annotations

import time
from typing import Callable, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp


class HostDCResult(NamedTuple):
    x: np.ndarray        # host complex128 solution [2,4,3,T,Z,W]
    true_res: float      # f64 canonical |b − M x| / |b|
    restarts: int
    inner_iters: int
    resid_secs: float    # host residual evaluations (total)
    inner_secs: float    # device inner solves incl. transfers (total)
    history: tuple       # per-restart true residuals


def _cpu():
    return jax.devices("cpu")[0]


def make_host_residual(u_host, params, geom, dtype=jnp.complex128,
                       cache_path: str | None = None):
    """Build the canonical residual evaluator on the CPU backend.

    Returns ``resid(x_np, b_np) -> (r_np, rel)`` with everything in
    host numpy c128; the Dirac bundle is built once (clover from Fμν)
    and kept lean — m() needs neither the clover inverse nor the
    doubled gauge (dirac.py:469-473), so those are dropped from the
    bundle (~18 GB saved at 48³×96 in c128).

    ``cache_path``: optional .npy file caching the c128 clover term —
    the single-core Fμν build is tens of minutes at 48³×96 and the
    session benches rebuild it per phase/attempt over the SAME
    deterministic gauge; the caller owns keying the path by
    (geom, kappa, csw, gauge seed)."""
    import dataclasses
    import os
    from quda_qkxtm_multigrid_tpu.dirac import Dirac, make_dirac

    cpu = _cpu()
    p = dataclasses.replace(params, use_pallas=False)
    u_cpu = jax.device_put(np.asarray(u_host).astype(
        np.dtype(jnp.dtype(dtype).name)), cpu)
    with jax.default_device(cpu):
        if (cache_path and p.has_clover
                and os.path.exists(cache_path)):
            clov = jax.device_put(np.load(cache_path), cpu)
            d = Dirac(u=u_cpu, params=p, geom=geom, clover=clov,
                      clover_inv=None, u_doubled=None)
        else:
            d = jax.jit(lambda u: make_dirac(u, p, geom))(u_cpu)
            d = dataclasses.replace(d, clover_inv=None, u_doubled=None)
            if cache_path and d.clover is not None:
                np.save(cache_path, np.asarray(d.clover))
        jax.block_until_ready(d.clover if d.clover is not None else d.u)

        resid_prog = jax.jit(lambda d, x, b: (lambda r: (
            r, jnp.real(jnp.vdot(r, r)), jnp.real(jnp.vdot(b, b))))(
                b - d.m(x)))

    def resid(x_np: np.ndarray, b_np: np.ndarray):
        with jax.default_device(cpu):
            r, rn2, bn2 = resid_prog(
                d, jax.device_put(x_np, cpu), jax.device_put(b_np, cpu))
            rel = float(np.sqrt(float(rn2) / float(bn2)))
            return np.asarray(r), rel

    return resid


def invert_host_dc(resid_fn: Callable, inner_fn: Callable,
                   b_np: np.ndarray, tol: float = 1e-9,
                   max_restarts: int = 10) -> HostDCResult:
    """Defect-correction driver.

    resid_fn(x_np, b_np) -> (r_np c128, rel)   — host canonical residual
    inner_fn(r_np) -> (e_np c128-castable, iters) — device inner solve
                      of M e ≈ r (handles its own h2d/d2h planes)
    """
    x = np.zeros_like(b_np)
    hist = []
    inner_total = 0
    restarts = 0
    t_res = t_in = 0.0
    rel = float("inf")
    stalls = 0
    for _ in range(max_restarts):
        t0 = time.perf_counter()
        r, rel = resid_fn(x, b_np)
        t_res += time.perf_counter() - t0
        hist.append(rel)
        if rel < tol:
            break
        # unattended-session guards: a NaN/Inf correction from a
        # diverged inner tier would poison x for every remaining
        # restart, and a stalled contraction (rel not improving ~10%
        # per restart, twice running) means the inner tier has hit its
        # consistency floor — either way stop and return the honest
        # partial result instead of burning the phase's wall-clock
        # (the reference's reliable-update breakdown handling,
        # inv_cg_quda.cpp reliable-delta guards, serves the same role).
        if len(hist) >= 2 and rel > 0.9 * hist[-2]:
            stalls += 1
            if stalls >= 2:
                break
        else:
            stalls = 0
        t0 = time.perf_counter()
        e, iters = inner_fn(r)
        t_in += time.perf_counter() - t0
        e = np.asarray(e, dtype=x.dtype)
        if not np.all(np.isfinite(e)):
            break
        x += e
        inner_total += int(iters)
        restarts += 1
    else:
        t0 = time.perf_counter()
        _, rel = resid_fn(x, b_np)
        t_res += time.perf_counter() - t0
        hist.append(rel)
    return HostDCResult(x=x, true_res=rel, restarts=restarts,
                        inner_iters=inner_total,
                        resid_secs=round(t_res, 2),
                        inner_secs=round(t_in, 2),
                        history=tuple(round(h, 14) for h in hist))


def device_inner_compact(cd, tol: float = 1e-6, maxiter: int = 600):
    """Inner-solve adapter: bf16/f32 CompactDirac CG on the device.

    Takes/returns HOST c128 arrays; moves data as f32 REAL planes
    (complex transfers are unsupported on the axon backend) and runs
    the eager two-program compact driver (compact.invert_compact_full)."""
    from quda_qkxtm_multigrid_tpu.compact import invert_compact_full
    from quda_qkxtm_multigrid_tpu.utils.checkpoint import (
        fetch_complex, upload_complex)

    def inner(r_np: np.ndarray):
        r_dev = upload_complex(r_np.astype(np.complex64), jnp.complex64)
        out = invert_compact_full(cd, r_dev, tol=tol, maxiter=maxiter)
        iters = int(out.iters)       # also drains the solve's programs
        r_dev.delete()               # free the RHS BEFORE the x fetch
        e = fetch_complex(out.x).astype(np.complex128)
        out.x.delete()
        return e, iters

    return inner


def device_inner_mg(mg, tol: float = 1e-5, solver: str = "gcr-pc",
                    max_restarts: int = 20, n_krylov: int = 10):
    """Inner-solve adapter: MG-GCR on the device solve tier (an
    HBM-gated preconditioner from mg/hbm_setup.py or any
    MGPreconditioner).  Host c128 in/out, f32-plane transfers.
    n_krylov bounds the GCR direction storage (2·n_krylov PC fields —
    the binding HBM term at 48³×96: 10 pairs ≈ 10 GB there)."""
    from quda_qkxtm_multigrid_tpu.mg.multigrid import mg_solve
    from quda_qkxtm_multigrid_tpu.utils.checkpoint import (
        fetch_complex, upload_complex)

    def inner(r_np: np.ndarray):
        r_dev = upload_complex(r_np.astype(np.complex64), jnp.complex64)
        out = mg_solve(mg, r_dev, tol=tol, solver=solver,
                       max_restarts=max_restarts, n_krylov=n_krylov)
        iters = int(out.iters)       # also drains the solve's programs
        r_dev.delete()               # free the RHS BEFORE the x fetch
        e = fetch_complex(out.x).astype(np.complex128)
        out.x.delete()
        return e, iters

    return inner
