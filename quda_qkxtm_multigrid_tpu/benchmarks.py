"""Solve-level benchmarks: the BASELINE.md north-star metrics.

Measures, at a given geometry on the current backend:
  - twisted-clover fused CG invert wall-clock (the reference's
    invertQuda timing, tests/invert_test.cpp),
  - MG setup wall-clock (null vectors batched through the multi-RHS
    machinery + coarse-op construction; reference newMultigridQuda),
  - twisted-clover MG-GCR solve wall-clock (the reference's production
    solve, inv_gcr_quda.cpp:518 + multigrid.h:177; BASELINE.md primary
    metric at 32³×64).

Returns plain dicts (bench.py embeds them in the driver JSON line).
All per-solve numbers carry the quda.h:198-202-style telemetry
(iters/secs/gflops).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _tmc_params(use_pallas: bool, bf16: bool = False):
    from quda_qkxtm_multigrid_tpu.dirac import DiracParams
    return DiracParams(kind="twisted-clover", kappa=0.115, mu=0.05,
                       csw=1.0, use_pallas=use_pallas, pallas_bf16=bf16)


def _make(geom, use_pallas: bool, bf16: bool = False):
    from quda_qkxtm_multigrid_tpu.dirac import make_dirac
    from quda_qkxtm_multigrid_tpu.utils import rng
    from quda_qkxtm_multigrid_tpu import fields

    k1, _ = jax.random.split(jax.random.PRNGKey(7))
    params = _tmc_params(use_pallas, bf16)
    u = jax.jit(lambda k: rng.random_gauge(k, geom, dtype=jnp.complex64))(k1)
    d = jax.jit(lambda u: make_dirac(u, params, geom),
                static_argnames=())(u)
    # point_source must run under jit: its eager complex scatter
    # (.at[].set on c64) poisons the axon TPU client — the error
    # surfaces as deferred UNIMPLEMENTED at a much later fetch
    b = jax.jit(lambda: fields.point_source(geom, (0, 0, 0, 0), 0, 0,
                                            dtype=jnp.complex64))()
    return d, b


def bench_cg(geom, tol: float = 1e-7, maxiter: int = 2000) -> dict:
    """Fused-path tmc CG solve wall-clock (warm; one cold solve first to
    absorb compilation)."""
    from quda_qkxtm_multigrid_tpu.invert import invert
    from quda_qkxtm_multigrid_tpu.utils.profiling import solve_telemetry

    on_tpu = jax.default_backend() == "tpu"
    d, b = _make(geom, use_pallas=on_tpu)
    # invert must run under jit on this backend (an eager lax.while_loop
    # dispatch raises UNIMPLEMENTED)
    solve = jax.jit(lambda d, b: invert(d, b, tol=tol, maxiter=maxiter))
    out = solve(d, b)                                # cold (compiles)
    float(out.true_res)
    t0 = time.perf_counter()
    out = solve(d, b)
    res = float(out.true_res)
    secs = time.perf_counter() - t0
    tel = solve_telemetry(d, int(out.iters), secs)
    return {**tel.as_dict(), "true_res": res, "solver": "cg-fused"}


def bench_mg(geom, tol: float = 1e-7, nvec: int = 24,
             block=(4, 4, 4, 4), solver: str = "gcr") -> dict:
    # tol 1e-7: the c64 true-residual floor on this backend is ~3e-8
    # (both the GCR and Richardson outers stall there; the reference
    # reaches deeper only through its double-precision outer)
    """MG setup + MG-GCR solve wall-clock at the given geometry
    (BASELINE.md: 'twisted-clover MG-GCR solve wall-clock (32³×64)' is
    the primary solve metric)."""
    from quda_qkxtm_multigrid_tpu.mg.multigrid import (
        MGParams, setup_mg, mg_solve)
    from quda_qkxtm_multigrid_tpu.invert import true_residual

    on_tpu = jax.default_backend() == "tpu"
    d, b = _make(geom, use_pallas=on_tpu)
    p = MGParams(block=block, nvec=nvec, smoother_pc=True, n_level=2)

    t0 = time.perf_counter()
    mg = setup_mg(d, p, jax.random.PRNGKey(3))
    jax.block_until_ready(mg.coarse.x)
    setup_secs = time.perf_counter() - t0

    out, tel = mg_solve(mg, b, tol=tol, telemetry=True,
                        solver=solver)                   # cold
    t0 = time.perf_counter()
    out, tel = mg_solve(mg, b, tol=tol, telemetry=True,
                        solver=solver)                   # warm
    _, rel = true_residual(d, out.x, b)
    rel = float(rel)
    return {**tel.as_dict(), "true_res": rel, "solver": f"mg-{solver}",
            "setup_secs": round(setup_secs, 2), "nvec": nvec,
            "block": list(block)}


def solve_benchmarks(geom) -> dict:
    """The detail.solve payload for bench.py."""
    return {"cg": bench_cg(geom), "mg": bench_mg(geom)}
