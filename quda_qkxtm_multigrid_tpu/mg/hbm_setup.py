"""HBM-gated MG setup — multigrid bring-up at volumes whose canonical
operator exceeds device HBM (48³×96 on a 16 GB chip).

The standard setup (mg/multigrid.setup_mg) keeps the canonical Dirac
bundle + the f32 planar V + the coarse-build programs resident — ~12 GB
of canonical operands alone at 48³×96, before any null-vector solver
state.  The reference never meets this wall on one device (it
distributes 48³×96 over ≥4 GPUs, lib/comm_*); the single-chip TPU
answer splits the setup across the host/device boundary:

  1. null vectors: solved ON DEVICE on the bf16 channel tier
     (CompactDirac CG — the only operator form that fits), streamed to
     host as f32 planes;
  2. block-orthonormalisation (CholQR²) on the host CPU backend;
  3. the Galerkin coarse operator V†(op)V built on the HOST against
     the CANONICAL operator (clover diag + gauge hops in c64 — full
     fidelity, no bf16 rounding in the coarse space);
  4. the solve-tier operands device_put once: V as bf16 planes
     (precision_null HALF analogue, quda.h:351), coarse X/Y, and the
     compact step operator.

The result is a standard MGPreconditioner whose dirac IS the compact
tier, so mg_solve's gcr-pc path runs unchanged; canonical-accuracy
outer residuals come from solvers/host_dc.py (defect correction with
the f64 host residual), the analogue of the reference's double outer
(interface_quda.cpp precision ladder).
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu.mg.multigrid import MGParams, MGPreconditioner
from quda_qkxtm_multigrid_tpu.mg.transfer import BlockGeometry, Transfer


def _cpu():
    return jax.devices("cpu")[0]


def generate_null_vectors_device(cd, mgp: MGParams, key, geom: Geometry,
                                 verbose: bool = False):
    """nvec loose solves of M v = random on the device compact tier,
    each fetched to host as c64 the moment it completes (at most one
    solution resident beside the operand bundle).  Returns a host
    [nvec, 2, 4, 3, T, Z, W] complex64 array."""
    from quda_qkxtm_multigrid_tpu.compact import invert_compact_full
    from quda_qkxtm_multigrid_tpu.utils.checkpoint import fetch_complex
    from quda_qkxtm_multigrid_tpu.utils import rng as _rng

    keys = jax.random.split(key, mgp.nvec)
    vs = np.empty((mgp.nvec, 2, 4, 3) + geom.lat_shape, np.complex64)
    for i, k in enumerate(keys):
        b = jax.jit(lambda k: _rng.random_spinor(
            k, geom, dtype=jnp.complex64))(k)
        out = invert_compact_full(cd, b, tol=mgp.setup_tol,
                                  maxiter=mgp.setup_maxiter)
        vs[i] = fetch_complex(out.x)
        if verbose:
            print(f"[hbm_setup] null vec {i + 1}/{mgp.nvec}: "
                  f"iters={int(out.iters)}", flush=True)
        for a in (b, out.x):
            a.delete()
    return vs


def _host_ortho(vs_np, bg: BlockGeometry):
    """Blocked layout + CholQR² on the CPU backend → planar f32
    (Vr, Vi) host arrays (the _ortho_blocked sequence, off-device)."""
    from quda_qkxtm_multigrid_tpu.mg.transfer import (
        to_blocked_flat, cholqr_pass_ri)

    cpu = _cpu()
    with jax.default_device(cpu):
        conv = jax.jit(lambda v: (lambda f: (jnp.real(f), jnp.imag(f)))(
            to_blocked_flat(v, bg)), static_argnames=())
        shape = (2,) + bg.coarse_shape + (bg.nvec, bg.block_volume * 6)
        Vr = np.empty(shape, np.float32)
        Vi = np.empty(shape, np.float32)
        for i in range(vs_np.shape[0]):
            fr, fi = conv(jax.device_put(vs_np[i], cpu))
            Vr[..., i, :] = np.asarray(fr, np.float32)
            Vi[..., i, :] = np.asarray(fi, np.float32)
        qr = jax.jit(cholqr_pass_ri)
        out = qr(qr((jax.device_put(Vr, cpu), jax.device_put(Vi, cpu))))
        return np.asarray(out[0]), np.asarray(out[1])


def _host_coarse_build(u_np, params, geom: Geometry, v_host, bg):
    """Canonical Galerkin coarse build on the CPU backend (c64): the
    level-1 diag/hops closures over a lean canonical Dirac (clover
    built from Fμν on host; no doubled gauge, no inverse — same split
    as multigrid._build_level1, run eagerly on CPU)."""
    from quda_qkxtm_multigrid_tpu.dirac import make_dirac
    from quda_qkxtm_multigrid_tpu.mg.coarse_op import (
        build_coarse_op_direct)
    from quda_qkxtm_multigrid_tpu.mg.multigrid import _level1_terms

    cpu = _cpu()
    p = dataclasses.replace(params, use_pallas=False)
    with jax.default_device(cpu):
        u_cpu = jax.device_put(u_np.astype(np.complex64), cpu)
        d = jax.jit(lambda u: make_dirac(u, p, geom))(u_cpu)
        d = dataclasses.replace(d, clover_inv=None, u_doubled=None)
        transfer = Transfer(v=(jax.device_put(v_host[0], cpu),
                               jax.device_put(v_host[1], cpu)), bg=bg)
        diag_apply, hop_terms = _level1_terms(d)
        coarse = build_coarse_op_direct(transfer, diag_apply=diag_apply,
                                        hop_terms=hop_terms,
                                        dtype=jnp.complex64)
        jax.block_until_ready((coarse.x, coarse.y))
    return coarse


def setup_mg_hbm(u_np: np.ndarray, params, geom: Geometry,
                 mgp: MGParams, key, cd=None, cinv_bf16: bool = True,
                 verbose: bool = False):
    """Build (MGPreconditioner, CompactDirac, timings) for an
    HBM-limited volume from a HOST gauge array.

    cinv_bf16=True stores the clover inverse channels in bf16 too
    (~1.5 GB saved at 48³×96): the inner PC consistency then floors at
    ~4e-3 instead of ~1e-7, which the host-DC outer absorbs at the
    cost of a few extra restarts — the memory/restart trade is the
    binding constraint at this volume, not inner precision."""
    from quda_qkxtm_multigrid_tpu.compact import make_compact

    timings = {}
    t0 = time.time()
    if cd is None:
        interp = jax.default_backend() != "tpu"
        cd = make_compact(jax.device_put(u_np, _cpu()), params, geom,
                          bf16=True, host=True, cinv_bf16=cinv_bf16,
                          interpret=interp)
        jax.block_until_ready(cd.g_ch)
    timings["build_compact_secs"] = round(time.time() - t0, 1)

    bx, by, bz, bt = mgp.block
    bg = BlockGeometry(geom, bx, by, bz, bt, mgp.nvec)

    t0 = time.time()
    vs = generate_null_vectors_device(cd, mgp, key, geom, verbose)
    timings["null_vectors_secs"] = round(time.time() - t0, 1)

    t0 = time.time()
    v_host = _host_ortho(vs, bg)
    del vs
    timings["host_ortho_secs"] = round(time.time() - t0, 1)

    t0 = time.time()
    coarse_host = _host_coarse_build(u_np, params, geom, v_host, bg)
    timings["host_coarse_secs"] = round(time.time() - t0, 1)

    t0 = time.time()
    dev = jax.devices()[0]
    v_dev = tuple(jax.device_put(np.asarray(p_, np.float32), dev)
                  for p_ in v_host)
    if mgp.vec_dtype == "bf16":
        # numpy has no bf16: cast on device from the f32 upload, then
        # free the f32 planes explicitly (the _vec_storage_cast rule)
        cast = jax.jit(lambda a: a.astype(jnp.bfloat16))
        v32 = v_dev
        v_dev = tuple(cast(p_) for p_ in v32)
        jax.block_until_ready(v_dev)
        for p_ in v32:
            p_.delete()
    transfer = Transfer(v=v_dev, bg=bg)
    # coarse X/Y are complex: upload via (re, im) planes (complex h2d
    # follows the same backend restriction as d2h — backend_quirks)
    from quda_qkxtm_multigrid_tpu.utils.checkpoint import upload_complex
    coarse = dataclasses.replace(
        coarse_host,
        x=upload_complex(np.asarray(coarse_host.x), jnp.complex64),
        y=upload_complex(np.asarray(coarse_host.y), jnp.complex64))
    jax.block_until_ready((transfer.v, coarse.x, coarse.y))
    timings["upload_secs"] = round(time.time() - t0, 1)

    mg = MGPreconditioner(transfer=transfer, coarse=coarse, dirac=cd,
                          params=mgp)
    return mg, cd, timings
