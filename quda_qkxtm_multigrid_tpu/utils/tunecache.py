"""Persistent kernel block-shape tunecache — the analogue of the
reference autotuner's disk cache (reference lib/tune.cpp:33-260:
tuneLaunch + tunecache.tsv under QUDA_RESOURCE_PATH, broadcast
rank0→all).

XLA autotunes its own kernels; what remains tunable here is the Pallas
slab depth tb (ops/dslash_pallas5.pick_slab_tb picks analytically from
the VMEM model).  tune_slab() measures the candidates once on the real
device and persists the winner keyed by (device kind, geometry, operand
config) to JSON under $QKXTM_RESOURCE_PATH (default ~/.cache/
quda_qkxtm_tpu); dslash_ch_auto consults the cache through
cached_slab_tb() before falling back to the analytic model."""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp


def _cache_path():
    root = os.environ.get(
        "QKXTM_RESOURCE_PATH",
        os.path.join(os.path.expanduser("~"), ".cache", "quda_qkxtm_tpu"))
    os.makedirs(root, exist_ok=True)
    return os.path.join(root, "tunecache.json")


def _key(geom, recon12, bf16, clover, xpay, recon8):
    dev = jax.devices()[0].device_kind if jax.devices() else "cpu"
    return (f"{dev}|{geom.X}x{geom.Y}x{geom.Z}x{geom.T}"
            f"|r12={int(recon12)}|bf16={int(bf16)}|cl={int(clover)}"
            f"|xp={int(xpay)}|r8={int(recon8)}")


def _load():
    try:
        with open(_cache_path()) as f:
            return json.load(f)
    except Exception:
        return {}


def cached_slab_tb(geom, recon12, bf16, clover, xpay,
                   recon8=False):
    """Persisted tb for this config, or None if never tuned."""
    return _load().get(_key(geom, recon12, bf16, clover, xpay, recon8))


def tune_slab(geom, recon12=True, bf16=True, clover=False, xpay=False,
              recon8=False, reps=2, verbose=False):
    """Measure the slab-depth candidates for one dslash config on the
    current device and persist the fastest (tuneLaunch analogue; run
    once per geometry at deployment, like QUDA's initial tuning pass).
    Returns the winning tb (0 = per-plane v5 grid)."""
    from quda_qkxtm_multigrid_tpu.ops.dslash_pallas5 import (
        dslash_ch_pallas5, dslash_ch_pallas5_slab, slab_vmem_bytes)

    ng = 64 if recon8 else (96 if recon12 else 144)
    gdt = jnp.bfloat16 if bf16 else jnp.float32
    key = jax.random.PRNGKey(0)
    g = jax.jit(lambda k: jax.random.normal(
        k, (geom.T, ng, geom.Z, geom.W), jnp.float32).astype(gdt))(key)
    psi = jax.jit(lambda k: jax.random.normal(
        k, (geom.T, 24, geom.Z, geom.W), jnp.float32))(key)
    kw = dict(recon12=recon12, bf16=bf16, recon8=recon8)
    if clover:
        kw.update(clover="fwd",
                  cinv_ch=jax.jit(lambda k: jax.random.normal(
                      k, (geom.T, 144, geom.Z, geom.W),
                      jnp.float32).astype(gdt))(key))
    if xpay:
        kw.update(xpay_coef=-0.01, x_ch=psi)

    def timed(fn):
        def chain(n):
            @jax.jit
            def f(g, p):
                def body(i, v):
                    return fn(g, v) * 0.5
                return jnp.sum(jnp.abs(jax.lax.fori_loop(0, n, body, p)))
            return f
        lo, hi = chain(4), chain(24)
        float(lo(g, psi)); float(hi(g, psi))
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            float(hi(g, psi))
            t1 = time.perf_counter()
            float(lo(g, psi))
            t2 = time.perf_counter()
            dt = ((t1 - t0) - (t2 - t1)) / 20  # chain-length slope
            best = dt if best is None else min(best, dt)
        return best

    results = {}
    results[0] = timed(lambda g, p: dslash_ch_pallas5(
        g, p, 0, geom, **kw))
    for tb in (2, 3, 4):
        if geom.T % tb:
            continue
        if slab_vmem_bytes(geom, tb, recon12, bf16, clover, xpay,
                           recon8=recon8) > 118 * 1024 * 1024:
            continue
        results[tb] = timed(lambda g, p, tb=tb: dslash_ch_pallas5_slab(
            g, p, 0, geom, tb=tb, **kw))
    winner = min(results, key=results.get)
    if verbose:
        for tb, t in sorted(results.items()):
            print(f"  tb={tb}: {t*1e3:.3f} ms")
    cache = _load()
    cache[_key(geom, recon12, bf16, clover, xpay, recon8)] = winner
    with open(_cache_path(), "w") as f:
        json.dump(cache, f, indent=1, sort_keys=True)
    return winner


# ---- multi-chip matpc policy (overlap vs single-kernel) -------------
#
# The reference autotunes its dslash POLICY (interior/exterior overlap
# vs basic, lib/dslash_policy.cuh:1056-1080) the same way it tunes
# block shapes.  The TPU analogue: under a t-sharded mesh the fused
# matpc can run either as one kernel over the t-extended block
# (serialises after the face ppermute) or interior/exterior-split with
# spin-projected faces (the collective can overlap the interior
# kernel).  Which wins depends on T_loc and the ICI:HBM ratio — so
# measure once per (device, geometry, nt, operator) and persist.

def _policy_key(geom, nt, kind, bf16):
    dev = jax.devices()[0].device_kind if jax.devices() else "cpu"
    return (f"policy|{dev}|{geom.X}x{geom.Y}x{geom.Z}x{geom.T}"
            f"|nt={nt}|{kind}|bf16={int(bf16)}")


def cached_matpc_policy(dirac, mesh):
    """Persisted overlap policy for this config: True/False, or None if
    never tuned."""
    nt = mesh.shape.get("t", 1)
    p = dirac.params
    return _load().get(_policy_key(dirac.geom, nt, p.kind,
                                   p.pallas_bf16))


def tune_matpc_policy(dirac, mesh, reps: int = 2, verbose: bool = False):
    """Measure overlap=False vs overlap=True for the fused shmap matpc
    under the given mesh and persist the winner (tuneLaunch analogue
    for the dslash policy).  Returns the winning overlap flag."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    geom = dirac.geom
    nt = mesh.shape.get("t", 1)
    spec = NamedSharding(mesh, P("t", None, None, None))
    psi = jax.jit(
        lambda k: jax.random.normal(
            k, (geom.T, 24, geom.Z, geom.W), jnp.float32),
        out_shardings=spec)(jax.random.PRNGKey(0))

    def timed(overlap):
        def chain(n):
            @jax.jit
            def f(p):
                def body(i, v):
                    return dirac._fused_matpc_ch_shmap(
                        v, mesh, False, overlap=overlap) * 0.5
                return jnp.sum(jnp.abs(
                    jax.lax.fori_loop(0, n, body, p)))
            return f
        lo, hi = chain(4), chain(24)
        float(lo(psi)); float(hi(psi))
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            float(hi(psi))
            t1 = time.perf_counter()
            float(lo(psi))
            t2 = time.perf_counter()
            dt = ((t1 - t0) - (t2 - t1)) / 20
            best = dt if best is None else min(best, dt)
        return best

    results = {False: timed(False)}
    if geom.T // nt > 2:
        results[True] = timed(True)
    winner = min(results, key=results.get)
    if verbose:
        for ov, t in sorted(results.items()):
            print(f"  overlap={ov}: {t*1e3:.3f} ms")
    cache = _load()
    p = dirac.params
    cache[_policy_key(geom, nt, p.kind, p.pallas_bf16)] = bool(winner)
    with open(_cache_path(), "w") as f:
        json.dump(cache, f, indent=1, sort_keys=True)
    return bool(winner)
