"""Consolidated on-chip session: everything queued while the axon
tunnel was down.  Run with plain `python scripts/tpu_session.py` when
jax.devices() answers again.  Each phase prints a tagged line; phases
are ordered by value so a mid-session tunnel death still yields the
most important numbers first."""
import json, time, sys
import jax, jax.numpy as jnp
from quda_qkxtm_multigrid_tpu import enable_compile_cache
enable_compile_cache(min_secs=1.0)
from quda_qkxtm_multigrid_tpu.lattice import Geometry


def phase(tag):
    print(f"\n===== {tag} [{time.strftime('%H:%M:%S')}] =====", flush=True)


# 0. sanity + fused CG on-chip check at 16^3x32
phase("sanity+cg16")
from quda_qkxtm_multigrid_tpu.benchmarks import _make, bench_cg, bench_mg
from quda_qkxtm_multigrid_tpu.invert import invert
g16 = Geometry(16, 16, 16, 32)
d, b = _make(g16, use_pallas=True)
solve = jax.jit(lambda d, b: invert(d, b, tol=1e-7, maxiter=2000))
out = solve(d, b)
print("16^3 cg (fused dagm): iters", int(out.iters), "res",
      float(out.true_res), flush=True)
assert float(out.true_res) < 5e-7
del d, b, out

# 1. MG north-star at 16^3x32: gcr vs gcr-pc (production outer)
phase("mg16-pc-vs-full")
mg16 = bench_mg(g16, solver="gcr")
print("MG16 gcr   :", json.dumps(mg16), flush=True)
mg16pc = bench_mg(g16, solver="gcr-pc")
print("MG16 gcr-pc:", json.dumps(mg16pc), flush=True)

# 2. 32^3x64 solve benches (north star)
phase("32cube-solves")
g32 = Geometry(32, 32, 32, 64)
cg32 = bench_cg(g32)
print("CG32:", json.dumps(cg32), flush=True)
for sv in ("gcr-pc", "gcr"):
    try:
        mg32 = bench_mg(g32, solver=sv)
        print(f"MG32 {sv}:", json.dumps(mg32), flush=True)
        break
    except Exception as e:       # keep going if one outer trips
        print(f"MG32 {sv} FAILED: {e!r}", flush=True)
import gc; gc.collect()

# 3. empirical tune at 32^3x64 (persisted tunecache)
phase("tune")
from quda_qkxtm_multigrid_tpu.utils.tunecache import tune_slab
for cfg in [dict(recon12=True, bf16=True),
            dict(recon12=True, bf16=False),
            dict(recon12=True, bf16=True, clover=True, xpay=True)]:
    tb = tune_slab(g32, verbose=True, **cfg)
    print("tuned", cfg, "->", tb, flush=True)

# 4. msrc slab A/B at 32^3x64 (the production 2pt kernel)
phase("msrc-slab-ab")
from quda_qkxtm_multigrid_tpu.ops.dslash_pallas5 import (
    dslash_ch_pallas5_msrc, dslash_ch_pallas5_msrc_slab, gauge_channels,
    pick_slab_tb)
from quda_qkxtm_multigrid_tpu.ops import dslash as dsl
from quda_qkxtm_multigrid_tpu.utils import rng as _rng
key = jax.random.PRNGKey(0)
n_src = 4
g_ch = jax.jit(lambda k: jax.random.normal(
    k, (g32.T, 96, g32.Z, g32.W), jnp.float32).astype(jnp.bfloat16))(key)
cols = jax.jit(lambda k: jax.random.normal(
    k, (n_src, g32.T, 24, g32.Z, g32.W), jnp.float32))(key)


def slope(fn):
    def chain(n):
        @jax.jit
        def f(g, p):
            def body(i, v):
                return fn(g, v) * 0.5
            return jnp.sum(jnp.abs(jax.lax.fori_loop(0, n, body, p)))
        return f
    lo, hi = chain(4), chain(24)
    float(lo(g_ch, cols)); float(hi(g_ch, cols))
    best = None
    for _ in range(3):
        t0 = time.perf_counter(); float(hi(g_ch, cols))
        t1 = time.perf_counter(); float(lo(g_ch, cols))
        t2 = time.perf_counter()
        dt = ((t1 - t0) - (t2 - t1)) / 20
        best = dt if best is None else min(best, dt)
    return best


kwm = dict(recon12=True, bf16=True)
t_pp = slope(lambda g, p: dslash_ch_pallas5_msrc(g, p, 0, g32, **kwm))
tb = pick_slab_tb(g32, True, True, False, False) or 2
t_sl = slope(lambda g, p: dslash_ch_pallas5_msrc_slab(
    g, p, 0, g32, tb=tb, **kwm))
fl = dsl.WILSON_DSLASH_FLOPS_PER_SITE * g32.half_volume * n_src
print(f"msrc per-plane: {t_pp*1e3:.3f} ms = {fl/t_pp/1e9:.0f} GF/s; "
      f"slab tb={tb}: {t_sl*1e3:.3f} ms = {fl/t_sl/1e9:.0f} GF/s",
      flush=True)
del g_ch, cols

# 5. 48^3x96 compact feasibility + CG solve
phase("48cube-compact")
from quda_qkxtm_multigrid_tpu.compact import make_compact, invert_compact
from quda_qkxtm_multigrid_tpu.dirac import DiracParams
from quda_qkxtm_multigrid_tpu.ops.dslash_pallas import _to_channels
g48 = Geometry(48, 48, 48, 96)
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    u48 = jax.jit(lambda k: _rng.random_gauge(k, g48,
                                              dtype=jnp.complex64))(
        jax.random.PRNGKey(5))
    jax.block_until_ready(u48)
cd = make_compact(u48, DiracParams(kind="twisted-clover", kappa=0.115,
                                   mu=0.05, csw=1.0), g48, host=True)
del u48
with jax.default_device(cpu):
    b_e = jax.jit(lambda k: jax.random.normal(
        k, (g48.T, 24, g48.Z, g48.W), jnp.float32))(jax.random.PRNGKey(6))
    b_o = jax.jit(lambda k: jax.random.normal(
        k, (g48.T, 24, g48.Z, g48.W), jnp.float32))(jax.random.PRNGKey(7))
dev = jax.devices()[0]
b_e, b_o = jax.device_put(b_e, dev), jax.device_put(b_o, dev)
t0 = time.perf_counter()
(x_e, x_o), iters, rel2 = invert_compact(cd, b_e, b_o, tol=1e-6,
                                         maxiter=400)
jax.block_until_ready(x_e)
cold = time.perf_counter() - t0
rel = jnp.sqrt(rel2)  # PC-system loop residual (r4 contract change)
t0 = time.perf_counter()
(x_e, x_o), iters2, _ = invert_compact(cd, b_e, b_o, tol=1e-6,
                                       maxiter=400)
jax.block_until_ready(x_e)
warm = time.perf_counter() - t0
print(f"48^3x96 compact CG: iters={int(iters)} rel={float(rel):.2e} "
      f"cold={cold:.1f}s warm={warm:.2f}s", flush=True)

# 6. headline bench
phase("bench")
import subprocess
r = subprocess.run([sys.executable, "/root/repo/bench.py"],
                   capture_output=True, text=True, timeout=2400)
print(r.stdout[-600:], flush=True)
print(r.stderr[-300:], flush=True)
