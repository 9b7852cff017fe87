"""Bisect the 32^3x64 MG setup chain on the axon TPU backend.

STATUS r2 known-issue #1: bench_mg at 32^3x64 dies with a DEFERRED
UNIMPLEMENTED somewhere in the setup sequence (msrc null-vector solves
-> block orthonormalisation -> coarse-op probing).  block_until_ready
does NOT surface async errors on this backend, so each stage is fetched
through a real/imag jit program (the only reliable error point) before
the next stage runs.  Run phases in order; the first stage whose fetch
raises is the culprit.

Usage: python scripts/mg_setup_bisect.py [geom]   (default 32 32 32 64;
pass e.g. 16 16 16 32 to confirm the small-volume control first).
"""
import os
import sys
import time

import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # env var alone is NOT enough: sitecustomize force-registers the
    # axon TPU backend (which hangs when the tunnel is down)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from quda_qkxtm_multigrid_tpu import enable_compile_cache
enable_compile_cache(min_secs=1.0)

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu.benchmarks import _make
from quda_qkxtm_multigrid_tpu.mg.multigrid import (
    MGParams, generate_null_vectors, _random_spinor_batch,
    _ortho_blocked_batched, _build_level1, setup_mg)
from quda_qkxtm_multigrid_tpu.mg.transfer import BlockGeometry, Transfer
from quda_qkxtm_multigrid_tpu.invert import invert_msrc


def fetch(tag, tree):
    """Force a real/imag host fetch of every leaf (the reliable error
    surface on this backend)."""
    t0 = time.time()
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "dtype")]
    for x in leaves:
        if jnp.issubdtype(x.dtype, jnp.complexfloating):
            re, im = jax.jit(lambda v: (jnp.real(v), jnp.imag(v)))(x)
            s = float(jnp.sum(jnp.abs(re[..., :1]))) + float(
                jnp.sum(jnp.abs(im[..., :1])))
        else:
            s = float(jnp.sum(jnp.abs(x[..., :1])))
        assert s == s, f"{tag}: NaN"
    print(f"  OK [{tag}] ({time.time()-t0:.1f}s, {len(leaves)} leaves)",
          flush=True)


dims = [int(a) for a in sys.argv[1:5]]
if len(dims) != 4:
    dims = [32, 32, 32, 64]
geom = Geometry(*dims)
print(f"bisect at {geom.dims}", flush=True)
p = MGParams(block=(4, 4, 4, 4), nvec=24, smoother_pc=True, n_level=2)
d, b = _make(geom, use_pallas=jax.default_backend() == "tpu")
fetch("dirac+source", (d.u, b))

bg = BlockGeometry(geom, 4, 4, 4, 4, p.nvec)
key = jax.random.PRNGKey(3)
keys = jax.random.split(key, bg.nvec)

# stage 1: one msrc batch draw
v = geom.volume
batch = 8 if v <= 600_000 else (2 if v <= 2_200_000 else 1)
print(f"batch={batch}", flush=True)
bs = _random_spinor_batch(keys[0], geom, batch, d.u.dtype)
fetch("random_spinor_batch", bs)

# stage 2: one msrc null solve
from functools import partial


@partial(jax.jit, static_argnames=("tol", "maxiter"))
def _msrc_solve(d, bs, tol, maxiter):
    return invert_msrc(d, bs, tol=tol, maxiter=maxiter)


out = _msrc_solve(d, bs, p.setup_tol, p.setup_maxiter)
fetch("msrc_solve[0]", out.x)

# stage 3: full null-vector generation (all batches + ortho)
t0 = time.time()
vv = generate_null_vectors(d, bg, key, p)
fetch("generate_null_vectors", vv)
print(f"  null vectors: {time.time()-t0:.1f}s", flush=True)

# stage 4: coarse-op probing
transfer = Transfer(v=(jnp.real(vv), jnp.imag(vv)), bg=bg)  # planar pair
coarse = _build_level1(transfer, d)
fetch("build_coarse_op", (coarse.x, coarse.y))

# stage 5: the full setup_mg wrapper (should now be a cache hit)
t0 = time.time()
mg = setup_mg(d, p, key)
fetch("setup_mg", (mg.coarse.x,))
print(f"setup_mg total (warm pieces): {time.time()-t0:.1f}s", flush=True)

# stage 6: one V-cycle and one gcr-pc restart
from quda_qkxtm_multigrid_tpu.mg.multigrid import mg_solve
out = mg_solve(mg, b, tol=1e-7, max_restarts=2, solver="gcr-pc")
fetch("mg_solve 2 restarts", out.x)
print("bisect: ALL STAGES OK", flush=True)
