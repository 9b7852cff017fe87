"""Stage-by-stage bisect of the 32^3x64 MG-GCR-PC north-star with a
REAL fetch after every stage (the axon backend defers async errors past
block_until_ready; only a host fetch surfaces them —
utils/backend_quirks.py).  Run:  python scripts/northstar_bisect.py
[stage...] where stages are: setup prep resid step solve.
"""
import sys
import time

import jax
import jax.numpy as jnp

from quda_qkxtm_multigrid_tpu import enable_compile_cache
enable_compile_cache(min_secs=1.0)
from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu import benchmarks as B

sel = set(a for a in sys.argv[1:] if not a.startswith("-"))


def on(name):
    return not sel or name in sel


t00 = time.time()


def stamp(msg):
    print(f"[{time.time() - t00:7.1f}s] {msg}", flush=True)


def fetch(name, tree):
    """real/imag jit-fetch of one element per leaf — forces execution
    + surfaces deferred errors attributable to THIS stage."""
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "dtype")]
    tot = 0.0
    for x in leaves:
        flat = x.reshape(-1)[:1]
        if jnp.issubdtype(x.dtype, jnp.complexfloating):
            r, i = jax.jit(lambda v: (jnp.real(v), jnp.imag(v)))(flat)
            tot += abs(float(r[0])) + abs(float(i[0]))
        else:
            tot += abs(float(jax.jit(
                lambda v: v.astype(jnp.float32))(flat)[0]))
    stamp(f"fetch[{name}] ok ({len(leaves)} leaves, probe={tot:.3e})")


geom = Geometry(32, 32, 32, 64)
d, b = B._make(geom, use_pallas=jax.default_backend() == "tpu")
fetch("dirac+b", (d.u, b))

from quda_qkxtm_multigrid_tpu.mg.multigrid import (
    MGParams, setup_mg, mg_solve, _pc_prepare, _pc_resid, _gcr_step_pc,
    _zeros_like, _pc_reconstruct, _mr_resid)

p = MGParams(block=(4, 4, 4, 4), nvec=24, smoother_pc=True, n_level=2,
             vec_dtype="bf16", solve_operator="compact")
t0 = time.time()
mg = setup_mg(d, p, jax.random.PRNGKey(3))
fetch("setup.v", mg.transfer.v)
fetch("setup.coarse", (mg.coarse.x, mg.coarse.y))
stamp(f"setup done in {time.time() - t0:.1f}s "
      f"(V dtype {mg.transfer.v[0].dtype})")
if mg.dirac_sloppy is not None:
    # compact mode: the canonical bundle must not stay resident during
    # the solve stages (bench_mg drops it the same way)
    d = None
    stamp("canonical dirac dropped (compact tiers resident)")

if on("prep") or on("resid") or on("step") or on("solve"):
    src = _pc_prepare(mg.dirac, b)
    fetch("pc_prepare", src)
if on("resid") or on("step") or on("solve"):
    x_p = _zeros_like(src)
    r_p, r2 = _pc_resid(mg.dirac, x_p, src)
    fetch("pc_resid", (r_p, r2))
if on("step") or on("solve"):
    import dataclasses as _dc
    mg_step = mg if mg.dirac_sloppy is None else _dc.replace(
        mg, dirac=mg.dirac_sloppy, dirac_sloppy=None)
    t0 = time.time()
    x_p = _gcr_step_pc(mg_step, x_p, r_p, 10)
    fetch("gcr_step_pc", x_p)
    stamp(f"one gcr_step_pc in {time.time() - t0:.1f}s (incl. compile)")
if on("solve"):
    t0 = time.time()
    out, tel = mg_solve(mg, b, tol=1e-7, telemetry=True, solver="gcr-pc")
    fetch("solve.x", (out.x, out.r2))
    stamp(f"solve {tel.as_dict()} r2_full={float(out.r2):.3e} "
          f"in {time.time() - t0:.1f}s")
stamp("DONE")
