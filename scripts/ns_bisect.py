"""Bisect which transfer contraction asks for the 25.7 GB n-minor V
copy at 32^3x64 (compile-only, random V; no null-vector setup)."""
import sys
import time

import jax
import jax.numpy as jnp

from quda_qkxtm_multigrid_tpu import enable_compile_cache
enable_compile_cache(min_secs=1.0)

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu.mg.transfer import BlockGeometry, Transfer
from quda_qkxtm_multigrid_tpu.mg import coarse_op as co
from quda_qkxtm_multigrid_tpu import benchmarks as B


def stamp(tag):
    print(f"[{time.strftime('%H:%M:%S')}] {tag}", flush=True)


g = Geometry(32, 32, 32, 64)
bg = BlockGeometry(fine=g, bx=4, by=4, bz=4, bt=4, nvec=24)
cshape = bg.coarse_shape
n = bg.nvec

sel = set(sys.argv[1:])


def on(name):
    return not sel or name in sel


@jax.jit
def mk(key):
    k1, k2, k3 = jax.random.split(key, 3)
    v = (jax.random.normal(k1, (2,) + cshape + (n, bg.block_volume * 6))
         + 1j * jax.random.normal(
             k2, (2,) + cshape + (n, bg.block_volume * 6))
         ).astype(jnp.complex64)
    vc = jax.random.normal(k3, (2, n) + cshape).astype(jnp.complex64)
    return v, vc


v, vc = mk(jax.random.PRNGKey(0))
jax.block_until_ready(v)
tr = Transfer(v=(jnp.real(v), jnp.imag(v)), bg=bg)  # planar pair
stamp("fields ready")

if on("prolong"):
    f = jax.jit(lambda tr, vc: tr.prolong(vc))
    f.lower(tr, vc).compile()
    stamp("prolong compile OK")

if on("restrict"):
    fine = jax.jit(lambda tr, vc: tr.prolong(vc))(tr, vc)
    jax.block_until_ready(fine)
    f = jax.jit(lambda tr, p: tr.restrict(p))
    f.lower(tr, fine).compile()
    stamp("restrict compile OK")

if on("build"):
    d, b = B._make(g, use_pallas=True)
    stamp("dirac ready")
    from quda_qkxtm_multigrid_tpu.mg.multigrid import _build_level1
    jax.jit(_build_level1).lower(tr, d).compile()
    stamp("build_level1 compile OK")

stamp("DONE")
