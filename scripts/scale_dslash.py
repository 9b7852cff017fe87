"""Strong-scaling sweep of the sharded Wilson dslash over mesh grids —
the analogue of the reference's scaling harnesses
(reference tests/scale_wilson_dslash_test.sh:1-30,
sim_scale_wilson_dslash_no_comms.sh: mpirun -n {1..} sweeps over grid
decompositions).

Runs the SAME pjit code over every (Gt, Gz, Gw) decomposition that fits
the available devices and the lattice divisibility, and prints per-grid
wall-clock, aggregate GFLOP/s and parallel efficiency vs the 1-device
run.  On a real pod this is the strong-scaling measurement; on the
8-virtual-CPU-device mesh (default when no pod is attached:
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8)
it validates that every decomposition compiles and runs — the role of
the reference's comms-less simulation sweep.

Usage: python scripts/scale_dslash.py [X Y Z T] [--reps N]
"""
import os
import sys
import time

import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # the env var alone is NOT enough: sitecustomize force-registers
    # the axon TPU backend, which HANGS when the tunnel is down
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu.ops import dslash as dsl
from quda_qkxtm_multigrid_tpu.parallel import (
    make_lattice_mesh, shard_gauge, shard_spinor)
from quda_qkxtm_multigrid_tpu.utils import rng


def time_grid(u, psi, geom, grid, reps=3):
    mesh = make_lattice_mesh(grid)
    u_s = shard_gauge(u, mesh)
    psi_s = shard_spinor(psi, mesh)

    def chain(n):
        @jax.jit
        def f(u, p):
            def body(i, v):
                return dsl.dslash_parity(u, v, 0, geom) * 0.125
            return jnp.sum(jnp.abs(jax.lax.fori_loop(0, n, body, p)))
        return f

    with jax.set_mesh(mesh):
        lo, hi = chain(2), chain(12)
        float(lo(u_s, psi_s[1]))
        float(hi(u_s, psi_s[1]))
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            float(hi(u_s, psi_s[1]))
            t1 = time.perf_counter()
            float(lo(u_s, psi_s[1]))
            t2 = time.perf_counter()
            dt = ((t1 - t0) - (t2 - t1)) / 10
            best = dt if best is None else min(best, dt)
    return best


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    dims = [int(a) for a in args[:4]] if len(args) >= 4 else [8, 8, 8, 16]
    geom = Geometry(*dims)
    ndev = len(jax.devices())
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    dtype = jnp.complex64 if jax.default_backend() == "tpu" \
        else jnp.complex128
    u = rng.random_gauge(k1, geom, dtype=dtype)
    psi = rng.random_spinor(k2, geom, dtype=dtype)
    flops = dsl.WILSON_DSLASH_FLOPS_PER_SITE * geom.half_volume

    candidates = [(1, 1, 1), (2, 1, 1), (4, 1, 1), (8, 1, 1),
                  (1, 2, 1), (2, 2, 1), (2, 2, 2), (4, 2, 1)]
    t_ref = None
    print(f"geom={geom.dims} devices={ndev} "
          f"backend={jax.default_backend()}")
    print(f"{'grid':>10} {'n':>3} {'ms/apply':>9} {'GF/s':>8} {'eff':>6}")
    for grid in candidates:
        n = grid[0] * grid[1] * grid[2]
        if n > ndev:
            continue
        # divisibility: T%Gt, Z%Gz, Y%Gw and even local T for parity
        if geom.T % (2 * grid[0]) or geom.Z % grid[1] or geom.Y % grid[2]:
            continue
        try:
            dt = time_grid(u, psi, geom, grid, reps)
        except Exception as e:
            print(f"{str(grid):>10} {n:>3}   FAILED: {type(e).__name__}")
            continue
        if t_ref is None:
            t_ref = dt
        eff = t_ref / (dt * n)
        print(f"{str(grid):>10} {n:>3} {dt*1e3:>9.3f} "
              f"{flops/dt/1e9:>8.1f} {eff:>6.2f}")


if __name__ == "__main__":
    main()
