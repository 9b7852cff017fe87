"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: Wilson-type Dslash GFLOP/s per chip (the reference's primary
kernel metric, tests/dslash_test.cpp:990-993; 1,320 flop/site,
lib/dirac_wilson.cpp:60).

vs_baseline = fraction of TPU speed-of-light for this bandwidth-bound
kernel: per output site in f32 the minimum HBM traffic is 8 links x 72 B
+ 96 B spinor in (perfect reuse) + 96 B out = 768 B -> SoL =
1320/768 * BW.  v5e BW = 819 GB/s -> 1408 GFLOP/s.  (BASELINE.md sets
the target at >= 0.70 of SoL.)
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from quda_qkxtm_multigrid_tpu.lattice import Geometry
    from quda_qkxtm_multigrid_tpu.ops import dslash as dsl
    from quda_qkxtm_multigrid_tpu.utils import rng

    on_tpu = jax.default_backend() not in ("cpu",)
    geom = Geometry(32, 32, 32, 64) if on_tpu else Geometry(8, 8, 8, 16)
    dtype = jnp.complex64

    @jax.jit
    def setup(key):
        k1, k2 = jax.random.split(key)
        u = rng.random_gauge(k1, geom, dtype=dtype)
        return u, dsl.double_gauge(u, geom), rng.random_spinor(
            k2, geom, dtype=dtype)

    u, ud, psi = setup(jax.random.PRNGKey(0))
    jax.block_until_ready((u, ud, psi))

    # Honest timing through the remote-execution tunnel: chain N applies
    # INSIDE one jit ending in a scalar reduction fetched to host (this
    # backend's block_until_ready does not reliably block), and take the
    # slope between two chain lengths to cancel dispatch/fetch overhead.
    from quda_qkxtm_multigrid_tpu.ops.dslash_pallas5 import dslash_parity_pallas5
    use_pallas = on_tpu

    def chain(n):
        @jax.jit
        def f(ud_or_u, p):
            def body(i, v):
                if use_pallas:
                    return dslash_parity_pallas5(ud_or_u, v, 0, geom,
                                                 recon12=True) * 0.125
                return dsl.dslash_parity(ud_or_u, v, 0, geom) * 0.125
            return jnp.sum(jnp.abs(jax.lax.fori_loop(0, n, body, p)))
        return f

    u = ud if use_pallas else u

    n_lo, n_hi = 10, 110
    f_lo, f_hi = chain(n_lo), chain(n_hi)
    float(f_lo(u, psi[1]))
    float(f_hi(u, psi[1]))          # compile both

    def best(f, reps=3):
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(u, psi[1]))
            vals.append(time.perf_counter() - t0)
        return min(vals)

    dt = (best(f_hi) - best(f_lo)) / (n_hi - n_lo)

    gflops = dsl.WILSON_DSLASH_FLOPS_PER_SITE * geom.half_volume / dt / 1e9
    sol = 1408.0  # v5e speed-of-light estimate, see module docstring
    print(json.dumps({
        "metric": "wilson_dslash_gflops_per_chip",
        "value": round(gflops, 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(gflops / sol, 4),
        "detail": {
            "geom": list(geom.dims), "dtype": "complex64",
            "backend": jax.default_backend(),
            "path": "pallas-v5-recon12" if on_tpu else "xla-shift",
            "ms_per_apply": round(dt * 1e3, 4),
            "speed_of_light_gflops": sol,
        },
    }))


if __name__ == "__main__":
    main()
