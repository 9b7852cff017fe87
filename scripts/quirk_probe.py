"""Probe which axon-TPU backend quirks still reproduce on the current
backend (the executable side of utils/backend_quirks.py).

Runs the RAW, un-worked-around pattern for each quirk and reports
REPRODUCES (workaround still needed) or FIXED (helper can be retired).
Run on the real chip after any backend/libtpu upgrade:

    python scripts/quirk_probe.py

On CPU all quirks report FIXED (they are axon-TPU behaviours) — that is
the expected control result, not a signal to delete the helpers.
"""
import traceback

import jax
import jax.numpy as jnp
import numpy as np

from quda_qkxtm_multigrid_tpu.utils.backend_quirks import (
    resid_with_norm, fetch_complex)


def probe(name, raw_fn, expect):
    """Run the raw pattern; quirk REPRODUCES if it raises or returns a
    wrong value."""
    try:
        val = raw_fn()
        ok = expect(val)
        status = "FIXED" if ok else f"REPRODUCES (wrong value: {val})"
    except Exception as e:  # noqa: BLE001 — any failure = quirk alive
        status = f"REPRODUCES ({type(e).__name__}: {str(e)[:120]})"
    print(f"  {name}: {status}", flush=True)
    return status


def main():
    print(f"backend = {jax.default_backend()}", flush=True)
    key = jax.random.PRNGKey(0)
    v = jax.jit(lambda k: (jax.random.normal(k, (64, 128))
                           + 1j * jax.random.normal(k, (64, 128))
                           ).astype(jnp.complex64))(key)
    truth = float(resid_with_norm(v)[1])

    # Q1: scalar-only complex-reduction program
    probe("Q1 scalar-only reduction",
          lambda: float(jax.jit(
              lambda x: jnp.real(jnp.vdot(x, x)))(v)),
          lambda got: abs(got - truth) < 1e-3 * max(truth, 1.0))

    # Q2: eager complex structural op (stack) + fetch
    def q2():
        s = jnp.stack([v, v])            # eager stack of c64
        re, im = jax.jit(lambda a: (jnp.real(a), jnp.imag(a)))(s)
        return float(jnp.sum(jnp.abs(re[..., :1]))) + float(
            jnp.sum(jnp.abs(im[..., :1])))
    probe("Q2 eager complex stack", q2, lambda got: got == got)

    # Q3: direct complex device->host fetch
    ref = fetch_complex(v)
    probe("Q3 np.asarray on complex",
          lambda: np.asarray(v),
          lambda got: np.allclose(got, ref))

    # Q4: residual fused with a preconditioner recursion in ONE program.
    # Small-scale stand-in for the MG pattern (mg/multigrid.py
    # _mr_resid/_gcr_step split): b - M(x) recomputed inside the same
    # program as a nested multi-step correction.  The full miscompile
    # needs the V-cycle recursion; treat FIXED here as necessary but
    # NOT sufficient to retire the split (re-run bench_mg to confirm).
    def q4():
        from quda_qkxtm_multigrid_tpu.lattice import Geometry
        from quda_qkxtm_multigrid_tpu.utils import rng
        from quda_qkxtm_multigrid_tpu.dirac import make_dirac, DiracParams
        from quda_qkxtm_multigrid_tpu.solvers.gcr import gcr_cycle
        from quda_qkxtm_multigrid_tpu.solvers.mr import mr
        geom = Geometry(8, 4, 4, 8)
        u = jax.jit(lambda k: rng.random_gauge(
            k, geom, dtype=jnp.complex64))(key)
        d = jax.jit(lambda u: make_dirac(
            u, DiracParams(kind="twisted-mass", kappa=0.115, mu=0.05),
            geom))(u)
        b = jax.jit(lambda k: rng.random_spinor(
            k, geom, dtype=jnp.complex64))(key)

        @jax.jit
        def fused(d, b):
            x0 = 0.1 * b
            r = b - d.m(x0)              # residual computed in-program
            e = gcr_cycle(d.m, r, n_krylov=4,
                          precond=lambda rr: mr(d.m, rr, niter=2,
                                                omega=0.85))
            rr = r - d.m(e)
            return rr, jnp.real(jnp.vdot(rr, rr))

        @jax.jit
        def resid_only(d, b, e):
            x0 = 0.1 * b
            r = b - d.m(x0) - d.m(e)
            return r, jnp.real(jnp.vdot(r, r))

        @jax.jit
        def step_only(d, r):
            return gcr_cycle(d.m, r, n_krylov=4,
                             precond=lambda rr: mr(d.m, rr, niter=2,
                                                   omega=0.85))

        _, fused_n2 = fused(d, b)
        r0, _ = resid_only(d, b, jnp.zeros_like(b))
        e = step_only(d, r0)
        _, split_n2 = resid_only(d, b, e)
        return abs(float(fused_n2) - float(split_n2)) / max(
            float(split_n2), 1e-30)
    probe("Q4 fused residual+precond (stand-in)", q4,
          lambda rel: rel < 1e-3)


if __name__ == "__main__":
    main()
