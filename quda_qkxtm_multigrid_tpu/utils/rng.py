"""Random field generation (counter-based, reproducible across shardings).

Replaces the reference's CURAND per-site state machinery
(reference lib/random.cu:46-68): JAX's threefry is already counter-based,
so a single key + shape determines every site's value independent of the
device mesh — no per-site state arrays needed.

All constructors emit the canonical lane-major layouts (lattice.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _real_dtype(dtype):
    return jnp.float64 if dtype == jnp.complex128 else jnp.float32


# The public constructors are jitted with static shape params: eager
# complex arithmetic is unsupported on the axon TPU backend (the error
# surfaces as a deferred UNIMPLEMENTED at the first host fetch, far
# from the offending op), so un-jitted constructors were a public-API
# trap.  jit respects jax.default_device, so host-staged builds
# (compact.make_compact host=True) are unaffected.
@partial(jax.jit, static_argnames=("geom", "dtype", "nspin", "ncolor",
                                   "parity_split", "batch_shape"))
def random_spinor(key, geom, dtype=jnp.complex128, nspin=4, ncolor=3,
                  parity_split=True, batch_shape=()):
    """Gaussian random color-spinor field [*batch, 2, 4, 3, T, Z, W] —
    the analogue of cpuColorSpinorField::Source(QUDA_RANDOM_SOURCE).
    batch_shape prepends axes drawn in the SAME normal call (batched
    draws, not vmap — vmap'd generation is unsupported on some
    backends)."""
    lead = (2,) if parity_split else ()
    shape = tuple(batch_shape) + lead + (nspin, ncolor) + geom.lat_shape
    kr, ki = jax.random.split(key)
    rdt = _real_dtype(dtype)
    re = jax.random.normal(kr, shape, dtype=rdt)
    im = jax.random.normal(ki, shape, dtype=rdt)
    return (re + 1j * im).astype(dtype)


def su3_project_leading(a):
    """Project onto SU(3) by Gram-Schmidt on the first two rows + cross
    -product third row (det = +1 exactly) — the classic reunitarisation
    (reference lib/gauge_field_order.h Reconstruct<12>).

    ``a`` has its (row, col) axes LEADING: [3, 3, ...].  Component-wise
    math only: batched jnp.linalg.qr lowers catastrophically on TPU, and
    trailing size-3 axes pay a 42x lane-padding tax."""
    r0 = [a[0, i] for i in range(3)]
    r1 = [a[1, i] for i in range(3)]

    def _norm(v):
        return jnp.sqrt(sum(jnp.real(c * jnp.conj(c)) for c in v))

    n0 = _norm(r0)
    r0 = [c / n0 for c in r0]
    ip = sum(jnp.conj(x) * y for x, y in zip(r0, r1))
    r1 = [y - ip * x for x, y in zip(r0, r1)]
    n1 = _norm(r1)
    r1 = [c / n1 for c in r1]
    r2 = [jnp.conj(r0[1] * r1[2] - r0[2] * r1[1]),
          jnp.conj(r0[2] * r1[0] - r0[0] * r1[2]),
          jnp.conj(r0[0] * r1[1] - r0[1] * r1[0])]
    rows = [jnp.stack(r, axis=0) for r in (r0, r1, r2)]
    return jnp.stack(rows, axis=0)


@partial(jax.jit, static_argnames=("batch_shape", "dtype"))
def random_su3(key, batch_shape, dtype=jnp.complex128):
    """Random SU(3) matrices [3, 3, *batch_shape] (leading matrix axes) —
    the role of construct_gauge_field's random unitaries
    (reference tests/test_util.cpp:1018)."""
    kr, ki = jax.random.split(key)
    rdt = _real_dtype(dtype)
    shape = (3, 3) + batch_shape
    a = (jax.random.normal(kr, shape, dtype=rdt)
         + 1j * jax.random.normal(ki, shape, dtype=rdt)).astype(dtype)
    return su3_project_leading(a)


@partial(jax.jit, static_argnames=("geom", "dtype"))
def random_gauge(key, geom, dtype=jnp.complex128):
    """Random SU(3) gauge field [4, 2, 3, 3, T, Z, W]."""
    u = random_su3(key, (4, 2) + geom.lat_shape, dtype)   # [3,3,4,2,T,Z,W]
    return jnp.moveaxis(u, (0, 1), (2, 3))


@partial(jax.jit, static_argnames=("geom", "dtype"))
def unit_gauge(geom, dtype=jnp.complex128):
    eye = jnp.eye(3, dtype=dtype).reshape(1, 1, 3, 3, 1, 1, 1)
    return jnp.broadcast_to(eye, (4, 2, 3, 3) + geom.lat_shape).astype(dtype)


@partial(jax.jit, static_argnames=("geom", "dtype", "nspin", "ncolor"))
def z4_source(key, geom, dtype=jnp.complex128, nspin=4, ncolor=3):
    """Z4 stochastic volume source with entries in {+1,+i,-1,-i},
    matching the reference's GSL-ranlux Z4 generator
    (reference lib/qudaQKXTM_Kepler_utils.cpp:149)."""
    shape = (2, nspin, ncolor) + geom.lat_shape
    k = jax.random.randint(key, shape, 0, 4)
    table = jnp.asarray([1 + 0j, 1j, -1 + 0j, -1j], dtype=dtype)
    return table[k]
