"""Random field generation (counter-based, reproducible across shardings).

Replaces the reference's CURAND per-site state machinery
(reference lib/random.cu:46-68): JAX's threefry is already counter-based,
so a single key + shape determines every site's value independent of the
device mesh — no per-site state arrays needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def random_spinor(key, geom, dtype=jnp.complex128, nspin=4, ncolor=3, parity_split=True):
    """Gaussian random color-spinor field, parity-split [2,T,Z,Y,X/2,Ns,Nc].

    The analogue of cpuColorSpinorField::Source(QUDA_RANDOM_SOURCE)
    (reference lib/color_spinor_field.cpp)."""
    lat = (2, geom.T, geom.Z, geom.Y, geom.X // 2) if parity_split else (
        geom.T, geom.Z, geom.Y, geom.X)
    shape = lat + (nspin, ncolor)
    kr, ki = jax.random.split(key)
    rdt = jnp.float64 if dtype == jnp.complex128 else jnp.float32
    re = jax.random.normal(kr, shape, dtype=rdt)
    im = jax.random.normal(ki, shape, dtype=rdt)
    return (re + 1j * im).astype(dtype)


def random_su3(key, shape, dtype=jnp.complex128):
    """Haar-ish random SU(3) matrices of batch ``shape`` (+ (3,3)).

    QR of a complex Gaussian, column-phase fixed, then det-normalised to
    land in SU(3) — the role of construct_gauge_field's random unitaries
    (reference tests/test_util.cpp:1018)."""
    kr, ki = jax.random.split(key)
    rdt = jnp.float64 if dtype == jnp.complex128 else jnp.float32
    a = (jax.random.normal(kr, shape + (3, 3), dtype=rdt)
         + 1j * jax.random.normal(ki, shape + (3, 3), dtype=rdt)).astype(dtype)
    q, r = jnp.linalg.qr(a)
    # fix the phase ambiguity so the distribution is Haar
    d = jnp.diagonal(r, axis1=-2, axis2=-1)
    q = q * (d / jnp.abs(d))[..., None, :]
    det = jnp.linalg.det(q)
    return q / det[..., None, None] ** (1.0 / 3.0)


def random_gauge(key, geom, dtype=jnp.complex128):
    """Random SU(3) gauge field, parity-split [4, 2, T, Z, Y, X/2, 3, 3]."""
    shape = (4, 2) + geom.cb_shape
    return random_su3(key, shape, dtype)


def unit_gauge(geom, dtype=jnp.complex128):
    u = jnp.zeros((4, 2) + geom.cb_shape + (3, 3), dtype=dtype)
    return u + jnp.eye(3, dtype=dtype)


def z4_source(key, geom, dtype=jnp.complex128, nspin=4, ncolor=3):
    """Z4 stochastic volume source: entries in {±1, ±i}/√2 … actually
    Z4 = {+1, +i, -1, -i} with unit modulus, matching the reference's
    GSL-ranlux Z4 generator (reference lib/qudaQKXTM_Kepler_utils.cpp:149)."""
    shape = (2,) + geom.cb_shape + (nspin, ncolor)
    k = jax.random.randint(key, shape, 0, 4)
    table = jnp.asarray([1 + 0j, 1j, -1 + 0j, -1j], dtype=dtype)
    return table[k]
