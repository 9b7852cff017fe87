"""Gauge-field observables and transformations on the parity-split layout.

Covers the reference's gauge_plaq.cu / QKXTM calculatePlaq
(reference lib/gauge_plaq.cu:149, lib/qudaQKXTM_Kepler_kernels.cu:425)
and the fermion temporal boundary-condition phase that the reference
folds into the links at load time (applyGaugeFieldScaling,
reference tests/test_util.cpp; QUDA_ANTI_PERIODIC_T).
"""

from __future__ import annotations

import jax.numpy as jnp

import jax.lax as _lax


def _einsum(*args, **kw):
    """einsum pinned to HIGHEST precision: on TPU the default lowers 3x3
    SU(3)/spin contractions to bf16 MXU passes, flooring solver residuals
    at ~1e-3.  bf16 compute is an explicit sloppy-field choice, never an
    implicit one."""
    kw.setdefault("precision", _lax.Precision.HIGHEST)
    return jnp.einsum(*args, **kw)

from quda_qkxtm_multigrid_tpu.lattice import Geometry, gather_neighbor


def _mm(a, b):
    return _einsum("...ab,...bc->...ac", a, b)


def plaquette(u, geom: Geometry):
    """Mean plaquette (1/3) Re tr U_mu U_nu U_mu^† U_nu^†, averaged over
    all sites and the 6 mu<nu planes.  Returns (total, spatial, temporal)
    like the reference's plaqQuda (reference lib/gauge_plaq.cu:149)."""
    spatial = 0.0
    temporal = 0.0
    for mu in range(4):
        for nu in range(mu + 1, 4):
            acc = 0.0
            for p in (0, 1):
                a = u[mu, p]                                         # U_mu(x)
                b = gather_neighbor(u[nu, 1 - p], mu, True, p, geom)  # U_nu(x+mu)
                c = gather_neighbor(u[mu, 1 - p], nu, True, p, geom)  # U_mu(x+nu)
                d = u[nu, p]                                          # U_nu(x)
                m = _mm(a, b)
                n = _mm(d, c)
                acc += jnp.sum(jnp.real(m * jnp.conj(n)))
            if nu == 3:
                temporal += acc
            else:
                spatial += acc
    norm = 3.0 * geom.volume * 3.0  # 3 planes each, Nc=3
    spatial = spatial / norm
    temporal = temporal / norm
    return (spatial + temporal) / 2.0, spatial, temporal


def apply_t_boundary(u, geom: Geometry, phase=-1.0):
    """Multiply U_t(x) at t = T-1 by ``phase`` (antiperiodic fermion BC),
    the analogue of the reference's t-boundary gauge scaling."""
    ut = u[3]
    mask = jnp.arange(geom.T).reshape(1, -1, 1, 1, 1, 1, 1) == geom.T - 1
    ut = jnp.where(mask, ut * phase, ut)
    return u.at[3].set(ut)
