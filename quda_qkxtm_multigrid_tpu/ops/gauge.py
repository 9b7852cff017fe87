"""Gauge-field observables and transformations on the canonical layout.

Covers the reference's gauge_plaq.cu / QKXTM calculatePlaq
(reference lib/gauge_plaq.cu:149, lib/qudaQKXTM_Kepler_kernels.cu:425)
and the fermion temporal boundary-condition phase folded into the links
at load time (reference tests/test_util.cpp applyGaugeFieldScaling,
QUDA_ANTI_PERIODIC_T).

Gauge layout [4, 2, 3, 3, T, Z, W].
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from quda_qkxtm_multigrid_tpu.lattice import Geometry, gather_neighbor
from quda_qkxtm_multigrid_tpu.ops.smallmat import mat_mul as _mm, mat_dag


def plaquette(u, geom: Geometry):
    """Mean plaquette (1/3) Re tr U_mu U_nu U_mu^dag U_nu^dag over all
    sites and 6 planes; returns (total, spatial, temporal) like plaqQuda
    (reference lib/gauge_plaq.cu:149)."""
    spatial = 0.0
    temporal = 0.0
    for mu in range(4):
        for nu in range(mu + 1, 4):
            acc = 0.0
            for p in (0, 1):
                a = u[mu, p]                                          # U_mu(x)
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
    norm = 3.0 * geom.volume * 3.0
    spatial = spatial / norm
    temporal = temporal / norm
    return (spatial + temporal) / 2.0, spatial, temporal


def apply_t_boundary(u, geom: Geometry, phase=-1.0):
    """Multiply U_t at t = T-1 by ``phase`` (antiperiodic fermion BC)."""
    ut = u[3]
    mask = jnp.asarray(
        (np.arange(geom.T) == geom.T - 1).reshape(1, 1, 1, -1, 1, 1))
    ut = jnp.where(mask, ut * phase, ut)
    return u.at[3].set(ut)


def gauge_transform(u, g, geom: Geometry):
    """u'_mu(x) = g(x) U_mu(x) g^dag(x+mu); g [2, 3, 3, T, Z, W]."""
    out = []
    for mu in range(4):
        per_par = []
        for p in range(2):
            g_fwd = gather_neighbor(g[1 - p], mu, True, p, geom)
            per_par.append(_mm(_mm(g[p], u[mu, p]), mat_dag(g_fwd)))
        out.append(jnp.stack(per_par))
    return jnp.stack(out)
