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


def topological_charge(u, geom: Geometry):
    """Field-theoretic topological charge from the clover-leaf field
    strength (reference lib/qcharge_quda.cu, gauge_tools.h:101):
    Q = (1/4π²) Σ_x Re tr[F_xy F_zt − F_xz F_yt + F_yz F_xt]
    (with the stored antisymmetric pairing of ops.clover.FMUNU_PAIRS)."""
    from quda_qkxtm_multigrid_tpu.ops.clover import field_strength
    from quda_qkxtm_multigrid_tpu.ops.smallmat import mat_mul
    f = field_strength(u, geom)   # pairs (yx),(zx),(zy),(tx),(ty),(tz)

    def retr(a, b):
        m = mat_mul(a, b)
        return jnp.sum(jnp.real(m[0, 0] + m[1, 1] + m[2, 2]))

    q = 0.0
    for p in (0, 1):
        q = q + retr(f[0, p], f[5, p]) - retr(f[1, p], f[4, p]) \
            + retr(f[2, p], f[3, p])
    return q / (4.0 * np.pi ** 2)


def gauge_fix_fft(u, geom: Geometry, gauge_dir: int = 4, n_iter: int = 100,
                  alpha: float = 0.08):
    """Fourier-accelerated steepest-descent gauge fixing (Landau
    gauge_dir=4, Coulomb gauge_dir=3) — the role of gaugefixingFFT
    (reference lib/gauge_fix_fft.cu, gauge_tools.h:78; Davies et al.
    Fourier acceleration).  Each iteration: the gauge-gradient
    Δ(x) = Σ_μ [A_μ(x−μ̂) − A_μ(x)] (A = traceless anti-hermitian part)
    is filtered in momentum space by p̂²max/p̂² (zero mode dropped —
    jnp.fft replaces the reference's CUFFT plans), then
    g = Proj_SU3(1 + (α/2) Δ̃) is applied.  Runs in lexicographic
    layout: the FFTs and 3×3 matmuls dominate and both map directly to
    XLA.  Returns (u_fixed, theta)."""
    from quda_qkxtm_multigrid_tpu.utils.rng import su3_project_leading
    from quda_qkxtm_multigrid_tpu.lattice import gauge_to_lex, gauge_from_lex
    import jax

    u_lex = gauge_to_lex(u, geom)            # [4, T, Z, Y, X, 3, 3]
    dims4 = (geom.T, geom.Z, geom.Y, geom.X)
    ax_of_mu = {0: 3, 1: 2, 2: 1, 3: 0}      # mu (x,y,z,t) → lex axis
    dirs = tuple(range(gauge_dir))
    fft_axes = tuple(ax_of_mu[mu] for mu in dirs)

    p2 = np.zeros(dims4)
    for a in fft_axes:
        ln = dims4[a]
        s = 4.0 * np.sin(np.pi * np.arange(ln) / ln) ** 2
        shape = [1, 1, 1, 1]
        shape[a] = ln
        p2 = p2 + s.reshape(shape)
    pmax = 4.0 * len(fft_axes)
    fac = np.where(p2 > 1e-12, pmax / np.maximum(p2, 1e-12), 0.0)
    fac_j = jnp.asarray(fac)[..., None, None]

    def dag(m):
        return jnp.conj(jnp.swapaxes(m, -1, -2))

    def gradient(u_lex):
        delta = None
        for mu in dirs:
            um = u_lex[mu]
            a = 0.5 * (um - dag(um))
            tr = (a[..., 0, 0] + a[..., 1, 1] + a[..., 2, 2]) / 3.0
            a = a - tr[..., None, None] * jnp.eye(3, dtype=a.dtype)
            am = jnp.roll(a, 1, axis=ax_of_mu[mu])    # A_mu(x-mu)
            d = am - a
            delta = d if delta is None else delta + d
        return delta

    eye = jnp.eye(3, dtype=u_lex.dtype)

    def body(i, u_lex):
        delta = gradient(u_lex)
        ft = jnp.fft.fftn(delta, axes=fft_axes)
        dacc = jnp.fft.ifftn(ft * fac_j, axes=fft_axes).astype(u_lex.dtype)
        w = eye + (0.5 * alpha) * dacc
        g = su3_project_leading(jnp.moveaxis(w, (-2, -1), (0, 1)))
        g = jnp.moveaxis(g, (0, 1), (-2, -1))
        new = []
        for mu in range(4):
            gp = jnp.roll(g, -1, axis=ax_of_mu[mu])   # g(x+mu)
            new.append(g @ u_lex[mu] @ dag(gp))
        return jnp.stack(new)

    u_lex = jax.lax.fori_loop(0, n_iter, body, u_lex)
    delta = gradient(u_lex)
    theta = jnp.sum(jnp.abs(delta) ** 2) / (3 * geom.volume)
    return gauge_from_lex(u_lex, geom), theta


def gauge_fix_ovr(u, geom: Geometry, gauge_dir: int = 3, n_iter: int = 100,
                  omega: float = 1.0):
    """Relaxation gauge fixing (Coulomb gauge_dir=3, Landau gauge_dir=4) —
    the role of gaugefixingOVR (reference lib/gauge_fix_ovr.cu,
    gauge_tools.h:55).  Checkerboard sweeps: at each site the local
    functional Σ_mu Re tr[g U_mu(x) + U_mu(x-mu) g^dag] is maximised by
    g = Proj_SU3(w^dag), w = Σ_mu [U_mu(x) + U_mu^dag(x-mu)]
    (full-SU(3) polar projection instead of the reference's SU(2)
    subgroup hits — same fixed points).  Returns (u_fixed, theta) with
    theta the standard gauge-fixing quality functional."""
    from quda_qkxtm_multigrid_tpu.ops.smallmat import mat_dag
    from quda_qkxtm_multigrid_tpu.utils.rng import su3_project_leading
    import jax

    dirs = tuple(range(gauge_dir))   # 0..2 Coulomb, 0..3 Landau

    def sweep(u, parity):
        w = None
        for mu in dirs:
            fwd = u[mu, parity]
            bwd = mat_dag(gather_neighbor(u[mu, 1 - parity], mu, False,
                                          parity, geom))
            t = fwd + bwd
            w = t if w is None else w + t
        g = su3_project_leading(jnp.conj(jnp.swapaxes(w, 0, 1)))
        # apply: U_mu(x in p) <- g(x) U_mu(x); U_mu(x-mu), x in p: right-
        # multiply by g(x)^dag: for links on the OTHER parity ending at p
        out = []
        for mu in range(4):
            per = [None, None]
            if mu in dirs:
                per[parity] = _mm(g, u[mu, parity])
                g_fwd = gather_neighbor(g, mu, True, 1 - parity, geom)
                per[1 - parity] = _mm(u[mu, 1 - parity], mat_dag(g_fwd))
            else:
                # gauge_dir<4: temporal links still transform
                per[parity] = _mm(g, u[mu, parity])
                g_fwd = gather_neighbor(g, mu, True, 1 - parity, geom)
                per[1 - parity] = _mm(u[mu, 1 - parity], mat_dag(g_fwd))
            out.append(jnp.stack(per))
        return jnp.stack(out)

    def body(i, u):
        u = sweep(u, 0)
        u = sweep(u, 1)
        return u

    u = jax.lax.fori_loop(0, n_iter, body, u)
    # theta functional: |sum_mu (A_mu(x) - A_mu(x-mu))|^2 proxy via
    # deviation of w from a constant times identity
    w = None
    for mu in dirs:
        d = u[mu] - jnp.stack([
            gather_neighbor(u[mu, 1], mu, False, 0, geom),
            gather_neighbor(u[mu, 0], mu, False, 1, geom)])
        w = d if w is None else w + d
    anti = 0.5 * (w - jnp.conj(jnp.swapaxes(w, 1, 2)))
    theta = jnp.sum(jnp.abs(anti) ** 2) / (3 * geom.volume)
    return u, theta
