"""Pure-NumPy site-loop reference implementations (the test oracle tier).

Plays the role of the reference's CPU oracles
(reference tests/wilson_dslash_reference.cpp, clover_reference.cpp):
explicit loops over lexicographic sites, no vectorisation tricks shared
with the JAX implementation, so bugs can't be correlated.

Layouts here are FULL lattice, lexicographic:
  psi [T, Z, Y, X, 4, 3], u [4, T, Z, Y, X, 3, 3].
Direction mu: 0=x, 1=y, 2=z, 3=t.
"""

import numpy as np

from quda_qkxtm_multigrid_tpu.ops.gamma import PROJ, GAMMA5


def _site_iter(dims):
    X, Y, Z, T = dims
    for t in range(T):
        for z in range(Z):
            for y in range(Y):
                for x in range(X):
                    yield t, z, y, x


def _shifted(coord, dims, mu, sign):
    X, Y, Z, T = dims
    x, y, z, t = coord
    if mu == 0:
        x = (x + sign) % X
    elif mu == 1:
        y = (y + sign) % Y
    elif mu == 2:
        z = (z + sign) % Z
    else:
        t = (t + sign) % T
    return x, y, z, t


def dslash_full(u, psi, dagger=False):
    """out(x) = sum_mu (1∓g_mu) U_mu(x) psi(x+mu) + (1±g_mu) U_mu†(x-mu) psi(x-mu).

    Matches reference dslashReference semantics
    (tests/wilson_dslash_reference.cpp:105-131)."""
    T, Z, Y, X = psi.shape[:4]
    dims = (X, Y, Z, T)
    out = np.zeros_like(psi)
    for t, z, y, x in _site_iter(dims):
        acc = np.zeros((4, 3), dtype=psi.dtype)
        for mu in range(4):
            xf, yf, zf, tf = _shifted((x, y, z, t), dims, mu, +1)
            xb, yb, zb, tb = _shifted((x, y, z, t), dims, mu, -1)
            p_fwd = PROJ[mu, 1 if dagger else 0]
            p_bwd = PROJ[mu, 0 if dagger else 1]
            uf = u[mu, t, z, y, x]
            ub = u[mu, tb, zb, yb, xb]
            acc += np.einsum("ab,sb->sa", uf,
                             np.einsum("st,tc->sc", p_fwd, psi[tf, zf, yf, xf]))
            acc += np.einsum("ba,sb->sa", ub.conj(),
                             np.einsum("st,tc->sc", p_bwd, psi[tb, zb, yb, xb]))
        out[t, z, y, x] = acc
    return out


def wilson_mat_full(u, psi, kappa, dagger=False):
    return psi - kappa * dslash_full(u, psi, dagger)


def twist_full(psi, kappa, mu_tw, flavor=+1, dagger=False, inverse=False):
    """Twist term (reference twistGamma5, wilson_dslash_reference.cpp:234)."""
    a = 2.0 * kappa * mu_tw * flavor
    b = 1.0
    if inverse:
        a = -a
        b = 1.0 / (1.0 + a * a)
    if dagger:
        a = -a
    g5 = np.real(np.diag(GAMMA5))  # (+1,+1,-1,-1)
    return b * (psi + 1j * a * g5[:, None] * psi)


def plaquette_full(u):
    """Mean plaquette over 6 planes; returns (total, spatial, temporal)."""
    T, Z, Y, X = u.shape[1:5]
    dims = (X, Y, Z, T)
    sp, tm = 0.0, 0.0
    for t, z, y, x in _site_iter(dims):
        for mu in range(4):
            for nu in range(mu + 1, 4):
                xf = _shifted((x, y, z, t), dims, mu, +1)
                xn = _shifted((x, y, z, t), dims, nu, +1)
                a = u[mu, t, z, y, x]
                b = u[nu, xf[3], xf[2], xf[1], xf[0]]
                c = u[mu, xn[3], xn[2], xn[1], xn[0]]
                d = u[nu, t, z, y, x]
                val = np.trace(a @ b @ c.conj().T @ d.conj().T).real
                if nu == 3:
                    tm += val
                else:
                    sp += val
    norm = 3.0 * (X * Y * Z * T) * 3.0
    return (sp + tm) / (2 * norm), sp / norm, tm / norm
