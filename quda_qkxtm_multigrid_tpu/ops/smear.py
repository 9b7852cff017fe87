"""Link smearing (APE, stout) and Gaussian quark-field smearing, plus
the covariant derivative/shift used by derivative insertions.

References:
  APE     — reference lib/gauge_ape.cu:45-140 (spatial staples only,
            coefficient alpha/(2*(3-1)), projection back to SU(3))
  Gauss   — reference lib/code_pieces_Kepler/Gauss_core_Kepler.h:217-223:
            psi' = (psi + alpha * H psi) / (1 + 6*alpha),
            H psi(x) = sum_{i=x,y,z} U_i(x) psi(x+i) + U_i^dag(x-i) psi(x-i)
            iterated nsmearGauss times over APE-smeared links
            (qudaQKXTM_Vector_Kepler.cpp:386)
  covdev  — reference lib/covDev.cu:134 (gauge-covariant shift for the
            one-derivative insertions, contractQuda.h:12-36)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from quda_qkxtm_multigrid_tpu.lattice import Geometry, gather_neighbor
from quda_qkxtm_multigrid_tpu.ops.smallmat import (
    mat_mul, mat_dag, su3_mul, su3_dag_mul)
from quda_qkxtm_multigrid_tpu.utils.rng import su3_project_leading


def _staple_sum(u, mu: int, geom: Geometry, dirs):
    """Sum of upper+lower staples of U_mu over nu in ``dirs`` (per parity):
    upper: U_nu(x) U_mu(x+nu) U_nu^dag(x+mu)
    lower: U_nu^dag(x-nu) U_mu(x-nu) U_nu(x-nu+mu)
    """
    per_par = []
    for p in (0, 1):
        q = 1 - p
        acc = None
        for nu in dirs:
            if nu == mu:
                continue
            u_nu_p = u[nu, p]
            up = mat_mul(mat_mul(u_nu_p,
                                 gather_neighbor(u[mu, q], nu, True, p, geom)),
                         mat_dag(gather_neighbor(u[nu, q], mu, True, p, geom)))
            # lower: all links live at x-nu (parity q) or x-nu+mu (parity p)
            u_nu_b = gather_neighbor(u[nu, q], nu, False, p, geom)   # U_nu(x-nu)
            u_mu_b = gather_neighbor(u[mu, q], nu, False, p, geom)   # U_mu(x-nu)
            #   U_nu(x-nu+mu): shift +mu then -nu
            u_nu_bm = gather_neighbor(
                gather_neighbor(u[nu, p], mu, True, q, geom), nu, False, p, geom)
            low = mat_mul(mat_mul(mat_dag(u_nu_b), u_mu_b), u_nu_bm)
            s = up + low
            acc = s if acc is None else acc + s
        per_par.append(acc)
    return jnp.stack(per_par)


def ape_smear_step(u, geom: Geometry, alpha: float, spatial_only: bool = True):
    """One APE step: U' = Proj_SU3[(1-alpha) U_mu + alpha/(2(d-1)) * staples]
    (reference lib/gauge_ape.cu:137-140; temporal links untouched when
    spatial_only, matching the smeared gauge QKXTM feeds to Gaussian
    smearing, README:105)."""
    dirs = (0, 1, 2) if spatial_only else (0, 1, 2, 3)
    coeff = alpha / (2.0 * (len(dirs) - 1))
    out = u
    for mu in dirs:
        st = _staple_sum(u, mu, geom, dirs)
        smeared = (1.0 - alpha) * u[mu] + coeff * st
        out = out.at[mu].set(_project_links(smeared))
    return out


def _project_links(m):
    """SU(3)-project links [2,3,3,T,Z,W] (leading matrix axes at 1,2)."""
    return jnp.stack([su3_project_leading(m[p]) for p in range(2)])


def ape_smear(u, geom: Geometry, alpha: float, n_steps: int,
              spatial_only: bool = True):
    def body(i, v):
        return ape_smear_step(v, geom, alpha, spatial_only)
    return jax.lax.fori_loop(0, n_steps, body, u)


def stout_smear_step(u, geom: Geometry, rho: float, spatial_only: bool = True):
    """One stout step: U' = exp(i Q) U with Q the traceless-hermitian
    projection of rho * staple * U^dag (reference lib/gauge_stout.cu).
    exp via 8-term Taylor on the (small) Q — adequate for smearing
    strengths used in practice."""
    dirs = (0, 1, 2) if spatial_only else (0, 1, 2, 3)
    out = u
    for mu in dirs:
        st = _staple_sum(u, mu, geom, dirs)
        omega = rho * jnp.stack([mat_mul(st[p], mat_dag(u[mu, p]))
                                 for p in (0, 1)])
        # traceless anti-hermitian part: Q = (O - O^dag)/2 - tr/6...
        dagger = jnp.conj(jnp.swapaxes(omega, 1, 2))
        q = 0.5 * (omega - dagger)
        tr = (q[:, 0, 0] + q[:, 1, 1] + q[:, 2, 2]) / 3.0
        eye = jnp.eye(3, dtype=u.dtype).reshape(1, 3, 3, 1, 1, 1)
        q = q - tr[:, None, None] * eye
        # U' = exp(Q) U  (Q anti-hermitian)
        def expm(qm):
            acc = jnp.broadcast_to(eye[0], qm.shape).astype(u.dtype)
            term = acc
            for k in range(1, 9):
                term = mat_mul(term, qm) / k
                acc = acc + term
            return acc
        new = jnp.stack([mat_mul(expm(q[p]), u[mu, p]) for p in (0, 1)])
        out = out.at[mu].set(new)
    return out


def gaussian_smear(psi, u_smeared, geom: Geometry, alpha: float, n: int):
    """nsmearGauss iterations of psi <- (psi + alpha*H psi)/(1+6 alpha)
    over (APE-)smeared links (reference Gauss_core_Kepler.h:217-223,
    qudaQKXTM_Vector_Kepler.cpp:386).  Works on the full field
    [..., 2, 4, 3, T, Z, W] where leading axes may batch spin-color
    source components."""
    norm = 1.0 / (1.0 + 6.0 * alpha)

    def hop(v):
        outs = []
        for p in (0, 1):
            acc = None
            for i in (0, 1, 2):
                fwd = gather_neighbor(v[..., 1 - p, :, :, :, :, :], i, True, p, geom)
                bwd = gather_neighbor(v[..., 1 - p, :, :, :, :, :], i, False, p, geom)
                u_b = gather_neighbor(u_smeared[i, 1 - p], i, False, p, geom)
                term = su3_mul(u_smeared[i, p], fwd) + su3_dag_mul(u_b, bwd)
                acc = term if acc is None else acc + term
            outs.append(acc)
        return jnp.stack(outs, axis=-6)

    def body(i, v):
        return norm * (v + alpha * hop(v))

    return jax.lax.fori_loop(0, n, body, psi)


def covdev_apply(u, psi, mu: int, forward: bool, geom: Geometry):
    """Gauge-covariant shift of a full spinor field (reference covDev.cu:134):
    forward:  out(x) = U_mu(x) psi(x+mu)
    backward: out(x) = U_mu^dag(x-mu) psi(x-mu)
    """
    outs = []
    for p in (0, 1):
        src = psi[1 - p]
        if forward:
            outs.append(su3_mul(u[mu, p],
                                gather_neighbor(src, mu, True, p, geom)))
        else:
            u_b = gather_neighbor(u[mu, 1 - p], mu, False, p, geom)
            outs.append(su3_dag_mul(u_b,
                                    gather_neighbor(src, mu, False, p, geom)))
    return jnp.stack(outs)
