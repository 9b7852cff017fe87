"""Explicit coarse operator: X (clover-like diagonal) + 8 directional
links Y, built by probing the fine operator through the transfer.

The analogue of CoarseOp/calculateY (reference lib/coarse_op.cu:17-118,
coarse stencil lib/dslash_coarse.cu:336-660, dispatch
lib/dirac_coarse.cpp:118-154).

Construction (probing with coarse 2-colouring): prolongate a unit coarse
basis vector placed on all coarse sites of one colour, apply one fine
hop direction, restrict.  Because every fine hop couples only adjacent
aggregates and the coarse lattice is bipartite (even coarse dims
required), the restriction separates cleanly:
  same-colour sites   → intra-aggregate (diagonal X) contribution
  other-colour sites  → the coarse link Y for that direction.
The diagonal fine term (A) probes X directly.

Coarse layouts:
  field  vc [2(chir), nvec, Tc, Zc, Yc, Xc]  (dof = 2*nvec flattened for
         matrix application)
  X      [dof, dof, Tc, Zc, Yc, Xc]
  Y      [8(dir: 2*mu+ (0 fwd | 1 bwd)), dof, dof, Tc, Zc, Yc, Xc]

Coarse dslash flops: (8*(8n^2) - 2n)/site, n = 2*nvec
(reference lib/dirac_coarse.cpp:154).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from quda_qkxtm_multigrid_tpu.utils.precision import heinsum
import numpy as np

from quda_qkxtm_multigrid_tpu.mg.transfer import BlockGeometry, Transfer


def _coarse_parity_mask(coarse_shape):
    tc, zc, yc, xc = coarse_shape
    t = np.arange(tc).reshape(-1, 1, 1, 1)
    z = np.arange(zc).reshape(1, -1, 1, 1)
    y = np.arange(yc).reshape(1, 1, -1, 1)
    x = np.arange(xc).reshape(1, 1, 1, -1)
    return (t + z + y + x) % 2    # [Tc,Zc,Yc,Xc]


# coarse roll axis for mu (coarse field trailing axes [Tc,Zc,Yc,Xc])
def _axis_of_mu(mu):
    return {0: -1, 1: -2, 2: -3, 3: -4}[mu]


@partial(jax.tree_util.register_dataclass, data_fields=["x", "y"],
         meta_fields=["bg"])
@dataclasses.dataclass(frozen=True)
class CoarseOperator:
    x: Any                       # [dof, dof, Tc,Zc,Yc,Xc]
    y: Any                       # [8, dof, dof, Tc,Zc,Yc,Xc]
    bg: BlockGeometry

    def apply(self, vc):
        """vc [2, nvec, Tc,Zc,Yc,Xc] → Dc vc (same shape)."""
        dof = self.bg.coarse_dof
        v = vc.reshape((dof,) + vc.shape[2:])
        out = heinsum("ab...,b...->a...", self.x, v)
        for mu in range(4):
            ax = _axis_of_mu(mu)
            fwd = jnp.roll(v, -1, axis=ax)      # v(xc+mu)
            bwd = jnp.roll(v, 1, axis=ax)
            out = out + heinsum("ab...,b...->a...", self.y[2 * mu], fwd)
            out = out + heinsum("ab...,b...->a...", self.y[2 * mu + 1], bwd)
        return out.reshape(vc.shape)

    def flops_per_apply(self) -> int:
        n = self.bg.coarse_dof
        vc = int(np.prod(self.bg.coarse_shape))
        return (8 * (8 * n * n) - 2 * n) * vc


def coarse_diag_hops(op: CoarseOperator):
    """Split a CoarseOperator into (diag_apply, hop_terms) over the
    coarse field layout [2, nc, T,Z,Y,X] — the probe inputs for
    constructing the NEXT level (the role of CoarseCoarseOp,
    reference lib/coarsecoarse_op.cu)."""
    dof = op.bg.coarse_dof

    def diag_apply(vc):
        v = vc.reshape((dof,) + vc.shape[2:])
        out = heinsum("ab...,b...->a...", op.x, v)
        return out.reshape(vc.shape)

    hop_terms = []
    for d in range(8):
        def h(vc, d=d):
            mu = d // 2
            shift = -1 if d % 2 == 0 else 1   # fwd hop reads v(x+mu)
            v = vc.reshape((dof,) + vc.shape[2:])
            nb = jnp.roll(v, shift, axis=_axis_of_mu(mu))
            out = heinsum("ab...,b...->a...", op.y[d], nb)
            return out.reshape(vc.shape)
        hop_terms.append(h)
    return diag_apply, hop_terms


def build_coarse_op(transfer, diag_apply: Callable,
                    hop_terms: list[Callable], dtype) -> CoarseOperator:
    """Probe the fine operator into coarse X and Y.

    diag_apply(fine) — the site-diagonal fine term (A for Wilson-type).
    hop_terms[d](fine) — the d-th directional hop INCLUDING its -kappa
    factor, d = 2*mu + (0 fwd | 1 bwd); fwd means the term reading
    psi(x+mu).
    """
    bg = transfer.bg
    cshape = bg.coarse_shape
    for d in cshape:
        if d % 2:
            raise ValueError(
                f"coarse dims {cshape} must be even for bipartite probing")
    dof = bg.coarse_dof
    nvec = bg.nvec
    cpar = jnp.asarray(_coarse_parity_mask(cshape))

    def basis_vc(idx, color):
        """Unit coarse vector (chir c, vec k) on all coarse sites of
        ``color``."""
        c, k = idx // nvec, idx % nvec
        vc = jnp.zeros((2, nvec) + cshape, dtype)
        return vc.at[c, k].set(jnp.where(cpar == color, 1.0, 0.0).astype(dtype))

    def probe(idx_color):
        idx, color = idx_color
        fine = transfer.prolong(basis_vc(idx, color))
        cols = [transfer.restrict(diag_apply(fine))]
        for h in hop_terms:
            cols.append(transfer.restrict(h(fine)))
        return jnp.stack(cols)    # [9, 2, nvec, Tc,Zc,Yc,Xc]

    idxs = jnp.arange(2 * dof)
    pairs = (idxs % dof, idxs // dof)   # color = 0 for first dof, 1 after
    probes = jax.lax.map(probe, pairs)  # [2*dof, 9, 2, nvec, ...]
    probes = probes.reshape(2, dof, 9, dof, *cshape)  # [color, b, term, a, site]

    same = jnp.stack([(cpar == c).astype(dtype) for c in (0, 1)])  # [2, site]
    other = jnp.stack([(cpar != c).astype(dtype) for c in (0, 1)])

    # X[a,b,site] = diag probe on same-colour sites + intra-aggregate
    # pieces of every hop on same-colour sites
    sm = same[:, None, None, None]      # [2,1,1,1,site...]
    ot = other[:, None, None, None]
    terms = probes                       # [color, b, term, a, site]
    x = (terms * sm).sum(axis=0)         # [b, term, a, site]
    x_total = x.sum(axis=1)              # diag + all intra-hop parts
    x_total = jnp.moveaxis(x_total, 0, 1)  # [a, b, site]

    ys = []
    yparts = (terms * ot).sum(axis=0)    # [b, term, a, site]
    for d in range(8):
        yd = yparts[:, 1 + d]            # [b, a, site]
        ys.append(jnp.moveaxis(yd, 0, 1))
    y = jnp.stack(ys)

    return CoarseOperator(x=x_total, y=y, bg=bg)
