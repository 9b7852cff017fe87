"""Disconnected quark loops via the (generalized) one-end trick with
derivative and conserved-current insertions, plus TSM bias correction.

The analogue of the reference loop engine
(reference lib/qudaQKXTM_Loops_Kepler.cpp oneEndTrick_w_One_Der :300,
drivers interface_quda.cpp calcMG_loop_wOneD_TSM_EvenOdd :8535-9509):

Per stochastic source ξ (Z4 volume noise) with x = M⁻¹ξ:
  tmp4 = D_W x          (the PLAIN Wilson/clover operator at the same
                         kappa, no twist — reference :322-347)
  tmp3 = γ5 tmp4
  std  loop (vv):  -= Ω(x, x)        (standard one-end trick)
  gen  loop (gv):  += Ω(x, tmp3)     (generalized one-end trick)
where Ω(a,b)[s1,s2](site) = Σ_color conj((γ5 a)[s1,c]) b[s2,c] — the
per-site spin-outer contraction of QUDA's contractGamma5Kernel
(reference lib/dslash_core/contract_core.h; 16 complex per site).

Derivative (cnD) and conserved (cnC) insertions per direction mu
(reference :398-440 call sequence):
  D term = Ω(x, ∂⁺tmp3) + Ω(∂⁻x, tmp3) − Ω(∂⁺x, tmp3) − Ω(x, ∂⁻tmp3)
  C term = Ω(x, ∂⁺tmp3) + Ω(∂⁻x, tmp3) + Ω(∂⁺x, tmp3) + Ω(x, ∂⁻tmp3)
with ∂± the covariant forward/backward shifts (reference covDev.cu).

Loop results accumulate as [16(spin s1*4+s2), T, Z, Y, X] position-space
fields; momentum projection via FFT (the CUFFT analogue, fft_project).
Contract with gamma matrices downstream to form physical insertions.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from quda_qkxtm_multigrid_tpu.utils.precision import heinsum
from quda_qkxtm_multigrid_tpu.lattice import Geometry
from quda_qkxtm_multigrid_tpu.dirac import Dirac, DiracParams, make_dirac
from quda_qkxtm_multigrid_tpu.ops.gamma import apply_gamma5
from quda_qkxtm_multigrid_tpu.ops.smear import covdev_apply
from quda_qkxtm_multigrid_tpu.physics.contract import corr_to_lex


def spin_outer_g5(a, b):
    """Ω(a,b)[s1,s2] = Σ_c conj((γ5 a)[p,s1,c]) b[p,s2,c] per site:
    [2,4,3,T,Z,W] x2 → [4,4,2,T,Z,W]."""
    ag5 = apply_gamma5(a)
    return heinsum("pmctzw,pnctzw->mnptzw", jnp.conj(ag5), b)


class LoopResult(NamedTuple):
    std: jax.Array        # [16, T, Z, Y, X]  (vv)
    gen: jax.Array        # [16, T, Z, Y, X]  (gv)
    der_std: jax.Array    # [4, 16, T, Z, Y, X]   (cnD_vv)
    der_gen: jax.Array    # [4, 16, T, Z, Y, X]   (cnD_gv)
    cons_std: jax.Array   # [4, 16, T, Z, Y, X]   (cnC_vv)
    cons_gen: jax.Array   # [4, 16, T, Z, Y, X]   (cnC_gv)


def _lex16(c, geom):
    """[4,4,2,T,Z,W] → [16,T,Z,Y,X]."""
    out = corr_to_lex(c, geom)
    return out.reshape((16,) + out.shape[2:])


def one_end_trick(x, dirac_plain: Dirac, geom: Geometry) -> LoopResult:
    """One noise-sample loop contributions from the solve x = M⁻¹ξ.

    ``dirac_plain`` is the UN-twisted operator at the same kappa (and
    clover for tmc), reference qudaQKXTM_Loops_Kepler.cpp:322-347."""
    u = dirac_plain.u
    tmp4 = dirac_plain.m(x)
    tmp3 = apply_gamma5(tmp4)

    std = -_lex16(spin_outer_g5(x, x), geom)
    gen = _lex16(spin_outer_g5(x, tmp3), geom)

    der_s, der_g, con_s, con_g = [], [], [], []
    for mu in range(4):
        dp_t3 = covdev_apply(u, tmp3, mu, True, geom)
        dm_t3 = covdev_apply(u, tmp3, mu, False, geom)
        dp_x = covdev_apply(u, x, mu, True, geom)
        dm_x = covdev_apply(u, x, mu, False, geom)
        t0 = spin_outer_g5(x, dp_t3)
        t3 = spin_outer_g5(dm_x, tmp3)
        t2 = spin_outer_g5(dp_x, tmp3)
        t1 = spin_outer_g5(x, dm_t3)
        der_g.append(_lex16(t0 + t3 - t2 - t1, geom))
        con_g.append(_lex16(t0 + t3 + t2 + t1, geom))
        # vv variants: replace tmp3 by x (standard one-end)
        s0 = spin_outer_g5(x, dp_x)
        s3 = spin_outer_g5(dm_x, x)
        s2 = spin_outer_g5(dp_x, x)
        s1 = spin_outer_g5(x, dm_x)
        der_s.append(_lex16(s0 + s3 - s2 - s1, geom))
        con_s.append(_lex16(s0 + s3 + s2 + s1, geom))
    return LoopResult(std=std, gen=gen,
                      der_std=jnp.stack(der_s), der_gen=jnp.stack(der_g),
                      cons_std=jnp.stack(con_s), cons_gen=jnp.stack(con_g))


def plain_wilson_partner(dirac: Dirac) -> Dirac:
    """The un-twisted companion operator used by the one-end trick
    (Wilson for TM, clover for TMC; reference :322-347)."""
    kind = "clover" if dirac.params.has_clover else "wilson"
    params = DiracParams(kind=kind, kappa=dirac.params.kappa, mu=0.0,
                         csw=dirac.params.csw)
    return Dirac(u=dirac.u, params=params, geom=dirac.geom,
                 clover=dirac.clover,
                 clover_inv=None if not dirac.params.has_clover
                 else dirac.clover_inv)


def plain_partner_from_gauge(u, params: DiracParams,
                             geom: Geometry) -> Dirac:
    """plain_wilson_partner built directly from the gauge field — for
    solve operators (CompactDirac) that carry no u/clover on device.
    use_pallas stays off: the XLA dslash reads u undoubled, so the
    contraction partner costs one gauge copy, not the fused bundle."""
    from quda_qkxtm_multigrid_tpu.dirac import make_dirac
    kind = "clover" if params.has_clover else "wilson"
    p = DiracParams(kind=kind, kappa=params.kappa, mu=0.0,
                    csw=params.csw)
    return make_dirac(u, p, geom)


def stochastic_loops(solve: Callable, key, dirac: Dirac, geom: Geometry,
                     n_sources: int, dtype=jnp.complex64):
    """Accumulate loops over Z4 stochastic sources (the stochastic part
    of calcMG_loop_wOneD_TSM_EvenOdd, reference interface_quda.cpp:8535).
    Returns the summed LoopResult (normalise by n_sources downstream)."""
    from quda_qkxtm_multigrid_tpu.utils.rng import z4_source

    plain = plain_wilson_partner(dirac)
    acc = None
    for i in range(n_sources):
        key, sub = jax.random.split(key)
        xi = z4_source(sub, geom, dtype=dtype)
        x = solve(xi)
        res = one_end_trick(x, plain, geom)
        if acc is None:
            acc = res
        else:
            import jax as _jax
            acc = _jax.jit(lambda a, b: _jax.tree.map(jnp.add, a, b))(acc, res)
    return acc
