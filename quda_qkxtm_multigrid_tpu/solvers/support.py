"""Solver support machinery: stopping conditions, normalization
conventions, and reliable-update bookkeeping.

The analogues of the reference's
  - residual-type bitmask with the Fermilab heavy-quark residual
    (reference include/quda.h:252-260, blas::HeavyQuarkResidualNorm
    lib/reduce_quda.cu:761-790),
  - massRescale source normalization conventions
    (lib/interface_quda.cpp:1412-1494, enum_quda.h:191-193),
  - reliable-update residual-increase counters that terminate or
    restart a diverging mixed-precision solve
    (lib/inv_cg_quda.cpp:260-311).
"""

from __future__ import annotations

import enum
from typing import NamedTuple

import jax
import jax.numpy as jnp


class ResidualType(enum.Flag):
    """Stopping-condition bitmask (quda.h QudaResidualType)."""
    L2_RELATIVE = enum.auto()
    L2_ABSOLUTE = enum.auto()
    HEAVY_QUARK = enum.auto()


class MassNormalization(enum.Enum):
    """Source normalization conventions (enum_quda.h:191-193)."""
    KAPPA = "kappa"
    MASS = "mass"
    ASYMMETRIC_MASS = "asymmetric-mass"


def heavy_quark_residual_sq(x, r):
    """Fermilab heavy-quark residual squared:
    hq² = (1/V) Σ_sites |r(site)|² / |x(site)|²  (sites with |x|² = 0
    contribute 1, reference reduce_quda.cu:776-779).  Fields in the
    canonical complex layout [..., 4, 3, T, Z, W]; the site norm sums
    over the spin-color axes only."""
    sc = (-5, -4)
    xn = jnp.sum(jnp.abs(x) ** 2, axis=sc)
    rn = jnp.sum(jnp.abs(r) ** 2, axis=sc)
    ratio = jnp.where(xn > 0, rn / jnp.where(xn > 0, xn, 1.0), 1.0)
    return jnp.mean(ratio)


def l2_stop_target(b2, tol: float, tol_abs: float,
                   residual_type: ResidualType):
    """The |r|² stopping target for the L2 parts of the bitmask
    (reference Solver::stopping, lib/solver.cpp)."""
    target = jnp.asarray(0.0, jnp.result_type(b2, jnp.float32))
    if residual_type & ResidualType.L2_RELATIVE:
        target = jnp.maximum(target, (tol * tol) * b2)
    if residual_type & ResidualType.L2_ABSOLUTE:
        target = jnp.maximum(target, tol_abs * tol_abs)
    if target == 0.0 and not (residual_type & ResidualType.L2_RELATIVE):
        # HQ-only solve: L2 check is vacuous
        target = jnp.asarray(jnp.inf)
    return target


def mass_rescale_factor(solution_type: str,
                        normalization: MassNormalization,
                        kappa: float, m5: float | None = None,
                        domain_wall: bool = False) -> float:
    """Source scale factor of massRescale
    (reference interface_quda.cpp:1412-1494).  solution_type in
    {"mat", "matdag-mat", "matpc", "matpcdag-matpc"}."""
    k = (0.5 / (5.0 + m5)) if (domain_wall and m5 is not None) else kappa
    n = normalization
    if n == MassNormalization.KAPPA:
        return 1.0
    table = {
        ("mat", MassNormalization.MASS): 2.0 * k,
        ("mat", MassNormalization.ASYMMETRIC_MASS): 2.0 * k,
        ("matdag-mat", MassNormalization.MASS): 4.0 * k * k,
        ("matdag-mat", MassNormalization.ASYMMETRIC_MASS): 4.0 * k * k,
        ("matpc", MassNormalization.MASS): 4.0 * k * k,
        ("matpc", MassNormalization.ASYMMETRIC_MASS): 2.0 * k,
        ("matpcdag-matpc", MassNormalization.MASS): 16.0 * k ** 4,
        ("matpcdag-matpc", MassNormalization.ASYMMETRIC_MASS): 4.0 * k * k,
    }
    try:
        return table[(solution_type, n)]
    except KeyError:
        raise ValueError(
            f"unsupported ({solution_type}, {n}) combination") from None


def mass_rescale(b, shifts=None, **kw):
    """Scale the source (and multishift offsets) by the convention
    factor; returns (b_scaled, shifts_scaled)."""
    f = mass_rescale_factor(**kw)
    bs = b if f == 1.0 else b * jnp.asarray(f, b.dtype)
    if shifts is None:
        return bs, None
    return bs, tuple(s * f for s in shifts)


class ReliableStats(NamedTuple):
    """Counters of the reliable-update discipline (the diagnostics the
    reference tracks at inv_cg_quda.cpp:260-311)."""
    restarts: jax.Array            # reliable updates performed
    res_increase: jax.Array        # consecutive true-residual increases
    res_increase_total: jax.Array  # total increases over the solve
    diverged: jax.Array            # True if terminated by the counters
