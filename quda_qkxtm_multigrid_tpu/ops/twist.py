"""Twisted-mass term: A = 1 + i·2κμ·flavor·γ5 (degenerate doublet).

Convention matches the reference oracle twistGamma5
(reference tests/wilson_dslash_reference.cpp:234-263): DIRECT applies
(1 + i a γ5), INVERSE applies (1 − i a γ5)/(1+a²), a = 2κμ·flavor,
dagger flips the sign of a; γ5 = diag(+,+,−,−) (DeGrand-Rossi).

Also the non-degenerate doublet term (reference ndegTwistGamma5,
:413-447): A = 1 + i a γ5 τ3 − b τ1 acting on a flavor doublet, with
a = 2κμ, b = 2κε.
"""

from __future__ import annotations

import jax.numpy as jnp

_G5 = (1.0, 1.0, -1.0, -1.0)


def twist_apply(psi, kappa: float, mu: float, flavor: int = +1,
                dagger: bool = False, inverse: bool = False):
    """Apply the twist (or its inverse) to a spinor array [..., 4, 3]."""
    a = 2.0 * kappa * mu * flavor
    b = 1.0
    if inverse:
        a = -a
        b = 1.0 / (1.0 + a * a)
    if dagger:
        a = -a
    g5 = jnp.asarray(_G5, dtype=jnp.float64 if psi.dtype == jnp.complex128
                     else jnp.float32)
    return (b * (psi + (1j * a) * g5[:, None] * psi)).astype(psi.dtype)


def ndeg_twist_apply(psi_doublet, kappa: float, mu: float, epsilon: float,
                     dagger: bool = False, inverse: bool = False):
    """Non-degenerate doublet twist on [..., 2(flavor), 4, 3]:
    A ψ = ψ + i a γ5 τ3 ψ − b τ1 ψ;  A⁻¹ = (1 − i a γ5 τ3 + b τ1)/(1+a²−b²)."""
    a = 2.0 * kappa * mu
    b = 2.0 * kappa * epsilon
    if dagger:
        a = -a
    g5 = jnp.asarray(_G5, dtype=jnp.float64 if psi_doublet.dtype == jnp.complex128
                     else jnp.float32)
    up, dn = psi_doublet[..., 0, :, :], psi_doublet[..., 1, :, :]
    if not inverse:
        out_up = up + (1j * a) * g5[:, None] * up - b * dn
        out_dn = dn - (1j * a) * g5[:, None] * dn - b * up
        scale = 1.0
    else:
        out_up = up - (1j * a) * g5[:, None] * up + b * dn
        out_dn = dn + (1j * a) * g5[:, None] * dn + b * up
        scale = 1.0 / (1.0 + a * a - b * b)
    out = jnp.stack([out_up, out_dn], axis=-3)
    return (scale * out).astype(psi_doublet.dtype)
