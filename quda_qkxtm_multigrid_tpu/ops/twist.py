"""Twisted-mass term: A = 1 + i·2κμ·flavor·γ5 (degenerate doublet).

Convention matches the reference oracle twistGamma5
(reference tests/wilson_dslash_reference.cpp:234-263): DIRECT applies
(1 + i a γ5), INVERSE applies (1 − i a γ5)/(1+a²), a = 2κμ·flavor,
dagger flips the sign of a; γ5 = diag(+,+,−,−) (DeGrand-Rossi).

Canonical layout: spin is axis -5 for a per-parity spinor [4,3,T,Z,W]
(and axis -5 for full fields [2,4,3,T,Z,W] as well — always 5 axes from
the end).
"""

from __future__ import annotations

import jax.numpy as jnp

_G5 = (1.0, 1.0, -1.0, -1.0)


def _g5(dtype):
    rdt = jnp.float64 if dtype == jnp.complex128 else jnp.float32
    return jnp.asarray(_G5, dtype=rdt).reshape(4, 1, 1, 1, 1)


def twist_apply(psi, kappa: float, mu: float, flavor: int = +1,
                dagger: bool = False, inverse: bool = False):
    """Apply the twist (or its inverse) to a spinor [..., 4, 3, T, Z, W]."""
    a = 2.0 * kappa * mu * flavor
    b = 1.0
    if inverse:
        a = -a
        b = 1.0 / (1.0 + a * a)
    if dagger:
        a = -a
    return (b * (psi + (1j * a) * _g5(psi.dtype) * psi)).astype(psi.dtype)


def ndeg_twist_apply(psi_doublet, kappa: float, mu: float, epsilon: float,
                     dagger: bool = False, inverse: bool = False):
    """Non-degenerate doublet twist on [..., 2(flavor), 4, 3, T, Z, W]:
    A ψ = ψ + i a γ5 τ3 ψ − b τ1 ψ;  A⁻¹ = (1 − i a γ5 τ3 + b τ1)/(1+a²−b²)
    (reference ndegTwistGamma5, tests/wilson_dslash_reference.cpp:413-447)."""
    a = 2.0 * kappa * mu
    b = 2.0 * kappa * epsilon
    if dagger:
        a = -a
    g5 = _g5(psi_doublet.dtype)
    up, dn = psi_doublet[..., 0, :, :, :, :, :], psi_doublet[..., 1, :, :, :, :, :]
    if not inverse:
        out_up = up + (1j * a) * g5 * up - b * dn
        out_dn = dn - (1j * a) * g5 * dn - b * up
        scale = 1.0
    else:
        out_up = up - (1j * a) * g5 * up + b * dn
        out_dn = dn + (1j * a) * g5 * dn + b * up
        scale = 1.0 / (1.0 + a * a - b * b)
    out = jnp.stack([out_up, out_dn], axis=-6)
    return (scale * out).astype(psi_doublet.dtype)
