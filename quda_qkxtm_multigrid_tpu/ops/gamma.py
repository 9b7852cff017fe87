"""Dirac gamma matrices in the DeGrand-Rossi basis and spin projectors.

Basis convention matches the reference CPU oracle
(reference tests/wilson_dslash_reference.cpp:21-68, projector table):
``projector[2*mu + 0] = 1 - gamma_mu`` (forward hop, no dagger) and
``projector[2*mu + 1] = 1 + gamma_mu``; gamma5 = diag(+1,+1,-1,-1)
(reference twistGamma5, tests/wilson_dslash_reference.cpp:252-258).

Note the reference folds the conventional 1/2 of the Wilson projectors
into kappa, so these projectors are ``1 ∓ gamma_mu`` *without* the 1/2.
"""

from __future__ import annotations

import numpy as np

_i = 1j

# gamma_mu, mu = 0(x), 1(y), 2(z), 3(t), DeGrand-Rossi basis.
GAMMA = np.zeros((4, 4, 4), dtype=np.complex128)
GAMMA[0] = [[0, 0, 0, _i], [0, 0, _i, 0], [0, -_i, 0, 0], [-_i, 0, 0, 0]]
GAMMA[1] = [[0, 0, 0, -1], [0, 0, 1, 0], [0, 1, 0, 0], [-1, 0, 0, 0]]
GAMMA[2] = [[0, 0, _i, 0], [0, 0, 0, -_i], [-_i, 0, 0, 0], [0, _i, 0, 0]]
GAMMA[3] = [[0, 0, 1, 0], [0, 0, 0, 1], [1, 0, 0, 0], [0, 1, 0, 0]]

# In this basis gamma5 is diagonal(+1,+1,-1,-1); derive it to keep a
# single source of truth and assert the sign convention.
GAMMA5 = (GAMMA[0] @ GAMMA[1] @ GAMMA[2] @ GAMMA[3]).real.astype(np.complex128)
assert np.allclose(GAMMA5, np.diag([1, 1, -1, -1])), GAMMA5

IDENTITY = np.eye(4, dtype=np.complex128)

# PROJ[mu, 0] = 1 - gamma_mu (forward, no dagger); PROJ[mu, 1] = 1 + gamma_mu.
PROJ = np.stack(
    [np.stack([IDENTITY - GAMMA[mu], IDENTITY + GAMMA[mu]]) for mu in range(4)]
)

# The 16-element gamma basis used by contraction kernels:
# index g = 0..15 corresponds to product gamma_1^a gamma_2^b gamma_3^c gamma_4^d
# with bits (a,b,c,d) of g, matching the reference's gamma-index convention
# in contract kernels (reference lib/contract.cu, lib/code_pieces_Kepler).
GAMMA_BASIS = np.zeros((16, 4, 4), dtype=np.complex128)
for g in range(16):
    m = IDENTITY
    for mu in range(4):
        if (g >> mu) & 1:
            m = m @ GAMMA[mu]
    GAMMA_BASIS[g] = m


def apply_gamma5(psi):
    """gamma5 psi for a canonical spinor [..., 4, 3, T, Z, W] (spin at
    axis -5; diagonal in DR basis)."""
    import jax.numpy as jnp

    rdt = jnp.float64 if psi.dtype == jnp.complex128 else jnp.float32
    sign = jnp.asarray([1.0, 1.0, -1.0, -1.0], dtype=rdt).reshape(4, 1, 1, 1, 1)
    return psi * sign


def apply_gamma(mu_or_matrix, psi):
    """Apply a 4x4 spin matrix (index into GAMMA, or an explicit matrix)
    over the leading spin axis of [..., 4, 3, T, Z, W]."""
    import jax.numpy as jnp
    import jax.lax as _lax
    import numpy as np

    m = GAMMA[mu_or_matrix] if isinstance(mu_or_matrix, int) else np.asarray(mu_or_matrix)
    g = jnp.asarray(m, dtype=psi.dtype)
    return jnp.einsum("st,...tcxzw->...scxzw", g, psi,
                      precision=_lax.Precision.HIGHEST)
