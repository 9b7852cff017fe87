"""Precision-pinned einsum.

XLA:TPU lowers einsum/dot_general with bf16 MXU passes by default; for
a solver/measurement library that silently floors f32 accuracy at ~1e-3
(observed: twisted-clover CG true-residual stuck at 2e-3, MG-GCR at
2e-2).  Every contraction in the library goes through `heinsum`, which
pins Precision.HIGHEST; bf16 compute is an explicit sloppy-dtype choice,
never an implicit one.
"""

from __future__ import annotations

import jax.lax as _lax
import jax.numpy as jnp


def heinsum(*args, **kw):
    kw.setdefault("precision", _lax.Precision.HIGHEST)
    return jnp.einsum(*args, **kw)
