"""Backend-quirk contract: every axon-TPU workaround as a TESTED helper.

The axon TPU backend (the PJRT tunnel this framework deploys on) has a
set of documented misbehaviours that several modules must work around.
Round-2 review flagged that the workarounds lived as point-of-use
comments ("load-bearing folklore"); this module makes each one an
executable contract:

  Q1  scalar-only complex-reduction programs — a jit program whose ONLY
      outputs are scalar reductions of a complex field either raises
      UNIMPLEMENTED at fetch or miscompiles (observed r² = 123 where
      host numpy says 9.8e-10).  Contract: obtain norms from a program
      that ALSO returns a field → ``resid_with_norm``.
  Q2  eager complex structural ops (stack/concatenate/slice/`.at[].set`
      on c64 outside jit) poison the client; the error surfaces as a
      deferred UNIMPLEMENTED at a much later fetch.  Contract: batch
      and slice inside jit programs → ``batched_normal_draw`` /
      ``jit_stack``.
  Q3  complex device→host fetch (np.asarray on a c64 array) raises
      UNIMPLEMENTED.  Contract: fetch via a real/imag program and
      recombine on host → ``fetch_complex``.
  Q4  residual+recursion fusion — one jit program combining b − M(x)
      with a V-cycle/preconditioner recursion evaluates the collapsed
      recursed form (reads 2.8e-9 where truth is 103).  Contract: keep
      the residual program and the correction program SEPARATE
      (mg/multigrid.py _mr_resid/_gcr_step); ``assert_split_programs``
      documents it and the probe in scripts/quirk_probe.py detects a
      backend fix.

  Q5  layout blow-up on big multi-axis arrays — XLA:TPU layout
      assignment freely picks transposed layouts for >3-axis
      intermediates/parameters, and the (8,128) tile then pads any
      small second-minor/minor physical dim (observed: 8x = 38 GB on
      the 32³×64 null-vector stack; LayoutConstraint custom calls are
      rejected by this backend's x64-rewrite pass, so layouts cannot
      be pinned).  Contract: any array ≳1 GB that crosses a program
      boundary or feeds a dot must be shaped so EVERY dim ≥ 8 is a
      multiple of 8 and plausible minor dims are multiples of 128
      (then every layout choice is tile-exact), and conversions into
      such arrays run as per-item programs accumulating into a donated
      buffer → ``assert_tile_exact``; production instance:
      mg/transfer.block_orthonormalize_flat + mg/multigrid.
      _ortho_blocked_batched.

Each helper is correct on EVERY backend (CPU/TPU), so call sites need
no branching; ``scripts/quirk_probe.py`` runs the raw (un-worked-
around) patterns on the real chip and reports which quirks still
reproduce — when a backend upgrade fixes one, the probe says which
helper can be retired.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


# --- Q1: norms must ride along a field output --------------------------

@jax.jit
def resid_with_norm(r):
    """(r, |r|²) with the field in the outputs — the only reliable way
    to obtain a norm of a computed complex field on the axon backend
    (Q1).  For residuals prefer invert.true_residual / mg._mr_resid,
    which fuse the b − M(x) evaluation; this helper covers ad-hoc
    norms of existing fields."""
    return r, jnp.real(jnp.vdot(r, r))


def norm2(x) -> float:
    """Host float |x|² through the Q1-safe program."""
    _, n2 = resid_with_norm(x)
    return float(n2)


# --- Q2: draws and structural ops happen inside jit --------------------

@partial(jax.jit, static_argnames=("shape", "dtype"))
def batched_normal_draw(key, shape, dtype):
    """One [*shape] complex normal drawn inside ONE jit program.
    Neither an eager stack of complex fields nor a vmap'd per-key
    generation survives the axon backend (Q2); a single batched draw
    does.  Used by mg setup (_random_spinor_batch wraps this with the
    field layout)."""
    real_dt = jnp.float64 if dtype == jnp.complex128 else jnp.float32
    br, bi = jax.random.normal(key, (2,) + tuple(shape), real_dt)
    return (br + 1j * bi).astype(dtype)


@jax.jit
def jit_stack(xs):
    """jnp.stack under jit — eager complex stacks are Q2-unsafe."""
    return jnp.stack(xs)


@jax.jit
def jit_concat(xs):
    """jnp.concatenate under jit (Q2)."""
    return jnp.concatenate(xs) if len(xs) > 1 else xs[0]


# --- Q3: complex host fetch via real/imag -------------------------------

@jax.jit
def _re_im(v):
    return jnp.real(v), jnp.imag(v)


def fetch_complex(x):
    """Device→host transfer of a complex array as numpy (Q3): fetch
    real/imag through a jit program and recombine on host."""
    import numpy as np
    if not jnp.issubdtype(x.dtype, jnp.complexfloating):
        return np.asarray(x)
    re, im = _re_im(x)
    return np.asarray(re) + 1j * np.asarray(im)


# --- Q4: residual / recursion program split -----------------------------

def assert_split_programs(resid_fn, step_fn):
    """Document-and-check that a solver keeps its residual program and
    its preconditioned correction program separate (Q4).  Both must be
    distinct compiled callables; fusing them into one program is the
    exact pattern the backend miscompiles.  Returns (resid_fn, step_fn)
    so call sites can wrap their pairs declaratively."""
    if resid_fn is step_fn:
        raise ValueError(
            "Q4 violation: residual and correction must be separate jit "
            "programs on the axon backend (see mg/multigrid.py)")
    return resid_fn, step_fn


# --- Q5: tile-exact shapes for big boundary arrays ---------------------

def assert_tile_exact(shape, min_bytes_hint: int = 1 << 30,
                      itemsize: int = 8) -> None:
    """Raise if a large boundary array violates the Q5 shape contract:
    at most 3 axes, and EVERY axis both sublane-exact (multiple of 8)
    and lane-exact-or-huge (multiple of 128, or itself >= 128·8 so any
    tiling pad is <2%).  Under that contract every layout XLA can pick
    is pad-free, so its transposed-layout habit costs at most a copy,
    never an 8x HBM expansion (the 32³×64 null-vector stack failure
    mode: a 16-wide axis chosen minor pads 16 → 128)."""
    import numpy as _np
    if int(_np.prod(shape)) * itemsize < min_bytes_hint:
        return
    if len(shape) > 3:
        raise ValueError(
            f"Q5: {tuple(shape)} has {len(shape)} axes — fold big "
            "boundary/dot arrays to <= 3 axes (XLA picks transposed "
            "layouts for multi-axis arrays and tile-pads the chosen "
            "minors; 3D batched-matmul shapes get sane layouts)")
    if shape[-2] % 8 or shape[-1] % 128:
        raise ValueError(
            f"Q5: minor pair {tuple(shape[-2:])} of {tuple(shape)} is "
            "not (8, 128)-tile-exact — the default boundary layout pads "
            "it")
