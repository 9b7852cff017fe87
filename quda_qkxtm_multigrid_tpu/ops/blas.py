"""Fused field-BLAS layer — the counterpart of quda::blas
(reference include/blas_quda.h:33-144, lib/blas_quda.cu, lib/reduce_quda.cu).

On TPU these are jnp expressions: XLA fuses chained site-wise updates and
reductions into single passes, which is exactly what the reference's ~50
hand-fused kernels (axpyZpbx, tripleCGReduction, ...) exist to do on CUDA.
The functions are kept with QUDA's names/signatures so solver code reads
the same, and `flops` tracks the analytic ledger (reference
lib/blas_quda.cu:42).

Reductions return f64-on-CPU / f32-on-TPU real scalars; under a sharded
mesh they lower to psum over all devices (reference comm_allreduce,
lib/comm_mpi.cpp:297).  Determinism comes free: XLA reduces in a fixed
order, the analogue of QUDA's deterministic tree reductions.
"""

from __future__ import annotations

import jax.numpy as jnp

flops = 0  # analytic ledger hook (incremented by solver drivers if desired)


def _re(x):
    return jnp.real(x)


# ---- level-1 updates ------------------------------------------------

def axpy(a, x, y):
    """y + a*x (reference blas_quda.h axpy)."""
    return y + a * x


def xpay(x, a, y):
    """x + a*y (reference blas_quda.h xpay)."""
    return x + a * y


def caxpy(a, x, y):
    return y + a * x


def caxpby(a, x, b, y):
    return a * x + b * y


def caxpbypz(a, x, b, y, z):
    return z + a * x + b * y


def axpyZpbx(a, p, x, r, b):
    """x' = x + a p ; p' = r + b p (fused CG update,
    reference blas_quda.h:60)."""
    return x + a * p, r + b * p


# ---- reductions -----------------------------------------------------

def norm2(x):
    return _re(jnp.vdot(x, x))


def reDotProduct(x, y):
    return _re(jnp.vdot(x, y))


def cDotProduct(x, y):
    return jnp.vdot(x, y)


def xmyNorm(x, y):
    """y' = x - y, returns (y', |y'|^2) (reference blas_quda.h:56)."""
    d = x - y
    return d, norm2(d)


def axpyNorm(a, x, y):
    """y' = y + a x, returns (y', |y'|^2) (reference blas_quda.h:55)."""
    yp = y + a * x
    return yp, norm2(yp)


def axpyCGNorm(a, x, y):
    """y' = y + a x; returns (y', |y'|^2, Re<y', x>) — the fused CG
    kernel (reference blas_quda.h:72)."""
    yp = y + a * x
    return yp, norm2(yp), reDotProduct(yp, x)


def tripleCGReduction(x, y, z):
    """(|x|^2, |y|^2, Re<y,z>) in one pass (reference blas_quda.h:92)."""
    return norm2(x), norm2(y), reDotProduct(y, z)


def cDotProductNormA(a, b):
    """(<a,b>, |a|^2) (reference blas_quda.h:84)."""
    return cDotProduct(a, b), norm2(a)


def caxpyXmazNormX(a, x, y, z):
    """y' = y + a x ; x' = z - a x ; returns |x'|^2
    (reference blas_quda.h caxpyXmazNormX)."""
    yp = y + a * x
    xp = z - a * x
    return yp, xp, norm2(xp)


# ---- multi-blas (batched over a leading vector-set axis) -------------

def caxpy_batch(a, xs, y):
    """y + sum_k a[k] xs[k]: the multi-caxpy used by GCR orthogonalisation
    and multi-shift updates (reference include/blas_quda.h:108-144,
    lib/multi_blas_core.cuh)."""
    ar = a.reshape(a.shape + (1,) * (xs.ndim - 1))
    return y + jnp.sum(ar * xs, axis=0)


def block_cdot(xs, y):
    """[<xs[k], y>]_k in one pass (reference multi_reduce_core.h)."""
    axes = tuple(range(1, xs.ndim))
    return jnp.sum(jnp.conj(xs) * y, axis=axes)
