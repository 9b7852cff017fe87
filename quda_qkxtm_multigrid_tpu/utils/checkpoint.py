"""Artifact checkpointing: MG null vectors, deflation eigenvectors,
accumulated loop data — the reference's resume story (SURVEY.md §5:
vec_infile/vec_outfile quda.h:389-393, ARPACK eigenvector I/O
qudaQKXTM_Kepler.h:446-448, loop dumps every Ndump noise vectors)."""

from __future__ import annotations

import numpy as np


def save_null_vectors(path: str, v_blocked, meta: dict | None = None):
    """Save the MG transfer's packed aggregate matrix
    (the analogue of MG vec_outfile, reference multigrid.cpp)."""
    np.savez_compressed(path, v=np.asarray(v_blocked),
                        **({f"meta_{k}": v for k, v in (meta or {}).items()}))


def load_null_vectors(path: str):
    with np.load(path) as f:
        return f["v"]


def fetch_complex(x) -> np.ndarray:
    """Device complex array → host numpy.  Complex d2h fetch raises
    UNIMPLEMENTED on the axon TPU backend (utils/backend_quirks.py):
    fetch re and im through jit programs and recombine on host.  The
    two planes are fetched by SEPARATE programs, each deleted before
    the next allocates — at 48³×96 the paired-output form held both
    f32 planes plus program temps beside the resident solve tier and
    tipped the HBM edge (cg48 RESOURCE_EXHAUSTED at this fetch, r5)."""
    import jax
    import jax.numpy as jnp
    re_d = jax.jit(jnp.real)(x)
    re = np.asarray(re_d)
    re_d.delete()
    im_d = jax.jit(jnp.imag)(x)
    im = np.asarray(im_d)
    im_d.delete()
    return re + 1j * im


def upload_complex(a: np.ndarray, dtype):
    """Host complex numpy → device complex array via a (re, im) jit
    combine (the h2d mirror of fetch_complex)."""
    import jax
    import jax.numpy as jnp
    rdt = jnp.float64 if dtype == jnp.complex128 else jnp.float32
    re = jnp.asarray(np.ascontiguousarray(a.real), rdt)
    im = jnp.asarray(np.ascontiguousarray(a.imag), rdt)
    return jax.jit(lambda r, i: jax.lax.complex(r, i))(re, im)


def load_null_vectors_device(path: str, dtype):
    """vec_infile loader returning the blocked V on device."""
    return upload_complex(load_null_vectors(path), dtype)


def save_eigenpairs(path: str, evals, evecs, resid=None):
    """Deflation eigenpairs (the analogue of QKXTM_Deflation's
    eigenvector read/write)."""
    np.savez_compressed(path, evals=np.asarray(evals),
                        evecs=np.asarray(evecs),
                        resid=np.asarray(resid) if resid is not None else
                        np.zeros(0))


def load_eigenpairs(path: str):
    with np.load(path) as f:
        return f["evals"], f["evecs"]


def save_loops(path: str, loops: dict, n_stoch: int):
    """Accumulated loop fields (resumable stochastic runs, the role of
    the reference's per-Ndump HDF5 dumps)."""
    np.savez_compressed(path, n_stoch=n_stoch,
                        **{k: np.asarray(v) for k, v in loops.items()})


def load_loops(path: str):
    with np.load(path) as f:
        n = int(f["n_stoch"])
        return {k: f[k] for k in f.files if k != "n_stoch"}, n
