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
