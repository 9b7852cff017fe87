"""Live-buffer byte accountant — the role of the reference's tracking
allocator (reference lib/malloc.cpp:89-270: device_malloc_ wrappers with
peak accounting, printPeakMemUsage, assertAllMemFree).

XLA owns the actual allocator; what survives translation is the
OBSERVABILITY layer: per-call-site attribution is replaced by live
jax.Array accounting (what fields does the program keep alive, in
bytes) plus the backend's own allocator stats when it exposes them.
"""

from __future__ import annotations

import contextlib
from collections import defaultdict

import jax


def live_bytes(by_shape: bool = False):
    """Total bytes of live jax.Arrays on all devices; optionally a
    {(shape, dtype): bytes} breakdown (the analogue of the reference's
    track_malloc ledger)."""
    total = 0
    detail = defaultdict(int)
    for a in jax.live_arrays():
        try:
            n = a.nbytes
        except Exception:
            continue
        total += n
        if by_shape:
            detail[(tuple(a.shape), str(a.dtype))] += n
    if by_shape:
        return total, dict(detail)
    return total


def device_memory_stats():
    """Backend allocator stats when available (bytes_in_use,
    peak_bytes_in_use, ...); {} when the platform does not report."""
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
        except Exception:
            s = None
        if s:
            out[str(d)] = {k: s[k] for k in
                           ("bytes_in_use", "peak_bytes_in_use",
                            "bytes_limit") if k in s}
    return out


class PeakTracker:
    """Peak live-bytes watermark over a region (printPeakMemUsage
    analogue).  Snapshots at enter/exit plus explicit .sample() calls —
    XLA allocations inside a single jit are not observable from Python,
    so sample() between program launches."""

    def __init__(self):
        self.start = self.peak = 0

    def sample(self):
        self.peak = max(self.peak, live_bytes())

    def __enter__(self):
        self.start = live_bytes()
        self.peak = self.start
        return self

    def __exit__(self, *exc):
        self.sample()
        return False

    def report(self) -> str:
        return (f"live bytes: start {self.start / 1e9:.3f} GB, "
                f"peak {self.peak / 1e9:.3f} GB "
                f"(+{(self.peak - self.start) / 1e9:.3f} GB)")


@contextlib.contextmanager
def assert_no_leak(tol_bytes: int = 1 << 20):
    """assertAllMemFree analogue for a scope: live bytes at exit must
    not exceed entry by more than tol (catches accidentally retained
    field references in workflows)."""
    start = live_bytes()
    yield
    end = live_bytes()
    if end - start > tol_bytes:
        raise AssertionError(
            f"live-buffer leak: {start / 1e6:.1f} MB -> "
            f"{end / 1e6:.1f} MB (+{(end - start) / 1e6:.1f} MB)")
