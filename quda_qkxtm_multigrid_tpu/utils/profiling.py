"""Timing profiles and the analytic-flops ledger.

The analogue of the reference TimeProfile (reference
include/quda_internal.h:163-232, per-API profiles
interface_quda.cpp:160-239, global summary at endQuda) and of the
per-operator analytic flop counts (lib/dirac_wilson.cpp:60,
blas_quda.cu:42).  jax.profiler traces complement this for kernel-level
timelines (QUDA's NVTX analogue is jax.profiler.TraceAnnotation).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class TimeProfile:
    """Accumulate wall time + optional flops per category."""

    def __init__(self, name: str = ""):
        self.name = name
        self.seconds = defaultdict(float)
        self.calls = defaultdict(int)
        self.flops = defaultdict(float)

    @contextlib.contextmanager
    def __call__(self, category: str, flops: float = 0.0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.seconds[category] += dt
            self.calls[category] += 1
            self.flops[category] += flops

    def add_flops(self, category: str, n: float):
        self.flops[category] += n

    def summary(self) -> str:
        total = sum(self.seconds.values())
        lines = [f"TimeProfile {self.name}: total {total:.3f} s"]
        for cat in sorted(self.seconds, key=self.seconds.get, reverse=True):
            s = self.seconds[cat]
            extra = ""
            if self.flops[cat]:
                extra = f"  {self.flops[cat] / max(s, 1e-12) / 1e9:.1f} GF/s"
            lines.append(f"  {cat:24s} {s:9.3f} s  x{self.calls[cat]:5d}"
                         f"{extra}")
        return "\n".join(lines)


# analytic per-site flop counts (reference flops ledgers)
FLOPS_PER_SITE = {
    "wilson_dslash": 1320,          # dirac_wilson.cpp:60
    "clover_apply": 504,            # dirac_clover.cpp:92
    "twist_apply": 48,              # dirac_twisted_mass.cpp
    "staggered_dslash": 570,
}


def enable_compile_cache(path: str):
    """Persistent XLA compilation cache — the role of QUDA's tunecache
    under QUDA_RESOURCE_PATH (reference lib/tune.cpp:211-260)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
