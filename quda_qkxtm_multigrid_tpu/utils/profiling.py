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


class SolveTelemetry:
    """Per-solve performance record — the analogue of the gflops/secs/
    iter fields QUDA returns through QudaInvertParam (reference
    include/quda.h:111-113, 198-202) and prints per solve."""

    def __init__(self, iters: int, secs: float, gflops: float):
        self.iters = int(iters)
        self.secs = float(secs)
        self.gflops = float(gflops)

    def __repr__(self):
        return (f"SolveTelemetry(iters={self.iters}, secs={self.secs:.3f}, "
                f"gflops={self.gflops:.1f})")

    def as_dict(self):
        return {"iters": self.iters, "secs": round(self.secs, 4),
                "gflops": round(self.gflops, 1)}


def solve_telemetry(dirac, iters: int, secs: float,
                    mg_cycles: int = 0) -> SolveTelemetry:
    """Analytic-ledger gflops for a solve: counts only the outer-operator
    applications (one matvec per iteration; MG V-cycle work is NOT
    ledgered, matching how the reference attributes solver gflops to the
    outer operator, lib/inv_gcr_quda.cpp 'true gflops' accounting)."""
    flops = dirac.flops_per_mat() * max(iters, 1)
    return SolveTelemetry(iters, secs, flops / max(secs, 1e-12) / 1e9)


def enable_compile_cache(path: str):
    """Persistent XLA compilation cache — the role of QUDA's tunecache
    under QUDA_RESOURCE_PATH (reference lib/tune.cpp:211-260)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
