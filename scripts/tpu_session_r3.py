"""Round-3 on-chip measurement session, ordered by value so a tunnel
death still yields the most important numbers first:

  1. 32³×64 MG setup + MG-GCR solve (the BASELINE.md north-star)
  2. 24³×48 2-level MG parity config, cold AND warm setup
     (BASELINE config 4, reference tests/multigrid_invert_test.cpp)
  3. bf16-spinor storage tier A/B (GF/s + CG floor + mixed recovery)
  4. 48³×96 CompactDirac CG (HBM-limited volume,
     reference interface_quda.cpp:1039)

Run: timeout 5400 python scripts/tpu_session_r3.py [phase ...]
(default: all phases in order; pass e.g. `northstar 24cube` to select).
"""
import json
import sys
import time

import jax

from quda_qkxtm_multigrid_tpu import enable_compile_cache

enable_compile_cache(min_secs=1.0)

from quda_qkxtm_multigrid_tpu.lattice import Geometry  # noqa: E402


def phase(tag):
    print(f"\n===== {tag} [{time.strftime('%H:%M:%S')}] =====", flush=True)


def main():
    sel = set(sys.argv[1:])

    def on(name):
        return not sel or name in sel

    from quda_qkxtm_multigrid_tpu import benchmarks as B

    if on("northstar"):
        phase("northstar: 32^3x64 tmc MG-GCR setup+solve")
        g32 = Geometry(32, 32, 32, 64)
        mg32 = B.bench_mg(g32, solver="gcr-pc")
        print("MG32 gcr-pc:", json.dumps(mg32), flush=True)

    if on("24cube"):
        phase("24^3x48 2-level MG parity config (cold + warm)")
        g24 = Geometry(24, 24, 24, 48)
        t0 = time.time()
        mg24 = B.bench_mg(g24, solver="gcr-pc")
        cold = time.time() - t0
        print("MG24 cold-process:", json.dumps(mg24),
              f"total_secs={cold:.1f}", flush=True)
        t0 = time.time()
        mg24w = B.bench_mg(g24, solver="gcr-pc")
        warm = time.time() - t0
        print("MG24 warm (same process, compile-cached):",
              json.dumps(mg24w), f"total_secs={warm:.1f}", flush=True)

    if on("bf16"):
        phase("bf16-spinor storage tier A/B")
        g32 = Geometry(32, 32, 32, 64)
        ab = B.bench_bf16_spinor(g32)
        print("BF16SPINOR:", json.dumps(ab), flush=True)

    if on("48cube"):
        phase("48^3x96 CompactDirac CG (HBM-limited)")
        g48 = Geometry(48, 48, 48, 96)
        cc = B.bench_compact(g48, tol=1e-6, maxiter=600)
        print("COMPACT48:", json.dumps(cc), flush=True)

    print("\nsession r3: DONE", flush=True)


if __name__ == "__main__":
    main()
