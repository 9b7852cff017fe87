"""Round-4 on-chip measurement session — HARDENED capture path.

Round 3 lost every solve number to a single tunnel failure because the
whole payload ran in one process behind one try/except.  This runner
fixes that (VERDICT r3, Next #1):

  * every phase runs in its OWN SUBPROCESS — a hung/poisoned TPU client
    (the axon tunnel's HBM-OOM / HTTP-500 modes) can kill at most one
    phase attempt, never the session;
  * each phase's record is APPENDED to ``BENCH_SESSION.jsonl`` the
    moment it completes, with machine provenance (pid/time/device
    written only by the measuring code path);
  * failures retry with backoff, gated on a backend-reachability probe
    so we don't burn retries against a dead tunnel;
  * phases are value-ordered: the BASELINE.md north-star first.

Phases (value order):
  probe16    16^3x32 tmc MG-GCR-PC (fast sanity; r3's commit-message
             numbers become an artifact)
  northstar  32^3x64 tmc MG-GCR-PC setup+solve (BASELINE primary)
  cg32       32^3x64 tmc fused CG (invertQuda-style timing)
  mg24       24^3x48 2-level MG parity config, cold AND warm
             (BASELINE config 4, reference tests/multigrid_invert_test.cpp)
  bf16       bf16-spinor storage tier A/B (GF/s + CG floor + recovery)
  compact48  48^3x96 CompactDirac CG (HBM-limited,
             reference interface_quda.cpp:1039)

Run:   python scripts/tpu_session_r4.py [phase ...]
Child: python scripts/tpu_session_r4.py --phase NAME   (internal)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(REPO, "BENCH_SESSION.jsonl")

# The package is run from the repo tree (not pip-installed); a child
# invoked as `python scripts/tpu_session_r4.py --phase X` gets scripts/
# on sys.path, not the repo root — make the import environment-proof.
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# (name, timeout_s, retries)
PHASES = [
    ("probe16", 1200, 2),
    ("northstar", 4800, 2),
    ("cg32", 1800, 2),
    ("mg24", 3000, 1),
    ("bf16", 1800, 1),
    ("compact48", 3000, 1),
    ("df64", 1800, 1),
    ("matpc_ab", 1800, 1),
]


def _append(phase: str, record: dict) -> None:
    import jax
    rec = {
        "phase": phase,
        "record": record,
        "provenance": {
            "pid": os.getpid(),
            "unix_time": round(time.time(), 1),
            "writer": f"tpu_session_r4:{phase}",
            "jax": jax.__version__,
            "device": str(jax.devices()[0]),
        },
    }
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"RESULT[{phase}]:", json.dumps(rec), flush=True)


def run_phase(phase: str) -> None:
    from quda_qkxtm_multigrid_tpu import enable_compile_cache
    enable_compile_cache(min_secs=1.0)
    from quda_qkxtm_multigrid_tpu import benchmarks as B
    from quda_qkxtm_multigrid_tpu.lattice import Geometry

    if phase == "probe16":
        _append(phase, B.bench_mg(Geometry(16, 16, 16, 32),
                                  solver="gcr-pc"))
    elif phase == "northstar":
        # production tier: bf16 null-vector storage (precision_null
        # HALF analogue) — the f32 V alone is 4.8 GB at this volume
        _append(phase, B.bench_mg(Geometry(32, 32, 32, 64),
                                  solver="gcr-pc", vec_dtype="bf16",
                                  solve_operator="compact"))
    elif phase == "cg32":
        _append(phase, B.bench_cg(Geometry(32, 32, 32, 64)))
    elif phase == "mg24":
        g24 = Geometry(24, 24, 24, 48)
        t0 = time.time()
        cold = B.bench_mg(g24, solver="gcr-pc")
        cold["total_secs_cold_process"] = round(time.time() - t0, 1)
        _append("mg24_cold", cold)
        t0 = time.time()
        warm = B.bench_mg(g24, solver="gcr-pc")
        warm["total_secs_warm_process"] = round(time.time() - t0, 1)
        _append("mg24_warm", warm)
    elif phase == "bf16":
        _append(phase, B.bench_bf16_spinor(Geometry(32, 32, 32, 64)))
    elif phase == "compact48":
        _append(phase, B.bench_compact(Geometry(48, 48, 48, 96),
                                       tol=1e-6, maxiter=600))
    elif phase == "df64":
        _append(phase, B.bench_df64(Geometry(16, 16, 16, 32)))
    elif phase == "matpc_ab":
        _append(phase, B.bench_matpc_ab(Geometry(32, 32, 32, 64)))
    else:
        raise SystemExit(f"unknown phase {phase!r}")


def _backend_alive(timeout_s: int = 180) -> bool:
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.default_backend())"],
            capture_output=True, text=True, timeout=timeout_s)
        out = r.stdout.strip().splitlines()
        return bool(out) and out[-1] == "tpu"
    except subprocess.TimeoutExpired:
        return False


def _phase_done(phase: str) -> bool:
    if not os.path.exists(RESULTS):
        return False
    want = {"mg24": ("mg24_cold", "mg24_warm")}.get(phase, (phase,))
    seen = set()
    with open(RESULTS) as f:
        for line in f:
            try:
                seen.add(json.loads(line)["phase"])
            except (ValueError, KeyError):
                pass
    return all(w in seen for w in want)


def main() -> None:
    sel = set(a for a in sys.argv[1:] if not a.startswith("-"))
    for name, timeout_s, retries in PHASES:
        if sel and name not in sel:
            continue
        if _phase_done(name) and "--force" not in sys.argv:
            print(f"[{name}] already recorded, skipping", flush=True)
            continue
        for attempt in range(retries + 1):
            print(f"\n===== {name} attempt {attempt + 1} "
                  f"[{time.strftime('%H:%M:%S')}] =====", flush=True)
            if not _backend_alive():
                print(f"[{name}] TPU backend unreachable; "
                      "waiting 300s", flush=True)
                time.sleep(300)
                if not _backend_alive():
                    print(f"[{name}] still unreachable, moving on",
                          flush=True)
                    break
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--phase", name],
                    timeout=timeout_s, cwd=REPO)
                if r.returncode == 0 and _phase_done(name):
                    break
                print(f"[{name}] rc={r.returncode}, "
                      f"recorded={_phase_done(name)}", flush=True)
            except subprocess.TimeoutExpired:
                print(f"[{name}] TIMEOUT after {timeout_s}s", flush=True)
            if attempt < retries:
                backoff = 120 * (attempt + 1)
                print(f"[{name}] retrying in {backoff}s", flush=True)
                time.sleep(backoff)
    print("\nsession r4: DONE", flush=True)


if __name__ == "__main__":
    if "--phase" in sys.argv:
        run_phase(sys.argv[sys.argv.index("--phase") + 1])
    else:
        main()
