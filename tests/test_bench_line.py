"""Driver-line contract for bench.py (VERDICT r4 weak #2/#3/#4):
the last stdout line must be one parseable JSON object, < 4 KB, with
vs_baseline <= 1 and no negative numeric leaves (the reference's
one-number benchmark discipline, tests/dslash_test.cpp:990-993)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _walk_numbers(obj, path=""):
    if isinstance(obj, dict):
        for k, v in obj.items():
            yield from _walk_numbers(v, f"{path}.{k}")
    elif isinstance(obj, list):
        for i, v in enumerate(obj):
            yield from _walk_numbers(v, f"{path}[{i}]")
    elif isinstance(obj, (int, float)):
        yield path, obj


def _check_line(line: str):
    rec = json.loads(line)
    assert len(line) <= 4096, f"driver line {len(line)} B > 4096 B cap"
    assert rec["metric"] == "wilson_dslash_gflops_per_chip"
    assert rec["value"] > 0
    assert 0 < rec["vs_baseline"] <= 1.0, \
        f"vs_baseline {rec['vs_baseline']} must be a <=1 SoL fraction"
    for path, v in _walk_numbers(rec):
        if "unix_time" in path or "pid" in path:
            continue
        assert v >= 0 or "res" in path, f"negative value at {path}: {v}"
    return rec


def test_summary_is_compact_and_whitelisted():
    """The session-record summariser must keep only whitelisted keys
    (never inline provenance or full records) and stay small even with
    many phases."""
    sys.path.insert(0, REPO)
    import importlib
    bench = importlib.import_module("bench")
    s = bench._session_solve_summary()
    if s:                      # repo ships the measured session records
        for phase, rec in s.items():
            if phase == "session_file":
                continue
            assert "provenance" not in rec
            for k in rec:
                assert k in bench._SUMMARY_KEYS
        assert len(json.dumps(s)) < 3000


def test_sol_table():
    import importlib
    sys.path.insert(0, REPO)
    bench = importlib.import_module("bench")
    assert bench.SOL_BF16G_BF16S == pytest.approx(3753.75, abs=0.1)
    assert bench.SOL_BF16G_F32S == pytest.approx(2815.3, abs=0.1)
    assert bench.SOL_BF16G_BF16S > bench.SOL_BF16G_F32S \
        > bench.SOL_F32G_F32S


def test_stale_cache_record_is_clean():
    """The re-emit path must never carry a negative field or a >1
    vs_baseline (the r4 artifact did both)."""
    p = os.path.join(REPO, ".bench_last_tpu.json")
    if not os.path.exists(p):
        pytest.skip("no stale cache present")
    with open(p) as f:
        _check_line(f.read())


@pytest.mark.slow
def test_bench_line_subprocess():
    """End-to-end: bench.py on the CPU tier prints one parseable,
    compact, non-negative JSON line (slow tier: spawns a fresh jax)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", QKXTM_BENCH_SOLVE="0",
               QKXTM_BENCH_NO_STALE="1")
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, timeout=900,
                       env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    line = r.stdout.strip().splitlines()[-1]
    _check_line(line)
