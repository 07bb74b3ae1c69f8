"""Smoke-test the benchmark harness logic on CPU at a tiny config."""
import json
import os
import subprocess
import sys

import pytest


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _copy_bench(tmp_path):
    """Copy bench.py into tmp so BENCH_BEST.json writes land in tmp."""
    src = os.path.join(REPO, "bench.py")
    dst = tmp_path / "bench.py"
    dst.write_text(open(src).read())
    return str(dst)


def _smoke_env(**extra):
    env = dict(os.environ)
    env.update({
        "SIGBENCH_LENGTH": "12", "SIGBENCH_DYADIC": "0",
        "SIGBENCH_PAIRS": "2", "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
    })
    env.update(extra)
    return env


def test_watchdog_smoke_config_never_persists_best(tmp_path):
    """A smoke-config run must not write BENCH_BEST.json (cache guard)."""
    bench = _copy_bench(tmp_path)
    out = subprocess.run(
        [sys.executable, bench], env=_smoke_env(SIGBENCH_DEADLINE_S="300"),
        capture_output=True, text=True, timeout=420, cwd=str(tmp_path))
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no JSON line; stderr: {out.stderr[-500:]}"
    assert json.loads(lines[-1])["value"] > 0
    assert not (tmp_path / "BENCH_BEST.json").exists(), \
        "smoke config polluted the cached-best fallback"


def test_watchdog_smoke_config_never_reads_cached_best(tmp_path):
    """With no budget, a smoke run must print the honest zero, never a
    cached headline number (which it did not measure)."""
    bench = _copy_bench(tmp_path)
    (tmp_path / "BENCH_BEST.json").write_text(json.dumps({
        "metric": "gram_pairs_per_sec_fwd_bwd_len1024_dyadic1_f64",
        "value": 9e9, "unit": "path-pairs/s", "vs_baseline": 1.0}))
    out = subprocess.run(
        [sys.executable, bench], env=_smoke_env(SIGBENCH_DEADLINE_S="1"),
        capture_output=True, text=True, timeout=120, cwd=str(tmp_path))
    rec = json.loads([l for l in out.stdout.splitlines()
                      if l.startswith("{")][-1])
    assert rec["value"] == 0.0
    assert "did not complete" in rec["unit"]


def test_watchdog_headline_config_uses_cached_best(tmp_path):
    """At the true headline config with no budget, the labelled cached
    record must print (the round-3 rc:124 failure mode)."""
    bench = _copy_bench(tmp_path)
    (tmp_path / "BENCH_BEST.json").write_text(json.dumps({
        "metric": "gram_pairs_per_sec_fwd_bwd_len1024_dyadic1_f64",
        "value": 123.4, "unit": "path-pairs/s", "vs_baseline": 0.006}))
    env = dict(os.environ)
    env["SIGBENCH_DEADLINE_S"] = "1"   # headline sizes (no SIGBENCH_* overrides)
    env.pop("SIGBENCH_LENGTH", None)
    env.pop("SIGBENCH_PAIRS", None)
    out = subprocess.run(
        [sys.executable, bench], env=env,
        capture_output=True, text=True, timeout=120, cwd=str(tmp_path))
    rec = json.loads([l for l in out.stdout.splitlines()
                      if l.startswith("{")][-1])
    assert rec["value"] == 123.4
    assert rec.get("cached") is True
    assert "cached" in rec["unit"]


def test_bench_inner_runs_on_cpu(tmp_path):
    env = dict(os.environ)
    env.update({
        "SIGBENCH_LENGTH": "12", "SIGBENCH_DYADIC": "0",
        "SIGBENCH_PAIRS": "2", "JAX_PLATFORMS": "cpu",
    })
    # jax_platforms env is overridden by the ambient plugin registration;
    # force it through a sitecustomize-proof wrapper
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import runpy, sys; sys.argv=['bench.py','--inner'];"
        "runpy.run_path('bench.py', run_name='__main__')"
    )
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=600,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no JSON line; stderr: {out.stderr[-500:]}"
    rec = json.loads(lines[-1])
    assert rec["value"] > 0
    assert rec["unit"] == "path-pairs/s"
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
