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
        # REPLACE the ambient PYTHONPATH, never append to it: the TPU
        # relay registers via a sitecustomize.py on the ambient
        # PYTHONPATH and overrides JAX_PLATFORMS=cpu after import, so an
        # inherited path silently sends these "CPU" subprocesses to the
        # remote TPU — minutes-long remote compiles per fresh tmp dir
        # and deadline flakes whenever the relay is busy.
        "PYTHONPATH": REPO,
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


def test_secondary_banks_error_first(tmp_path):
    """BENCH_SECONDARY.json must be complete and labelled even when a
    later phase dies: phase results bank incrementally and each risky
    phase writes its error placeholder BEFORE running (the round-4
    artifact lost its default-grade record to a mid-secondary death)."""
    bench = _copy_bench(tmp_path)
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import runpy, sys; sys.argv=['bench.py','--inner'];"
        "runpy.run_path('bench.py', run_name='__main__')"
    )
    env = _smoke_env(SIGBENCH_FORCE_SECONDARY="1",
                     SIGBENCH_DEFAULT_PAIR_CHUNK="notanint")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=600,
                         cwd=str(tmp_path))
    sec_path = tmp_path / "BENCH_SECONDARY.json"
    assert sec_path.exists(), f"stderr: {out.stderr[-500:]}"
    sec = json.loads(sec_path.read_text())
    # phase 1 (f32) completed and banked
    assert "f32_matched_precision_pairs_per_sec" in sec, sec
    # phase 2 died at the chunk parse AFTER its placeholder landed
    assert sec.get("f64_default_grade_error") == "attempt did not complete"
    # the headline line carries the secondary summary
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    rec = json.loads(lines[-1])
    assert "secondary" in rec
    assert "f32_matched_precision_pairs_per_sec" in rec["secondary"]


def test_verify_warm_smoke(tmp_path):
    """--verify-warm: passes (exit 0, verify_warm true) when the inner
    attempt's first line lands within threshold; fails closed (exit 3,
    hint) when it does not."""
    bench = _copy_bench(tmp_path)
    out = subprocess.run(
        [sys.executable, bench, "--verify-warm"],
        env=_smoke_env(SIGBENCH_DEADLINE_S="300",
                       SIGBENCH_WARM_FIRST_LINE_S="280"),
        capture_output=True, text=True, timeout=420, cwd=str(tmp_path))
    rec = json.loads([l for l in out.stdout.splitlines()
                      if l.startswith("{")][-1])
    assert out.returncode == 0, (out.returncode, rec, out.stderr[-300:])
    assert rec["verify_warm"] is True
    assert rec["first_line_s"] is not None

    out = subprocess.run(
        [sys.executable, bench, "--verify-warm"],
        env=_smoke_env(SIGBENCH_DEADLINE_S="60",
                       SIGBENCH_WARM_FIRST_LINE_S="0"),
        capture_output=True, text=True, timeout=180, cwd=str(tmp_path))
    rec = json.loads([l for l in out.stdout.splitlines()
                      if l.startswith("{")][-1])
    assert out.returncode == 3
    assert rec["verify_warm"] is False
    assert rec["hint"]


def test_spawn_attempt_scrubs_sig_flags(tmp_path):
    """The watchdog's inner attempts must run with SIG_* tracing flags
    stripped (compile-cache key discipline): a session flag must not leak
    into the spawned environment."""
    bench = _copy_bench(tmp_path)
    probe = tmp_path / "probe.py"
    probe.write_text(
        "import importlib.util, os, sys, json\n"
        "spec = importlib.util.spec_from_file_location('bench', "
        f"{str(bench)!r})\n"
        "m = importlib.util.module_from_spec(spec)\n"
        "spec.loader.exec_module(m)\n"
        "os.environ['SIG_PLANES'] = '0'\n"
        "os.environ['SIGBENCH_PAIRS'] = '2'\n"
        "env = m._plain_env()\n"
        "assert 'SIG_PLANES' not in env, env.get('SIG_PLANES')\n"
        "assert env.get('SIGBENCH_PAIRS') == '2'\n"
        "os.environ['SIGBENCH_KEEP_FLAGS'] = '1'\n"
        "assert m._plain_env().get('SIG_PLANES') == '0'\n"
        "print('SCRUB_OK')\n")
    out = subprocess.run([sys.executable, str(probe)], env=_smoke_env(),
                         capture_output=True, text=True, timeout=120,
                         cwd=str(tmp_path))
    assert "SCRUB_OK" in out.stdout, out.stderr[-500:]


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


def test_baseline_suite_banks_incrementally(tmp_path):
    """benchmarks/run_benchmarks.py --json must bank BASELINE_RESULTS.json
    after EVERY config (a crash mid-suite keeps earlier entries) and
    record per-config failures as machine-readable error entries."""
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');\n"
        "import runpy, sys\n"
        "sys.argv = ['run_benchmarks.py', 'readme', 'nosuch', '--json']\n"
        "import benchmarks.run_benchmarks as rb\n"
        f"rb.RESULTS_PATH = {str(tmp_path / 'BASELINE_RESULTS.json')!r}\n"
        "rb.BENCHES['nosuch'] = lambda report: (_ for _ in ()).throw("
        "RuntimeError('boom'))\n"
        "rb.main()\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=300,
                         cwd=REPO)
    path = tmp_path / "BASELINE_RESULTS.json"
    assert path.exists(), out.stderr[-500:]
    rec = json.loads(path.read_text())
    assert rec["suite"]["readme_compute_kernel_b5"]["value"] > 0
    assert "boom" in rec["suite"]["nosuch_error"]["unit"]
