"""Smoke-test the benchmark harness logic on CPU at a tiny config."""
import json
import os
import subprocess
import sys

import pytest


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
