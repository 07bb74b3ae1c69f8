"""Exact device-time attribution of the benchmark step via jax.profiler.

The remote relay's ~27 ms dispatch latency made all round-2 single-op
stage timings meaningless (see floor_probe.py); the profiler sidesteps the
problem entirely -- device op durations come from the device trace. Runs a
few pipelined benchmark steps under jax.profiler.start_trace and prints the
top XLA/Mosaic ops by total self-duration.

Run: python scripts/profile_bench.py [out_dir]
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys

os.environ.setdefault("JAX_ENABLE_X64", "true")

import jax
import jax.numpy as jnp
import numpy as np


def run_traced(out_dir):
    import sigkernel_tpu as sk

    jax.config.update("jax_enable_x64", True)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(16, 1024, 3)).cumsum(axis=1)
                    * (1.0 / np.sqrt(1024)), jnp.float64)
    Y = jnp.asarray(rng.normal(size=(16, 1024, 3)).cumsum(axis=1)
                    * (1.0 / np.sqrt(1024)), jnp.float64)
    kernel = sk.RBFKernel(1.0)

    def fwd_bwd(X, Y):
        def loss(x):
            K = sk.sig_gram(kernel, x, Y, dyadic_order=1, max_batch=None,
                            grad_solver="f32")
            return K.sum()
        return jax.value_and_grad(loss)(X)

    def pipe(X, Y):
        def one(carry, i):
            x, acc = carry
            s = 1.0 + 1e-6 * (i + 1) + 1e-9 * acc
            v, g = fwd_bwd(x * s, Y * s)
            return (x + 1e-9 * g, acc + 1e-12 * v), v

        (_, _), vs = jax.lax.scan(one, (X, jnp.float64(0.0)),
                                  jnp.arange(2))
        return vs

    pstep = jax.jit(pipe)
    print("compiling/warming...", flush=True)
    float(pstep(X, Y).sum())
    print("tracing...", flush=True)
    jax.profiler.start_trace(out_dir)
    float(pstep(X * (1.0 + 1e-6), Y).sum())
    jax.profiler.stop_trace()
    print("trace written", flush=True)


def parse(out_dir, top=40):
    paths = sorted(glob.glob(os.path.join(
        out_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        print("no trace found under", out_dir)
        return
    with gzip.open(paths[-1], "rt") as fh:
        trace = json.load(fh)
    events = trace.get("traceEvents", [])
    # device lanes: pid names containing "TPU"/"Device"; fall back to all
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    dev_pids = {p for p, n in pid_names.items()
                if any(k in n for k in ("TPU", "Device", "device"))}
    durs = collections.Counter()
    counts = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        d = e.get("dur", 0) / 1e6  # us -> s
        durs[name] += d
        counts[name] += 1
        total += d
    print(f"\ndevice total (summed op durations): {total*1e3:.1f} ms "
          f"(2 pipelined steps -> {total/2*1e3:.1f} ms/step)")
    print(f"{'op':70} {'total ms':>9} {'n':>5} {'%':>6}")
    for name, d in durs.most_common(top):
        print(f"{name[:70]:70} {d*1e3:9.2f} {counts[name]:5d} "
              f"{100*d/max(total,1e-12):6.2f}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sigbench_trace"
    if not os.environ.get("SIGPROFILE_PARSE_ONLY"):
        run_traced(out)
    parse(out)
