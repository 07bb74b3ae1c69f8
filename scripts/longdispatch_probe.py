"""Does a single long-running XLA dispatch crash the TPU worker?

Discriminator for the round-4 chunk-32 worker crash
(scripts/defgrade32_repro.py stage 6): the crashing program is ONE
value_and_grad dispatch whose execution is ~313 sequential df64
grid-route chunk adjoints (estimated 10-20 min on-chip).  Every
component of that program passes in isolation and the identical program
at a 400-pair Gram (13 chunks, ~3 min) passes — so if a *plain XLA*
program (no Pallas at all) with a long enough execution also kills the
worker, the root cause is an execution-length limit in the
worker/relay, not a kernel fault.

Protocol: a jitted fori_loop of f32 matmuls, calibrated with a short
run, then scaled to TARGET_S seconds (default 420 s — past the ~270 s
mark where stage 6 died).  Prints a heartbeat per step so the log shows
exactly where a crash lands.

Run:  python -u scripts/longdispatch_probe.py [TARGET_S]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

TARGET_S = float(sys.argv[1]) if len(sys.argv) > 1 else 420.0
N = 4096

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
A = jnp.asarray(rng.normal(size=(N, N)) / np.sqrt(N), jnp.float32)
C0 = jnp.asarray(rng.normal(size=(N, N)) / np.sqrt(N), jnp.float32)


def run(iters):
    @jax.jit
    def prog(c, a):
        def body(_, x):
            return 0.5 * x + 0.5 * (x @ a)
        return jax.lax.fori_loop(0, iters, body, c)

    float(C0[0, 0])
    t0 = time.time()
    out = prog(C0, A)
    s = float(out[0, 0])
    return time.time() - t0, s


# calibrate (includes compile; run twice, take the second)
run(2000)
dt, _ = run(2000)
per_iter = dt / 2000
iters = int(TARGET_S / per_iter)
print(f"calibration: {per_iter*1e6:.1f} us/iter -> {iters} iters for "
      f"~{TARGET_S:.0f}s", flush=True)

t0 = time.time()
dt, s = run(iters)
print(f"single dispatch of {dt:.1f}s executed OK (value {s:.4f})",
      flush=True)
print("LONGDISPATCH_OK", flush=True)
