"""On-chip check of the plane-split df64 kernel: compile, values, timing.

1. small grid: plane-split vs stretched kernel values must be bit-equal;
2. benchmark grid (128 pairs, len 1024, dyadic 1): values + stack-driven
   adjoint cotangent A/B, slope timings (kernel incl. stream construction).

Run: timeout 3000 python -u scripts/onchip_planes_check.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
# persistent compile cache: remote compiles at benchmark shapes take tens
# of minutes; share them across probe scripts and bench.py
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sigkernel_tpu.ops import pallas_df64 as pd

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(7)
FAIL = []

MODE = os.environ.get("PLCHECK_MODE", "all")


def mk(B, Mb, Nb):
    inc = rng.normal(size=(B, Mb, Nb)) * 0.05
    hi = jnp.asarray(inc, jnp.float32)
    lo = jnp.asarray(inc - np.asarray(hi, np.float64), jnp.float32)
    return hi, lo


@functools.partial(jax.jit, static_argnames=("dy", "pl_"))
def val(h, l, dy, pl_):
    fn = pd._solve_final_one_df_pl if pl_ else pd._solve_final_one_df
    return fn(h, l, False, dy)


if MODE in ("all", "small"):
    for (B, Mb, Nb, dy) in [(8, 63, 63, 1), (8, 40, 63, 2)]:
        h, l = mk(B, Mb, Nb)
        a = np.asarray(val(h, l, dy, False))
        b = np.asarray(val(h, l, dy, True))
        bit = np.array_equal(a, b)
        print(f"small B={B} {Mb}x{Nb} f={2**dy}: bit-equal={bit} "
              f"maxdiff={np.abs(a-b).max():.3e}", flush=True)
        if not bit:
            FAIL.append(f"small-{Mb}x{Nb}")

B, Mb, Nb, dy = 128, 1023, 1023, 1
h, l = mk(B, Mb, Nb)
jax.block_until_ready((h, l))

if MODE in ("all", "bench"):
    a = np.asarray(val(h, l, dy, False))
    b = np.asarray(val(h, l, dy, True))
    bit = np.array_equal(a, b)
    print(f"bench values bit-equal={bit} maxdiff={np.abs(a-b).max():.3e}",
          flush=True)
    if not bit:
        FAIL.append("bench-values")


def slope(fn, n_lo=2, n_hi=6):
    def chain(hh, ll, n):
        def body(c, _):
            out = fn(c, ll)
            return c * (1.0 + 1e-12 * out.sum()).astype(c.dtype), 0
        c, _ = jax.lax.scan(body, hh, jnp.arange(n))
        return c.sum()

    f2 = jax.jit(lambda a, b: chain(a, b, n_lo))
    f6 = jax.jit(lambda a, b: chain(a, b, n_hi))
    float(f2(h, l)); float(f6(h, l))
    t0 = time.perf_counter(); float(f2(h, l)); t2 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(f6(h, l)); t6 = time.perf_counter() - t0
    return (t6 - t2) / (n_hi - n_lo) * 1e3, t2 * 1e3, t6 * 1e3


if MODE in ("all", "time"):
    for pl_ in (False, True):
        ms, t2, t6 = slope(lambda a, b, pl_=pl_:
                           pd._solve_final_one_df_pl(a, b, False, dy)
                           if pl_ else pd._solve_final_one_df(a, b, False, dy))
        print(f"fwd+streams planes={int(pl_)}: {ms:7.2f} ms/iter "
              f"(t2={t2:.1f} t6={t6:.1f})", flush=True)

print("FAILED:" if FAIL else "ALL OK", FAIL, flush=True)
sys.exit(1 if FAIL else 0)
