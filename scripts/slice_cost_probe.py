"""Does a lane-offset VMEM slice cost full-width work in Mosaic?

Chains N steps of a df64-scheme-sized op sequence over (128, 2048) state
slabs, operating on (a) the full slab, (b) a 512-lane PREFIX slice,
(c) a 512-lane OFFSET slice at lane 1536, (d) prefix with a pre-roll.
If (c) ~ (a) while (b) ~ (a)/4, offset lane slices are the reason the
windowed wavefront's shrink phases saved nothing.

Run: timeout 2000 python -u scripts/slice_cost_probe.py
"""
import sys
import time
import functools

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_enable_x64", True)

print("devices:", jax.devices())

P, L, W = 128, 2048, 512
N_STEPS = 2048


def ops(a, b):
    """~30 dependent mul/adds + 2 rolls, df-flavoured."""
    for _ in range(5):
        s = a + b
        e = s - a
        t = (a - (s - e)) + (b - e)
        p = s * jnp.float32(1.000001)
        a = pltpu.roll(p + t, jnp.int32(1), axis=1)
        b = b * jnp.float32(0.999999) + t
    return a, b


def kernel(o_ref, s0, s1, *, mode):
    slab = (P, L)
    s0[0] = jnp.ones(slab, jnp.float32)
    s1[0] = jnp.ones(slab, jnp.float32) * 0.5

    def body(i, c):
        if mode == "full":
            a, b = ops(s0[0], s1[0])
            s0[0] = a
            s1[0] = b
        elif mode == "prefix":
            a, b = ops(s0[0, :, 0:W], s1[0, :, 0:W])
            s0[0, :, 0:W] = a
            s1[0, :, 0:W] = b
        elif mode == "offset":
            a, b = ops(s0[0, :, L - W:L], s1[0, :, L - W:L])
            s0[0, :, L - W:L] = a
            s1[0, :, L - W:L] = b
        return c + jnp.int32(1)

    lax.fori_loop(jnp.int32(0), jnp.int32(N_STEPS), body, jnp.int32(0))
    o_ref[...] = s0[0]


def run(mode):
    kern = functools.partial(kernel, mode=mode)

    def f(x):
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((P, L), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, P, L), jnp.float32),
                            pltpu.VMEM((1, P, L), jnp.float32)],
        )()
        return out.sum() + x * 1e-20

    def chain(x, n):
        def body(c, _):
            return c * (1.0 + 1e-12 * f(c)), 0
        c, _ = lax.scan(body, x, jnp.arange(n))
        return c

    x = jnp.float32(1.0)
    f2 = jax.jit(lambda x: chain(x, 2))
    f8 = jax.jit(lambda x: chain(x, 10))
    float(f2(x)); float(f8(x))
    t0 = time.perf_counter(); float(f2(x)); t2 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(f8(x)); t8 = time.perf_counter() - t0
    ms = (t8 - t2) / 8 * 1e3
    print(f"{mode:8s}: {ms:7.2f} ms/iter ({N_STEPS} steps, "
          f"{ms / N_STEPS * 1e3:6.2f} us/step)", flush=True)


for mode in ("full", "prefix", "offset", "full", "prefix", "offset"):
    run(mode)
print("done")
