"""Can Mosaic lower a lane interleave (dilation by f) cheaply?

Tests jnp.repeat(x, 2, axis=-1) and the broadcast+reshape spelling inside
a TPU kernel, for correctness and slope-timed cost on (128, 1024)->(128,
2048). If cheap, the stream row-stretch (an XLA repeat pass + transpose
on doubled data, ~2x stream HBM) moves in-kernel.

Run: timeout 2000 python -u scripts/interleave_probe.py
"""
import sys
import time
import functools

sys.path.insert(0, "/root/repo")

import os
from contextlib import nullcontext as _nullcontext

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_enable_x64", True)
# CPU-force must precede ANY backend init (jax.devices() on the axon
# plugin blocks while the relay is wedged)
if os.environ.get("INTERLEAVE_INTERPRET"):
    jax.config.update("jax_platforms", "cpu")

print("devices:", jax.devices())

P, Lb, f = 128, 1024, 2
N_STEPS = 1024


def kernel(o_ref, s_in, s_out, *, mode, n_steps):
    s_in[0] = jnp.ones((P, Lb), jnp.float32)

    def body(i, c):
        x = s_in[0] * (1.0 + 1e-9 * lax.convert_element_type(i, jnp.float32))
        if mode == "repeat":
            y = jnp.repeat(x, f, axis=1)
        elif mode == "compact":
            # inverse of dilation: f-block lane sum via strided slicing
            z = jnp.repeat(x, f, axis=1)
            cz = z[:, ::2] + z[:, 1::2]
            y = jnp.concatenate([cz, jnp.zeros_like(cz)], axis=1)
        elif mode == "bcast":
            y = jnp.broadcast_to(x[:, :, None], (P, Lb, f))
            y = y.reshape(P, Lb * f)
        elif mode == "ptrepeat_roll":
            # concat-style tile then 2-roll interleave is NOT equal to
            # dilation; timed as an op-cost yardstick only
            z = pltpu.repeat(x, f, axis=1)
            y = jnp.where(
                lax.broadcasted_iota(jnp.int32, (P, Lb * f), 1) % 2 == 0,
                z, pltpu.roll(z, jnp.int32(1), axis=1))
        else:  # baseline: no interleave, just a copy-sized op
            y = pltpu.repeat(x, f, axis=1)
        s_out[0] = y
        return c + jnp.int32(1)

    lax.fori_loop(jnp.int32(0), jnp.int32(n_steps), body, jnp.int32(0))
    o_ref[...] = s_out[0]


def run(mode, n_steps=N_STEPS):
    kern = functools.partial(kernel, mode=mode, n_steps=n_steps)

    def F(x):
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((P, Lb * f), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, P, Lb), jnp.float32),
                            pltpu.VMEM((1, P, Lb * f), jnp.float32)],
        )()
        return out.sum() * 1e-20 + x

    x = jnp.float32(1.0)
    try:
        f2 = jax.jit(lambda x: F(F(x)))
        v = float(f2(x))
    except Exception as e:
        print(f"{mode:16s}: FAILED {str(e).splitlines()[0][:120]}")
        return

    def chain(x, n):
        def body(c, _):
            return c * (1.0 + 1e-12 * F(c)), 0
        c, _ = lax.scan(body, x, jnp.arange(n))
        return c

    c2 = jax.jit(lambda x: chain(x, 2))
    c8 = jax.jit(lambda x: chain(x, 10))
    float(c2(x)); float(c8(x))
    t0 = time.perf_counter(); float(c2(x)); t2 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(c8(x)); t8 = time.perf_counter() - t0
    ms = (t8 - t2) / 8 * 1e3
    print(f"{mode:16s}: {ms:7.2f} ms/iter ({ms / n_steps * 1e3:6.2f} us/op)",
          flush=True)


# correctness of the dilation spellings in interpret mode (CPU-forced
# above: interpret mode on the axon backend roundtrips the relay per op)
with pltpu.force_tpu_interpret_mode() if os.environ.get(
        "INTERLEAVE_INTERPRET") else _nullcontext():
    if os.environ.get("INTERLEAVE_INTERPRET"):
        for mode in ("repeat", "bcast", "compact"):
            kern = functools.partial(kernel, mode=mode, n_steps=1)
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((P, Lb * f), jnp.float32),
                scratch_shapes=[pltpu.VMEM((1, P, Lb), jnp.float32),
                                pltpu.VMEM((1, P, Lb * f), jnp.float32)],
            )()
            want = np.repeat(np.ones((P, Lb), np.float32), f, axis=1)
            if mode == "compact":
                want = want[:, ::2] + want[:, 1::2]
                want = np.pad(want, ((0, 0), (0, Lb)))
                got = np.asarray(out)
                ok = np.array_equal(got[:, :Lb], want[:, :Lb])
            else:
                ok = np.array_equal(np.asarray(out), want)
            print(f"interpret {mode}: {'OK' if ok else 'BAD'}")

if not os.environ.get("INTERLEAVE_INTERPRET"):
    for mode in ("repeat", "bcast", "compact", "ptrepeat_roll",
                 "tile_baseline"):
        run(mode)
print("done")
