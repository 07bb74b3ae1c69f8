"""Which lane-dilation spellings does Mosaic actually compile?

Round-3 finding: the windowed ``jnp.repeat(x[:, ws//f:(ws+W)//f], f)``
dilation fails AOT compile (infer-vector-layout: unsupported shape cast
vector<128x192x2> -> vector<128x384>) even though interpret mode passes.
This probe compiles each candidate spelling in a minimal kernel on the
real toolchain and reports compile + value status:

  A. full-width jnp.repeat (1024 -> 2048)
  B. windowed jnp.repeat (192 -> 384)        [the known failure]
  C. full-width broadcast_to + reshape
  D. strided-slice compaction x[:, ::2] + x[:, 1::2] (COLLAPSE_COMPACT core)
  E. strided STORE interleave: out[:, ::2] = x; out[:, 1::2] = x

Run: timeout 1800 python -u scripts/dilate_probe.py
"""
import sys
import functools

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_enable_x64", True)

print("devices:", jax.devices(), flush=True)

P, Lb, f = 128, 1024, 2
L = Lb * f


def kernel(x_ref, o_ref, *, mode):
    x = x_ref[...]
    if mode == "A":
        o_ref[...] = jnp.repeat(x, f, axis=1)
    elif mode == "B":
        w = jnp.repeat(x[:, 192:384], f, axis=1)
        o_ref[:, :384] = w
        o_ref[:, 384:] = jnp.zeros((P, L - 384), jnp.float32)
    elif mode == "C":
        y = jnp.broadcast_to(x[:, :, None], (P, Lb, f))
        o_ref[...] = y.reshape(P, Lb * f)
    elif mode == "D":
        z = x[:, ::2] + x[:, 1::2]
        o_ref[...] = jnp.concatenate(
            [z, jnp.zeros((P, L - Lb // 2), jnp.float32)], axis=1)
    elif mode == "E":
        o_ref[:, ::2] = x
        o_ref[:, 1::2] = x


def run(mode):
    x = jnp.asarray(np.arange(P * Lb, dtype=np.float32).reshape(P, Lb))
    try:
        out = pl.pallas_call(
            functools.partial(kernel, mode=mode),
            out_shape=jax.ShapeDtypeStruct((P, L), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        out = np.asarray(out)
    except Exception as e:
        msg = str(e).split("\n")[0][:100]
        print(f"{mode}: COMPILE/RUN FAIL: {msg}", flush=True)
        return
    xn = np.asarray(x)
    if mode in ("A", "C", "E"):
        want = np.repeat(xn, f, axis=1)
        ok = np.array_equal(out, want)
    elif mode == "B":
        want = np.repeat(xn[:, 192:384], f, axis=1)
        ok = np.array_equal(out[:, :384], want)
    elif mode == "D":
        want = xn[:, ::2] + xn[:, 1::2]
        ok = np.array_equal(out[:, :Lb // 2], want)
    print(f"{mode}: {'OK' if ok else 'WRONG VALUES'}", flush=True)


for m in ("A", "B", "C", "D", "E"):
    run(m)
print("done", flush=True)
