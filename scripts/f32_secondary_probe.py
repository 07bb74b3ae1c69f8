"""Reproduce bench.py's f32 secondary path with a real traceback.

The BENCH_SECONDARY.json emission silently swallowed an exception on the
last live run (file stayed stale while the headline moved); this runs the
same f32 end-to-end fwd+bwd at the benchmark config and prints the error.
"""
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import sigkernel_tpu as sk
from sigkernel_tpu.kernels import RBFKernel

LENGTH, DYADIC, DIM = 1024, 1, 3
A, B = 8, 16

rng = np.random.default_rng(0)
X = jnp.asarray(rng.normal(size=(A, LENGTH, DIM)).cumsum(axis=1)
                / np.sqrt(LENGTH), dtype=jnp.float32)
Y = jnp.asarray(rng.normal(size=(B, LENGTH, DIM)).cumsum(axis=1)
                / np.sqrt(LENGTH), dtype=jnp.float32)
kernel = RBFKernel(sigma=1.0)


def fwd_bwd32(x, y):
    def loss(x_):
        K = sk.sig_gram(kernel, x_, y, dyadic_order=DYADIC, max_batch=None)
        return K.sum()
    return jax.value_and_grad(loss)(x)


try:
    t0 = time.perf_counter()
    v, g = jax.jit(fwd_bwd32)(X, Y)
    v = float(v)
    gs = float(g.sum())
    print(f"OK value={v:.6g} gsum={gs:.6g} compile+run {time.perf_counter()-t0:.1f}s",
          flush=True)
except Exception:
    traceback.print_exc()
    sys.exit(1)
