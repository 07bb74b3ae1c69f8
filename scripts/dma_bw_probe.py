"""Pallas async-DMA bandwidth probe: stream the benchmark-sized increment
streams through the exact double-buffered in_copy structure of the
wavefront kernels, with near-zero compute, slope-timed.

Every HBM-heavy stage of the benchmark step (df64 fwd kernel deficit,
adjoint, stream construction) clusters at ~90-110 GB/s effective while
XLA elementwise measures 689 GB/s -- this isolates whether Pallas DMA
itself has a ~100 GB/s ceiling or the kernels' compute hides it.

Run: timeout 2800 python -u scripts/dma_bw_probe.py
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

from sigkernel_tpu.ops.pallas_solver import _ix

print("devices:", jax.devices())

P, L = 128, 2048
N_SLOTS = 2048          # base slots, benchmark-like
T = 2                   # slabs per DMA batch


def dma_kernel(a_hbm, b_hbm, out_ref, buf_a, buf_b, sem, *, n_batches,
               two_streams):
    def in_copy(b, slot):
        cps = [pltpu.make_async_copy(a_hbm.at[pl.ds(_ix(b * T), T)],
                                     buf_a.at[_ix(slot)], sem.at[_ix(slot)])]
        if two_streams:
            cps.append(pltpu.make_async_copy(b_hbm.at[pl.ds(_ix(b * T), T)],
                                             buf_b.at[_ix(slot)],
                                             sem.at[_ix(2 + slot)]))
        return cps

    for c in in_copy(0, 0):
        c.start()
    out_ref[...] = jnp.zeros((P, L), jnp.float32)

    def body(b, acc):
        bslot = lax.rem(b, jnp.int32(2))

        @pl.when(b + 1 < n_batches)
        def _():
            for c in in_copy(b + 1, 1 - bslot):
                c.start()

        for c in in_copy(b, bslot):
            c.wait()
        # touch one slab per batch so nothing is elided (1 op per batch)
        acc = acc + jnp.int32(1)
        out_ref[...] = out_ref[...] + buf_a[bslot, 0]
        return acc

    lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), body, jnp.int32(0))


def run(n_slots, two_streams):
    n_batches = n_slots // T
    kern = functools.partial(dma_kernel, n_batches=n_batches,
                             two_streams=two_streams)
    a = jnp.ones((n_slots, P, L), jnp.float32)
    b = jnp.ones((n_slots, P, L), jnp.float32)

    def f(a, b):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((P, L), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, T, P, L), jnp.float32),
                pltpu.VMEM((2, T, P, L), jnp.float32),
                pltpu.SemaphoreType.DMA((4,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(a, b)

    def chain(a, b, n):
        def body(c, _):
            out = f(c[0], b)
            return (c[0] * (1.0 + 1e-12 * out.sum()), c[1]), 0
        c, _ = lax.scan(body, (a, b), jnp.arange(n))
        return c[0].sum()

    f2 = jax.jit(lambda a, b: chain(a, b, 2))
    f6 = jax.jit(lambda a, b: chain(a, b, 6))
    float(f2(a, b)); float(f6(a, b))
    t0 = time.perf_counter(); float(f2(a, b)); t2 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(f6(a, b)); t6 = time.perf_counter() - t0
    ms = (t6 - t2) / 4 * 1e3
    gb = n_slots * P * L * 4 * (2 if two_streams else 1) / 1e9
    print(f"slots={n_slots} two={int(two_streams)}: {ms:7.2f} ms/iter "
          f"{gb:.2f} GB -> {gb / (ms / 1e3):6.1f} GB/s "
          f"(t2={t2*1e3:.0f} t6={t6*1e3:.0f})", flush=True)


for two in (True, False):
    run(N_SLOTS, two)
print("done")
