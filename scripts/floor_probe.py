"""Microbenchmark: what sets the ~7us/step wavefront chain floor?

Round-2 measurements pinned the per-diagonal cost of every wavefront kernel
at ~7 us for (64, 2048) slabs -- flat in DMA batch, unroll, and op count
(2 ops == 32 ops), i.e. the loop-carried VMEM state write->read chain
itself. This probe answers the round-3 design questions:

1. Does the floor scale with slab size, or is it a fixed per-step latency?
   (fixed -> bigger slabs / more pairs per launch are near-free throughput)
2. Do independently-chained states interleaved in one body hide each
   other's latency? (yes -> co-locate forward/reverse/product sweeps)
3. Does carrying the state as fori_loop *values* (registers, Mosaic's
   choice) instead of VMEM scratch stores break the floor?
4. Does a pallas grid step per diagonal behave differently from an
   in-kernel fori_loop?

Run on the real chip:  python scripts/floor_probe.py [quick]
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


N_STEPS = 4096
T = 4  # static unroll, compile-time ping-pong slots (as production)


def _step_math(vm1, vm2, flavour):
    if flavour == "add":
        return vm1 + jnp.float32(1e-6)
    k01 = pltpu.roll(vm1, jnp.int32(1), axis=1)
    k00 = pltpu.roll(vm2, jnp.int32(1), axis=1)
    u = vm1 * jnp.float32(1e-7)
    u2 = u * u * jnp.float32(1.0 / 12.0)
    return ((k01 + vm1) * (jnp.float32(1.0) + jnp.float32(0.5) * u + u2)
            - k00 * (jnp.float32(1.0) - u2))


def _scratch_kernel(seed_ref, out_ref, state, *, n_steps, n_chains, flavour):
    """VMEM scratch ping-pong chains (production dataflow)."""
    for c in range(n_chains):
        state[2 * c] = seed_ref[...] + jnp.float32(c)
        state[2 * c + 1] = seed_ref[...] * jnp.float32(0.5)

    def body(b, _):
        for t in range(T):
            for c in range(n_chains):
                sa = 2 * c + t % 2
                sb = 2 * c + 1 - t % 2
                state[sb] = _step_math(state[sa], state[sb], flavour)
        return 0

    lax.fori_loop(jnp.int32(0), jnp.int32(n_steps // T), body, 0)
    acc = state[0]
    for c in range(1, n_chains):
        acc = acc + state[2 * c]
    out_ref[...] = acc


def _value_kernel(seed_ref, out_ref, *, n_steps, n_chains, flavour):
    """fori_loop VALUE carries: Mosaic places the state (registers if it
    fits); no explicit VMEM stores in the chain."""
    init = []
    for c in range(n_chains):
        init.append(seed_ref[...] + jnp.float32(c))
        init.append(seed_ref[...] * jnp.float32(0.5))

    def body(b, carry):
        st = list(carry)
        for t in range(T):
            for c in range(n_chains):
                ia, ib = 2 * c + t % 2, 2 * c + 1 - t % 2
                st[ib] = _step_math(st[ia], st[ib], flavour)
        return tuple(st)

    final = lax.fori_loop(jnp.int32(0), jnp.int32(n_steps // T), body,
                          tuple(init))
    acc = final[0]
    for c in range(1, n_chains):
        acc = acc + final[2 * c]
    out_ref[...] = acc


def _grid_kernel(seed_ref, out_ref, state, *, n_chains, flavour):
    """One grid step per T diagonals; scratch persists across grid steps."""
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        for c in range(n_chains):
            state[2 * c] = seed_ref[...] + jnp.float32(c)
            state[2 * c + 1] = seed_ref[...] * jnp.float32(0.5)

    for t in range(T):
        for c in range(n_chains):
            sa = 2 * c + t % 2
            sb = 2 * c + 1 - t % 2
            state[sb] = _step_math(state[sa], state[sb], flavour)

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        acc = state[0]
        for c in range(1, n_chains):
            acc = acc + state[2 * c]
        out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("slab", "n_chains", "flavour",
                                             "mode", "n_steps"))
def run_chain(seed, slab, n_chains, flavour, mode, n_steps=N_STEPS):
    seed_arr = jnp.broadcast_to(seed, slab).astype(jnp.float32)
    params = pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024)
    if mode == "scratch":
        kernel = functools.partial(_scratch_kernel, n_steps=n_steps,
                                   n_chains=n_chains, flavour=flavour)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(slab, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((2 * n_chains,) + slab, jnp.float32)],
            compiler_params=params,
        )(seed_arr)
    if mode == "value":
        kernel = functools.partial(_value_kernel, n_steps=n_steps,
                                   n_chains=n_chains, flavour=flavour)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(slab, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=params,
        )(seed_arr)
    kernel = functools.partial(_grid_kernel, n_chains=n_chains,
                               flavour=flavour)
    return pl.pallas_call(
        kernel,
        grid=(n_steps // T,),
        out_shape=jax.ShapeDtypeStruct(slab, jnp.float32),
        in_specs=[pl.BlockSpec(slab, lambda b: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(slab, lambda b: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2 * n_chains,) + slab, jnp.float32)],
        compiler_params=params,
    )(seed_arr)


def _best_wall(slab, n_chains, flavour, mode, n_steps, reps=3):
    out = run_chain(jnp.float32(1.0), slab, n_chains, flavour, mode, n_steps)
    float(out.ravel()[0])  # compile + warm
    best = float("inf")
    for i in range(reps):
        s = jnp.float32(1.0 + 1e-6 * (i + 1))
        float(s)  # materialise
        t0 = time.perf_counter()
        out = run_chain(s, slab, n_chains, flavour, mode, n_steps)
        float(out.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def measure(slab, n_chains, flavour, mode, reps=3):
    """Slope-based per-step cost: (wall(N2) - wall(N1)) / (N2 - N1).

    A single dispatch through the remote relay costs ~27 ms fixed -- at
    N=4096 steps EVERY config walls at ~27 ms and 'per-step' numbers are
    pure dispatch artifact (this bit round 2's stage profiles too). The
    slope of two step counts in one dispatch each cancels it.
    """
    n1, n2 = N_STEPS, N_STEPS * 8
    try:
        t1 = _best_wall(slab, n_chains, flavour, mode, n1, reps)
        t2 = _best_wall(slab, n_chains, flavour, mode, n2, reps)
    except Exception as e:
        print(f"slab={slab!s:12} chains={n_chains} {flavour:6} {mode:8} "
              f"-> FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
        return None
    us = (t2 - t1) / (n2 - n1) * 1e6
    print(f"slab={slab!s:12} chains={n_chains} {flavour:6} {mode:8} "
          f"-> {us:7.4f} us/step ({us / n_chains:7.4f} us/chain-step; "
          f"walls {t1*1e3:.1f} / {t2*1e3:.1f} ms)", flush=True)
    return us


def main():
    quick = "quick" in sys.argv
    print("devices:", jax.devices(), flush=True)

    # 1. floor vs slab size, scratch mode (the production dataflow)
    for slab in [(8, 256), (8, 2048), (64, 2048), (128, 2048), (256, 2048)]:
        measure(slab, 1, "add", "scratch")
    # 2. value-carry mode: registers if it fits
    for slab in [(8, 256), (8, 2048), (64, 2048), (128, 2048)]:
        measure(slab, 1, "add", "value")
    # 3. the real scheme math both ways at the production slab
    measure((64, 2048), 1, "scheme", "scratch")
    measure((64, 2048), 1, "scheme", "value")
    measure((128, 2048), 1, "scheme", "value")
    # 4. interleaved independent chains
    for n_chains in (2, 4):
        measure((64, 2048), n_chains, "add", "scratch")
        measure((64, 2048), n_chains, "scheme", "value")
    # 5. grid-loop flavour
    if not quick:
        measure((64, 2048), 1, "add", "grid")
        measure((64, 2048), 1, "scheme", "grid")


if __name__ == "__main__":
    main()
