"""Pallas (Mosaic) TPU wavefront kernels for the Goursat PDE.

The native TPU tier, playing the role of the reference's hand-written CUDA
backend (reference sigkernel/cuda_backend.py:6-49,121-160) with the CUDA
block grid replaced by lane vectorisation:

- *pairs on lanes*: all path pairs of a tile are updated simultaneously in
  the 128-wide lane dimension;
- *diagonal on sublanes*: one wavefront step updates the entire anti-diagonal
  (up to ``MM+1`` rows) as a single fused VPU op over an ``(L, P)`` block;
- increments are pre-skewed to diagonal-major layout in XLA and streamed
  HBM -> VMEM with double-buffered async DMA, one ``(L, P)`` slab per step;
- the two previous diagonals live in a rotating VMEM scratch; the dependency
  shifts ``K[i-1, *]`` are ``pltpu.roll`` over the sublane axis.

The 1024-thread CUDA limit does not exist here: the diagonal length is bounded
only by VMEM (~8k rows at f32 with 128 lanes), and longer paths fall back to
the scan tier until the blocked kernel lands.

Padding is free: a zero increment makes the update an exact no-op
(``(1+1)*(1+0)-1 = 1``), so padded rows/lanes hold the boundary value 1
forever and never contaminate valid cells (junk flows strictly downward in
``i``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import scan_solver
from ..utils import ceil_to

# lane width and max diagonal rows the single-block kernel supports
LANES = 128
SUBLANES = 8
MAX_ROWS = 8192


def supported(inc: jnp.ndarray) -> bool:
    """Gate for the auto dispatcher: TPU backend + f32 + fits in VMEM."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    if platform not in ("tpu", "axon"):
        return False
    if inc.dtype != jnp.float32:
        return False
    MM, NN = inc.shape[-2], inc.shape[-1]
    if MM == 0 or NN == 0:
        return False
    return MM + 1 <= MAX_ROWS


def _scheme(k00, k01, k10, u, naive):
    if naive:
        return (k01 + k10) * (1.0 + 0.5 * u) - k00
    u2 = u * u * (1.0 / 12.0)
    return (k01 + k10) * (1.0 + 0.5 * u + u2) - k00 * (1.0 - u2)


def _ix(v):
    """Force ref/DMA index operands to int32.

    Under ``jax_enable_x64`` python-int literals become i64 constants, which
    Mosaic's memref slicing rejects (and its i64->i32 conversion path
    recurses), so every dynamic ref index must be wrapped.
    """
    return jnp.asarray(v, jnp.int32)


# diagonals fetched per DMA batch (must be even so the ping-pong slot of an
# in-batch step is static: (b*T + t) % 2 == t % 2)
DMA_BATCH = 4


def _wavefront_kernel(inc_hbm, out_ref, state, ibuf, isem,
                      *, n_steps, MM, L, naive, grid_out):
    """Single-program wavefront sweep.

    ``inc_hbm``: (n_batches*T, L, P) skewed increments in HBM/ANY
    (step-padded to a multiple of ``T = DMA_BATCH``).
    ``out_ref``: final (1, P) VMEM output, or (n_steps, L, P) HBM diagonal
    stack when ``grid_out``.
    ``state``: (2, L, P) VMEM ping-pong diagonals, statically indexed.
    ``ibuf``: (2, T, L, P) VMEM DMA landing slots.
    ``isem``: 2 DMA semaphores (+2 for grid write-back).
    """
    T = DMA_BATCH
    P = state.shape[-1]
    n_batches = pl.cdiv(n_steps, T)
    ii = lax.broadcasted_iota(jnp.int32, (L, P), 0)
    one = jnp.float32(1.0)

    state[0] = jnp.ones((L, P), jnp.float32)  # v_0 (and padding steady-state)
    state[1] = jnp.ones((L, P), jnp.float32)  # v_1

    def in_copy(b, slot):
        return pltpu.make_async_copy(inc_hbm.at[pl.ds(_ix(b * T), T)],
                                     ibuf.at[_ix(slot)], isem.at[_ix(slot)])

    in_copy(0, 0).start()

    def body(b, _):
        bslot = lax.rem(b, jnp.int32(2))

        @pl.when(b + 1 < n_batches)
        def _():
            in_copy(b + 1, 1 - bslot).start()

        in_copy(b, bslot).wait()

        for t in range(T):  # static unroll; slots below are compile-time
            q = b * T + t
            vm2_s, vm1_s = t % 2, 1 - (t % 2)

            @pl.when(q < n_steps)
            def _():
                u = ibuf[bslot, t]
                vm1 = state[vm1_s]
                k10 = vm1
                k01 = pltpu.roll(vm1, jnp.int32(1), axis=0)
                k00 = pltpu.roll(state[vm2_s], jnp.int32(1), axis=0)
                v = _scheme(k00, k01, k10, u, naive)
                mask = (ii == 0) | (ii == q + 2) | (ii > MM)
                v = jnp.where(mask, one, v)

                if grid_out:
                    # the write-back of step q-2 used this same state slot as
                    # its source; it must complete before we overwrite it
                    @pl.when(q >= 2)
                    def _():
                        pltpu.make_async_copy(
                            state.at[vm2_s], out_ref.at[_ix(q - 2)],
                            isem.at[_ix(2 + t % 2)]).wait()
                state[vm2_s] = v
                if grid_out:
                    pltpu.make_async_copy(state.at[vm2_s],
                                          out_ref.at[_ix(q)],
                                          isem.at[_ix(2 + t % 2)]).start()
        return 0

    # int32 loop bounds: under jax_enable_x64 a default (int64) fori index
    # cannot be lowered by Mosaic (its int64->int32 convert path recurses)
    lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), body, 0)

    last = (n_steps - 1) % 2
    if grid_out:
        pltpu.make_async_copy(state.at[last], out_ref.at[_ix(n_steps - 1)],
                              isem.at[_ix(2 + last)]).wait()
        @pl.when(n_steps >= 2)
        def _():
            pltpu.make_async_copy(state.at[1 - last],
                                  out_ref.at[_ix(n_steps - 2)],
                                  isem.at[_ix(2 + (1 - last))]).wait()
    else:
        out_ref[:, :] = state[last, MM:MM + 1, :]


def _pad_skew(inc: jnp.ndarray):
    """(B, MM, NN) f32 -> skewed (n_steps, L, P) with pairs innermost (lanes).

    ``out[q, i, b] = inc[b, i-1, q-i+1]`` (zero out of range). Pads rows to
    the sublane multiple and pairs to the lane multiple with zeros (exact
    no-ops for the PDE update).
    """
    B, MM, NN = inc.shape
    n_steps = MM + NN - 1
    L = ceil_to(MM + 1, SUBLANES)
    P = ceil_to(B, LANES)
    q = jnp.arange(n_steps)[:, None]
    i = jnp.arange(MM + 1)[None, :]
    a = i - 1
    b = q - a
    valid = (a >= 0) & (a < MM) & (b >= 0) & (b < NN)
    a_c = jnp.clip(a, 0, MM - 1)
    b_c = jnp.clip(b, 0, NN - 1)
    vals = inc[:, a_c, b_c]  # (B, n_steps, MM+1)
    vals = jnp.where(valid, vals, jnp.zeros((), inc.dtype))
    sk = jnp.transpose(vals, (1, 2, 0))  # (n_steps, MM+1, B)
    n_steps_pad = ceil_to(n_steps, DMA_BATCH)
    sk = jnp.pad(sk, ((0, n_steps_pad - n_steps), (0, L - (MM + 1)),
                      (0, P - B)))
    return sk, n_steps, L, P


@functools.partial(jax.jit, static_argnames=("naive",))
def solve_final(inc: jnp.ndarray, naive: bool = False) -> jnp.ndarray:
    """Pallas forward solve returning ``K[..., -1, -1]``."""
    batch_shape = inc.shape[:-2]
    MM, NN = inc.shape[-2], inc.shape[-1]
    inc3 = inc.reshape((-1, MM, NN)).astype(jnp.float32)
    sk, n_steps, L, P = _pad_skew(inc3)

    kernel = functools.partial(_wavefront_kernel, n_steps=n_steps, MM=MM,
                               L=L, naive=naive, grid_out=False)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, L, P), jnp.float32),
            pltpu.VMEM((2, DMA_BATCH, L, P), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(sk)
    return out[0, :inc3.shape[0]].reshape(batch_shape)


@functools.partial(jax.jit, static_argnames=("naive",))
def solve_grid(inc: jnp.ndarray, naive: bool = False) -> jnp.ndarray:
    """Pallas solve returning the full ``(..., MM+1, NN+1)`` grid (used by
    the adjoint backward); diagonals are streamed to HBM and unskewed in XLA.
    """
    batch_shape = inc.shape[:-2]
    MM, NN = inc.shape[-2], inc.shape[-1]
    inc3 = inc.reshape((-1, MM, NN)).astype(jnp.float32)
    B = inc3.shape[0]
    sk, n_steps, L, P = _pad_skew(inc3)

    kernel = functools.partial(_wavefront_kernel, n_steps=n_steps, MM=MM,
                               L=L, naive=naive, grid_out=True)
    diags = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_steps, L, P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, L, P), jnp.float32),
            pltpu.VMEM((2, DMA_BATCH, L, P), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(sk)
    # (n_steps, L, P) -> (n_steps, B, MM+1) -> grid (B, MM+1, NN+1)
    diags = diags[:, :MM + 1, :B].transpose(0, 2, 1)
    grid = scan_solver.unskew_grid(diags, MM, NN)
    return grid.reshape(batch_shape + (MM + 1, NN + 1))
