"""Fused-increment Pallas wavefront: increments computed IN-KERNEL.

For the linear static kernel the PDE increment grid is a rank-``D`` outer
product of path increments:

    inc[a, b] = <dxr[a], dyr[b]>,   dxr = repeat(diff(X)*scale, 2^d) / 2^d

so the kernel never needs the (refined, sheared) increment grid at all --
the anti-diagonal of increments needed at step ``q`` is produced on the fly
from a per-component rolling shift register:

    S_q[i] = dyr[q + 1 - i]   (zero out of range)
    S_q    = roll(S_{q-1}, 1) with dyr[q + 1] inserted at position 0
    u_q[i] = sum_d DX[d][i] * S_q[d][i],   DX[d][i] = dxr[i - 1][d]

This removes the entire XLA prep pipeline (cast/refine/shear/transpose) and
the HBM increment stream (~33 MB/pair at the benchmark size) -- the kernel's
only inputs are the paths' increments (~KBs/pair), everything else lives in
VMEM. Forward-only, f32, pairs-on-sublanes layout; opt-in via
:func:`gram_linear_f32` until hardware-validated.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_solver import SUBLANES, LANES, _ix, _scheme, _chunk_map
from ..utils import ceil_to


def _fused_kernel(dx_ref, dy_ref, out_ref, state, sreg,
                  *, n_steps, MM, NN, D, naive):
    """dx_ref: (D, P, L) with DX[d, b, i] = dxr[b, i-1, d] (zero pad at i=0).
    dy_ref: (D, P, Ly) with DY[d, b, j] = dyr[b, j, d] (zero padded).
    out_ref: (P, L) final diagonal slab. state: (2, P, L) ping-pong.
    sreg: (D, P, L) rolling shift register of reversed dy increments.
    """
    P, L = state.shape[1], state.shape[2]
    ii = lax.broadcasted_iota(jnp.int32, (P, L), 1)
    one = jnp.float32(1.0)

    state[0] = jnp.ones((P, L), jnp.float32)
    state[1] = jnp.ones((P, L), jnp.float32)
    # S_{-1}[i] = dyr[-i]: only position 0 holds dyr[0]
    for d in range(D):
        sreg[d] = jnp.zeros((P, L), jnp.float32)
        sreg[d, :, 0:1] = dy_ref[d, :, 0:1]

    def body(q, _):
        # advance the shift register: S_q = roll(S_{q-1}) ; S_q[0] = dyr[q+1]
        u = jnp.zeros((P, L), jnp.float32)
        for d in range(D):
            s = pltpu.roll(sreg[d], jnp.int32(1), axis=1)
            head = jnp.where(
                q + 1 < NN,
                jax.lax.dynamic_slice(dy_ref[d], (_ix(0), _ix(q + 1)),
                                      (P, 1)),
                jnp.zeros((P, 1), jnp.float32))
            s = jax.lax.dynamic_update_slice(s, head, (_ix(0), _ix(0)))
            sreg[d] = s
            u = u + dx_ref[d] * s

        vm2_s = lax.rem(q, jnp.int32(2))
        vm1_s = 1 - vm2_s
        vm1 = state[vm1_s]
        k10 = vm1
        k01 = pltpu.roll(vm1, jnp.int32(1), axis=1)
        k00 = pltpu.roll(state[vm2_s], jnp.int32(1), axis=1)
        v = _scheme(k00, k01, k10, u, naive)
        mask = (ii == 0) | (ii == q + 2) | (ii > MM)
        state[vm2_s] = jnp.where(mask, one, v)
        return 0

    lax.fori_loop(jnp.int32(0), jnp.int32(n_steps), body, 0)
    out_ref[...] = state[(n_steps - 1) % 2]


def _refined_increments(paths: jnp.ndarray, dyadic_order: int):
    """(B, len, D) paths -> (B, MM, D) refined f32 increments."""
    f = 2 ** dyadic_order
    d = jnp.diff(paths, axis=-2).astype(jnp.float32)
    d = jnp.repeat(d, f, axis=-2) / jnp.float32(f)
    return d


# pairs per launch: (4 + D) VMEM slabs of (chunk, L) f32 must fit in ~12 MB
FUSED_CHUNK = 128


def _solve_one(dxdy, MM, NN, D, naive):
    dx, dy = dxdy  # (chunk, MM, D), (chunk, NN, D)
    B = dx.shape[0]
    n_steps = MM + NN - 1
    P = ceil_to(B, SUBLANES)
    L = ceil_to(MM + 1, LANES)
    Ly = ceil_to(NN, LANES)

    # DX[d, b, i] = dxr[b, i-1, d]; DY[d, b, j] = dyr[b, j, d]
    DX = jnp.moveaxis(dx, -1, 0)                      # (D, B, MM)
    DX = jnp.pad(DX, ((0, 0), (0, P - B), (1, L - MM - 1)))
    DY = jnp.moveaxis(dy, -1, 0)
    DY = jnp.pad(DY, ((0, 0), (0, P - B), (0, Ly - NN)))

    kernel = functools.partial(_fused_kernel, n_steps=n_steps, MM=MM,
                               NN=NN, D=D, naive=naive)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, P, L), jnp.float32),
            pltpu.VMEM((D, P, L), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(DX, DY)
    return out[:B, MM]


@functools.partial(jax.jit, static_argnames=("dyadic_order", "naive"))
def solve_final_linear(X: jnp.ndarray, Y: jnp.ndarray, scale=1.0,
                       dyadic_order: int = 0,
                       naive: bool = False) -> jnp.ndarray:
    """Fused pairwise solve for the linear kernel: ``K_sig(X^i, Y^i)``.

    ``X``: (B, len_x, D), ``Y``: (B, len_y, D). Returns (B,). Pairs beyond
    ``FUSED_CHUNK`` are processed in sequential VMEM-sized launches.
    """
    B, _, D = X.shape
    dx = _refined_increments(X * jnp.asarray(scale, X.dtype), dyadic_order)
    dy = _refined_increments(Y * jnp.asarray(scale, Y.dtype), dyadic_order)
    MM, NN = dx.shape[1], dy.shape[1]

    if B <= FUSED_CHUNK:
        return _solve_one((dx, dy), MM, NN, D, naive)

    Bp = ceil_to(B, FUSED_CHUNK)
    dx = jnp.pad(dx, ((0, Bp - B), (0, 0), (0, 0)))
    dy = jnp.pad(dy, ((0, Bp - B), (0, 0), (0, 0)))
    nc = Bp // FUSED_CHUNK
    out = jax.lax.map(
        lambda c: _solve_one(c, MM, NN, D, naive),
        (dx.reshape(nc, FUSED_CHUNK, MM, D),
         dy.reshape(nc, FUSED_CHUNK, NN, D)))
    return out.reshape(Bp)[:B]


def gram_linear_f32(X: jnp.ndarray, Y: jnp.ndarray, scale=1.0,
                    dyadic_order: int = 0, naive: bool = False):
    """Fused linear-kernel signature Gram ``(A, B)`` (forward, f32).

    All ``A*B`` pairs are flattened into the fused pairwise solve; path
    increments are tiny, so the pair expansion costs KBs, not the GBs the
    increment-grid route needs.
    """
    A, B = X.shape[0], Y.shape[0]
    Xp = jnp.repeat(X, B, axis=0)          # pair (i, j) -> row i
    Yp = jnp.tile(Y, (A, 1, 1))            # pair (i, j) -> row j
    vals = solve_final_linear(Xp, Yp, scale=scale, dyadic_order=dyadic_order,
                              naive=naive)
    return vals.reshape(A, B)
