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

from .pallas_solver import SUBLANES, LANES, _scheme, _chunk_map
from ..utils import ceil_to


def _fused_kernel(dx_ref, dy_ref, out_ref, state, sreg, fut,
                  *, n_steps, MM, NN, D, naive):
    """dx_ref: (D, P, L) with DX[d, b, i] = dxr[b, i-1, d] (zero pad at i=0).
    dy_ref: (D, P, Ly) with DY[d, b, j] = dyr[b, j, d] (zero padded).
    out_ref: (P, L) final diagonal slab. state: (2, P, L) ping-pong.
    sreg: (D, P, L) rolling shift register of reversed dy increments.
    fut: (D, P, Ly) "future" register: head (column 0) holds the next value
    to insert; advanced by a LEFT roll + tail zeroing each step. Mosaic has
    no dynamic-index vector loads, so the next head is never *addressed* --
    it arrives at column 0 by rolling (zeros drain in past the end, which
    reproduces the out-of-range-insert-zero semantics exactly).
    """
    P, L = state.shape[1], state.shape[2]
    Ly = fut.shape[2]
    ii = lax.broadcasted_iota(jnp.int32, (P, L), 1)
    jy = lax.broadcasted_iota(jnp.int32, (P, Ly), 1)
    one = jnp.float32(1.0)

    state[0] = jnp.ones((P, L), jnp.float32)
    state[1] = jnp.ones((P, L), jnp.float32)
    # S_{-1}[i] = dyr[-i]: only position 0 holds dyr[0]
    for d in range(D):
        sreg[d] = jnp.zeros((P, L), jnp.float32)
        sreg[d, :, 0:1] = dy_ref[d, :, 0:1]
        # fut[j] = dyr[j + 1]: left-shift dy by one (dy is zero-padded)
        f0 = pltpu.roll(dy_ref[d], jnp.int32(Ly - 1), axis=1)
        fut[d] = jnp.where(jy == Ly - 1, 0.0, f0)

    def body(q, _):
        # advance the shift register: S_q = roll(S_{q-1}) ; S_q[0] = dyr[q+1]
        u = jnp.zeros((P, L), jnp.float32)
        for d in range(D):
            head = fut[d][:, 0:1]                     # dyr[q + 1] (or 0)
            s = pltpu.roll(sreg[d], jnp.int32(1), axis=1)
            s = jnp.where(ii == 0, jnp.broadcast_to(head, (P, L)), s)
            sreg[d] = s
            fn = pltpu.roll(fut[d], jnp.int32(Ly - 1), axis=1)
            fut[d] = jnp.where(jy == Ly - 1, 0.0, fn)
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


def supported(M: int, N: int, D: int, dyadic_order: int) -> bool:
    """Can the fused kernels run this problem? TPU backend + the refined
    row slab (and every per-component register slab) within the VMEM
    budget. The RBF-dyadic kernel is the hungriest: ~(4D + 10) slabs of
    (FUSED_CHUNK, L) f32."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    if platform not in ("tpu", "axon"):
        return False
    f = 2 ** dyadic_order
    MM = f * (M - 1)
    L = ceil_to(MM + 1, LANES)
    slabs = 4 * D + 10
    return M > 1 and N > 1 and \
        slabs * FUSED_CHUNK * L * 4 <= 90 * 1024 * 1024


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
            pltpu.VMEM((D, P, Ly), jnp.float32),
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

    return _chunk_map(lambda c: _solve_one(c, MM, NN, D, naive),
                      (dx, dy), FUSED_CHUNK)


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


# ---------------------------------------------------------------------------
# Fused RBF (dyadic_order = 0): increments from rolling exp-Gram diagonals
# ---------------------------------------------------------------------------

def _fused_rbf_kernel(px_ref, ypts_ref, sxa_ref, syrow_ref, ry0_ref,
                      sys0_ref, g0_ref, out_ref, state, ry, sys, gd,
                      fy, fs, *, n_steps, MM, N, D, inv_sigma, naive):
    """Increments generated in-kernel for the RBF static kernel.

    ``G[a, b] = exp((2<x_a, y_b> - |x_a|^2 - |y_b|^2) / sigma)`` on the base
    point grid; the double difference of ``G`` is assembled from three
    rolling G-diagonals (``p``, ``p+1``, ``p+2``). The inner-product diagonal
    uses the same rolling shift register as the linear fusion, over path
    POINTS instead of increments.

    px_ref: (D, P, L) with PX[d, b, a] = x[b, a, d].
    ypts_ref: (D, P, Ly) y points (insert source). sxa_ref: (P, L) |x_a|^2.
    syrow_ref: (P, Ly) |y_b|^2. ry0/sys0: initial registers (state for
    diagonal p=1). g0_ref: (2, P, L) initial G diagonals p=0,1.
    Scratch: state (2,P,L) solution ping-pong; ry (D,P,L) point register;
    sys (P,L) |y|^2 register; gd (3,P,L) rolling G diagonals; fy (D,P,Ly) /
    fs (P,Ly) future registers delivering y[q+2] / |y[q+2]|^2 at column 0
    by left rolls (no dynamic-index loads on Mosaic).
    """
    P, L = state.shape[1], state.shape[2]
    Ly = fy.shape[2]
    ii = lax.broadcasted_iota(jnp.int32, (P, L), 1)
    jy = lax.broadcasted_iota(jnp.int32, (P, Ly), 1)
    one = jnp.float32(1.0)

    state[0] = jnp.ones((P, L), jnp.float32)
    state[1] = jnp.ones((P, L), jnp.float32)
    for d in range(D):
        ry[d] = ry0_ref[d]
        # fy[j] = y[j + 2] (zeros drain in past the end, matching the
        # out-of-range-insert-zero semantics of the original formulation)
        f0 = pltpu.roll(ypts_ref[d], jnp.int32(Ly - 2), axis=1)
        fy[d] = jnp.where(jy >= Ly - 2, 0.0, f0)
    sys[...] = sys0_ref[...]
    s0 = pltpu.roll(syrow_ref[...], jnp.int32(Ly - 2), axis=1)
    fs[...] = jnp.where(jy >= Ly - 2, 0.0, s0)
    gd[0] = g0_ref[0]   # G diagonal p = q   (starts at p=0)
    gd[1] = g0_ref[1]   # G diagonal p = q+1 (starts at p=1)

    def advance(reg):
        nxt = pltpu.roll(reg, jnp.int32(Ly - 1), axis=1)
        return jnp.where(jy == Ly - 1, 0.0, nxt)

    def body(q, _):
        # advance the point registers to hold y[q+2-a] at position a
        ip = jnp.zeros((P, L), jnp.float32)
        for d in range(D):
            head = fy[d][:, 0:1]                       # y[q + 2] (or 0)
            r = pltpu.roll(ry[d], jnp.int32(1), axis=1)
            r = jnp.where(ii == 0, jnp.broadcast_to(head, (P, L)), r)
            ry[d] = r
            fy[d] = advance(fy[d])
            ip = ip + px_ref[d] * r
        shead = fs[:, 0:1]
        s = pltpu.roll(sys[...], jnp.int32(1), axis=1)
        s = jnp.where(ii == 0, jnp.broadcast_to(shead, (P, L)), s)
        sys[...] = s
        fs[...] = advance(fs[...])

        # new G diagonal p = q+2 and the double difference
        g_new = jnp.exp((2.0 * ip - sxa_ref[...] - s)
                        * jnp.float32(inv_sigma))
        s2 = lax.rem(q, jnp.int32(3))          # slot of diagonal p = q
        s1 = lax.rem(q + 1, jnp.int32(3))      # p = q+1
        s0 = lax.rem(q + 2, jnp.int32(3))      # p = q+2 (to be written)
        g_q = gd[s2]
        g_q1 = gd[s1]
        u = (g_new + pltpu.roll(g_q, jnp.int32(1), axis=1)
             - g_q1 - pltpu.roll(g_q1, jnp.int32(1), axis=1))
        gd[s0] = g_new

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


def _rbf_one(xy, M, N, D, inv_sigma, naive):
    x, y = xy  # (chunk, M, D) f32 points, (chunk, N, D)
    B = x.shape[0]
    MM, NN = M - 1, N - 1
    n_steps = MM + NN - 1
    P = ceil_to(B, SUBLANES)
    L = ceil_to(M, LANES)
    Ly = ceil_to(N, LANES)

    xp = jnp.pad(x, ((0, P - B), (0, L - M), (0, 0)))
    yp = jnp.pad(y, ((0, P - B), (0, Ly - N), (0, 0)))
    PX = jnp.moveaxis(xp, -1, 0)                  # (D, P, L): x[b, a, d]
    YP = jnp.moveaxis(yp, -1, 0)                  # (D, P, Ly)
    SxA = jnp.sum(xp * xp, axis=-1)               # (P, L)
    SyR = jnp.sum(yp * yp, axis=-1)               # (P, Ly)

    # registers as they must look BEFORE the q=0 advance (state for p=1):
    # ry[a] = y[1-a]: positions 0,1 hold y[1], y[0]
    y0 = yp[:, 0, :]
    y1 = yp[:, 1, :] if N > 1 else jnp.zeros_like(y0)
    ry0 = jnp.zeros((P, L, D), jnp.float32)
    ry0 = ry0.at[:, 0, :].set(y1).at[:, 1, :].set(y0)
    ry0 = jnp.moveaxis(ry0, -1, 0)                # (D, P, L)
    sys0 = jnp.zeros((P, L), jnp.float32)
    sys0 = sys0.at[:, 0].set(jnp.sum(y1 * y1, -1))
    sys0 = sys0.at[:, 1].set(jnp.sum(y0 * y0, -1))

    def g_of(a_pts, b_pts):  # exp kernel of two (P, D) point sets
        d2 = jnp.sum((a_pts - b_pts) ** 2, axis=-1)
        return jnp.exp(-d2 * jnp.float32(inv_sigma))

    x0 = xp[:, 0, :]
    x1 = xp[:, 1, :] if M > 1 else jnp.zeros_like(x0)
    g0 = jnp.zeros((2, P, L), jnp.float32)
    g0 = g0.at[0, :, 0].set(g_of(x0, y0))                    # G[0,0]
    g0 = g0.at[1, :, 0].set(g_of(x0, y1))                    # G[0,1]
    g0 = g0.at[1, :, 1].set(g_of(x1, y0))                    # G[1,0]

    kernel = functools.partial(_fused_rbf_kernel, n_steps=n_steps, MM=MM,
                               N=N, D=D, inv_sigma=inv_sigma, naive=naive)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, P, L), jnp.float32),
            pltpu.VMEM((D, P, L), jnp.float32),
            pltpu.VMEM((P, L), jnp.float32),
            pltpu.VMEM((3, P, L), jnp.float32),
            pltpu.VMEM((D, P, Ly), jnp.float32),
            pltpu.VMEM((P, Ly), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(PX, YP, SxA, SyR, ry0, sys0, g0)
    return out[:B, MM]


# ---------------------------------------------------------------------------
# Fused RBF at dyadic_order >= 1: stretched-register formulation
#
# The refined increment is dd_base[(i-1)//f, (q+1-i)//f] / f^2, and the
# rolling y-point register stays a *pure roll* at any refinement factor:
# R_q[i] = y[(q+1-i)//f] satisfies R_q[i] = R_{q-1}[i-1] with head
# R_q[0] = y[(q+1)//f]. With row-stretched x streams (PX[i] = x[(i-1)//f],
# PX1 = x[.. + 1], static) and two register banks (columns C and C+1), the
# four Gram corners are generated per cell per step (4 exps; the dyadic-0
# kernel's rolled-diagonal reuse breaks under the 2-D stretch).
# ---------------------------------------------------------------------------

def _fused_rbf_dyadic_kernel(px_ref, px1_ref, sxa_ref, sxa1_ref, ypts_ref,
                             ynrm_ref, out_ref, state, ry, ry1, sy, sy1,
                             fy, fy1, fs, fs1,
                             *, n_steps, MM, N, D, f, inv_f2, naive):
    """px/px1: (D, P, L) stretched x points; sxa/sxa1: (P, L) their square
    norms. ypts: (D, P, Ly); ynrm: (P, Ly). Registers ry/ry1 (D, P, L) and
    sy/sy1 (P, L) hold y[(q+1-i)//f] / y[.. + 1] and their norms. The
    heads y[(q+1)//f] / y[(q+1)//f + 1] are delivered at column 0 of the
    future registers fy/fy1 (D, P, Ly) and fs/fs1 (P, Ly), which left-roll
    once every ``f`` steps (Mosaic has no dynamic-index vector loads).
    Out-of-range heads drain in as zeros where the original clamped to
    y[N-1]; both are consumed only by off-grid cells (never read back by
    any valid cell), so the valid region is bit-identical."""
    P, L = state.shape[1], state.shape[2]
    Ly = fy.shape[2]
    ii = lax.broadcasted_iota(jnp.int32, (P, L), 1)
    jy = lax.broadcasted_iota(jnp.int32, (P, Ly), 1)
    one = jnp.float32(1.0)

    state[0] = jnp.ones((P, L), jnp.float32)
    state[1] = jnp.ones((P, L), jnp.float32)
    # pre-advance init: row 0 holds y[0] / y[1] (consumed valid only there)
    for d in range(D):
        ry[d] = jnp.zeros((P, L), jnp.float32)
        ry[d, :, 0:1] = ypts_ref[d, :, 0:1]
        ry1[d] = jnp.zeros((P, L), jnp.float32)
        ry1[d, :, 0:1] = ypts_ref[d, :, 1:2] if N > 1 \
            else jnp.zeros((P, 1), jnp.float32)
        # future heads: fy[j] = y[j] (head y[0]), fy1[j] = y[j + 1]
        fy[d] = ypts_ref[d]
        f1 = pltpu.roll(ypts_ref[d], jnp.int32(Ly - 1), axis=1)
        fy1[d] = jnp.where(jy == Ly - 1, 0.0, f1)
    sy[...] = jnp.zeros((P, L), jnp.float32)
    sy[:, 0:1] = ynrm_ref[:, 0:1]
    sy1[...] = jnp.zeros((P, L), jnp.float32)
    sy1[:, 0:1] = ynrm_ref[:, 1:2] if N > 1 \
        else jnp.zeros((P, 1), jnp.float32)
    fs[...] = ynrm_ref[...]
    s1i = pltpu.roll(ynrm_ref[...], jnp.int32(Ly - 1), axis=1)
    fs1[...] = jnp.where(jy == Ly - 1, 0.0, s1i)

    def body(q, _):
        # the head column index (q + 1) // f increments exactly when
        # (q + 1) % f == 0: advance the future registers then, before use
        adv = lax.rem(q + 1, jnp.int32(f)) == 0

        def step(reg):
            nxt = pltpu.roll(reg, jnp.int32(Ly - 1), axis=1)
            nxt = jnp.where(jy == Ly - 1, 0.0, nxt)
            return jnp.where(adv, nxt, reg)

        ip = jnp.zeros((P, L), jnp.float32)    # PX . R
        ip1 = jnp.zeros((P, L), jnp.float32)   # PX1 . R
        jp = jnp.zeros((P, L), jnp.float32)    # PX . R'
        jp1 = jnp.zeros((P, L), jnp.float32)   # PX1 . R'
        for d in range(D):
            fy[d] = step(fy[d])
            fy1[d] = step(fy1[d])
            r = pltpu.roll(ry[d], jnp.int32(1), axis=1)
            r = jnp.where(ii == 0,
                          jnp.broadcast_to(fy[d][:, 0:1], (P, L)), r)
            ry[d] = r
            r1 = pltpu.roll(ry1[d], jnp.int32(1), axis=1)
            r1 = jnp.where(ii == 0,
                           jnp.broadcast_to(fy1[d][:, 0:1], (P, L)), r1)
            ry1[d] = r1
            ip = ip + px_ref[d] * r
            ip1 = ip1 + px1_ref[d] * r
            jp = jp + px_ref[d] * r1
            jp1 = jp1 + px1_ref[d] * r1
        fs[...] = step(fs[...])
        fs1[...] = step(fs1[...])
        s = pltpu.roll(sy[...], jnp.int32(1), axis=1)
        s = jnp.where(ii == 0, jnp.broadcast_to(fs[:, 0:1], (P, L)), s)
        sy[...] = s
        s1 = pltpu.roll(sy1[...], jnp.int32(1), axis=1)
        s1 = jnp.where(ii == 0, jnp.broadcast_to(fs1[:, 0:1], (P, L)), s1)
        sy1[...] = s1

        g00 = jnp.exp(2.0 * ip - sxa_ref[...] - s)
        g01 = jnp.exp(2.0 * jp - sxa_ref[...] - s1)
        g10 = jnp.exp(2.0 * ip1 - sxa1_ref[...] - s)
        g11 = jnp.exp(2.0 * jp1 - sxa1_ref[...] - s1)
        u = (g11 + g00 - g10 - g01) * jnp.float32(inv_f2)

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


def _rbf_dyadic_one(xy, M, N, D, f, naive):
    x, y = xy  # (chunk, M, D) pre-scaled f32 points, (chunk, N, D)
    B = x.shape[0]
    MM, NN = f * (M - 1), f * (N - 1)
    n_steps = MM + NN - 1
    P = ceil_to(B, SUBLANES)
    L = ceil_to(MM + 1, LANES)
    Ly = ceil_to(N, LANES)

    xp = jnp.pad(x, ((0, P - B), (0, 0), (0, 0)))
    yp = jnp.pad(y, ((0, P - B), (0, Ly - N), (0, 0)))
    # stretched x streams: PX[i] = x[(i-1)//f], PX1[i] = x[(i-1)//f + 1]
    # (row 0 is boundary; repeat+pad keeps everything copy-only)
    xs = jnp.repeat(xp, f, axis=1)                       # rows 1..MM
    PX = jnp.pad(xs[:, :MM, :], ((0, 0), (1, L - MM - 1), (0, 0)))
    xs1 = jnp.repeat(xp[:, 1:, :], f, axis=1)
    PX1 = jnp.pad(xs1[:, :MM, :], ((0, 0), (1, L - MM - 1), (0, 0)))
    SXA = jnp.sum(PX * PX, axis=-1)                      # (P, L)
    SXA1 = jnp.sum(PX1 * PX1, axis=-1)
    PX = jnp.moveaxis(PX, -1, 0)                         # (D, P, L)
    PX1 = jnp.moveaxis(PX1, -1, 0)
    YP = jnp.moveaxis(yp, -1, 0)                         # (D, P, Ly)
    SyR = jnp.sum(yp * yp, axis=-1)                      # (P, Ly)

    kernel = functools.partial(_fused_rbf_dyadic_kernel, n_steps=n_steps,
                               MM=MM, N=N, D=D, f=f,
                               inv_f2=1.0 / (f * f), naive=naive)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, P, L), jnp.float32),
            pltpu.VMEM((D, P, L), jnp.float32),
            pltpu.VMEM((D, P, L), jnp.float32),
            pltpu.VMEM((P, L), jnp.float32),
            pltpu.VMEM((P, L), jnp.float32),
            pltpu.VMEM((D, P, Ly), jnp.float32),
            pltpu.VMEM((D, P, Ly), jnp.float32),
            pltpu.VMEM((P, Ly), jnp.float32),
            pltpu.VMEM((P, Ly), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(PX, PX1, SXA, SXA1, YP, SyR)
    return out[:B, MM]


@functools.partial(jax.jit, static_argnames=("naive",))
def solve_final_rbf(X: jnp.ndarray, Y: jnp.ndarray, sigma,
                    naive: bool = False) -> jnp.ndarray:
    """Fused pairwise RBF solve at dyadic_order=0: ``K_sig(X^i, Y^i)``.

    ``X``: (B, len_x, D), ``Y``: (B, len_y, D). Returns (B,). ``sigma`` stays
    a traced operand (differentiable/jit-sweepable): the kernel bakes
    ``inv_sigma = 1`` and the bandwidth enters by pre-scaling the points with
    ``rsqrt(sigma)`` -- ``|x - y|^2 / sigma == |x/sqrt(sigma) - y/sqrt(sigma)|^2``
    exactly as the kernel computes it.
    """
    B, M, D = X.shape
    N = Y.shape[1]
    r = lax.rsqrt(jnp.asarray(sigma, jnp.float32))
    x = X.astype(jnp.float32) * r
    y = Y.astype(jnp.float32) * r

    return _chunk_map(lambda c: _rbf_one(c, M, N, D, 1.0, naive),
                      (x, y), FUSED_CHUNK)


@functools.partial(jax.jit, static_argnames=("dyadic_order", "naive"))
def solve_final_rbf_dyadic(X: jnp.ndarray, Y: jnp.ndarray, sigma,
                           dyadic_order: int,
                           naive: bool = False) -> jnp.ndarray:
    """Fused pairwise RBF solve at any dyadic order (stretched registers,
    4 in-kernel exps per cell). ``sigma`` stays traced (rsqrt pre-scale)."""
    B, M, D = X.shape
    N = Y.shape[1]
    f = 2 ** dyadic_order
    r = lax.rsqrt(jnp.asarray(sigma, jnp.float32))
    x = X.astype(jnp.float32) * r
    y = Y.astype(jnp.float32) * r

    return _chunk_map(lambda c: _rbf_dyadic_one(c, M, N, D, f, naive),
                      (x, y), FUSED_CHUNK)
