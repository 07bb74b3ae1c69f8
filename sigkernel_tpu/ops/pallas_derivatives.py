"""Pallas fused triple wavefront: kernel + first/second directional
derivatives in one sweep.

The native accelerator tier for ``k_kgrad`` (reference
sigkernel/cuda_backend.py:165-223 runs this fused triple on CUDA; round 1
only had the scan tier on TPU). Three coupled states ``(K, K_diff,
K_diffdiff)`` advance together along anti-diagonals; the product-rule
recurrences (f1..f4 / g1..g4) are the ones proven in
:func:`..ops.scan_solver.solve_derivatives_final` and the C++ solver.

Structure mirrors :mod:`.pallas_solver`: sheared diagonal-major streaming
(three increment planes), ping-pong VMEM states, batched double-buffered
DMA, dual slab layouts, transpose covariance (the recurrences are symmetric
in the 01/10 neighbours, so the final corners are transpose-invariant).
f32; f64-grade derivative solves stay on the scan tier.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_solver import (MAX_ROWS, IN_OFF, _ix, _pad_shear,
                            _extract_final, _chunk_map, pair_chunk)

DMA_BATCH = 2  # three ibuf planes per slot


def supported(inc) -> bool:
    """TPU backend + fits the VMEM row bound on the shorter side."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    if platform not in ("tpu", "axon"):
        return False
    MM, NN = inc.shape[-2], inc.shape[-1]
    return MM > 0 and NN > 0 and min(MM, NN) + 1 <= MAX_ROWS


def _deriv_kernel(u_hbm, ud_hbm, us_hbm, outk_ref, outd_ref, outs_ref,
                  kst, dst, sst, ibu, ibd, ibs, isem, carry,
                  *, n_steps, MM, row_axis, refine=1, NN=None,
                  window_seg=0):
    """Triple-state wavefront (higher-order scheme for K, coupled
    product-rule recurrences for the derivative states). ``refine > 1``
    consumes row-stretched base streams (select + roll per step + a carry
    of the previous diagonal; see pallas_solver._wavefront_kernel)."""
    T = DMA_BATCH
    f = refine
    slab = kst.shape[1:]
    n_slots = pl.cdiv(n_steps, f) if f > 1 else n_steps
    n_batches = pl.cdiv(n_slots, T)
    in_off = IN_OFF if f == 1 else 0
    ii = lax.broadcasted_iota(jnp.int32, slab, row_axis)
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)

    # Lane-window phase plan (see pallas_solver._window_phases): the
    # derivative recurrences share the K scheme's constant-continuation
    # invariant (u = ud = us = 0 reproduces each state's value), so
    # frozen rows outside the window equal full compute.
    from .pallas_solver import _window_phases
    spb = T * f if f > 1 else T
    phases = None
    if window_seg and row_axis == 1 and NN is not None:
        phases = _window_phases(n_batches, spb, n_steps, NN, slab[1],
                                window_seg)

    kst[0] = jnp.ones(slab, jnp.float32)
    kst[1] = jnp.ones(slab, jnp.float32)
    dst[0] = jnp.zeros(slab, jnp.float32)
    dst[1] = jnp.zeros(slab, jnp.float32)
    sst[0] = jnp.zeros(slab, jnp.float32)
    sst[1] = jnp.zeros(slab, jnp.float32)

    def in_copies(b, slot):
        ds = pl.ds(_ix(b * T + in_off), T)
        return (
            pltpu.make_async_copy(u_hbm.at[ds],
                                  ibu.at[_ix(slot)], isem.at[_ix(slot)]),
            pltpu.make_async_copy(ud_hbm.at[ds],
                                  ibd.at[_ix(slot)], isem.at[_ix(2 + slot)]),
            pltpu.make_async_copy(us_hbm.at[ds],
                                  ibs.at[_ix(slot)], isem.at[_ix(4 + slot)]),
        )

    for c in in_copies(0, 0):
        c.start()

    def roll(x):
        return pltpu.roll(x, jnp.int32(1), axis=row_axis)

    def make_body(ws=None, W=None, iiw=None, guarded=True):
        ii_loc = ii if ws is None else iiw

        def sl(ref, *idx):
            v = ref[idx] if len(idx) > 1 else ref[idx[0]]
            return v if ws is None else v[:, ws:ws + W]

        def when_q(q):
            if guarded:
                return pl.when(q < n_steps)
            return lambda fn: fn()

        def step(q, u, ud, us, vm2, vm1):
                k10, p2k = sl(kst, vm1), sl(kst, vm2)
                d10, p2d = sl(dst, vm1), sl(dst, vm2)
                s10, p2s = sl(sst, vm1), sl(sst, vm2)
                k01, k00 = roll(k10), roll(p2k)
                d01, d00 = roll(d10), roll(p2d)
                s01, s00 = roll(s10), roll(p2s)

                u2 = u * u * jnp.float32(1.0 / 12.0)
                k = (k01 + k10) * (1.0 + 0.5 * u + u2) - k00 * (1.0 - u2)

                f1 = k00 * ud + d00 * u
                f2 = k01 * ud + d01 * u
                f3 = k10 * ud + d10 * u
                f4 = k * ud + (d01 + d10 - d00 + f1) * u
                d = d01 + d10 - d00 + 0.25 * (f1 + f2 + f3 + f4)

                g1 = k00 * us + 2.0 * d00 * ud + s00 * u
                g2 = k01 * us + 2.0 * d01 * ud + s01 * u
                g3 = k10 * us + 2.0 * d10 * ud + s10 * u
                g4 = k * us + 2.0 * d * ud + (s01 + s10 - s00 + g1) * u
                s = s01 + s10 - s00 + 0.25 * (g1 + g2 + g3 + g4)

                bnd = (ii_loc == 0) | (ii_loc == q + 2) | (ii_loc > MM)
                k = jnp.where(bnd, one, k)
                d = jnp.where(bnd, zero, d)
                s = jnp.where(bnd, zero, s)
                if ws is not None and ws > 0:
                    # window-bottom margin: keep the frozen values the
                    # roll wrapped over
                    edge = ii_loc == ws
                    k = jnp.where(edge, p2k, k)
                    d = jnp.where(edge, p2d, d)
                    s = jnp.where(edge, p2s, s)
                if ws is None:
                    kst[vm2] = k
                    dst[vm2] = d
                    sst[vm2] = s
                else:
                    kst[vm2, :, ws:ws + W] = k
                    dst[vm2, :, ws:ws + W] = d
                    sst[vm2, :, ws:ws + W] = s

        def body(b, _):
            bslot = lax.rem(b, jnp.int32(2))

            @pl.when(b + 1 < n_batches)
            def _():
                for c in in_copies(b + 1, 1 - bslot):
                    c.start()

            for c in in_copies(b, bslot):
                c.wait()

            for t in range(T):
                if f == 1:
                    q = b * T + t

                    @when_q(q)
                    def _(q=q, t=t):
                        step(q, sl(ibu, bslot, t), sl(ibd, bslot, t),
                             sl(ibs, bslot, t), t % 2, 1 - t % 2)
                else:
                    kk = b * T + t
                    for s_i in range(f):
                        q = kk * f + s_i
                        sp = s_i % 2   # == q % 2 (f even)

                        @when_q(q)
                        def _(q=q, t=t, s_i=s_i, sp=sp):
                            sel = lax.rem(ii_loc, jnp.int32(f)) <= s_i

                            def take(ib, ci):
                                prev = (sl(carry, ci) if t == 0
                                        else sl(ib, bslot, t - 1))
                                pre = jnp.where(sel, sl(ib, bslot, t),
                                                prev)
                                return pltpu.roll(pre, jnp.int32(1),
                                                  axis=row_axis)

                            step(q, take(ibu, 0), take(ibd, 1),
                                 take(ibs, 2), sp, 1 - sp)
            if f > 1:
                carry[0] = ibu[bslot, T - 1]
                carry[1] = ibd[bslot, T - 1]
                carry[2] = ibs[bslot, T - 1]
            return 0
        return body

    if phases is None:
        lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), make_body(), 0)
    else:
        for (b0, b1, ws_p, W_p) in phases:
            iiw = (lax.broadcasted_iota(jnp.int32, (slab[0], W_p), 1)
                   + jnp.int32(ws_p))
            guarded = b1 * spb > n_steps
            lax.fori_loop(jnp.int32(b0), jnp.int32(b1),
                          make_body(ws_p, W_p, iiw, guarded), 0)

    last = (n_steps - 1) % 2
    outk_ref[...] = kst[last]
    outd_ref[...] = dst[last]
    outs_ref[...] = sst[last]


def _solve_one(incs, dyadic_order=0):
    from .pallas_solver import (_layout, _stretch_stream,
                                _aligned_streams_ps, _use_aligned)

    u3, ud3, us3 = incs
    f = 2 ** dyadic_order
    B, Mb, Nb = u3.shape
    MM, NN = Mb * f, Nb * f
    n_steps = MM + NN - 1
    row_axis, slab, _ = _layout(B, MM)
    if f == 1:
        if _use_aligned(B, slab, row_axis):
            sku, skd, sks = _aligned_streams_ps([u3, ud3, us3], 1,
                                                DMA_BATCH, slab)
        else:
            sku, n_steps, row_axis, slab = _pad_shear(u3, DMA_BATCH)
            skd, _, _, _ = _pad_shear(ud3, DMA_BATCH)
            sks, _, _, _ = _pad_shear(us3, DMA_BATCH)
    else:
        sc = jnp.float32(1.0 / (f * f))
        if _use_aligned(B, slab, row_axis):
            sku, skd, sks = _aligned_streams_ps(
                [u3 * sc, ud3 * sc, us3 * sc], f, DMA_BATCH, slab)
        else:
            sku = _stretch_stream(u3 * sc, f, DMA_BATCH, row_axis, slab)
            skd = _stretch_stream(ud3 * sc, f, DMA_BATCH, row_axis, slab)
            sks = _stretch_stream(us3 * sc, f, DMA_BATCH, row_axis, slab)
    from .pallas_solver import WINDOW_SEG

    kernel = functools.partial(_deriv_kernel, n_steps=n_steps, MM=MM,
                               row_axis=row_axis, refine=f, NN=NN,
                               window_seg=WINDOW_SEG)
    outk, outd, outs = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(slab, jnp.float32),) * 3,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
        scratch_shapes=[
            pltpu.VMEM((2,) + slab, jnp.float32),
            pltpu.VMEM((2,) + slab, jnp.float32),
            pltpu.VMEM((2,) + slab, jnp.float32),
            pltpu.VMEM((2, DMA_BATCH) + slab, jnp.float32),
            pltpu.VMEM((2, DMA_BATCH) + slab, jnp.float32),
            pltpu.VMEM((2, DMA_BATCH) + slab, jnp.float32),
            pltpu.SemaphoreType.DMA((6,)),
            pltpu.VMEM((3,) + slab, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(sku, skd, sks)
    return (_extract_final(outk, row_axis, MM, B),
            _extract_final(outd, row_axis, MM, B),
            _extract_final(outs, row_axis, MM, B))


@functools.partial(jax.jit, static_argnames=("dyadic_order",))
def solve_derivatives_final(inc: jnp.ndarray, inc_d: jnp.ndarray,
                            inc_dd: jnp.ndarray, dyadic_order: int = 0):
    """Fused Pallas triple solve.

    ``inc``/``inc_d``/``inc_dd``: (..., M-1, N-1) *base* increment grids,
    refined in-kernel by ``2^dyadic_order`` (pass refined grids with
    ``dyadic_order=0`` for the legacy contract). Returns three arrays with
    the batch shape (final corners of K, K_diff, K_diffdiff), f32.
    """
    batch_shape = inc.shape[:-2]
    f = 2 ** dyadic_order
    Mb, Nb = inc.shape[-2], inc.shape[-1]
    MM, NN = Mb * f, Nb * f
    import math
    B = math.prod(batch_shape)

    def flat(a):
        return a.reshape((B, Mb, Nb)).astype(jnp.float32)

    u3, ud3, us3 = flat(inc), flat(inc_d), flat(inc_dd)
    if MM + 1 > MAX_ROWS:  # transpose covariance (01/10-symmetric updates)
        u3, ud3, us3 = (jnp.swapaxes(a, -1, -2) for a in (u3, ud3, us3))
        MMs, NNs = NN, MM
    else:
        MMs, NNs = MM, NN
    outs = _chunk_map(
        functools.partial(_solve_one, dyadic_order=dyadic_order),
        (u3, ud3, us3), pair_chunk(MMs, NNs, planes=3))
    return tuple(o.reshape(batch_shape) for o in outs)
