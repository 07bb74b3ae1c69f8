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


def _deriv_kernel_df(uh_hbm, ul_hbm, udh_hbm, udl_hbm, ush_hbm, usl_hbm,
                     outk_ref, outd_ref, outs_ref, st, ib, isem, carry,
                     *, n_steps, MM, row_axis, refine=1):
    """Double-double triple wavefront: the f64-grade tier of the fused
    derivatives solve (reference spec: the f64 Cython derivatives at
    sigkernel/cython_backend.pyx:122-176). All three states and the
    product-rule recurrences run in (hi, lo) double-float pairs.

    ``st``: (6, 2, *slab) state planes ((K, D, S) x (hi, lo), ping-pong in
    the second axis); ``ib``: (6, 2, T, *slab) stream landing buffers in
    the same (plane-major) order; ``carry``: (6, *slab) previous-diagonal
    carries for the in-kernel refinement select. Outputs are the hi+lo
    final slabs summed in f32 pairs (caller combines to f64).
    """
    from .pallas_df64 import (_df_add, _df_mul, _df_mul_const, _df_scheme)

    T = DMA_BATCH
    f = refine
    slab = st.shape[2:]
    n_slots = pl.cdiv(n_steps, f) if f > 1 else n_steps
    n_batches = pl.cdiv(n_slots, T)
    in_off = IN_OFF if f == 1 else 0
    ii = lax.broadcasted_iota(jnp.int32, slab, row_axis)
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)

    hbms = (uh_hbm, ul_hbm, udh_hbm, udl_hbm, ush_hbm, usl_hbm)
    for pidx in range(6):
        init = one if pidx == 0 else zero   # K hi = 1; everything else 0
        st[pidx, 0] = jnp.full(slab, init, jnp.float32)
        st[pidx, 1] = jnp.full(slab, init, jnp.float32)

    def in_copies(b, slot):
        ds = pl.ds(_ix(b * T + in_off), T)
        return tuple(
            pltpu.make_async_copy(hbms[pidx].at[ds],
                                  ib.at[_ix(pidx), _ix(slot)],
                                  isem.at[_ix(2 * pidx + slot)])
            for pidx in range(6))

    for c in in_copies(0, 0):
        c.start()

    def roll(x):
        return pltpu.roll(x, jnp.int32(1), axis=row_axis)

    def rollp(p):
        return roll(p[0]), roll(p[1])

    def step(q, u, ud, us, vm2, vm1):
        k10 = (st[0, vm1], st[1, vm1])
        p2k = (st[0, vm2], st[1, vm2])
        d10 = (st[2, vm1], st[3, vm1])
        p2d = (st[2, vm2], st[3, vm2])
        s10 = (st[4, vm1], st[5, vm1])
        p2s = (st[4, vm2], st[5, vm2])
        k01, k00 = rollp(k10), rollp(p2k)
        d01, d00 = rollp(d10), rollp(p2d)
        s01, s00 = rollp(s10), rollp(p2s)

        k = _df_scheme(k00[0], k00[1], k01[0], k01[1], k10[0], k10[1],
                       u[0], u[1], False)

        def mul(a, b):
            return _df_mul(a[0], a[1], b[0], b[1])

        def add(a, b):
            return _df_add(a[0], a[1], b[0], b[1])

        def sub(a, b):
            return _df_add(a[0], a[1], -b[0], -b[1])

        def scale(a, c):
            return _df_mul_const(a[0], a[1], c)

        f1 = add(mul(k00, ud), mul(d00, u))
        f2 = add(mul(k01, ud), mul(d01, u))
        f3 = add(mul(k10, ud), mul(d10, u))
        dsum = sub(add(d01, d10), d00)
        f4 = add(mul(k, ud), mul(add(dsum, f1), u))
        d = add(dsum, scale(add(add(f1, f2), add(f3, f4)), 0.25))

        g1 = add(add(mul(k00, us), scale(mul(d00, ud), 2.0)), mul(s00, u))
        g2 = add(add(mul(k01, us), scale(mul(d01, ud), 2.0)), mul(s01, u))
        g3 = add(add(mul(k10, us), scale(mul(d10, ud), 2.0)), mul(s10, u))
        ssum = sub(add(s01, s10), s00)
        g4 = add(add(mul(k, us), scale(mul(d, ud), 2.0)),
                 mul(add(ssum, g1), u))
        sv = add(ssum, scale(add(add(g1, g2), add(g3, g4)), 0.25))

        bnd = (ii == 0) | (ii == q + 2) | (ii > MM)
        outs = ((jnp.where(bnd, one, k[0]), jnp.where(bnd, zero, k[1])),
                (jnp.where(bnd, zero, d[0]), jnp.where(bnd, zero, d[1])),
                (jnp.where(bnd, zero, sv[0]), jnp.where(bnd, zero, sv[1])))
        for pidx, pair in enumerate(outs):
            st[2 * pidx, vm2] = pair[0]
            st[2 * pidx + 1, vm2] = pair[1]

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

                @pl.when(q < n_steps)
                def _(q=q, t=t):
                    step(q, (ib[0, bslot, t], ib[1, bslot, t]),
                         (ib[2, bslot, t], ib[3, bslot, t]),
                         (ib[4, bslot, t], ib[5, bslot, t]),
                         t % 2, 1 - t % 2)
            else:
                kk = b * T + t
                for s_i in range(f):
                    q = kk * f + s_i
                    sp = s_i % 2   # == q % 2 (f even)

                    @pl.when(q < n_steps)
                    def _(q=q, t=t, s_i=s_i, sp=sp):
                        sel = lax.rem(ii, jnp.int32(f)) <= s_i

                        def take(pidx):
                            prev = (carry[pidx] if t == 0
                                    else ib[pidx, bslot, t - 1])
                            pre = jnp.where(sel, ib[pidx, bslot, t], prev)
                            return roll(pre)

                        step(q, (take(0), take(1)), (take(2), take(3)),
                             (take(4), take(5)), sp, 1 - sp)
        if f > 1:
            for pidx in range(6):
                carry[pidx] = ib[pidx, bslot, T - 1]
        return 0

    lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), body, 0)

    last = (n_steps - 1) % 2
    outk_ref[0], outk_ref[1] = st[0, last], st[1, last]
    outd_ref[0], outd_ref[1] = st[2, last], st[3, last]
    outs_ref[0], outs_ref[1] = st[4, last], st[5, last]


def _solve_one_df(incs, dyadic_order=0):
    from .pallas_solver import (_layout, _stretch_stream,
                                _aligned_streams_ps, _use_aligned)
    from .pallas_df64 import _split_hi_lo

    u64, ud64, us64 = incs
    f = 2 ** dyadic_order
    B, Mb, Nb = u64.shape
    MM, NN = Mb * f, Nb * f
    n_steps = MM + NN - 1
    row_axis, slab, _ = _layout(B, MM)

    comps = []
    for a in (u64, ud64, us64):
        hi, lo = _split_hi_lo(a)
        comps += [hi, lo]
    if f == 1:
        if _use_aligned(B, slab, row_axis):
            streams = _aligned_streams_ps(comps, 1, DMA_BATCH, slab)
        else:
            s0, n_steps, row_axis, slab = _pad_shear(comps[0], DMA_BATCH)
            streams = [s0] + [_pad_shear(c, DMA_BATCH)[0]
                              for c in comps[1:]]
    else:
        sc = jnp.float32(1.0 / (f * f))
        scaled = [c * sc for c in comps]
        if _use_aligned(B, slab, row_axis):
            streams = _aligned_streams_ps(scaled, f, DMA_BATCH, slab)
        else:
            streams = [_stretch_stream(c, f, DMA_BATCH, row_axis, slab)
                       for c in scaled]

    kernel = functools.partial(_deriv_kernel_df, n_steps=n_steps, MM=MM,
                               row_axis=row_axis, refine=f)
    outk, outd, outs = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((2,) + slab, jnp.float32),) * 3,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
        scratch_shapes=[
            pltpu.VMEM((6, 2) + slab, jnp.float32),
            pltpu.VMEM((6, 2, DMA_BATCH) + slab, jnp.float32),
            pltpu.SemaphoreType.DMA((12,)),
            pltpu.VMEM((6,) + slab, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(*streams)

    def fin(o):
        h = _extract_final(o[0], row_axis, MM, B)
        l = _extract_final(o[1], row_axis, MM, B)
        return h.astype(jnp.float64) + l.astype(jnp.float64)

    return fin(outk), fin(outd), fin(outs)


@functools.partial(jax.jit, static_argnames=("dyadic_order",))
def solve_derivatives_final_df(inc, inc_d, inc_dd, dyadic_order: int = 0):
    """f64-grade fused Pallas triple solve on f64 base increment grids.

    Double-float counterpart of :func:`solve_derivatives_final` (all three
    states in (hi, lo) pairs; ~6x the f32 tier's op count, still orders of
    magnitude above the scan tier's emulated-f64 XLA path on TPU).
    Returns three f64 arrays with the batch shape.
    """
    batch_shape = inc.shape[:-2]
    f = 2 ** dyadic_order
    Mb, Nb = inc.shape[-2], inc.shape[-1]
    MM, NN = Mb * f, Nb * f
    import math
    B = math.prod(batch_shape)

    def flat(a):
        return a.reshape((B, Mb, Nb)).astype(jnp.float64)

    u3, ud3, us3 = flat(inc), flat(inc_d), flat(inc_dd)
    if MM + 1 > MAX_ROWS:  # transpose covariance (01/10-symmetric updates)
        u3, ud3, us3 = (jnp.swapaxes(a, -1, -2) for a in (u3, ud3, us3))
        MMs, NNs = NN, MM
    else:
        MMs, NNs = MM, NN
    outs = _chunk_map(
        functools.partial(_solve_one_df, dyadic_order=dyadic_order),
        (u3, ud3, us3), max(pair_chunk(MMs, NNs, planes=12) // 2, 8))
    return tuple(o.reshape(batch_shape) for o in outs)


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
