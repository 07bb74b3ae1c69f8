"""Matched-precision (f32) in-kernel-generation wavefront kernels.

The f32 counterpart of the df64 generation route
(:mod:`.pallas_df64`, ``_wavefront_df_gen_kernel`` /
:mod:`.pallas_adjoint`, ``_product_collapse_planes_gen_kernel``): RBF
increments are generated ON THE FLY from path-point slabs inside the
kernel -- no increment grid, no DF prep pass, no sheared HBM stream in
either direction -- but the generation arithmetic is plain f32 instead of
double-float (~10x fewer VPU ops per generated cell), and the wavefront
update is the single-plane f32 scheme (~13x fewer ops per cell than
``_df_scheme``). On a chip with no f64 units this is the fastest tier in
the library by construction; it is the gradient-grade match of the
reference's f32 CUDA backward (reference sigkernel/sigkernel.py:229).

Structure is a line-for-line mirror of the validated df64 gen kernels
(same plane-split state, T_GEN slot rotation, lane windows, stack
emission, flush machinery) with the DF value pairs collapsed to single
f32 slabs. See those kernels' docstrings for the dataflow contracts.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_solver import (LANES, SUBLANES, MAX_ROWS, WINDOW_SEG, _ix,
                            _layout, _scheme, _chunk_map, _window_phases)
from .pallas_df64 import T_GEN, gen_supported  # noqa: F401 (same geometry)
from ..utils import ceil_to


def _gen_point_slabs32(Xp, Yp, sigma, P: int, Lb: int):
    """Per-pair paths -> f32 point slabs (x, sx, yr, syr, rs)."""
    x = Xp.astype(jnp.float32)
    y = Yp.astype(jnp.float32)
    B, M, D = x.shape
    N = y.shape[1]
    sx = jnp.sum(x * x, axis=-1)                   # (B, M)
    sy = jnp.sum(y * y, axis=-1)
    rs = jnp.float32(-1.0) / jnp.asarray(sigma, jnp.float32)

    def pad_x(c):
        pad = [(0, P - B), (0, Lb - M)] + [(0, 0)] * (c.ndim - 2)
        return jnp.pad(c, pad)

    def pad_yr(c):                                 # reversed: y[C - t]
        pad = [(0, P - B), (Lb - N, 0)] + [(0, 0)] * (c.ndim - 2)
        return jnp.pad(jnp.flip(c, axis=1), pad)

    xs = jnp.moveaxis(pad_x(x), -1, 0)             # (D, P, Lb)
    yrs = jnp.moveaxis(pad_yr(y), -1, 0)
    sxs = pad_x(sx)                                # (P, Lb)
    syrs = pad_yr(sy)
    # full-width rs slab (a (P, 1) broadcast inside a windowed body
    # crashes Mosaic's vector-layout pass; see _gen_point_slabs)
    rss = jnp.broadcast_to(rs, (P, Lb))
    return xs, sxs, yrs, syrs, rss


def _make_inc_gen32(point_refs, gd, gb, *, Mb, Nb, refine,
                    emit_wait=None, emit_start=None):
    """f32 in-kernel RBF increment-generation closures.

    Mirror of :func:`.pallas_df64._make_inc_gen` with the DF arithmetic
    collapsed to f32 (one exp per G cell instead of the DF exp chain).
    ``gd``: (3, P, Lb) G-diagonal rotation scratch; ``gb``: (2, P, Lb)
    generated-increment ping-pong. Same slot contract (t === k mod 6).
    """
    x_ref, sx_ref, yr_ref, syr_ref, rs_ref = point_refs
    D = x_ref.shape[0]
    P, Lb = gb.shape[1], gb.shape[2]
    C = Lb - 1
    f = refine
    iib = lax.broadcasted_iota(jnp.int32, (P, Lb), 1)
    zero = jnp.float32(0.0)
    inv_f2 = np.float32(1.0 / (f * f))
    rs = rs_ref[...]

    def gen_G(kk, wsb=None, Wb=None):
        rho = lax.rem(jnp.int32(kk) - jnp.int32(C) + jnp.int32(2 * Lb),
                      jnp.int32(Lb))

        def win(v):
            return v if wsb is None else v[:, wsb:wsb + Wb]

        cr = None
        for d in range(D):
            ry = win(pltpu.roll(yr_ref[d], rho, axis=1))
            p = win(x_ref[d]) * ry
            cr = p if cr is None else cr + p
        sy = win(pltpu.roll(syr_ref[...], rho, axis=1))
        d2 = win(sx_ref[...]) + sy - 2.0 * cr
        return jnp.exp(d2 * win(rs))

    def gen_inc(k, t, wsb=None, Wb=None):
        s2 = (t + 2) % 3
        s1 = (t + 1) % 3
        s0 = t % 3
        gv = gen_G(k + 2, wsb, Wb)
        if wsb is None:
            gd[s2] = gv
            g0_ = gd[s0]
            g1f = gd[s1]
        else:
            gd[s2, :, wsb:wsb + Wb] = gv
            g0_ = gd[s0, :, wsb:wsb + Wb]
            g1f = gd[s1]
        sh1 = jnp.int32(Lb - 1)
        if wsb is None:
            g2r = pltpu.roll(gv, sh1, axis=1)
        else:
            g2r = pltpu.roll(gd[s2], sh1, axis=1)[:, wsb:wsb + Wb]
        g1r = pltpu.roll(g1f, sh1, axis=1)
        if wsb is not None:
            g1r = g1r[:, wsb:wsb + Wb]
            g1_ = g1f[:, wsb:wsb + Wb]
        else:
            g1_ = g1f
        # dd in df_prep._dd's op order: (g11 + g00) - (g10 + g01)
        iv = (g2r + g0_) - (g1r + g1_)
        iiw = iib if wsb is None else (
            lax.broadcasted_iota(jnp.int32, (P, Wb), 1) + jnp.int32(wsb))
        bi = jnp.int32(0) + k - iiw
        valid = (iiw < Mb) & (bi >= 0) & (bi < Nb)
        iv = jnp.where(valid, iv * inv_f2, zero)
        if emit_wait is not None:
            emit_wait(t)
        if wsb is None:
            gb[t % 2] = iv
        else:
            gb[t % 2, :, wsb:wsb + Wb] = iv
        if emit_start is not None:
            emit_start(k, t)

    return gen_G, gen_inc


def _wavefront_f32_gen_kernel(x_ref, sx_ref, yr_ref, syr_ref, rs_ref,
                              out_ref, stk_ref, s_ref, gd, gb, isem,
                              *, n_steps, MM, NN, Mb, Nb, naive, refine,
                              hi_stack=False, out_offset=0,
                              window_seg=0, margin_top=8):
    """f32 plane-split wavefront with in-kernel RBF increment generation.

    Mirror of :func:`.pallas_df64._wavefront_df_gen_kernel` (see its
    docstring for the generation/mask/window contracts) with single f32
    state planes and the f32 update scheme.
    """
    T = T_GEN
    f = refine
    P = s_ref.shape[2]
    Lb = x_ref.shape[2]
    n_slots = pl.cdiv(n_steps, f)
    n_batches = pl.cdiv(n_slots, T)
    spb = T * f
    iib = lax.broadcasted_iota(jnp.int32, (P, Lb), 1)
    one = jnp.float32(1.0)

    phases = None
    if window_seg:
        phases = _window_phases(n_batches, spb, n_steps, NN, f * Lb,
                                window_seg, margin_top=margin_top,
                                align=f * LANES)

    for p in range(f):
        s_ref[0, p] = jnp.ones((P, Lb), jnp.float32)
        s_ref[1, p] = jnp.ones((P, Lb), jnp.float32)
    gb[1] = jnp.zeros((P, Lb), jnp.float32)    # inc diag -1 == exact zeros

    gen_G, gen_inc = _make_inc_gen32(
        (x_ref, sx_ref, yr_ref, syr_ref, rs_ref),
        gd, gb, Mb=Mb, Nb=Nb, refine=f)

    gd[0] = gen_G(0)
    gd[1] = gen_G(1)

    def step(q, k, s, sp, cur, prev, wsb=None, Wb=None, iibw=None):
        vm2, vm1 = sp, 1 - sp
        iiw = iib if wsb is None else iibw

        def st(slot, p):
            if wsb is None:
                return s_ref[slot, p]
            return s_ref[slot, p, :, wsb:wsb + Wb]

        k10 = [st(vm1, p) for p in range(f)]
        p2 = [st(vm2, p) for p in range(f)]
        roll1 = lambda v: pltpu.roll(v, jnp.int32(1), axis=1)
        k01 = [roll1(k10[f - 1])] + k10[:f - 1]
        k00 = [roll1(p2[f - 1])] + p2[:f - 1]
        u = [roll1(cur if s == f - 1 else prev)] + \
            [(cur if p <= s else prev) for p in range(f - 1)]

        p_star = (s + 2) % f
        off = (s + 2 - p_star) // f
        hit_lane = jnp.int32(0) + k + off

        vs = []
        for p in range(f):
            v = _scheme(k00[p], k01[p], k10[p], u[p], naive)
            mask = iiw > (MM - p) // f
            if p == p_star:
                mask = mask | (iiw == hit_lane)
            if p == 0:
                mask = mask | (iiw == 0)
            v = jnp.where(mask, one, v)
            if wsb is not None and wsb > 0 and p == 0:
                v = jnp.where(iiw == wsb, p2[0], v)
            vs.append(v)

        if hi_stack:
            @pl.when(q >= 2)
            def _():
                pltpu.make_async_copy(
                    s_ref.at[_ix(vm2)],
                    stk_ref.at[_ix(q - 2 + out_offset)],
                    isem.at[_ix(4 + sp)]).wait()
        for p in range(f):
            if wsb is None:
                s_ref[vm2, p] = vs[p]
            else:
                s_ref[vm2, p, :, wsb:wsb + Wb] = vs[p]
        if hi_stack:
            pltpu.make_async_copy(s_ref.at[_ix(vm2)],
                                  stk_ref.at[_ix(q + out_offset)],
                                  isem.at[_ix(4 + sp)]).start()

    def make_body(ws=None, W=None, guarded=True):
        def when_q(q):
            if guarded:
                return pl.when(q < n_steps)
            return lambda fn: fn()

        wsb = None if ws is None else ws // f
        Wb = None if ws is None else W // f
        iibw = None if ws is None else (
            lax.broadcasted_iota(jnp.int32, (P, Wb), 1) + jnp.int32(wsb))

        def ld(slot):
            if wsb is None:
                return gb[slot]
            return gb[slot, :, wsb:wsb + Wb]

        def body(b, _):
            for t in range(T):
                k = b * T + t

                @when_q(k * f)   # whole base slot off the end: skip
                def _(k=k, t=t):
                    gen_inc(k, t, wsb, Wb)
                    cur = ld(t % 2)
                    prev = ld(1 - t % 2)
                    for s in range(f):
                        q = k * f + s
                        sp = s % 2 if f > 1 else t % 2

                        @when_q(q)
                        def _(q=q, s=s, sp=sp):
                            step(q, k, s, sp, cur, prev, wsb, Wb, iibw)
            return 0
        return body

    if phases is None:
        lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), make_body(), 0)
    else:
        for (b0, b1, ws_p, W_p) in phases:
            guarded = b1 * spb > n_steps
            lax.fori_loop(jnp.int32(b0), jnp.int32(b1),
                          make_body(ws_p, W_p, guarded), 0)

    last = (n_steps - 1) % 2
    if hi_stack:
        pltpu.make_async_copy(s_ref.at[_ix(last)],
                              stk_ref.at[_ix(n_steps - 1 + out_offset)],
                              isem.at[_ix(4 + last)]).wait()

        @pl.when(n_steps >= 2)
        def _():
            pltpu.make_async_copy(
                s_ref.at[_ix(1 - last)],
                stk_ref.at[_ix(n_steps - 2 + out_offset)],
                isem.at[_ix(4 + (1 - last))]).wait()
    for p in range(f):
        out_ref[p] = s_ref[last, p]


def _solve_final_one_f32_gen(Xp, Yp, sigma, naive, dyadic_order,
                             stack_pad=None, window_seg=None):
    """Final-corner f32 solve with in-kernel RBF increment generation.

    Mirror of :func:`.pallas_df64._solve_final_one_df_gen` (f32 grade).
    """
    B, M, D = Xp.shape
    N = Yp.shape[1]
    f = 2 ** dyadic_order
    Mb, Nb = M - 1, N - 1
    MM, NN = Mb * f, Nb * f
    n_steps = MM + NN - 1
    row_axis, slab, _ = _layout(B, MM)
    assert row_axis == 1, "gen kernel is pairs-on-sublanes only"
    P = slab[0]
    Lb = ceil_to(max(Mb + 1, Nb + 1), LANES)

    ins = _gen_point_slabs32(Xp, Yp, sigma, P, Lb)

    hi_stack = stack_pad is not None
    if hi_stack:
        Tp = ceil_to(n_steps + 2, LANES) + stack_pad
        stk_shape = (Tp, f, P, Lb)
        stk_spec = pl.BlockSpec(memory_space=pl.ANY)
    else:
        stk_shape = (1, 1, 8, LANES)
        stk_spec = pl.BlockSpec(memory_space=pl.ANY)

    seg = WINDOW_SEG if window_seg is None else window_seg
    kernel = functools.partial(
        _wavefront_f32_gen_kernel, n_steps=n_steps, MM=MM, NN=NN,
        Mb=Mb, Nb=Nb, naive=naive, refine=f, hi_stack=hi_stack,
        out_offset=stack_pad if hi_stack else 0,
        window_seg=seg, margin_top=max(8, 3 * f + 2))
    out, stk = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((f, P, Lb), jnp.float32),
                   jax.ShapeDtypeStruct(stk_shape, jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM), stk_spec),
        scratch_shapes=[
            pltpu.VMEM((2, f, P, Lb), jnp.float32),     # state planes
            pltpu.VMEM((3, P, Lb), jnp.float32),        # gd
            pltpu.VMEM((2, P, Lb), jnp.float32),        # gb
            pltpu.SemaphoreType.DMA((8,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(*ins)
    val = out[MM % f, :B, MM // f]
    return (val, stk) if hi_stack else val


@functools.partial(jax.jit,
                   static_argnames=("naive", "dyadic_order", "stack_pad"))
def solve_final_f32_gen_stack(Xp, Yp, sigma, naive: bool = False,
                              dyadic_order: int = 0, stack_pad: int = 8):
    """Chunked f32 gen solve emitting the plane-layout solution stack
    (consumed by :func:`..pallas_adjoint.adjoint_planes_collapsed_gen32`).
    Returns ``(values (B,) f32, stacks (nc, Tp, f, P, L))``."""
    from .pallas_adjoint import shared_chunk

    f = 2 ** dyadic_order
    B, M, _ = Xp.shape
    N = Yp.shape[1]
    chunk = shared_chunk((M - 1) * f, (N - 1) * f)

    def one(args):
        x, y = args
        return _solve_final_one_f32_gen(x, y, sigma, naive, dyadic_order,
                                        stack_pad=stack_pad)

    if B <= chunk:
        val, stk = one((Xp, Yp))
        return val, stk[None]
    Bp = ceil_to(B, chunk)
    Xq = jnp.pad(Xp, ((0, Bp - B), (0, 0), (0, 0)))
    Yq = jnp.pad(Yp, ((0, Bp - B), (0, 0), (0, 0)))
    Xc = Xq.reshape(Bp // chunk, chunk, M, -1)
    Yc = Yq.reshape(Bp // chunk, chunk, N, -1)
    val, stk = jax.lax.map(one, (Xc, Yc))
    return val.reshape(Bp)[:B], stk


@functools.partial(jax.jit, static_argnames=("naive", "dyadic_order"))
def solve_final_f32_gen(Xp, Yp, sigma, naive: bool = False,
                        dyadic_order: int = 0):
    """Forward-only f32 gen solve (no stack): the value path."""
    from .pallas_adjoint import shared_chunk

    f = 2 ** dyadic_order
    B, M, _ = Xp.shape
    N = Yp.shape[1]
    chunk = shared_chunk((M - 1) * f, (N - 1) * f)

    def one(args):
        x, y = args
        return _solve_final_one_f32_gen(x, y, sigma, naive, dyadic_order)

    return _chunk_map(one, (Xp, Yp), chunk)
