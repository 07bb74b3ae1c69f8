"""Double-double ("two-float") Pallas wavefront solver: f64-grade precision
on a TPU whose Mosaic compiler has no native float64.

Each PDE value is carried as an unevaluated sum ``hi + lo`` of two float32s
(~49-bit effective mantissa, unit roundoff ~2^-49 = 1.8e-15), using
error-free transformations:

- ``two_sum`` (Knuth) -- exact addition error, add/sub only (safe under any
  FMA contraction);
- ``two_prod`` via Veltkamp splitting (Dekker) -- the partial products of
  12-bit halves are exact in f32, so the algorithm is correct whether or not
  the compiler contracts to FMA.

Measured against the f64 scan oracle on hardware: ~3e-13 relative at
moderate grids (the validation pin), growing to ~1.3-1.5e-10 at the full
benchmark grid (2046^2, 4093 steps) from coherent rounding drift of the
2-float state over the sweep -- the practical accuracy limit of
double-float at this depth, independent of the increment prep's accuracy
(exp Taylor order 13 vs 10 moves it by <0.2e-10). All of this runs on the
f32 VPU (~15x the plain-f32 op count instead of XLA's much slower
integer-emulated f64).

Structure mirrors :mod:`sigkernel_tpu.ops.pallas_solver` (same skewed
streaming, ping-pong state, batched DMA); inputs/outputs are split/combined
hi/lo pairs in XLA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_solver import (LANES, MAX_ROWS, IN_OFF, WINDOW_SEG,
                            _ix, _maybe_transpose, _pad_shear, _layout,
                            _chunk_map, _extract_final, _stack_to_grid,
                            _window_phases)
from ..utils import ceil_to

DMA_BATCH = 2  # smaller than the f32 kernel: two ibuf planes (hi, lo)


def supported(inc: jnp.ndarray) -> bool:
    """TPU + f64 + shorter refined side within VMEM (transpose covariance
    lets long rectangular grids solve transposed)."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    if platform not in ("tpu", "axon"):
        return False
    if inc.dtype != jnp.float64:
        return False
    MM, NN = inc.shape[-2], inc.shape[-1]
    if MM == 0 or NN == 0:
        return False
    return min(MM, NN) + 1 <= MAX_ROWS


# ---------------------------------------------------------------------------
# Error-free transformations (element-wise on f32 arrays)
# ---------------------------------------------------------------------------

def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _quick_two_sum(a, b):
    s = a + b
    return s, b - (s - a)


def _split(a):
    c = jnp.float32(4097.0) * a  # 2^12 + 1 for f32 (24-bit mantissa)
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _two_prod_sqr(a):
    """``_two_prod(a, a)`` with the Veltkamp split computed once (exact;
    saves 4 of its 13 ops)."""
    p = a * a
    ah, al = _split(a)
    err = ((ah * ah - p) + jnp.float32(2.0) * (ah * al)) + al * al
    return p, err


def _df_add(xh, xl, yh, yl):
    s, e = _two_sum(xh, yh)
    return _quick_two_sum(s, e + (xl + yl))


def _df_mul(xh, xl, yh, yl):
    p, e = _two_prod(xh, yh)
    return _quick_two_sum(p, e + (xh * yl + xl * yh))


def _df_neg(xh, xl):
    return -xh, -xl


def _df_const(x: float):
    hi = np.float32(x)
    lo = np.float32(x - float(hi))
    return jnp.float32(hi), jnp.float32(lo)


def _df_mul_const(xh, xl, c: float):
    """Multiply a double-float by a Python-float constant.

    The constant's hi/lo decomposition AND the Veltkamp split of its hi part
    are precomputed here in numpy f32. This is load-bearing: if the split
    were traced, XLA constant-folds it with excess precision
    (``--xla_allow_excess_precision``, default on) and silently destroys the
    error-free transformation, degrading the whole solve to f32 accuracy.
    """
    ch = np.float32(c)
    cl = np.float32(c - float(ch))
    t = np.float32(4097.0) * ch
    chh = np.float32(t - np.float32(t - ch))
    chl = np.float32(ch - chh)

    p = xh * ch
    ah, al = _split(xh)
    err = ((ah * chh - p) + ah * chl + al * chh) + al * chl
    e = err + (xh * cl + xl * ch)
    return _quick_two_sum(p, e)


def _df_sqr(xh, xl):
    p, e = _two_prod_sqr(xh)
    return _quick_two_sum(p, e + jnp.float32(2.0) * (xh * xl))


def _df_add_f32(xh, xl, b32):
    s, e = _two_sum(xh, b32)
    return _quick_two_sum(s, e + xl)


# 2^(j/8), j = 0..7, as numpy-precomputed DF constants (fine-reduction
# table of _df_exp; never enters an EFT as a bare literal -- selected into
# a traced tensor first)
_EXP8_TABLE = tuple(
    (np.float32(v), np.float32(v - float(np.float32(v))))
    for v in (float(2.0 ** (j / 8.0)) for j in range(8)))
_LN2 = float(np.log(2.0))


def _df_exp(xh, xl):
    """In-kernel double-float ``exp`` (Mosaic-safe mirror of
    :func:`..df32.exp_`): 8x-fine reduction + DF Taylor order 3 + f32 tail.

    Differences from the XLA version, forced by the kernel environment:
    no ``optimization_barrier`` (literal-involving ``add_const`` EFTs are
    avoided by the ``T*(1+w)`` expm1 factorisation: every two_sum runs on
    traced values), and ``2^m`` is assembled as a product of 7 selected
    power-of-two factors instead of exponent-bit bitcasting (exact either
    way; ``m`` is clamped to [-64, 0] -- RBF exponents are <= ~0 and
    ``exp < 2^-64`` is ~5e-20, far below the increment budget).
    """
    k = jnp.floor(xh * np.float32(8.0 / _LN2) + np.float32(0.5))
    # r = x - k*(ln2/8); |r| <= ln2/16
    th_, tl_ = _df_mul_const(k, jnp.zeros_like(k), _LN2 / 8.0)
    rh, rl = _df_add(xh, xl, -th_, -tl_)

    # w = exp(r) - 1 = r + r^2/2 + r^3/6 + f32-tail(orders 4..7)
    r2h, r2l = _df_sqr(rh, rl)
    h2h, h2l = r2h * jnp.float32(0.5), r2l * jnp.float32(0.5)
    c3h, c3l = _df_mul(r2h, r2l, rh, rl)
    c3h, c3l = _df_mul_const(c3h, c3l, 1.0 / 6.0)
    r4 = r2h * r2h
    tail = r4 * (np.float32(1.0 / 24.0)
                 + rh * (np.float32(1.0 / 120.0)
                         + rh * (np.float32(1.0 / 720.0)
                                 + rh * np.float32(1.0 / 5040.0))))
    wh, wl = _df_add(rh, rl, h2h, h2l)
    ch, cl = _df_add_f32(c3h, c3l, tail)
    wh, wl = _df_add(wh, wl, ch, cl)

    # table 2^(j/8): j = k - 8*floor(k/8) is an exact small-integer f32
    m = jnp.floor(k * np.float32(0.125))
    j = k - np.float32(8.0) * m
    tbh = jnp.full_like(xh, _EXP8_TABLE[0][0])
    tbl = jnp.full_like(xh, _EXP8_TABLE[0][1])
    for ji in range(1, 8):
        sel = j == np.float32(ji)
        tbh = jnp.where(sel, _EXP8_TABLE[ji][0], tbh)
        tbl = jnp.where(sel, _EXP8_TABLE[ji][1], tbl)
    # exp(r + j ln2/8) = T * (1 + w) = T + T*w (EFTs on traced values only)
    ph, pl_ = _df_mul(tbh, tbl, wh, wl)
    ph, pl_ = _df_add(tbh, tbl, ph, pl_)

    # 2^m as a product of selected power-of-two factors (each mul exact)
    mm = (-jnp.clip(m, -64.0, 0.0)).astype(jnp.int32)
    two_m = jnp.ones_like(xh)
    for b in (1, 2, 4, 8, 16, 32, 64):
        two_m = two_m * jnp.where((mm & b) != 0,
                                  np.float32(2.0 ** (-b)), np.float32(1.0))
    return ph * two_m, pl_ * two_m


def _df_scheme(k00h, k00l, k01h, k01l, k10h, k10l, uh, ul, naive):
    """Double-double version of the two update schemes.

    Rearranged so no error-free transformation ever involves a literal
    constant: XLA's algebraic simplifier rewrites patterns like
    ``(x + 1) - x`` with excess precision and silently zeroes the error
    terms. Expanding the schemes removes the ``1 + ...`` polynomials:

        naive:  v = (s - k00) + s*(u/2)                 with s = k01 + k10
        order2: v = (s - k00) + s*(u/2 + u^2/12) + k00*(u^2/12)

    Full renormalizing EFT throughout: on-chip this kernel's wall time is
    DMA/step-infrastructure-bound (a 3-op dummy scheme measured 97% of the
    full scheme's time), so cheaper "sloppy" df arithmetic buys nothing
    and measurably degrades accuracy (1.7e-10 vs 2.8e-13 at the benchmark
    grid).
    """
    sh, sl = _df_add(k01h, k01l, k10h, k10l)           # s = k01 + k10
    d0h, d0l = _df_add(sh, sl, -k00h, -k00l)           # s - k00
    # 0.5*u is exact per component (power of two)
    huh, hul = uh * jnp.float32(0.5), ul * jnp.float32(0.5)
    if naive:
        mh, ml = _df_mul(sh, sl, huh, hul)
        return _df_add(d0h, d0l, mh, ml)
    u2h, u2l = _df_mul(uh, ul, uh, ul)                 # u^2
    th, tl = _df_mul_const(u2h, u2l, 1.0 / 12.0)       # u^2 / 12
    wh, wl = _df_add(huh, hul, th, tl)                 # u/2 + u^2/12
    m1h, m1l = _df_mul(sh, sl, wh, wl)
    m2h, m2l = _df_mul(k00h, k00l, th, tl)
    vh, vl = _df_add(d0h, d0l, m1h, m1l)
    return _df_add(vh, vl, m2h, m2l)


def _df_scheme_gen(k00h, k00l, k01h, k01l, k10h, k10l, uh, ul, naive):
    """The GEN-tier update scheme: hi-only ``u^2/12`` correction chain.

    Identical to :func:`_df_scheme` except the second-order correction
    ``t = u^2/12`` and its ``k00 * t`` product run in plain f32 (the
    first-order term ``s * u/2`` stays full double-float):

        135 f32 ops/cell  ->  79 f32 ops/cell  (the VPU-issue bound that
        sets the df64 kernels' wall time; docs/BENCHMARKS.md round 3).

    Error budget (why this is sound for the GEN kernels only): dropping
    the EFTs of the u^2 chain perturbs each cell update by

        |dv| <= (|s| + |k00|) * |u|^2 * 2^-23  ~=  3 * u^2 * 2^-23.

    The gen kernels' increments are generated in-kernel from the DF exp of
    the static kernel, whose ~2^-48-level G rounding noise already enters
    each update as |dv| ~ 3 * 4 * 2^-48 (the double difference of white
    per-cell G noise) -- the measured gen-tier floor (rtol ~1e-11 vs the
    exact-increment scan oracle at coarse grids). The hi-only u^2 term is
    BELOW that existing floor whenever |u| <= 2^(-12.5) ~= 1.8e-4, which
    holds for every production grid (benchmark config: |u| ~ 1e-5 refined;
    increments shrink as 1/length^2). At coarse grids (|u| ~ 1e-2, e.g.
    length-8 tests) the model bound is ~n_steps * 3 * u^2 * 2^-23 ~ 5e-10
    absolute -- still ~1e4x tighter than f32 -- and the gen tests assert
    against exactly this model. The increment-grid df kernels
    (``_wavefront_df_kernel``, planes, blocked, derivatives) take
    arbitrary-scale increments and keep the full-EFT :func:`_df_scheme`.
    """
    sh, sl = _df_add(k01h, k01l, k10h, k10l)           # s = k01 + k10
    d0h, d0l = _df_add(sh, sl, -k00h, -k00l)           # s - k00
    huh, hul = uh * jnp.float32(0.5), ul * jnp.float32(0.5)
    if naive:
        mh, ml = _df_mul(sh, sl, huh, hul)
        return _df_add(d0h, d0l, mh, ml)
    # hi-only u^2/12 (plain f32 mul; NOT an EFT, so the excess-precision
    # folding hazard of literal-constant EFTs does not apply)
    t32 = (uh * uh) * np.float32(1.0 / 12.0)
    wh, wl = _df_add_f32(huh, hul, t32)                # u/2 + u^2/12
    m1h, m1l = _df_mul(sh, sl, wh, wl)
    m2 = k00h * t32
    vh, vl = _df_add(d0h, d0l, m1h, m1l)
    return _df_add_f32(vh, vl, m2)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _wavefront_df_kernel(inch_hbm, incl_hbm, outh_ref, outl_ref, stk_ref,
                         sh_ref, sl_ref, ibh, ibl, isem, carryh, carryl,
                         ckbuf=None, *, n_steps, MM, row_axis, naive,
                         grid_out, out_offset=0, refine=1, hi_stack=False,
                         ckpt_c=0, NN=None, window_seg=0,
                         forced_phases=None):
    """Double-double wavefront; ``refine > 1`` consumes the row-stretched
    base stream (select + roll per step; see
    ``pallas_solver._wavefront_kernel`` for the refinement contract).

    Output modes (``stk_ref`` is a small dummy unless noted):
    - default: final hi/lo value slabs in VMEM;
    - ``grid_out``: hi/lo diagonal stacks in HBM (entry q at q+out_offset);
    - ``hi_stack``: final hi/lo value slabs PLUS the hi plane's diagonal
      stack streamed to ``stk_ref`` (entry q at q+out_offset). The
      f32-rounded-from-df64 stack is exactly what the fused adjoint
      consumes, so a fwd+bwd step reuses the forward sweep instead of
      re-solving;
    - ``ckpt_c = C > 0``: final hi/lo value slabs PLUS a SPARSE hi stack:
      only the per-window checkpoint pairs (diagonals ``T-6-m*C`` at slab
      ``2m``, ``T-5-m*C`` at ``2m+1``; the layout of
      ``pallas_adjoint.ckpt_pairs``) are written, ``C/2``x less stack
      traffic; the ckpt-consuming adjoint recomputes the rest in-kernel.
      Writes stage through ``ckbuf`` (2 slabs, per-slot wait chains seeded
      against the 2 spare slabs at the stack tail) so the ping-pong state
      is never DMA-live when overwritten."""
    T = DMA_BATCH
    f = refine
    slab = sh_ref.shape[1:]
    n_slots = pl.cdiv(n_steps, f) if f > 1 else n_steps
    n_batches = pl.cdiv(n_slots, T)
    in_off = IN_OFF if f == 1 else 0
    ii = lax.broadcasted_iota(jnp.int32, slab, row_axis)
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)

    # Lane-window phase plan: compute only the active sliding row window
    # of each anti-diagonal (frozen rows equal their computed values
    # bit-for-bit; see _window_phases). Pairs-on-sublanes slabs only.
    spb = T * f if f > 1 else T
    phases = None
    if window_seg and row_axis == 1 and NN is not None:
        phases = _window_phases(n_batches, spb, n_steps, NN, slab[1],
                                window_seg)
    if forced_phases is not None:
        # timing-probe override: run the whole sweep under an arbitrary
        # static window plan (results are garbage unless the plan covers
        # the active region -- scripts/onchip_window_check.py wprobe mode)
        phases = forced_phases

    sh_ref[0] = jnp.ones(slab, jnp.float32)
    sh_ref[1] = jnp.ones(slab, jnp.float32)
    sl_ref[0] = jnp.zeros(slab, jnp.float32)
    sl_ref[1] = jnp.zeros(slab, jnp.float32)

    if ckpt_c:
        # residues of the checkpoint diagonals mod C (static; the
        # ckpt_supported gate guarantees n_steps - 6 >= C >= 0)
        r_lo = (n_steps - 6) % ckpt_c
        r_hi = (n_steps - 5) % ckpt_c
        n_seed = stk_ref.shape[0] - 2      # 2 spare slabs at the tail
        ckbuf[0] = jnp.zeros(slab, jnp.float32)
        ckbuf[1] = jnp.zeros(slab, jnp.float32)
        pltpu.make_async_copy(ckbuf.at[_ix(0)], stk_ref.at[_ix(n_seed)],
                              isem.at[_ix(4)]).start()
        pltpu.make_async_copy(ckbuf.at[_ix(1)], stk_ref.at[_ix(n_seed + 1)],
                              isem.at[_ix(5)]).start()

        def ckpt_write(q, vslot):
            """If diagonal ``q`` is a checkpoint entry, stage + stream the
            just-written state slot ``vslot`` (full slab, so frozen rows
            outside a compute window are included; per-slot chains: wait
            the previous same-slot copy first)."""
            qi = jnp.int32(0) + q          # q may be a python int mix
            rem = lax.rem(qi, jnp.int32(ckpt_c))
            for off, r in ((0, r_lo), (1, r_hi)):
                @pl.when(rem == jnp.int32(r))
                def _(off=off):
                    # the wait index is irrelevant to the semaphore
                    pltpu.make_async_copy(ckbuf.at[_ix(off)],
                                          stk_ref.at[_ix(n_seed)],
                                          isem.at[_ix(4 + off)]).wait()
                    ckbuf[off] = sh_ref[vslot]
                    m = lax.div(jnp.int32(n_steps - 6 + off) - qi,
                                jnp.int32(ckpt_c))
                    pltpu.make_async_copy(ckbuf.at[_ix(off)],
                                          stk_ref.at[_ix(2 * m + off)],
                                          isem.at[_ix(4 + off)]).start()

    def in_copy(b, slot):
        ds = pl.ds(_ix(b * T + in_off), T)
        return (pltpu.make_async_copy(inch_hbm.at[ds],
                                      ibh.at[_ix(slot)], isem.at[_ix(slot)]),
                pltpu.make_async_copy(incl_hbm.at[ds],
                                      ibl.at[_ix(slot)],
                                      isem.at[_ix(2 + slot)]))

    for c in in_copy(0, 0):
        c.start()

    def step(q, uh, ul, vm2, vm1, sp, ws=None, W=None, iiw=None):
        if ws is None:
            k10h, k10l = sh_ref[vm1], sl_ref[vm1]
            p2h, p2l = sh_ref[vm2], sl_ref[vm2]
            ii_loc = ii
        else:
            k10h = sh_ref[vm1, :, ws:ws + W]
            k10l = sl_ref[vm1, :, ws:ws + W]
            p2h = sh_ref[vm2, :, ws:ws + W]
            p2l = sl_ref[vm2, :, ws:ws + W]
            ii_loc = iiw
        k01h = pltpu.roll(k10h, jnp.int32(1), axis=row_axis)
        k01l = pltpu.roll(k10l, jnp.int32(1), axis=row_axis)
        k00h = pltpu.roll(p2h, jnp.int32(1), axis=row_axis)
        k00l = pltpu.roll(p2l, jnp.int32(1), axis=row_axis)
        vh, vl = _df_scheme(k00h, k00l, k01h, k01l, k10h, k10l,
                            uh, ul, naive)
        mask = (ii_loc == 0) | (ii_loc == q + 2) | (ii_loc > MM)
        vh = jnp.where(mask, one, vh)
        vl = jnp.where(mask, zero, vl)
        if ws is not None and ws > 0:
            # window-bottom margin: the roll wrapped the window's top lane
            # into lane ``ws``; keep the frozen (done, slot-equalised)
            # value that sits there instead
            edge = ii_loc == ws
            vh = jnp.where(edge, p2h, vh)
            vl = jnp.where(edge, p2l, vl)

        if grid_out:
            @pl.when(q >= 2)
            def _():
                pltpu.make_async_copy(
                    sh_ref.at[_ix(vm2)],
                    outh_ref.at[_ix(q - 2 + out_offset)],
                    isem.at[_ix(4 + sp)]).wait()
                pltpu.make_async_copy(
                    sl_ref.at[_ix(vm2)],
                    outl_ref.at[_ix(q - 2 + out_offset)],
                    isem.at[_ix(6 + sp)]).wait()
        if hi_stack:
            @pl.when(q >= 2)
            def _():
                pltpu.make_async_copy(
                    sh_ref.at[_ix(vm2)],
                    stk_ref.at[_ix(q - 2 + out_offset)],
                    isem.at[_ix(4 + sp)]).wait()
        if ws is None:
            sh_ref[vm2] = vh
            sl_ref[vm2] = vl
        else:
            sh_ref[vm2, :, ws:ws + W] = vh
            sl_ref[vm2, :, ws:ws + W] = vl
        if ckpt_c:
            ckpt_write(q, vm2)
        if grid_out:
            pltpu.make_async_copy(sh_ref.at[_ix(vm2)],
                                  outh_ref.at[_ix(q + out_offset)],
                                  isem.at[_ix(4 + sp)]).start()
            pltpu.make_async_copy(sl_ref.at[_ix(vm2)],
                                  outl_ref.at[_ix(q + out_offset)],
                                  isem.at[_ix(6 + sp)]).start()
        if hi_stack:
            pltpu.make_async_copy(sh_ref.at[_ix(vm2)],
                                  stk_ref.at[_ix(q + out_offset)],
                                  isem.at[_ix(4 + sp)]).start()

    def make_body(ws=None, W=None, iiw=None, guarded=True):
        def when_q(q):
            """Static-guard elision: interior window phases cannot overrun
            ``n_steps``, so their steps skip the per-step predicate."""
            if guarded:
                return pl.when(q < n_steps)
            return lambda fn: fn()

        if ws is None:
            def ld(ref, bslot, t):
                return ref[bslot, t]

            def ldc(ref):
                return ref[0]
        else:
            def ld(ref, bslot, t):
                return ref[bslot, t, :, ws:ws + W]

            def ldc(ref):
                return ref[0, :, ws:ws + W]
        ii_loc = ii if ws is None else iiw

        def body(b, _):
            bslot = lax.rem(b, jnp.int32(2))

            @pl.when(b + 1 < n_batches)
            def _():
                for c in in_copy(b + 1, 1 - bslot):
                    c.start()

            for c in in_copy(b, bslot):
                c.wait()

            for t in range(T):
                if f == 1:
                    q = b * T + t

                    @when_q(q)
                    def _(q=q, t=t):
                        step(q, ld(ibh, bslot, t), ld(ibl, bslot, t),
                             t % 2, 1 - t % 2, t % 2, ws, W, iiw)
                else:
                    k = b * T + t
                    for s in range(f):
                        q = k * f + s
                        sp = s % 2   # == q % 2 (f even)

                        @when_q(q)
                        def _(q=q, t=t, s=s, sp=sp):
                            # previous diagonal: carry at batch start (the
                            # other DMA slot is racing with the prefetch)
                            prvh = (ldc(carryh) if t == 0
                                    else ld(ibh, bslot, t - 1))
                            prvl = (ldc(carryl) if t == 0
                                    else ld(ibl, bslot, t - 1))
                            sel = lax.rem(ii_loc, jnp.int32(f)) <= s
                            ph = jnp.where(sel, ld(ibh, bslot, t), prvh)
                            pl_ = jnp.where(sel, ld(ibl, bslot, t), prvl)
                            uh = pltpu.roll(ph, jnp.int32(1), axis=row_axis)
                            ul = pltpu.roll(pl_, jnp.int32(1), axis=row_axis)
                            step(q, uh, ul, sp, 1 - sp, sp, ws, W, iiw)
            if f > 1:
                carryh[0] = ibh[bslot, T - 1]
                carryl[0] = ibl[bslot, T - 1]
            return 0
        return body

    # int32 loop bounds: under jax_enable_x64 a default (int64) fori index
    # cannot be lowered by Mosaic (its int64->int32 convert path recurses)
    if phases is None:
        lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), make_body(), 0)
    else:
        for (b0, b1, ws_p, W_p) in phases:
            iiw = (lax.broadcasted_iota(jnp.int32, (slab[0], W_p), 1)
                   + jnp.int32(ws_p))
            guarded = b1 * spb > n_steps   # only the tail phase can overrun
            lax.fori_loop(jnp.int32(b0), jnp.int32(b1),
                          make_body(ws_p, W_p, iiw, guarded), 0)

    last = (n_steps - 1) % 2
    if grid_out:
        pltpu.make_async_copy(sh_ref.at[_ix(last)],
                              outh_ref.at[_ix(n_steps - 1 + out_offset)],
                              isem.at[_ix(4 + last)]).wait()
        pltpu.make_async_copy(sl_ref.at[_ix(last)],
                              outl_ref.at[_ix(n_steps - 1 + out_offset)],
                              isem.at[_ix(6 + last)]).wait()
        @pl.when(n_steps >= 2)
        def _():
            pltpu.make_async_copy(sh_ref.at[_ix(1 - last)],
                                  outh_ref.at[_ix(n_steps - 2 + out_offset)],
                                  isem.at[_ix(4 + (1 - last))]).wait()
            pltpu.make_async_copy(sl_ref.at[_ix(1 - last)],
                                  outl_ref.at[_ix(n_steps - 2 + out_offset)],
                                  isem.at[_ix(6 + (1 - last))]).wait()
    else:
        if hi_stack:
            pltpu.make_async_copy(sh_ref.at[_ix(last)],
                                  stk_ref.at[_ix(n_steps - 1 + out_offset)],
                                  isem.at[_ix(4 + last)]).wait()
            @pl.when(n_steps >= 2)
            def _():
                pltpu.make_async_copy(
                    sh_ref.at[_ix(1 - last)],
                    stk_ref.at[_ix(n_steps - 2 + out_offset)],
                    isem.at[_ix(4 + (1 - last))]).wait()
        if ckpt_c:
            # drain both checkpoint chains (index irrelevant to the wait)
            for off in (0, 1):
                pltpu.make_async_copy(ckbuf.at[_ix(off)],
                                      stk_ref.at[_ix(n_seed)],
                                      isem.at[_ix(4 + off)]).wait()
        outh_ref[...] = sh_ref[last]
        outl_ref[...] = sl_ref[last]


# ---------------------------------------------------------------------------
# Plane-split wavefront: refined lanes as f base-width planes
#
# Mosaic cannot lower ANY lane-dilation shuffle (jnp.repeat / broadcast+
# reshape / strided slices all fail AOT -- scripts/dilate_probe.py), so the
# in-kernel dyadic refinement must never materialise a refined-width vector
# from base-width data. The fix is a change of representation: a refined
# array Z (P, L) is carried as f base-width planes Z_p[i] = Z[f*i + p].
# Under this split every piece of the refined wavefront step gets CHEAPER:
#
# - the stretched-increment select  (i' mod f <= s ? d_k : d_{k-1})  becomes
#   a compile-time plane choice (p <= s picks the current base diagonal) --
#   no select ops, and the streams stay at BASE lane width (f x less stream
#   HBM + construction, with no dilation anywhere);
# - the dependency roll by one refined lane becomes plane re-indexing
#   (y_p = Z_{p-1}, free) plus ONE base-width roll for plane 0 -- f x less
#   roll work;
# - the boundary masks hit a single (plane, lane) resolved at compile time
#   per in-batch position.
#
# The arithmetic scheme itself is elementwise and runs per plane (same
# total lane count). Values are BIT-IDENTICAL to the stretched-width
# kernel: every operation is the same f32 op on the same operands, only
# the lane placement differs.
# ---------------------------------------------------------------------------


def _wavefront_df_planes_kernel(inch_hbm, incl_hbm, outh_ref, outl_ref,
                                stk_ref, sh_ref, sl_ref, ibh, ibl, isem,
                                carryh, carryl, *, n_steps, MM, NN, naive,
                                refine, hi_stack=False, out_offset=0,
                                window_seg=0):
    """Plane-split double-double wavefront (refine = f >= 2).

    ``inch/incl``: base-diagonal streams ``(W, P, Lb)``, entry ``k`` = base
    anti-diagonal ``k`` at base row lanes (offset 0, pre-scaled by 1/f^2).
    ``sh/sl``: ``(2, f, P, Lb)`` ping-pong state planes. ``stk_ref``
    (``hi_stack``): ``(Tp, f, P, Lb)`` hi diagonal stack, entry q at
    q + out_offset, plane layout (the plane-split adjoint consumes it).
    """
    T = DMA_BATCH
    f = refine
    n_slots = pl.cdiv(n_steps, f)
    n_batches = pl.cdiv(n_slots, T)
    P, Lb = sh_ref.shape[2], sh_ref.shape[3]
    iib = lax.broadcasted_iota(jnp.int32, (P, Lb), 1)
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)

    spb = T * f
    phases = None
    if window_seg:
        phases = _window_phases(n_batches, spb, n_steps, NN, f * Lb,
                                window_seg, align=f * LANES)

    for p in range(f):
        sh_ref[0, p] = jnp.ones((P, Lb), jnp.float32)
        sh_ref[1, p] = jnp.ones((P, Lb), jnp.float32)
        sl_ref[0, p] = jnp.zeros((P, Lb), jnp.float32)
        sl_ref[1, p] = jnp.zeros((P, Lb), jnp.float32)

    def in_copy(b, slot):
        ds = pl.ds(_ix(b * T), T)
        return (pltpu.make_async_copy(inch_hbm.at[ds], ibh.at[_ix(slot)],
                                      isem.at[_ix(slot)]),
                pltpu.make_async_copy(incl_hbm.at[ds], ibl.at[_ix(slot)],
                                      isem.at[_ix(2 + slot)]))

    for c in in_copy(0, 0):
        c.start()

    def step(q, k, s, sp, cur, prev, wsb=None, Wb=None, iibw=None):
        """One refined step in plane representation (sp = q % 2, static).

        ``cur``/``prev``: (hi, lo) base-increment slabs for diagonals k,
        k-1, already window-sliced. ``q``/``k`` traced, ``s`` static.
        """
        vm2, vm1 = sp, 1 - sp
        iiw = iib if wsb is None else iibw

        def st(ref, slot, p):
            if wsb is None:
                return ref[slot, p]
            return ref[slot, p, :, wsb:wsb + Wb]

        # assemble all plane inputs BEFORE any write (plane p reads the
        # old value of plane p-1)
        k10 = [(st(sh_ref, vm1, p), st(sl_ref, vm1, p)) for p in range(f)]
        p2 = [(st(sh_ref, vm2, p), st(sl_ref, vm2, p)) for p in range(f)]

        def rolled(pair):
            return (pltpu.roll(pair[0], jnp.int32(1), axis=1),
                    pltpu.roll(pair[1], jnp.int32(1), axis=1))

        k01 = [rolled(k10[f - 1])] + k10[:f - 1]
        k00 = [rolled(p2[f - 1])] + p2[:f - 1]
        # pre_p = (p <= s ? cur : prev); u_p = pre_{p-1}, u_0 = roll(pre_-1)
        u = [rolled(cur if s == f - 1 else prev)] + \
            [(cur if p <= s else prev) for p in range(f - 1)]

        # boundary mask: refined lane q+2 lives on ONE static plane
        p_star = (s + 2) % f
        off = (s + 2 - p_star) // f          # 0 or 1, static
        hit_lane = jnp.int32(0) + k + off

        vs = []
        for p in range(f):
            vh, vl = _df_scheme(k00[p][0], k00[p][1], k01[p][0], k01[p][1],
                                k10[p][0], k10[p][1], u[p][0], u[p][1],
                                naive)
            mask = iiw > (MM - p) // f       # refined row f*i + p > MM
            if p == p_star:
                mask = mask | (iiw == hit_lane)
            if p == 0:
                mask = mask | (iiw == 0)
            vh = jnp.where(mask, one, vh)
            vl = jnp.where(mask, zero, vl)
            if wsb is not None and wsb > 0 and p == 0:
                # window-bottom edge: the plane-0 rolls wrapped the window
                # top into lane wsb; keep the frozen value
                edge = iiw == wsb
                vh = jnp.where(edge, p2[0][0], vh)
                vl = jnp.where(edge, p2[0][1], vl)
            vs.append((vh, vl))

        if hi_stack:
            @pl.when(q >= 2)
            def _():
                pltpu.make_async_copy(
                    sh_ref.at[_ix(vm2)],
                    stk_ref.at[_ix(q - 2 + out_offset)],
                    isem.at[_ix(4 + sp)]).wait()
        for p in range(f):
            if wsb is None:
                sh_ref[vm2, p] = vs[p][0]
                sl_ref[vm2, p] = vs[p][1]
            else:
                sh_ref[vm2, p, :, wsb:wsb + Wb] = vs[p][0]
                sl_ref[vm2, p, :, wsb:wsb + Wb] = vs[p][1]
        if hi_stack:
            pltpu.make_async_copy(sh_ref.at[_ix(vm2)],
                                  stk_ref.at[_ix(q + out_offset)],
                                  isem.at[_ix(4 + sp)]).start()

    def make_body(ws=None, W=None, guarded=True):
        wsb = None if ws is None else ws // f
        Wb = None if ws is None else W // f
        iibw = None if ws is None else (
            lax.broadcasted_iota(jnp.int32, (P, Wb), 1) + jnp.int32(wsb))

        def when_q(q):
            if guarded:
                return pl.when(q < n_steps)
            return lambda fn: fn()

        def sl_in(x):
            return x if wsb is None else x[:, wsb:wsb + Wb]

        def body(b, _):
            bslot = lax.rem(b, jnp.int32(2))

            @pl.when(b + 1 < n_batches)
            def _():
                for c in in_copy(b + 1, 1 - bslot):
                    c.start()

            for c in in_copy(b, bslot):
                c.wait()

            for t in range(T):
                k = b * T + t
                for s in range(f):
                    q = k * f + s
                    sp = s % 2           # == q % 2 (f even)

                    @when_q(q)
                    def _(k=k, t=t, s=s, sp=sp, q=q):
                        cur = (sl_in(ibh[bslot, t]), sl_in(ibl[bslot, t]))
                        prev = ((sl_in(carryh[0]), sl_in(carryl[0]))
                                if t == 0
                                else (sl_in(ibh[bslot, t - 1]),
                                      sl_in(ibl[bslot, t - 1])))
                        step(q, k, s, sp, cur, prev, wsb, Wb, iibw)
            carryh[0] = ibh[bslot, T - 1]
            carryl[0] = ibl[bslot, T - 1]
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
        pltpu.make_async_copy(sh_ref.at[_ix(last)],
                              stk_ref.at[_ix(n_steps - 1 + out_offset)],
                              isem.at[_ix(4 + last)]).wait()
        @pl.when(n_steps >= 2)
        def _():
            pltpu.make_async_copy(
                sh_ref.at[_ix(1 - last)],
                stk_ref.at[_ix(n_steps - 2 + out_offset)],
                isem.at[_ix(4 + (1 - last))]).wait()
    for p in range(f):
        outh_ref[p] = sh_ref[last, p]
        outl_ref[p] = sl_ref[last, p]


def planes_ok(B: int, Mb: int, Nb: int, dyadic_order: int) -> bool:
    """Geometry gate for the plane-split df64 kernel: TPU backend,
    pairs-on-sublanes layout, f in (2, 4), refined rows within VMEM."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    if platform not in ("tpu", "axon"):
        return False
    f = 2 ** dyadic_order
    if f not in (2, 4) or Mb < 1 or Nb < 1:
        return False
    MM = Mb * f
    if MM + 1 > MAX_ROWS or B > 128:
        return False
    row_axis, _, _ = _layout(B, MM)
    return row_axis == 1


def _solve_final_one_df_pl(hi3, lo3, naive, dyadic_order,
                           stack_pad=None, window_seg=None):
    """Plane-split final-corner df64 solve (bit-identical values to
    :func:`_solve_final_one_df`, base-width streams, f x less roll work).
    With ``stack_pad`` also returns the hi stack in PLANE layout
    ``(Tp, f, P, Lb)`` for the plane-split adjoint."""
    from .pallas_solver import _base_stream

    B, Mb, Nb = hi3.shape
    f = 2 ** dyadic_order
    MM, NN = Mb * f, Nb * f
    n_steps = MM + NN - 1
    row_axis, slab, _ = _layout(B, MM)
    assert row_axis == 1, "plane-split kernel is pairs-on-sublanes only"
    P = slab[0]
    # base plane lanes: cover base rows 0..Mb, 128-aligned independently of
    # the refined width (window slices stay lane-aligned for every f)
    Lb = ceil_to(Mb + 1, LANES)
    s = jnp.float32(1.0 / (f * f))
    skh = _base_stream(hi3.astype(jnp.float32) * s, DMA_BATCH, P, Lb, f)
    skl = _base_stream(lo3.astype(jnp.float32) * s, DMA_BATCH, P, Lb, f)

    hi_stack = stack_pad is not None
    if hi_stack:
        Tp = ceil_to(n_steps + 2, LANES) + stack_pad
        stk_shape, stk_spec = ((Tp, f, P, Lb),
                               pl.BlockSpec(memory_space=pl.ANY))
    else:
        stk_shape = (1, 1, 8, LANES)
        stk_spec = pl.BlockSpec(memory_space=pl.ANY)

    kernel = functools.partial(
        _wavefront_df_planes_kernel, n_steps=n_steps, MM=MM, NN=NN,
        naive=naive, refine=f, hi_stack=hi_stack,
        out_offset=stack_pad if hi_stack else 0,
        window_seg=WINDOW_SEG if window_seg is None else window_seg)
    outh, outl, stk = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((f, P, Lb), jnp.float32),
                   jax.ShapeDtypeStruct((f, P, Lb), jnp.float32),
                   jax.ShapeDtypeStruct(stk_shape, jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   stk_spec),
        scratch_shapes=[
            pltpu.VMEM((2, f, P, Lb), jnp.float32),
            pltpu.VMEM((2, f, P, Lb), jnp.float32),
            pltpu.VMEM((2, DMA_BATCH, P, Lb), jnp.float32),
            pltpu.VMEM((2, DMA_BATCH, P, Lb), jnp.float32),
            pltpu.SemaphoreType.DMA((8,)),
            pltpu.VMEM((1, P, Lb), jnp.float32),
            pltpu.VMEM((1, P, Lb), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(skh, skl)
    # final value: refined row MM = plane MM % f, base lane MM // f
    h = outh[MM % f, :B, MM // f]
    l = outl[MM % f, :B, MM // f]
    val = h.astype(jnp.float64) + l.astype(jnp.float64)
    return (val, stk) if hi_stack else val


@functools.partial(jax.jit, static_argnames=("naive", "dyadic_order"))
def solve_final_df_pl(hi: jnp.ndarray, lo: jnp.ndarray, naive: bool = False,
                      dyadic_order: int = 0) -> jnp.ndarray:
    """Plane-split value-only df64 solve (bit-equal to
    :func:`solve_final_df`, base-width streams). Caller gates on
    :func:`planes_ok`."""
    import math

    from .pallas_solver import _chunk_map, pair_chunk

    f = 2 ** dyadic_order
    batch_shape = hi.shape[:-2]
    Mb, Nb = hi.shape[-2], hi.shape[-1]
    MM, NN = Mb * f, Nb * f
    B = math.prod(batch_shape)
    hi3 = hi.reshape((B,) + hi.shape[-2:])
    lo3 = lo.reshape((B,) + lo.shape[-2:])
    chunk = min(pair_chunk(MM, NN, planes=2), 128)
    out = _chunk_map(
        lambda c: _solve_final_one_df_pl(c[0], c[1], naive, dyadic_order),
        (hi3, lo3), chunk)
    return out.reshape(batch_shape)


@functools.partial(jax.jit,
                   static_argnames=("naive", "dyadic_order", "stack_pad"))
def solve_final_df_stack_pl(hi: jnp.ndarray, lo: jnp.ndarray,
                            naive: bool = False, dyadic_order: int = 0,
                            stack_pad: int = 8):
    """Plane-split analogue of :func:`solve_final_df_stack`: the emitted
    hi stack is in PLANE layout ``(nc, Tp, f, P, Lb)`` for
    :func:`..pallas_adjoint.adjoint_planes_collapsed`. Same shared-chunk
    contract; caller gates on ``pallas_adjoint.planes_adj_ok``."""
    import math

    from .pallas_adjoint import shared_chunk

    f = 2 ** dyadic_order
    batch_shape = hi.shape[:-2]
    Mb, Nb = hi.shape[-2], hi.shape[-1]
    B = math.prod(batch_shape)
    hi3 = hi.reshape((B,) + hi.shape[-2:])
    lo3 = lo.reshape((B,) + lo.shape[-2:])
    chunk = shared_chunk(Mb * f, Nb * f)
    if B <= chunk:
        val, stk = _solve_final_one_df_pl(hi3, lo3, naive, dyadic_order,
                                          stack_pad=stack_pad)
        return val.reshape(batch_shape), stk[None]
    Bp = ceil_to(B, chunk)
    hi4 = jnp.pad(hi3, ((0, Bp - B), (0, 0), (0, 0)))
    lo4 = jnp.pad(lo3, ((0, Bp - B), (0, 0), (0, 0)))
    hi4 = hi4.reshape(Bp // chunk, chunk, Mb, Nb)
    lo4 = lo4.reshape(Bp // chunk, chunk, Mb, Nb)

    def one(args):
        h, l = args
        return _solve_final_one_df_pl(h, l, naive, dyadic_order,
                                      stack_pad=stack_pad)

    val, stk = jax.lax.map(one, (hi4, lo4))
    return val.reshape(Bp)[:B].reshape(batch_shape), stk


# ---------------------------------------------------------------------------
# In-kernel increment generation (RBF): the kernel's only inputs are path
# points -- no increment grid, no sheared stream, no prep pipeline
# ---------------------------------------------------------------------------

T_GEN = 6  # base diags per loop batch: 6 = lcm(2, 3) makes both the inc
           # ping-pong slot (k % 2) and the G rotation slot (k % 3) static


def _make_inc_gen(point_refs, gdh, gdl, gbh, gbl, *, Mb, Nb, refine,
                  emit_wait=None, emit_start=None):
    """Build the in-kernel RBF increment-generation closures.

    Shared by the forward gen kernel and the gen adjoint (which generates
    its reverse stream from swapped+flipped path slabs; DF add/mul and
    two-prod are exactly commutative, so the generated reverse diagonals
    are bit-identical to transposing+flipping the forward ones).

    ``point_refs``: the 10 VMEM point-slab refs in
    :func:`_gen_point_slabs` order. ``gdh/gdl``: (3, P, Lb) G-diagonal
    rotation scratch; ``gbh/gbl``: (2, P, Lb) generated-increment
    ping-pong scratch. ``emit_wait(t)`` / ``emit_start(k, t)`` optionally
    bracket the gb-slot overwrite for HBM emission (forward kernel only).

    Returns ``(gen_G, gen_inc)``; the caller seeds G diagonals 0 and 1
    (``gdh[0], gdl[0] = gen_G(0)`` etc.) before the loop and must call
    ``gen_inc(k, t)`` with ``t`` congruent to ``k`` mod 6 (= lcm of the
    inc ping-pong and G-rotation slots).
    """
    (xh_ref, xl_ref, sxh_ref, sxl_ref, yrh_ref, yrl_ref,
     syh_ref, syl_ref, rsh_ref, rsl_ref) = point_refs
    D = xh_ref.shape[0]
    P, Lb = gbh.shape[1], gbh.shape[2]
    C = Lb - 1
    f = refine
    iib = lax.broadcasted_iota(jnp.int32, (P, Lb), 1)
    zero = jnp.float32(0.0)
    inv_f2 = np.float32(1.0 / (f * f))
    rsh = rsh_ref[...]
    rsl = rsl_ref[...]

    def gen_G(kk, wsb=None, Wb=None):
        """DF G point-diagonal ``kk`` on lanes [wsb, wsb+Wb) (full slab if
        None). Rolls are full-width; arithmetic windowed."""
        rho = lax.rem(jnp.int32(kk) - jnp.int32(C) + jnp.int32(2 * Lb),
                      jnp.int32(Lb))

        def win(v):
            return v if wsb is None else v[:, wsb:wsb + Wb]

        crh = crl = None
        for d in range(D):
            ryh = win(pltpu.roll(yrh_ref[d], rho, axis=1))
            ryl = win(pltpu.roll(yrl_ref[d], rho, axis=1))
            ph, pl_ = _df_mul(win(xh_ref[d]), win(xl_ref[d]), ryh, ryl)
            if crh is None:
                crh, crl = ph, pl_
            else:
                crh, crl = _df_add(crh, crl, ph, pl_)
        syh = win(pltpu.roll(syh_ref[...], rho, axis=1))
        syl = win(pltpu.roll(syl_ref[...], rho, axis=1))
        d2h, d2l = _df_add(win(sxh_ref[...]), win(sxl_ref[...]), syh, syl)
        m2h, m2l = _df_mul_const(crh, crl, -2.0)
        d2h, d2l = _df_add(d2h, d2l, m2h, m2l)
        ah, al = _df_mul(d2h, d2l, win(rsh), win(rsl))
        return _df_exp(ah, al)

    def gen_inc(k, t, wsb=None, Wb=None):
        """Generate base inc diagonal ``k`` into gbuf slot ``t % 2``;
        G slots are static (T = 6 = lcm(2,3)): k % 3 == t % 3."""
        s2 = (t + 2) % 3           # slot of G diag k+2 (to be written)
        s1 = (t + 1) % 3
        s0 = t % 3
        gh, gl = gen_G(k + 2, wsb, Wb)
        if wsb is None:
            gdh[s2], gdl[s2] = gh, gl
            g0h_, g0l_ = gdh[s0], gdl[s0]
            g1f_h, g1f_l = gdh[s1], gdl[s1]
        else:
            gdh[s2, :, wsb:wsb + Wb] = gh
            gdl[s2, :, wsb:wsb + Wb] = gl
            g0h_ = gdh[s0, :, wsb:wsb + Wb]
            g0l_ = gdl[s0, :, wsb:wsb + Wb]
            g1f_h, g1f_l = gdh[s1], gdl[s1]
        # shifts: z[a] = x[a + 1] (roll by Lb - 1; wrap junk lands outside
        # the valid grid and is zero-masked below)
        sh1 = jnp.int32(Lb - 1)
        if wsb is None:
            g2r_h = pltpu.roll(gh, sh1, axis=1)
            g2r_l = pltpu.roll(gl, sh1, axis=1)
        else:
            g2r_h = pltpu.roll(gdh[s2], sh1, axis=1)[:, wsb:wsb + Wb]
            g2r_l = pltpu.roll(gdl[s2], sh1, axis=1)[:, wsb:wsb + Wb]
        g1r_h = pltpu.roll(g1f_h, sh1, axis=1)
        g1r_l = pltpu.roll(g1f_l, sh1, axis=1)
        if wsb is not None:
            g1r_h = g1r_h[:, wsb:wsb + Wb]
            g1r_l = g1r_l[:, wsb:wsb + Wb]
            g1h_, g1l_ = g1f_h[:, wsb:wsb + Wb], g1f_l[:, wsb:wsb + Wb]
        else:
            g1h_, g1l_ = g1f_h, g1f_l
        # dd in df_prep._dd's op order: (g11 + g00) - (g10 + g01)
        ah, al = _df_add(g2r_h, g2r_l, g0h_, g0l_)
        bh, bl = _df_add(g1r_h, g1r_l, g1h_, g1l_)
        ih, il = _df_add(ah, al, -bh, -bl)
        # build the windowed iota fresh: slicing a broadcasted_iota's
        # sublane-replicated layout crashes Mosaic's vector-layout pass
        iiw = iib if wsb is None else (
            lax.broadcasted_iota(jnp.int32, (P, Wb), 1) + jnp.int32(wsb))
        bi = jnp.int32(0) + k - iiw
        valid = (iiw < Mb) & (bi >= 0) & (bi < Nb)
        ih = jnp.where(valid, ih * inv_f2, zero)
        il = jnp.where(valid, il * inv_f2, zero)
        if emit_wait is not None:
            # the k-2 emission reads this slot: it must land before the
            # overwrite below (the dst index is irrelevant to the wait)
            emit_wait(t)
        if wsb is None:
            gbh[t % 2], gbl[t % 2] = ih, il
        else:
            gbh[t % 2, :, wsb:wsb + Wb] = ih
            gbl[t % 2, :, wsb:wsb + Wb] = il
        if emit_start is not None:
            emit_start(k, t)

    return gen_G, gen_inc


def _wavefront_df_gen_kernel(xh_ref, xl_ref, sxh_ref, sxl_ref,
                             yrh_ref, yrl_ref, syh_ref, syl_ref,
                             rsh_ref, rsl_ref,
                             outh_ref, outl_ref, stk_ref, stkl_ref, inc_ref,
                             sh_ref, sl_ref, gdh, gdl, gbh, gbl, isem,
                             *, n_steps, MM, NN, Mb, Nb, naive, refine,
                             hi_stack=False, lo_stack=False, out_offset=0,
                             emit_inc=False, window_seg=0, margin_top=8):
    """Double-double wavefront with IN-KERNEL RBF increment generation.

    Replaces the XLA prep pipeline (DF Gram + double difference,
    ~600 ops/cell of VPU work in its own HBM pass) and the sheared stream
    construction + streaming (the largest remaining HBM passes of the
    benchmark step) for the RBF static kernel: base increment diagonals are
    generated on the fly from rolling views of the path points, two G
    diagonals ahead of the refined wavefront.

    Generation math (mirrors :mod:`.df_prep` op-for-op so values match the
    stream route to DF rounding): for G point-diagonal ``kk`` (cells
    ``(a, kk - a)``), lane ``a`` needs ``y[kk - a]`` -- a single dynamic
    lane-roll of the REVERSED y slab ``yr[t] = y[C - t]`` by
    ``rho = kk - C`` (roll wrap brings junk that only ever lands outside
    the valid grid; the increment zero-mask below is the load-bearing
    guard). Then ``arg = (sx + sy - 2<x, y>) * (-1/sigma)`` and
    ``G = _df_exp(arg)``, all in double-float. Base increment diagonal
    ``k`` is the double difference of G diagonals ``k, k+1, k+2`` (kept in
    a 3-slot rotation), masked to EXACT zeros outside ``0 <= a < Mb,
    0 <= k - a < Nb`` -- the out-of-column zero-continuation invariant
    every downstream freeze/extraction relies on -- and pre-scaled by the
    exact ``1/f^2``.

    Inputs (all VMEM): xh/xl ``(D, P, Lb)`` x components at base row lane
    ``a``; sxh/sxl ``(P, Lb)`` |x_a|^2; yrh/yrl ``(D, P, Lb)`` reversed y
    components; syh/syl ``(P, Lb)`` reversed |y_b|^2; rsh/rsl ``(P, 1)``
    the DF scalar ``-1/sigma``. Outputs: final value slabs, plus
    optionally the hi solution stack (``hi_stack``, entry q at
    q + out_offset -- same contract as ``_wavefront_df_kernel``) and the
    hi increment base-diagonal stack (``emit_inc``, entry k at k; the
    backward unshears it instead of re-running the prep).

    Lane windows: one phase plan drives both halves -- the generation and
    the refined compute run on the refined window divided by ``f``
    (align = f*LANES keeps base slices 128-aligned; margin_top >= 3f + 2
    so G diagonal ``k + 2`` plus its ``a + 1`` shift fit). Register rolls
    are full-width (O(slab) per step, negligible); arithmetic is windowed.

    The refined state uses the PLANE representation of
    :func:`_wavefront_df_planes_kernel` (Mosaic cannot dilate lanes), so
    the generated base diagonals feed the refined step directly -- no
    shuffle between the two halves.
    """
    assert not (lo_stack and emit_inc), \
        "lo_stack reuses the emit_inc semaphore slots"
    assert not lo_stack or hi_stack, "lo_stack requires hi_stack"
    T = T_GEN
    f = refine
    D = xh_ref.shape[0]
    P = sh_ref.shape[2]
    Lb = xh_ref.shape[2]
    C = Lb - 1
    n_slots = pl.cdiv(n_steps, f)
    n_batches = pl.cdiv(n_slots, T)
    spb = T * f
    iib = lax.broadcasted_iota(jnp.int32, (P, Lb), 1)
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    inv_f2 = np.float32(1.0 / (f * f))

    phases = None
    if window_seg:
        phases = _window_phases(n_batches, spb, n_steps, NN, f * Lb,
                                window_seg, margin_top=margin_top,
                                align=f * LANES)

    for p in range(f):
        sh_ref[0, p] = jnp.ones((P, Lb), jnp.float32)
        sh_ref[1, p] = jnp.ones((P, Lb), jnp.float32)
        sl_ref[0, p] = jnp.zeros((P, Lb), jnp.float32)
        sl_ref[1, p] = jnp.zeros((P, Lb), jnp.float32)
    gbh[1] = jnp.zeros((P, Lb), jnp.float32)   # inc diag -1 == exact zeros
    gbl[1] = jnp.zeros((P, Lb), jnp.float32)

    def emit_wait(t):
        # (forward emission only) the k-2 emission reads slot t%2
        pltpu.make_async_copy(gbh.at[_ix(t % 2)], inc_ref.at[_ix(0)],
                              isem.at[_ix(6 + t % 2)]).wait()

    def emit_start(k, t):
        @pl.when(k < n_slots)
        def _():
            pltpu.make_async_copy(gbh.at[_ix(t % 2)],
                                  inc_ref.at[_ix(jnp.int32(0) + k)],
                                  isem.at[_ix(6 + t % 2)]).start()

    gen_G, gen_inc = _make_inc_gen(
        (xh_ref, xl_ref, sxh_ref, sxl_ref, yrh_ref, yrl_ref,
         syh_ref, syl_ref, rsh_ref, rsl_ref),
        gdh, gdl, gbh, gbl, Mb=Mb, Nb=Nb, refine=f,
        emit_wait=emit_wait if emit_inc else None,
        emit_start=emit_start if emit_inc else None)

    # pre-loop: G diagonals 0 and 1 (full width; 2 steps, negligible)
    g0h, g0l = gen_G(0)
    gdh[0], gdl[0] = g0h, g0l
    g1h, g1l = gen_G(1)
    gdh[1], gdl[1] = g1h, g1l

    if emit_inc:
        # seed the two emission wait-chains (entries are overwritten by
        # the real k = 0, 1 copies before anything reads them)
        pltpu.make_async_copy(gbh.at[_ix(0)], inc_ref.at[_ix(0)],
                              isem.at[_ix(6)]).start()
        pltpu.make_async_copy(gbh.at[_ix(1)], inc_ref.at[_ix(1)],
                              isem.at[_ix(7)]).start()

    def step(q, k, s, sp, cur, prev, wsb=None, Wb=None, iibw=None):
        """One refined step in PLANE representation (see
        :func:`_wavefront_df_planes_kernel`); cur/prev are the generated
        base increment (hi, lo) slabs for diagonals k, k-1 (sliced)."""
        vm2, vm1 = sp, 1 - sp
        iiw = iib if wsb is None else iibw

        def st(ref, slot, p):
            if wsb is None:
                return ref[slot, p]
            return ref[slot, p, :, wsb:wsb + Wb]

        k10 = [(st(sh_ref, vm1, p), st(sl_ref, vm1, p)) for p in range(f)]
        p2 = [(st(sh_ref, vm2, p), st(sl_ref, vm2, p)) for p in range(f)]

        def rolled(pair):
            return (pltpu.roll(pair[0], jnp.int32(1), axis=1),
                    pltpu.roll(pair[1], jnp.int32(1), axis=1))

        k01 = [rolled(k10[f - 1])] + k10[:f - 1]
        k00 = [rolled(p2[f - 1])] + p2[:f - 1]
        u = [rolled(cur if s == f - 1 else prev)] + \
            [(cur if p <= s else prev) for p in range(f - 1)]

        p_star = (s + 2) % f
        off = (s + 2 - p_star) // f
        hit_lane = jnp.int32(0) + k + off

        vs = []
        for p in range(f):
            vh, vl = _df_scheme_gen(k00[p][0], k00[p][1],
                                    k01[p][0], k01[p][1],
                                    k10[p][0], k10[p][1],
                                    u[p][0], u[p][1], naive)
            mask = iiw > (MM - p) // f
            if p == p_star:
                mask = mask | (iiw == hit_lane)
            if p == 0:
                mask = mask | (iiw == 0)
            vh = jnp.where(mask, one, vh)
            vl = jnp.where(mask, zero, vl)
            if wsb is not None and wsb > 0 and p == 0:
                edge = iiw == wsb
                vh = jnp.where(edge, p2[0][0], vh)
                vl = jnp.where(edge, p2[0][1], vl)
            vs.append((vh, vl))

        if hi_stack:
            @pl.when(q >= 2)
            def _():
                pltpu.make_async_copy(
                    sh_ref.at[_ix(vm2)],
                    stk_ref.at[_ix(q - 2 + out_offset)],
                    isem.at[_ix(4 + sp)]).wait()
                if lo_stack:
                    pltpu.make_async_copy(
                        sl_ref.at[_ix(vm2)],
                        stkl_ref.at[_ix(q - 2 + out_offset)],
                        isem.at[_ix(6 + sp)]).wait()
        for p in range(f):
            if wsb is None:
                sh_ref[vm2, p] = vs[p][0]
                sl_ref[vm2, p] = vs[p][1]
            else:
                sh_ref[vm2, p, :, wsb:wsb + Wb] = vs[p][0]
                sl_ref[vm2, p, :, wsb:wsb + Wb] = vs[p][1]
        if hi_stack:
            pltpu.make_async_copy(sh_ref.at[_ix(vm2)],
                                  stk_ref.at[_ix(q + out_offset)],
                                  isem.at[_ix(4 + sp)]).start()
            if lo_stack:
                pltpu.make_async_copy(sl_ref.at[_ix(vm2)],
                                      stkl_ref.at[_ix(q + out_offset)],
                                      isem.at[_ix(6 + sp)]).start()

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
                return gbh[slot], gbl[slot]
            return (gbh[slot, :, wsb:wsb + Wb],
                    gbl[slot, :, wsb:wsb + Wb])

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
                        # q % 2: s % 2 when f is even, k % 2 == t % 2
                        # when f == 1 (T is even)
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
        pltpu.make_async_copy(sh_ref.at[_ix(last)],
                              stk_ref.at[_ix(n_steps - 1 + out_offset)],
                              isem.at[_ix(4 + last)]).wait()
        if lo_stack:
            pltpu.make_async_copy(
                sl_ref.at[_ix(last)],
                stkl_ref.at[_ix(n_steps - 1 + out_offset)],
                isem.at[_ix(6 + last)]).wait()

        @pl.when(n_steps >= 2)
        def _():
            pltpu.make_async_copy(
                sh_ref.at[_ix(1 - last)],
                stk_ref.at[_ix(n_steps - 2 + out_offset)],
                isem.at[_ix(4 + (1 - last))]).wait()
            if lo_stack:
                pltpu.make_async_copy(
                    sl_ref.at[_ix(1 - last)],
                    stkl_ref.at[_ix(n_steps - 2 + out_offset)],
                    isem.at[_ix(6 + (1 - last))]).wait()
    if emit_inc:
        for off in (0, 1):
            pltpu.make_async_copy(gbh.at[_ix(off)], inc_ref.at[_ix(off)],
                                  isem.at[_ix(6 + off)]).wait()
    for p in range(f):
        outh_ref[p] = sh_ref[last, p]
        outl_ref[p] = sl_ref[last, p]


# ---------------------------------------------------------------------------
# XLA wrappers
# ---------------------------------------------------------------------------

def _split_hi_lo(x64: jnp.ndarray):
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def _pad_skew_components(hi: jnp.ndarray, lo: jnp.ndarray,
                         dyadic_order: int = 0):
    """f32 hi/lo base components -> streams + geometry.

    Returns ``(skh, skl, n_steps, row_axis, slab, f)``. With
    ``dyadic_order > 0`` the streams are row-stretched *base* streams
    (offset 0, f^2 x less HBM, no refine passes -- measured to dominate the
    old pipeline); components are pre-scaled by the exact power of two
    ``1/f^2``.
    """
    from .pallas_solver import (_layout, _stretch_stream, _aligned_streams_ps,
                                _use_aligned)

    f = 2 ** dyadic_order
    B, Mb, Nb = hi.shape
    row_axis, slab, _ = _layout(B, Mb * f)
    if f == 1:
        if _use_aligned(B, slab, row_axis):
            skh, skl = _aligned_streams_ps([hi, lo], 1, DMA_BATCH, slab)
            return skh, skl, Mb + Nb - 1, row_axis, slab, 1
        skh, n_steps, row_axis, slab = _pad_shear(hi, DMA_BATCH)
        skl, _, _, _ = _pad_shear(lo, DMA_BATCH)
        return skh, skl, n_steps, row_axis, slab, f
    s = jnp.float32(1.0 / (f * f))
    if _use_aligned(B, slab, row_axis):
        skh, skl = _aligned_streams_ps([hi * s, lo * s], f, DMA_BATCH, slab)
    else:
        skh = _stretch_stream(hi * s, f, DMA_BATCH, row_axis, slab)
        skl = _stretch_stream(lo * s, f, DMA_BATCH, row_axis, slab)
    n_steps = Mb * f + Nb * f - 1
    return skh, skl, n_steps, row_axis, slab, f


def _pad_skew_df(inc: jnp.ndarray, dyadic_order: int = 0):
    """f64 base (B, M-1, N-1) -> sheared hi/lo f32 base streams.

    The hi/lo split runs at *base* resolution (one emulated-f64 subtraction
    per base cell); refinement happens in-kernel.
    """
    hi, lo = _split_hi_lo(inc)
    return _pad_skew_components(hi, lo, dyadic_order)


def _df_scratch(slab, ckpt=False):
    """Kernel scratch: states, DMA landing buffers, semaphores, carries."""
    base = [
        pltpu.VMEM((2,) + slab, jnp.float32),
        pltpu.VMEM((2,) + slab, jnp.float32),
        pltpu.VMEM((2, DMA_BATCH) + slab, jnp.float32),
        pltpu.VMEM((2, DMA_BATCH) + slab, jnp.float32),
        pltpu.SemaphoreType.DMA((8,)),
        pltpu.VMEM((1,) + slab, jnp.float32),
        pltpu.VMEM((1,) + slab, jnp.float32),
    ]
    if ckpt:
        base.append(pltpu.VMEM((2,) + slab, jnp.float32))
    return base


def _solve_final_one_df(hi3: jnp.ndarray, lo3: jnp.ndarray, naive: bool,
                        dyadic_order: int = 0, stack_pad=None,
                        ckpt: bool = False, window_seg=None,
                        forced_phases=None):
    """Final-corner df64 solve; with ``stack_pad`` also returns the hi
    plane's diagonal stack (entry q at q + stack_pad) for adjoint reuse.
    With ``ckpt`` instead returns the SPARSE checkpoint stack (pair m of
    diagonals ``(T-6-m*C, T-5-m*C)`` at slabs ``(2m, 2m+1)``, ``C`` from
    :func:`..pallas_adjoint.ckpt_pairs` geometry) for the checkpoint
    adjoint -- ``C/2``x less stack HBM traffic than the full stack."""
    from .pallas_adjoint import TB as ATB, ckpt_pairs, ckpt_supported

    assert not (ckpt and stack_pad is not None)
    B = hi3.shape[0]
    skh, skl, n_steps, row_axis, slab, f = _pad_skew_components(
        hi3, lo3, dyadic_order)
    MM = hi3.shape[-2] * f
    hi_stack = stack_pad is not None
    ckpt_c = ATB * f if ckpt else 0
    if hi_stack:
        Tp = ceil_to(n_steps + 2, LANES) + stack_pad
        stk_shape, stk_spec = (Tp,) + slab, pl.BlockSpec(memory_space=pl.ANY)
    elif ckpt:
        assert row_axis == 1 and ckpt_supported(n_steps, f)
        stk_shape = (2 * ckpt_pairs(n_steps, f) + 2,) + slab
        stk_spec = pl.BlockSpec(memory_space=pl.ANY)
    else:
        stk_shape = (1, 8, LANES)
        stk_spec = pl.BlockSpec(memory_space=pl.ANY)
    kernel = functools.partial(_wavefront_df_kernel, n_steps=n_steps, MM=MM,
                               row_axis=row_axis, naive=naive,
                               grid_out=False, refine=f, hi_stack=hi_stack,
                               out_offset=stack_pad if hi_stack else 0,
                               ckpt_c=ckpt_c, NN=hi3.shape[-1] * f,
                               window_seg=(WINDOW_SEG if window_seg is None
                                           else window_seg),
                               forced_phases=forced_phases)
    outh, outl, stk = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(slab, jnp.float32),
                   jax.ShapeDtypeStruct(slab, jnp.float32),
                   jax.ShapeDtypeStruct(stk_shape, jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   stk_spec),
        scratch_shapes=_df_scratch(slab, ckpt=ckpt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(skh, skl)
    h = _extract_final(outh, row_axis, MM, B)
    l = _extract_final(outl, row_axis, MM, B)
    val = h.astype(jnp.float64) + l.astype(jnp.float64)
    return (val, stk) if (hi_stack or ckpt) else val


def _solve_final_one(inc3: jnp.ndarray, naive: bool,
                     dyadic_order: int = 0) -> jnp.ndarray:
    hi, lo = _split_hi_lo(inc3)
    return _solve_final_one_df(hi, lo, naive, dyadic_order)


def _solve_grid_one(inc3: jnp.ndarray, naive: bool,
                    dyadic_order: int = 0) -> jnp.ndarray:
    B = inc3.shape[0]
    skh, skl, n_steps, row_axis, slab, f = _pad_skew_df(inc3, dyadic_order)
    MM, NN = inc3.shape[-2] * f, inc3.shape[-1] * f
    Tp = ceil_to(n_steps + 2, LANES)   # aligned stack; entries at q + 2
    kernel = functools.partial(_wavefront_df_kernel, n_steps=n_steps, MM=MM,
                               row_axis=row_axis, naive=naive, grid_out=True,
                               out_offset=2, refine=f)
    diag_h, diag_l, _ = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((Tp,) + slab, jnp.float32),
                   jax.ShapeDtypeStruct((Tp,) + slab, jnp.float32),
                   jax.ShapeDtypeStruct((1, 8, LANES), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=_df_scratch(slab),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(skh, skl)
    Kh = _stack_to_grid(diag_h, row_axis, MM, NN, B,
                        pre=2).astype(jnp.float64)
    # lo plane carries the correction term: its boundary is exactly zero
    Kl = _stack_to_grid(diag_l, row_axis, MM, NN, B,
                        boundary=0.0, pre=2).astype(jnp.float64)
    return Kh + Kl


@functools.partial(jax.jit, static_argnames=("naive", "dyadic_order"))
def solve_final(inc: jnp.ndarray, naive: bool = False,
                dyadic_order: int = 0) -> jnp.ndarray:
    """Double-double forward solve; returns f64 ``K[..., -1, -1]``."""
    from .pallas_solver import _chunk_map, pair_chunk

    batch_shape = inc.shape[:-2]
    f = 2 ** dyadic_order
    MM, NN = inc.shape[-2] * f, inc.shape[-1] * f
    inc3 = inc.reshape((-1,) + inc.shape[-2:]).astype(jnp.float64)
    inc3, t = _maybe_transpose(inc3, MM)
    if t:
        MM, NN = NN, MM
    out = _chunk_map(lambda c: _solve_final_one(c, naive=naive,
                                                dyadic_order=dyadic_order),
                     inc3, pair_chunk(MM, NN, planes=2))
    return out.reshape(batch_shape)


def supported_df(hi: jnp.ndarray) -> bool:
    """Gate for DF (hi, lo) f32 inputs: TPU + shorter refined side in VMEM."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    if platform not in ("tpu", "axon"):
        return False
    MM, NN = hi.shape[-2], hi.shape[-1]
    if MM == 0 or NN == 0:
        return False
    return min(MM, NN) + 1 <= MAX_ROWS


@functools.partial(jax.jit, static_argnames=("naive", "dyadic_order"))
def solve_final_df(hi: jnp.ndarray, lo: jnp.ndarray, naive: bool = False,
                   dyadic_order: int = 0) -> jnp.ndarray:
    """Double-double forward solve directly on DF (hi, lo) f32 increments
    (no f64 round-trip); returns f64 ``K[..., -1, -1]``."""
    import math

    from .pallas_solver import _chunk_map, pair_chunk

    batch_shape = hi.shape[:-2]
    f = 2 ** dyadic_order
    MM, NN = hi.shape[-2] * f, hi.shape[-1] * f
    B = math.prod(batch_shape)
    hi3 = hi.reshape((B,) + hi.shape[-2:])
    lo3 = lo.reshape((B,) + lo.shape[-2:])
    if MM + 1 > MAX_ROWS:  # transpose covariance: final corner is invariant
        hi3 = jnp.swapaxes(hi3, -1, -2)
        lo3 = jnp.swapaxes(lo3, -1, -2)
        MM, NN = NN, MM
    out = _chunk_map(
        lambda c: _solve_final_one_df(c[0], c[1], naive, dyadic_order),
        (hi3, lo3), pair_chunk(MM, NN, planes=2))
    return out.reshape(batch_shape)


@functools.partial(jax.jit,
                   static_argnames=("naive", "dyadic_order", "stack_pad"))
def solve_final_df_stack(hi: jnp.ndarray, lo: jnp.ndarray,
                         naive: bool = False, dyadic_order: int = 0,
                         stack_pad: int = 8):
    """Df64 final-corner solve that ALSO emits the hi plane's diagonal
    stack (entry q at q + stack_pad) for the fused adjoint to consume --
    one sweep serves both the forward value and the backward's recompute.

    Returns ``(values (B,), stacks (n_chunks, Tp, P, L))``: the batch is
    chunked with the SAME chunk size the fused adjoint uses
    (``pallas_adjoint`` shared chunk), so each stack entry pairs with the
    adjoint's corresponding chunk (zero-padded tail pairs solve to the
    constant-1 boundary; their cotangent is zeroed by ``g``). The caller
    gates on geometry (no transpose, pairs-on-sublanes).
    """
    import math

    from .pallas_adjoint import shared_chunk
    from ..utils import ceil_to as _ceil

    f = 2 ** dyadic_order
    batch_shape = hi.shape[:-2]
    Mb, Nb = hi.shape[-2], hi.shape[-1]
    B = math.prod(batch_shape)
    hi3 = hi.reshape((B,) + hi.shape[-2:])
    lo3 = lo.reshape((B,) + lo.shape[-2:])
    chunk = shared_chunk(Mb * f, Nb * f)
    if B <= chunk:
        val, stk = _solve_final_one_df(hi3, lo3, naive, dyadic_order,
                                       stack_pad=stack_pad)
        return val.reshape(batch_shape), stk[None]
    Bp = _ceil(B, chunk)
    hi4 = jnp.pad(hi3, ((0, Bp - B), (0, 0), (0, 0)))
    lo4 = jnp.pad(lo3, ((0, Bp - B), (0, 0), (0, 0)))
    hi4 = hi4.reshape(Bp // chunk, chunk, Mb, Nb)
    lo4 = lo4.reshape(Bp // chunk, chunk, Mb, Nb)

    def one(args):
        h, l = args
        return _solve_final_one_df(h, l, naive, dyadic_order,
                                   stack_pad=stack_pad)

    val, stk = jax.lax.map(one, (hi4, lo4))   # (nc, chunk), (nc, Tp, P, L)
    return val.reshape(Bp)[:B].reshape(batch_shape), stk


# ---------------------------------------------------------------------------
# In-kernel generation wrappers
# ---------------------------------------------------------------------------

def gen_supported(B: int, M: int, N: int, dyadic_order: int) -> bool:
    """Geometry gate for the in-kernel RBF generation kernel: TPU backend,
    pairs-on-sublanes layout, f in (2, 4) (the plane-split consumption and
    its adjoint), and MATCHING base lane widths on both sides -- the gen
    kernel's roll modulus ties the x-row and reversed-y views to one
    width, and the plane-split adjoint's stack pairing needs the forward
    plane width to equal ``ceil(Mb+1, LANES)``."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    if platform not in ("tpu", "axon"):
        return False
    f = 2 ** dyadic_order
    if f not in (2, 4) or M < 2 or N < 2 or B < 1:
        return False
    MM, NN = (M - 1) * f, (N - 1) * f
    if MM + 1 > MAX_ROWS or NN + 1 > MAX_ROWS:
        return False
    return ceil_to(M, LANES) == ceil_to(N, LANES)


def _gen_point_slabs(Xp, Yp, sigma, P: int, Lb: int):
    """Per-pair paths -> the gen kernel's VMEM point slabs (all tiny).

    Mirrors :mod:`.df_prep`'s forward math op-for-op (DF split at f64,
    ``_sq_norms`` accumulation order, ``-1/sigma`` via one emulated-f64
    division) so generated increments match the prep route to DF rounding.
    """
    from . import df32, df_prep

    B, M, D = Xp.shape
    N = Yp.shape[1]
    x = df32.from_f64(Xp.astype(jnp.float64))
    y = df32.from_f64(Yp.astype(jnp.float64))
    sx = df_prep._sq_norms(x)                      # DF (B, M)
    sy = df_prep._sq_norms(y)
    rs = df32.from_f64(-1.0 / jnp.asarray(sigma).astype(jnp.float64))

    def pad_x(c):                                  # (B, M[, D]) -> (P, Lb, .)
        pad = [(0, P - B), (0, Lb - M)] + [(0, 0)] * (c.ndim - 2)
        return jnp.pad(c, pad)

    def pad_yr(c):                                 # reversed: y[C - t]
        pad = [(0, P - B), (Lb - N, 0)] + [(0, 0)] * (c.ndim - 2)
        return jnp.pad(jnp.flip(c, axis=1), pad)

    xh, xl = (jnp.moveaxis(pad_x(c), -1, 0) for c in x)     # (D, P, Lb)
    yrh, yrl = (jnp.moveaxis(pad_yr(c), -1, 0) for c in y)
    sxh, sxl = (pad_x(c) for c in sx)                       # (P, Lb)
    syh, syl = (pad_yr(c) for c in sy)
    # full-width rs slabs: a (P, 1) operand broadcast inside a windowed
    # body crashes Mosaic's vector-layout pass (observed at the benchmark
    # geometry); 0.5 MB of VMEM buys a plain elementwise multiply
    rsh = jnp.broadcast_to(rs[0].astype(jnp.float32), (P, Lb))
    rsl = jnp.broadcast_to(rs[1].astype(jnp.float32), (P, Lb))
    return xh, xl, sxh, sxl, yrh, yrl, syh, syl, rsh, rsl


def _solve_final_one_df_gen(Xp, Yp, sigma, naive, dyadic_order,
                            stack_pad=None, emit_inc=False,
                            lo_stack=False, window_seg=None):
    """Final-corner df64 solve with IN-KERNEL RBF increment generation.

    ``Xp``/``Yp``: per-pair paths ``(B, M, D)`` / ``(B, N, D)``. With
    ``stack_pad`` also returns the hi solution stack (entry q at
    q + stack_pad) for the fused adjoint; with ``emit_inc`` also the hi
    increment base-diagonal stack (entry k at k) whose unshear
    (:func:`gen_inc_unshear`) replaces the backward's prep recompute.
    With ``lo_stack`` (requires ``stack_pad``, excludes ``emit_inc``)
    ALSO emits the LO solution stack -- the forward half of the
    stream-free df64-grade gen adjoint
    (:func:`..pallas_adjoint.adjoint_planes_gen_df`), whose product needs
    both planes of the forward solution at double-float accuracy.
    """
    B, M, D = Xp.shape
    N = Yp.shape[1]
    f = 2 ** dyadic_order
    Mb, Nb = M - 1, N - 1
    MM, NN = Mb * f, Nb * f
    n_steps = MM + NN - 1
    n_slots = -(-n_steps // f)
    row_axis, slab, _ = _layout(B, MM)
    assert row_axis == 1, "gen kernel is pairs-on-sublanes only"
    P = slab[0]
    # one lane width serves the x rows, the reversed-y rolling view AND
    # the state planes (the roll modulus ties them together)
    Lb = ceil_to(max(Mb + 1, Nb + 1), LANES)

    ins = _gen_point_slabs(Xp, Yp, sigma, P, Lb)

    hi_stack = stack_pad is not None
    if hi_stack:
        Tp = ceil_to(n_steps + 2, LANES) + stack_pad
        stk_shape = (Tp, f, P, Lb)
        stk_spec = pl.BlockSpec(memory_space=pl.ANY)
    else:
        stk_shape = (1, 1, 8, LANES)
        stk_spec = pl.BlockSpec(memory_space=pl.ANY)
    stkl_shape = stk_shape if lo_stack else (1, 1, 8, LANES)
    if emit_inc:
        Ti = ceil_to(n_slots + 2, 8)
        inc_shape = (Ti, P, Lb)
    else:
        inc_shape = (1, 8, LANES)

    seg = WINDOW_SEG if window_seg is None else window_seg
    kernel = functools.partial(
        _wavefront_df_gen_kernel, n_steps=n_steps, MM=MM, NN=NN,
        Mb=Mb, Nb=Nb, naive=naive, refine=f, hi_stack=hi_stack,
        lo_stack=lo_stack,
        out_offset=stack_pad if hi_stack else 0, emit_inc=emit_inc,
        window_seg=seg, margin_top=max(8, 3 * f + 2))
    outh, outl, stk, stkl, incs = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((f, P, Lb), jnp.float32),
                   jax.ShapeDtypeStruct((f, P, Lb), jnp.float32),
                   jax.ShapeDtypeStruct(stk_shape, jnp.float32),
                   jax.ShapeDtypeStruct(stkl_shape, jnp.float32),
                   jax.ShapeDtypeStruct(inc_shape, jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   stk_spec,
                   pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((2, f, P, Lb), jnp.float32),     # sh
            pltpu.VMEM((2, f, P, Lb), jnp.float32),     # sl
            pltpu.VMEM((3, P, Lb), jnp.float32),        # gdh
            pltpu.VMEM((3, P, Lb), jnp.float32),        # gdl
            pltpu.VMEM((2, P, Lb), jnp.float32),        # gbh
            pltpu.VMEM((2, P, Lb), jnp.float32),        # gbl
            pltpu.SemaphoreType.DMA((8,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(*ins)
    # final value: refined row MM = plane MM % f, base lane MM // f
    h = outh[MM % f, :B, MM // f]
    l = outl[MM % f, :B, MM // f]
    val = h.astype(jnp.float64) + l.astype(jnp.float64)
    outs = (val,)
    if hi_stack:
        outs = outs + (stk,)
    if lo_stack:
        outs = outs + (stkl,)
    if emit_inc:
        outs = outs + (incs,)
    return outs if len(outs) > 1 else val


def gen_inc_unshear(incs: jnp.ndarray, B: int, Mb: int, Nb: int, f: int):
    """Hi increment base-diagonal stack ``(Ti, P, Lb)`` (entry k at k) ->
    ``(B, Mb, Nb)`` f32 grid. Flat-stride inverse shear, tail pad only.
    The kernel emits the increments pre-scaled by ``1/f^2`` (the refine
    scale); undoing it is exact (power of two)."""
    Ti, P, Lb = incs.shape
    D = jnp.transpose(incs, (1, 2, 0))             # (P, Lb, Ti)
    flat = jnp.pad(D.reshape(P, Lb * Ti), ((0, 0), (0, Lb)))
    K = flat.reshape(P, Lb, Ti + 1)[:, :Mb, :Nb]   # K[p, a, b] = D[p,a,a+b]
    return K[:B] * jnp.float32(f * f)


@functools.partial(jax.jit,
                   static_argnames=("naive", "dyadic_order", "stack_pad",
                                    "emit_inc"))
def solve_final_df_gen_stack(Xp, Yp, sigma, naive: bool = False,
                             dyadic_order: int = 0, stack_pad: int = 8,
                             emit_inc: bool = True):
    """Chunked in-kernel-generation solve emitting the hi solution stack
    and (``emit_inc``) the hi increment stack (the whole prep + stream
    pipeline of :func:`solve_final_df_stack` disappears; the backward
    consumes both). With ``emit_inc=False`` (the gen-adjoint route, which
    REGENERATES the reverse stream in-kernel) the increment emission and
    its unshear pass are skipped entirely.

    Returns ``(values (B,), stacks (nc, Tp, f, P, L)[, inc_grids
    (B, Mb, Nb)])``. Chunked with the SAME shared chunk as the fused
    adjoint.
    """
    from .pallas_adjoint import shared_chunk

    f = 2 ** dyadic_order
    B, M, _ = Xp.shape
    N = Yp.shape[1]
    Mb, Nb = M - 1, N - 1
    chunk = shared_chunk(Mb * f, Nb * f)

    def one(args):
        x, y = args
        if not emit_inc:
            return _solve_final_one_df_gen(
                x, y, sigma, naive, dyadic_order, stack_pad=stack_pad)
        val, stk, incs = _solve_final_one_df_gen(
            x, y, sigma, naive, dyadic_order, stack_pad=stack_pad,
            emit_inc=True)
        return val, stk, gen_inc_unshear(incs, x.shape[0], Mb, Nb, f)

    if B <= chunk:
        out = one((Xp, Yp))
        if not emit_inc:
            return out[0], out[1][None]
        val, stk, hi = out
        return val, stk[None], hi
    Bp = ceil_to(B, chunk)
    Xq = jnp.pad(Xp, ((0, Bp - B), (0, 0), (0, 0)))
    # repeat-pad Y's tail with real points? zero paths are fine: the pad
    # pairs' values are discarded and their stacks solve the boundary
    Yq = jnp.pad(Yp, ((0, Bp - B), (0, 0), (0, 0)))
    Xc = Xq.reshape(Bp // chunk, chunk, M, -1)
    Yc = Yq.reshape(Bp // chunk, chunk, N, -1)
    out = jax.lax.map(one, (Xc, Yc))
    if not emit_inc:
        return out[0].reshape(Bp)[:B], out[1]
    val, stk, hi = out
    return (val.reshape(Bp)[:B],
            stk,
            hi.reshape(Bp, Mb, Nb)[:B])


@functools.partial(jax.jit, static_argnames=("naive", "dyadic_order"))
def solve_final_df_gen(Xp, Yp, sigma, naive: bool = False,
                       dyadic_order: int = 0):
    """Forward-only in-kernel-generation solve (no stacks): the fast path
    for value-only calls and the df-hybrid forward."""
    from .pallas_adjoint import shared_chunk

    f = 2 ** dyadic_order
    B, M, _ = Xp.shape
    N = Yp.shape[1]
    chunk = shared_chunk((M - 1) * f, (N - 1) * f)

    def one(args):
        x, y = args
        return _solve_final_one_df_gen(x, y, sigma, naive, dyadic_order)

    return _chunk_map(one, (Xp, Yp), chunk)


@functools.partial(jax.jit, static_argnames=("naive", "dyadic_order"))
def solve_final_df_ckpt(hi: jnp.ndarray, lo: jnp.ndarray,
                        naive: bool = False, dyadic_order: int = 0):
    """Df64 final-corner solve emitting the SPARSE checkpoint stack for
    :func:`..pallas_adjoint.adjoint_ckpt_collapsed` -- the fwd+bwd step's
    forward-stack HBM traffic (write here, read there) shrinks
    ``TB*f/2``-fold vs :func:`solve_final_df_stack`; the adjoint recomputes
    the skipped diagonals in-kernel from the base increment stream.

    Same chunking contract as :func:`solve_final_df_stack` (the adjoint
    consumes the stacks chunk-by-chunk). Caller gates on
    :func:`..pallas_adjoint.ckpt_supported` + ``stack_shareable``.
    """
    import math

    from .pallas_adjoint import shared_chunk
    from ..utils import ceil_to as _ceil

    f = 2 ** dyadic_order
    batch_shape = hi.shape[:-2]
    Mb, Nb = hi.shape[-2], hi.shape[-1]
    B = math.prod(batch_shape)
    hi3 = hi.reshape((B,) + hi.shape[-2:])
    lo3 = lo.reshape((B,) + lo.shape[-2:])
    chunk = shared_chunk(Mb * f, Nb * f)
    if B <= chunk:
        val, stk = _solve_final_one_df(hi3, lo3, naive, dyadic_order,
                                       ckpt=True)
        return val.reshape(batch_shape), stk[None]
    Bp = _ceil(B, chunk)
    hi4 = jnp.pad(hi3, ((0, Bp - B), (0, 0), (0, 0)))
    lo4 = jnp.pad(lo3, ((0, Bp - B), (0, 0), (0, 0)))
    hi4 = hi4.reshape(Bp // chunk, chunk, Mb, Nb)
    lo4 = lo4.reshape(Bp // chunk, chunk, Mb, Nb)

    def one(args):
        h, l = args
        return _solve_final_one_df(h, l, naive, dyadic_order, ckpt=True)

    val, stk = jax.lax.map(one, (hi4, lo4))
    return val.reshape(Bp)[:B].reshape(batch_shape), stk


@functools.partial(jax.jit, static_argnames=("naive", "dyadic_order"))
def solve_grid(inc: jnp.ndarray, naive: bool = False,
               dyadic_order: int = 0) -> jnp.ndarray:
    """Double-double solve returning the full refined f64 grid."""
    from .pallas_solver import _chunk_map, pair_chunk

    batch_shape = inc.shape[:-2]
    f = 2 ** dyadic_order
    MM, NN = inc.shape[-2] * f, inc.shape[-1] * f
    inc3 = inc.reshape((-1,) + inc.shape[-2:]).astype(jnp.float64)
    inc3, transposed = _maybe_transpose(inc3, MM)
    MMs, NNs = (NN, MM) if transposed else (MM, NN)
    grid = _chunk_map(lambda c: _solve_grid_one(c, naive=naive,
                                                dyadic_order=dyadic_order),
                      inc3, pair_chunk(MMs, NNs, planes=2))
    if transposed:
        grid = jnp.swapaxes(grid, -1, -2)
    return grid.reshape(batch_shape + (MM + 1, NN + 1))
