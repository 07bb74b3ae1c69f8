"""Fused adjoint: the reverse PDE sweep multiplies the forward stack
in-flight and emits the increment cotangent directly.

Replaces :func:`..ops.pallas_solver.adjoint_dd`'s dataflow (two full stack
write-backs + an XLA flip/roll/multiply chain over both stacks) with:

1. one forward sweep writing its diagonal stack ``S_f[q, i] = K[i, q+2-i]``
   (existing kernel, ``out_pad`` headroom for descending loads);
2. one *transposed-reversed* sweep that, as each diagonal of
   ``K_rev(inc^T-flipped)`` is produced, loads the matching forward
   diagonal (descending, double-buffered), forms
   ``P[q, i] = g * K[i-1, q-i+1] * K_rev[MM-i, NN-q+i-2]`` and streams P
   out -- the reversed stack never touches HBM.

The transposed reverse solve is the trick that makes step 2 a vector op:
with ``V[i'] = K_rev[q_r+2-i', i']`` (transposed state), the product
partner of forward row ``i`` on cotangent diagonal ``q`` sits at
``i' = i + (NN - q - 2)`` -- a per-step row *roll* (Mosaic-native),
where the untransposed pairing would need a row *reversal* (a gather).
Index algebra: ``q = T - 3 - q_r`` pairs the sweeps; wrapped roll entries
only land at grid positions outside ``1 <= i <= MM, 1 <= j <= NN``, which
the unshear slice discards.

HBM traffic per pair: one stack write + one stack read + one cotangent
write (~3 passes) vs ~8-10 for the unfused path. f32, pairs-on-sublanes
(the backward runs at f32 by design; see ops/solve.py module docstring).

The VMEM row bound applies to *both* sides here (the reversed sweep's
diagonal spans NN); rectangles with only the shorter side in budget fall
back to ``adjoint_dd``.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_solver import (LANES, SUBLANES, MAX_ROWS, PS_LAYOUT_MAX_B,
                            IN_OFF, _ix, _scheme, _chunk_map, _pad_shear,
                            _layout, _stack_to_grid, _solve_stack_one,
                            pair_chunk, adjoint_dd)
from ..utils import ceil_to, dyadic_refine

TB = 4        # diagonals per DMA batch (even: static ping-pong slots)
# In-kernel f-block lane compaction of the collapsed cotangent at flush
# time (strided lane slices; removes the XLA block-sum pass and halves the
# emitted base stack). Opt-in until the Mosaic strided-slice cost is
# chip-confirmed (scripts/interleave_probe.py "compact" mode).
import os as _os
COLLAPSE_COMPACT = bool(int(_os.environ.get("SIG_COLLAPSE_COMPACT", "0")))
PAD_F = 8     # legacy headroom constant (refine=1); see _pad_f


def _pad_f(f: int) -> int:
    """Forward-stack headroom: bounds ``E_b = T-4-(b+1)*TB*f >= -pad_f``."""
    return TB * f + 4


def _product_kernel(rinc_hbm, fstk_hbm, g_ref, out_hbm, state, ibuf, fbuf,
                    obuf, isem, carry, *, n_steps, MM, NN, L_f, naive,
                    pad_f, refine=1):
    """Transposed-reverse sweep + in-flight product.

    rinc_hbm: sheared increments of flip2(inc)^T (rows = NN) -- the
    row-stretched *base* stream when ``refine > 1`` (select + roll per
    step, see ``pallas_solver._wavefront_kernel``). fstk_hbm: forward
    stack, entry q at q + pad_f. g_ref: (P, 1) output cotangent scale.
    out_hbm: cotangent diagonal stack, entry q at q + 2 (fast unshear
    convention; entries beyond [2, T+1] are never read). state: (2, P,
    L_r); ibuf: (2, TB, P, L_r); fbuf: (2, TB*refine, P, L_f); obuf:
    (2, P, L_f). isem: 6 semaphores (rev-in, fwd-in, out x2 each).
    """
    P = state.shape[1]
    L_r = state.shape[2]
    f = refine
    TBf = TB * f
    n_slots = pl.cdiv(n_steps, f) if f > 1 else n_steps
    n_batches = pl.cdiv(n_slots, TB)
    in_off = IN_OFF if f == 1 else 0
    ii = lax.broadcasted_iota(jnp.int32, (P, L_r), 1)
    one = jnp.float32(1.0)

    state[0] = jnp.ones((P, L_r), jnp.float32)
    state[1] = jnp.ones((P, L_r), jnp.float32)

    # Pre-loop: cotangent diagonals q = T-1, T-2 have A2 = 1 (the reversed
    # solve's boundary); emit them straight from the forward stack. Their
    # obuf slots are reclaimed by the loop's unconditional same-slot waits.
    pre1 = pltpu.make_async_copy(fstk_hbm.at[_ix(n_steps - 3 + pad_f)],
                                 fbuf.at[_ix(0), _ix(0)], isem.at[_ix(2)])
    pre2 = pltpu.make_async_copy(fstk_hbm.at[_ix(n_steps - 4 + pad_f)],
                                 fbuf.at[_ix(0), _ix(1)], isem.at[_ix(3)])
    pre1.start()
    pre2.start()
    pre1.wait()
    pre2.wait()
    gv = g_ref[...]
    # cotangent stack entries land at q + 2 (fast unshear convention)
    obuf[0] = pltpu.roll(fbuf[0, 0], jnp.int32(1), axis=1) * gv
    pltpu.make_async_copy(obuf.at[_ix(0)], out_hbm.at[_ix(n_steps + 1)],
                          isem.at[_ix(4)]).start()
    obuf[1] = pltpu.roll(fbuf[0, 1], jnp.int32(1), axis=1) * gv
    pltpu.make_async_copy(obuf.at[_ix(1)], out_hbm.at[_ix(n_steps)],
                          isem.at[_ix(5)]).start()

    def in_copies(b, slot):
        # forward entries e = T-5-q_r land at fbuf[slot, TBf-1-(t*f+s)];
        # window start E_b + pad_f >= 0 by construction
        E_b = n_steps - 4 - (b + 1) * TBf + pad_f
        return (
            pltpu.make_async_copy(rinc_hbm.at[pl.ds(_ix(b * TB + in_off),
                                                    TB)],
                                  ibuf.at[_ix(slot)], isem.at[_ix(slot)]),
            pltpu.make_async_copy(fstk_hbm.at[pl.ds(_ix(E_b), TBf)],
                                  fbuf.at[_ix(slot)], isem.at[_ix(2 + slot)]),
        )

    for c in in_copies(0, 0):
        c.start()

    def step(q_r, u, bslot, fb_idx, sp):
        """One reverse step + product emission (sp = q_r % 2, static)."""
        vm2_s, vm1_s = sp, 1 - sp
        vm1 = state[vm1_s]
        k10 = vm1
        k01 = pltpu.roll(vm1, jnp.int32(1), axis=1)
        k00 = pltpu.roll(state[vm2_s], jnp.int32(1), axis=1)
        v = _scheme(k00, k01, k10, u, naive)
        v = jnp.where((ii == 0) | (ii == q_r + 2) | (ii > NN),
                      one, v)
        state[vm2_s] = v

        # emit cotangent diagonal q = T - 3 - q_r
        q = n_steps - 3 - q_r

        @pl.when(q >= 0)
        def _():
            # A2[i] = V[i + s_al], s_al = q_r - MM + 2: roll by
            # -s_al (mod L_r; python % keeps the divisor's sign)
            s = jnp.int32(MM - 2 - q_r) % jnp.int32(L_r)
            A2 = pltpu.roll(v, s, axis=1)[:, :L_f]
            F = fbuf[bslot, fb_idx]                # S_f[q - 2]
            A1 = pltpu.roll(F, jnp.int32(1), axis=1)
            A1 = jnp.where(q >= 2, A1, one)        # fwd boundary
            prod = A1 * A2 * g_ref[...]

            oslot = sp
            # the previous same-slot copy targeted entry q + 4
            # (the pre-loop ones for the first two emissions)
            pltpu.make_async_copy(obuf.at[_ix(oslot)],
                                  out_hbm.at[_ix(q + 4)],
                                  isem.at[_ix(4 + oslot)]).wait()
            obuf[oslot] = prod
            pltpu.make_async_copy(obuf.at[_ix(oslot)],
                                  out_hbm.at[_ix(q + 2)],
                                  isem.at[_ix(4 + oslot)]).start()

    def body(b, _):
        bslot = lax.rem(b, jnp.int32(2))

        @pl.when(b + 1 < n_batches)
        def _():
            for c in in_copies(b + 1, 1 - bslot):
                c.start()

        for c in in_copies(b, bslot):
            c.wait()

        for t in range(TB):
            if f == 1:
                q_r = b * TB + t

                @pl.when(q_r < n_steps)
                def _(q_r=q_r, t=t):
                    step(q_r, ibuf[bslot, t], bslot, TB - 1 - t, t % 2)
            else:
                k = b * TB + t
                for s_i in range(f):
                    q_r = k * f + s_i
                    sp = s_i % 2   # == q_r % 2 (f even)

                    @pl.when(q_r < n_steps)
                    def _(q_r=q_r, t=t, s_i=s_i, sp=sp):
                        # previous diagonal: carry at batch start (the other
                        # DMA slot is racing with the next prefetch)
                        prev = carry[0] if t == 0 else ibuf[bslot, t - 1]
                        sel = lax.rem(ii, jnp.int32(f)) <= s_i
                        pre = jnp.where(sel, ibuf[bslot, t], prev)
                        u = pltpu.roll(pre, jnp.int32(1), axis=1)
                        step(q_r, u, bslot, TBf - 1 - (t * f + s_i), sp)
        if f > 1:
            carry[0] = ibuf[bslot, TB - 1]
        return 0

    lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), body, 0)

    # drain the last two product writes (diagonals q = 0, 1 -> entries 2, 3)
    lastq_r = n_steps - 3      # emitted q = 0
    @pl.when(lastq_r >= 0)
    def _():
        pltpu.make_async_copy(obuf.at[_ix(lastq_r % 2)], out_hbm.at[_ix(2)],
                              isem.at[_ix(4 + lastq_r % 2)]).wait()
    @pl.when(lastq_r >= 1)
    def _():
        s = (lastq_r - 1) % 2
        pltpu.make_async_copy(obuf.at[_ix(s)], out_hbm.at[_ix(3)],
                              isem.at[_ix(4 + s)]).wait()


def _product_collapse_kernel(rinc_hbm, fstk_hbm, g_ref, out_hbm, state,
                             ibuf, fbuf, acc, obuf, isem, carry,
                             *, n_steps, MM, NN, L_f, naive, pad_f, refine,
                             window_seg=0, compact=False):
    """Transposed-reverse sweep + in-flight product + in-kernel dyadic
    collapse of the cotangent to BASE anti-diagonals (refine = f > 1 only).

    Instead of streaming every refined cotangent diagonal (the refined
    stack is the backward's largest HBM pass), per-lane partial block sums
    are kept in two rotating accumulator slabs: the product at refined
    step ``q`` belongs to base diagonal ``kb = (i0)//f + (j0)//f`` which is
    ``k = q//f`` on lanes ``i0 mod f <= q mod f`` and ``k-1`` elsewhere
    (the same parity select as the input refinement, with the product
    stored at lane ``i0 = i-1`` so the final lane-block reduction is
    f-aligned). Since emissions run ``q`` DESCENDING, base diagonal ``k``
    is complete right after the step with ``q mod f == 0``; its
    accumulator (slot ``k mod 2`` -- compile-time per unrolled position)
    is flushed to ``out_hbm`` entry ``k + 2`` and zeroed for diagonal
    ``k-2``. The XLA side then does an f-aligned lane-block sum, a base
    unshear, and the exact ``1/f^2`` scale -- all on f^2-smaller data.
    ``out_hbm`` needs 4 slots of headroom past entry ``V+1`` for the
    wait-chain seed copies (entries V+2, V+3; V = n_steps//f + 1).
    """
    P = state.shape[1]
    L_r = state.shape[2]
    f = refine
    TBf = TB * f
    n_slots = pl.cdiv(n_steps, f)
    n_batches = pl.cdiv(n_slots, TB)
    ii = lax.broadcasted_iota(jnp.int32, (P, L_r), 1)
    iif = lax.broadcasted_iota(jnp.int32, (P, L_f), 1)
    one = jnp.float32(1.0)
    zslab = jnp.zeros((P, L_f), jnp.float32)

    # Lane-window phase plan for the reverse SOLVE only (the in-flight
    # product reads the full state slab -- frozen rows hold their final
    # values, the same invariant as the forward windows)
    from .pallas_solver import _window_phases
    spb = TB * f
    phases = None
    if window_seg:
        phases = _window_phases(n_batches, spb, n_steps, MM, L_r,
                                window_seg)
    A = (n_steps - 3) // f      # k(q) = A - m - c, m = b*TB + t
    r0 = (n_steps - 3) % f      # q mod f == (r0 - s_i) mod f

    state[0] = jnp.ones((P, L_r), jnp.float32)
    state[1] = jnp.ones((P, L_r), jnp.float32)
    acc[0] = zslab
    acc[1] = zslab

    def flush(slot, k_entry):
        """Emit acc[slot] as base-stack entry ``k_entry`` (+2 offset);
        with ``compact``, f-block-sum the lanes first (the XLA side's
        block reduction moves in-kernel, f x less cotangent-stack HBM)."""
        pltpu.make_async_copy(obuf.at[_ix(slot)],
                              out_hbm.at[_ix(k_entry + 2)],
                              isem.at[_ix(4 + slot)]).wait()
        if compact:
            a = acc[slot]
            while a.shape[1] > L_f // f:
                a = a[:, ::2] + a[:, 1::2]
            obuf[slot] = a
        else:
            obuf[slot] = acc[slot]
        acc[slot] = zslab
        pltpu.make_async_copy(obuf.at[_ix(slot)],
                              out_hbm.at[_ix(k_entry + 2)],
                              isem.at[_ix(4 + slot)]).start()

    def accumulate(prod, q_mod_f, k_par):
        sel = lax.rem(iif, jnp.int32(f)) <= q_mod_f
        acc[k_par] = acc[k_par] + jnp.where(sel, prod, 0.0)
        acc[1 - k_par] = acc[1 - k_par] + jnp.where(sel, 0.0, prod)

    # seed the per-slot wait chains (entries V+2, V+3 are never read)
    V = n_slots + 1
    zout = jnp.zeros(obuf.shape[1:], jnp.float32)
    obuf[0] = zout
    obuf[1] = zout
    pltpu.make_async_copy(obuf.at[_ix(0)], out_hbm.at[_ix(V + 2)],
                          isem.at[_ix(4)]).start()
    pltpu.make_async_copy(obuf.at[_ix(1)], out_hbm.at[_ix(V + 3)],
                          isem.at[_ix(5)]).start()

    # Pre-loop: diagonals q1 = T-1, q2 = T-2 have A2 = 1 (reversed-solve
    # boundary); their products come straight from the forward stack
    pre1 = pltpu.make_async_copy(fstk_hbm.at[_ix(n_steps - 3 + pad_f)],
                                 fbuf.at[_ix(0), _ix(0)], isem.at[_ix(2)])
    pre2 = pltpu.make_async_copy(fstk_hbm.at[_ix(n_steps - 4 + pad_f)],
                                 fbuf.at[_ix(0), _ix(1)], isem.at[_ix(3)])
    pre1.start()
    pre2.start()
    pre1.wait()
    pre2.wait()
    gv = g_ref[...]
    q1, q2 = n_steps - 1, n_steps - 2
    k1, k2 = q1 // f, q2 // f
    accumulate(fbuf[0, 0] * gv, q1 % f, k1 % 2)
    if q1 % f == 0:
        flush(k1 % 2, jnp.int32(k1))
    accumulate(fbuf[0, 1] * gv, q2 % f, k2 % 2)
    # q2 % f == f-1 always (T-2 = fV - 3): never a flush position

    def in_copies(b, slot):
        E_b = n_steps - 4 - (b + 1) * TBf + pad_f
        return (
            pltpu.make_async_copy(rinc_hbm.at[pl.ds(_ix(b * TB), TB)],
                                  ibuf.at[_ix(slot)], isem.at[_ix(slot)]),
            pltpu.make_async_copy(fstk_hbm.at[pl.ds(_ix(E_b), TBf)],
                                  fbuf.at[_ix(slot)], isem.at[_ix(2 + slot)]),
        )

    for c in in_copies(0, 0):
        c.start()

    def step(q_r, u, bslot, fb_idx, sp, s_i, t, ws=None, W=None,
             iiw=None):
        vm2_s, vm1_s = sp, 1 - sp
        if ws is None:
            k10 = state[vm1_s]
            p2 = state[vm2_s]
            ii_loc = ii
        else:
            k10 = state[vm1_s, :, ws:ws + W]
            p2 = state[vm2_s, :, ws:ws + W]
            ii_loc = iiw
        k01 = pltpu.roll(k10, jnp.int32(1), axis=1)
        k00 = pltpu.roll(p2, jnp.int32(1), axis=1)
        v = _scheme(k00, k01, k10, u, naive)
        v = jnp.where((ii_loc == 0) | (ii_loc == q_r + 2) | (ii_loc > NN),
                      one, v)
        if ws is not None and ws > 0:
            # window-bottom margin (roll wrap); keep the frozen value
            v = jnp.where(ii_loc == ws, p2, v)
        if ws is None:
            state[vm2_s] = v
        else:
            state[vm2_s, :, ws:ws + W] = v

        q = n_steps - 3 - q_r

        @pl.when(q >= 0)
        def _():
            # product stored at lane i-1: A2 shift drops by one, the
            # forward entry needs no roll at all. Full-slab state read:
            # frozen rows outside the window hold their final values.
            vf = state[vm2_s] if ws is not None else v
            s = jnp.int32(MM - 3 - q_r) % jnp.int32(L_r)
            A2 = pltpu.roll(vf, s, axis=1)[:, :L_f]
            F = fbuf[bslot, fb_idx]                # S_f[q - 2]
            F = jnp.where(q >= 2, F, one)          # fwd boundary
            prod = F * A2 * g_ref[...]

            c = 1 if s_i > r0 else 0
            k_par = (A + t + c) % 2                # k = A - m - c
            accumulate(prod, (r0 - s_i) % f, k_par)
            if s_i == r0:                          # q % f == 0: k complete
                k_dyn = _ix(A) - lax.div(_ix(q_r), jnp.int32(f))
                flush(k_par, k_dyn)

    def make_body(ws=None, W=None, iiw=None, guarded=True):
        if ws is None:
            def ld(bslot, t):
                return ibuf[bslot, t]

            def ldc():
                return carry[0]
        else:
            def ld(bslot, t):
                return ibuf[bslot, t, :, ws:ws + W]

            def ldc():
                return carry[0, :, ws:ws + W]
        ii_loc = ii if ws is None else iiw

        def when_q(q_r):
            if guarded:
                return pl.when(q_r < n_steps)
            return lambda fn: fn()

        def body(b, _):
            bslot = lax.rem(b, jnp.int32(2))

            @pl.when(b + 1 < n_batches)
            def _():
                for c in in_copies(b + 1, 1 - bslot):
                    c.start()

            for c in in_copies(b, bslot):
                c.wait()

            for t in range(TB):
                for s_i in range(f):
                    q_r = (b * TB + t) * f + s_i
                    sp = s_i % 2   # == q_r % 2 (f even)

                    @when_q(q_r)
                    def _(q_r=q_r, t=t, s_i=s_i, sp=sp):
                        prev = ldc() if t == 0 else ld(bslot, t - 1)
                        sel = lax.rem(ii_loc, jnp.int32(f)) <= s_i
                        pre = jnp.where(sel, ld(bslot, t), prev)
                        u = pltpu.roll(pre, jnp.int32(1), axis=1)
                        step(q_r, u, bslot, TBf - 1 - (t * f + s_i), sp,
                             s_i, t, ws, W, iiw)
            carry[0] = ibuf[bslot, TB - 1]
            return 0
        return body

    if phases is None:
        lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), make_body(), 0)
    else:
        for (b0, b1, ws_p, W_p) in phases:
            iiw = (lax.broadcasted_iota(jnp.int32, (P, W_p), 1)
                   + jnp.int32(ws_p))
            guarded = b1 * spb > n_steps
            lax.fori_loop(jnp.int32(b0), jnp.int32(b1),
                          make_body(ws_p, W_p, iiw, guarded), 0)

    # drain both flush chains (shapes identical; the index is irrelevant
    # to the semaphore wait)
    pltpu.make_async_copy(obuf.at[_ix(0)], out_hbm.at[_ix(2)],
                          isem.at[_ix(4)]).wait()
    pltpu.make_async_copy(obuf.at[_ix(1)], out_hbm.at[_ix(3)],
                          isem.at[_ix(5)]).wait()


def _product_collapse_planes_kernel(rinc_hbm, fstk_hbm, g_ref, out_hbm,
                                    state, ibuf, fbuf, acc, obuf, isem,
                                    carry, *, n_steps, MM, NN, Lbf, naive,
                                    pad_f, refine, window_seg=0):
    """Plane-split transposed-reverse sweep + in-flight product + dyadic
    collapse (see ``pallas_df64._wavefront_df_planes_kernel`` for the
    plane representation; Mosaic has no lane-dilation, so everything runs
    at base lane width).

    Deltas vs :func:`_product_collapse_kernel`:
    - rinc_hbm: BASE-width reverse stream ``(W, P, Lbr)`` (entry k_r =
      base diag of flip2(inc)^T, offset 0, pre-scaled 1/f^2) -- f x less
      stream HBM, no stretch pass;
    - fstk_hbm: plane-layout forward stack ``(Tp, f, P, Lbf)``;
    - the product alignment roll decomposes as plane re-indexing (STATIC
      per in-batch position: ``sigma mod f`` depends only on ``q_r mod
      f``) plus one base-width dynamic roll per plane;
    - the f-block lane collapse is free: refined product lane ``f*a + p``
      contributes to base lane ``a``, so summing the statically-chosen
      planes into the two base-width accumulators IS the collapse -- the
      cotangent stack leaves the kernel at base width (f x less cotangent
      HBM, no XLA block-sum pass).
    """
    P = state.shape[2]
    Lbr = state.shape[3]
    f = refine
    TBf = TB * f
    n_slots = pl.cdiv(n_steps, f)
    n_batches = pl.cdiv(n_slots, TB)
    iib = lax.broadcasted_iota(jnp.int32, (P, Lbr), 1)
    one = jnp.float32(1.0)
    zslab = jnp.zeros((P, Lbf), jnp.float32)
    L_r = f * Lbr

    from .pallas_solver import _window_phases
    spb = TB * f
    phases = None
    if window_seg:
        phases = _window_phases(n_batches, spb, n_steps, MM, L_r,
                                window_seg, align=f * LANES)
    A = (n_steps - 3) // f
    r0 = (n_steps - 3) % f

    for p in range(f):
        state[0, p] = jnp.ones((P, Lbr), jnp.float32)
        state[1, p] = jnp.ones((P, Lbr), jnp.float32)
    acc[0] = zslab
    acc[1] = zslab
    gv = g_ref[...]

    def flush(slot, k_entry):
        pltpu.make_async_copy(obuf.at[_ix(slot)],
                              out_hbm.at[_ix(k_entry + 2)],
                              isem.at[_ix(4 + slot)]).wait()
        obuf[slot] = acc[slot]
        acc[slot] = zslab
        pltpu.make_async_copy(obuf.at[_ix(slot)],
                              out_hbm.at[_ix(k_entry + 2)],
                              isem.at[_ix(4 + slot)]).start()

    def accumulate_planes(prods, q_mod_f, k_par):
        """prods[p] joins base diag k (acc[k_par]) when p <= q_mod_f,
        else k-1 -- the plane index IS the refined residue (static)."""
        hi_sum = lo_sum = None
        for p in range(f):
            if p <= q_mod_f:
                hi_sum = prods[p] if hi_sum is None else hi_sum + prods[p]
            else:
                lo_sum = prods[p] if lo_sum is None else lo_sum + prods[p]
        if hi_sum is not None:
            acc[k_par] = acc[k_par] + hi_sum
        if lo_sum is not None:
            acc[1 - k_par] = acc[1 - k_par] + lo_sum

    # seed the per-slot flush-wait chains (entries V+2, V+3 never read)
    V = n_slots + 1
    obuf[0] = zslab
    obuf[1] = zslab
    pltpu.make_async_copy(obuf.at[_ix(0)], out_hbm.at[_ix(V + 2)],
                          isem.at[_ix(4)]).start()
    pltpu.make_async_copy(obuf.at[_ix(1)], out_hbm.at[_ix(V + 3)],
                          isem.at[_ix(5)]).start()

    # pre-loop: cotangent diagonals q1 = T-1, q2 = T-2 have A2 = 1
    pre1 = pltpu.make_async_copy(fstk_hbm.at[_ix(n_steps - 3 + pad_f)],
                                 fbuf.at[_ix(0), _ix(0)], isem.at[_ix(2)])
    pre2 = pltpu.make_async_copy(fstk_hbm.at[_ix(n_steps - 4 + pad_f)],
                                 fbuf.at[_ix(0), _ix(1)], isem.at[_ix(3)])
    pre1.start()
    pre2.start()
    pre1.wait()
    pre2.wait()
    q1, q2 = n_steps - 1, n_steps - 2
    k1, k2 = q1 // f, q2 // f
    accumulate_planes([fbuf[0, 0, p] * gv for p in range(f)],
                      q1 % f, k1 % 2)
    if q1 % f == 0:
        flush(k1 % 2, jnp.int32(k1))
    accumulate_planes([fbuf[0, 1, p] * gv for p in range(f)],
                      q2 % f, k2 % 2)
    # q2 % f == f-1 always (T-2 = f*V - 3): never a flush position

    def in_copies(b, slot):
        E_b = n_steps - 4 - (b + 1) * TBf + pad_f
        return (
            pltpu.make_async_copy(rinc_hbm.at[pl.ds(_ix(b * TB), TB)],
                                  ibuf.at[_ix(slot)], isem.at[_ix(slot)]),
            pltpu.make_async_copy(fstk_hbm.at[pl.ds(_ix(E_b), TBf)],
                                  fbuf.at[_ix(slot)],
                                  isem.at[_ix(2 + slot)]),
        )

    for c in in_copies(0, 0):
        c.start()

    def make_body(ws=None, W=None, guarded=True):
        wsb = None if ws is None else ws // f
        Wb = None if ws is None else W // f
        iibw = None if ws is None else (
            lax.broadcasted_iota(jnp.int32, (P, Wb), 1) + jnp.int32(wsb))

        def when_q(q_r):
            if guarded:
                return pl.when(q_r < n_steps)
            return lambda fn: fn()

        def sl_in(x):
            return x if wsb is None else x[:, wsb:wsb + Wb]

        iiw = iib if wsb is None else iibw

        def step(q_r, k_r, s_i, sp, t, cur, prev, fb_idx, bslot):
            vm2, vm1 = sp, 1 - sp

            def st(slot, p):
                if wsb is None:
                    return state[slot, p]
                return state[slot, p, :, wsb:wsb + Wb]

            k10 = [st(vm1, p) for p in range(f)]
            p2 = [st(vm2, p) for p in range(f)]
            roll1 = lambda x: pltpu.roll(x, jnp.int32(1), axis=1)
            k01 = [roll1(k10[f - 1])] + k10[:f - 1]
            k00 = [roll1(p2[f - 1])] + p2[:f - 1]
            u = [roll1(cur if s_i == f - 1 else prev)] + \
                [(cur if p <= s_i else prev) for p in range(f - 1)]

            p_star = (s_i + 2) % f
            off = (s_i + 2 - p_star) // f
            hit_lane = jnp.int32(0) + k_r + off

            vs = []
            for p in range(f):
                v = _scheme(k00[p], k01[p], k10[p], u[p], naive)
                mask = iiw > (NN - p) // f
                if p == p_star:
                    mask = mask | (iiw == hit_lane)
                if p == 0:
                    mask = mask | (iiw == 0)
                v = jnp.where(mask, one, v)
                if wsb is not None and wsb > 0 and p == 0:
                    v = jnp.where(iiw == wsb, p2[0], v)
                vs.append(v)
            for p in range(f):
                if wsb is None:
                    state[vm2, p] = vs[p]
                else:
                    state[vm2, p, :, wsb:wsb + Wb] = vs[p]

            q = n_steps - 3 - q_r

            @pl.when(q >= 0)
            def _():
                # refined alignment shift sigma = (MM - 3 - q_r) mod L_r
                # decomposes as sigma = f*sq + sr with sr static (f | MM,
                # q_r = k_r f + s_i): product plane p reads reverse plane
                # (p - sr) mod f rolled by sq (+1 when p < sr)
                sr = (-3 - s_i) % f
                d = jnp.int32(MM - 3) - jnp.int32(0) - q_r
                sig = lax.rem(d + jnp.int32(2 * L_r), jnp.int32(L_r))
                sq = lax.div(sig, jnp.int32(f))
                prods = []
                for p in range(f):
                    src = (p - sr) % f
                    sh = sq + (1 if p < sr else 0)
                    # full-width state plane: frozen rows hold finals
                    A2 = pltpu.roll(state[vm2, src], sh, axis=1)[:, :Lbf]
                    F = fbuf[bslot, fb_idx, p]
                    F = jnp.where(q >= 2, F, one)
                    prods.append(F * A2 * gv)
                c = 1 if s_i > r0 else 0
                k_par = (A + t + c) % 2
                accumulate_planes(prods, (r0 - s_i) % f, k_par)
                if s_i == r0:
                    k_dyn = _ix(A) - lax.div(_ix(q_r), jnp.int32(f))
                    flush(k_par, k_dyn)

        def body(b, _):
            bslot = lax.rem(b, jnp.int32(2))

            @pl.when(b + 1 < n_batches)
            def _():
                for c in in_copies(b + 1, 1 - bslot):
                    c.start()

            for c in in_copies(b, bslot):
                c.wait()

            for t in range(TB):
                k_r = b * TB + t
                for s_i in range(f):
                    q_r = k_r * f + s_i
                    sp = s_i % 2   # == q_r % 2 (f even)

                    @when_q(q_r)
                    def _(q_r=q_r, k_r=k_r, t=t, s_i=s_i, sp=sp):
                        cur = sl_in(ibuf[bslot, t])
                        prev = (sl_in(carry[0]) if t == 0
                                else sl_in(ibuf[bslot, t - 1]))
                        step(q_r, k_r, s_i, sp, t, cur, prev,
                             TBf - 1 - (t * f + s_i), bslot)
            carry[0] = ibuf[bslot, TB - 1]
            return 0
        return body

    if phases is None:
        lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), make_body(), 0)
    else:
        for (b0, b1, ws_p, W_p) in phases:
            guarded = b1 * spb > n_steps
            lax.fori_loop(jnp.int32(b0), jnp.int32(b1),
                          make_body(ws_p, W_p, guarded), 0)

    pltpu.make_async_copy(obuf.at[_ix(0)], out_hbm.at[_ix(2)],
                          isem.at[_ix(4)]).wait()
    pltpu.make_async_copy(obuf.at[_ix(1)], out_hbm.at[_ix(3)],
                          isem.at[_ix(5)]).wait()


def planes_adj_ok(B: int, Mb: int, Nb: int, dyadic_order: int) -> bool:
    """Gate for the plane-split stack-sharing fwd+bwd route."""
    from .pallas_df64 import planes_ok

    f = 2 ** dyadic_order
    NN = Nb * f
    return (planes_ok(B, Mb, Nb, dyadic_order)
            and NN + 1 <= MAX_ROWS
            # forward plane lanes must fit within the reverse state's
            and ceil_to(Mb + 1, LANES) <= ceil_to(Nb + 1, LANES)
            and (Mb + Nb) * f - 1 >= 4)


def adjoint_planes_collapsed(inc3: jnp.ndarray, g: jnp.ndarray, naive: bool,
                             dyadic_order: int, fwd_stack) -> jnp.ndarray:
    """Base-resolution increment cotangent from a PLANE-LAYOUT forward
    stack (``pallas_df64._solve_final_one_df_pl(stack_pad=...)``); the
    collapse is free and the cotangent stack leaves the kernel at base
    width. Caller must have checked :func:`planes_adj_ok`."""
    f = 2 ** dyadic_order
    inc32 = inc3.astype(jnp.float32)
    B0, Mb, Nb = inc32.shape
    MM, NN = Mb * f, Nb * f
    T = MM + NN - 1
    pad_f = _pad_f(f)
    chunk = shared_chunk(MM, NN)

    def one_core(inc_c, g_c, S_f):
        from .pallas_solver import _base_stream, WINDOW_SEG

        B = inc_c.shape[0]
        P = ceil_to(B, SUBLANES)
        Lbf = ceil_to(Mb + 1, LANES)
        Lbr = ceil_to(Nb + 1, LANES)
        assert S_f.shape[1:] == (f, P, Lbf), (S_f.shape, (f, P, Lbf))

        rbase = jnp.swapaxes(jnp.flip(jnp.flip(inc_c, -1), -2), -1, -2)
        rb = rbase.astype(jnp.float32) * jnp.float32(1.0 / (f * f))
        rsk = _base_stream(rb, TB, P, Lbr, f)

        gp = jnp.pad(g_c.astype(jnp.float32), (0, P - B))[:, None]

        V = -(-T // f) + 1
        Tp_out = ceil_to(V + 4, LANES)
        kernel = functools.partial(
            _product_collapse_planes_kernel, n_steps=T, MM=MM, NN=NN,
            Lbf=Lbf, naive=naive, pad_f=pad_f, refine=f,
            window_seg=WINDOW_SEG)
        cot_b = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Tp_out, P, Lbf), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, f, P, Lbr), jnp.float32),      # state
                pltpu.VMEM((2, TB, P, Lbr), jnp.float32),     # ibuf
                pltpu.VMEM((2, TB * f, f, P, Lbf), jnp.float32),  # fbuf
                pltpu.VMEM((2, P, Lbf), jnp.float32),         # acc
                pltpu.VMEM((2, P, Lbf), jnp.float32),         # obuf
                pltpu.SemaphoreType.DMA((6,)),
                pltpu.VMEM((1, P, Lbr), jnp.float32),         # carry
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(rsk, S_f, gp)

        # base unshear (entry kb at kb + 2), exact 1/f^2 scale; products
        # are already at base lanes -- no block-sum pass
        Ds = cot_b[:, :, :Mb]
        DT = jnp.transpose(Ds, (1, 2, 0))                  # (P, Mb, Tp_out)
        flat = jnp.pad(DT.reshape(P, Mb * Tp_out), ((0, 0), (0, Mb)))
        K = flat.reshape(P, Mb, Tp_out + 1)[:, :, 2: 2 + Nb]
        return K[:B] * jnp.float32(1.0 / (f * f))

    g32 = g.astype(jnp.float32)
    if B0 <= chunk:
        return one_core(inc32, g32, fwd_stack[0])
    Bp = ceil_to(B0, chunk)
    nc = Bp // chunk
    assert fwd_stack.shape[0] == nc, (fwd_stack.shape, nc)
    inc4 = jnp.pad(inc32, ((0, Bp - B0), (0, 0), (0, 0))).reshape(
        nc, chunk, Mb, Nb)
    g4 = jnp.pad(g32, (0, Bp - B0)).reshape(nc, chunk)
    out = jax.lax.map(lambda a: one_core(a[0], a[1], a[2]),
                      (inc4, g4, fwd_stack))
    return out.reshape(Bp, Mb, Nb)[:B0]


def _pad_f_gen(f: int) -> int:
    """Forward-stack headroom for the GEN adjoint: its fstk DMA batches are
    ``T_GEN`` base slots deep (vs :data:`TB`), so
    ``E_b = T-4-(b+1)*T_GEN*f >= -pad``. (T_GEN = 6 = lcm of the increment
    ping-pong and G-rotation slots of the generation machinery.)"""
    from .pallas_df64 import T_GEN

    return T_GEN * f + 4


def _product_collapse_planes_gen_kernel(
        xh_ref, xl_ref, sxh_ref, sxl_ref, yrh_ref, yrl_ref,
        syh_ref, syl_ref, rsh_ref, rsl_ref, fstk_hbm, g_ref, out_hbm,
        state, fbuf, acc, obuf, gdh, gdl, gbh, gbl, isem,
        *, n_steps, MM, NN, Lbf, naive, pad_f, refine, Mb_r, Nb_r,
        window_seg=0):
    """Plane-split collapse adjoint with IN-KERNEL reverse-stream generation.

    Replaces :func:`_product_collapse_planes_kernel`'s HBM reverse stream
    (built on the XLA side from the unsheared increment grid: unshear +
    flip + transpose + re-shear, the largest remaining backward passes)
    with on-the-fly generation from path-point slabs, exactly like the
    forward gen kernel (``pallas_df64._wavefront_df_gen_kernel``).

    The reverse sweep solves the PDE on the TRANSPOSED-REVERSED increment
    grid, whose increments are those of the swapped + flipped paths:
    ``rbase[u, v] = inc[Mb-1-v, Nb-1-u] = dd(kappa(flip(y)[u..], flip(x)[v..]))``.
    DF add / two-prod are exactly commutative, so generating from
    ``_gen_point_slabs(flip(y), flip(x))`` reproduces the streamed reverse
    diagonals BIT-FOR-BIT (validated on chip). ``Mb_r = Nb``/``Nb_r = Mb``
    are the reverse grid's base dims for the generation masks.

    Loop batches are ``T_GEN`` (= 6) base slots (the generation slot
    rotations need t === k mod 6), so the forward stack must be emitted
    with ``stack_pad >= _pad_f_gen(f)``.
    """
    from .pallas_df64 import T_GEN, _make_inc_gen

    P = state.shape[2]
    Lbr = state.shape[3]
    f = refine
    T_b = T_GEN
    TFf = T_b * f
    n_slots = pl.cdiv(n_steps, f)
    n_batches = pl.cdiv(n_slots, T_b)
    iib = lax.broadcasted_iota(jnp.int32, (P, Lbr), 1)
    one = jnp.float32(1.0)
    zslab = jnp.zeros((P, Lbf), jnp.float32)
    L_r = f * Lbr

    from .pallas_solver import _window_phases
    spb = T_b * f
    phases = None
    if window_seg:
        phases = _window_phases(n_batches, spb, n_steps, MM, L_r,
                                window_seg, margin_top=max(8, 3 * f + 2),
                                align=f * LANES)
    A = (n_steps - 3) // f
    r0 = (n_steps - 3) % f

    for p in range(f):
        state[0, p] = jnp.ones((P, Lbr), jnp.float32)
        state[1, p] = jnp.ones((P, Lbr), jnp.float32)
    acc[0] = zslab
    acc[1] = zslab
    gv = g_ref[...]

    # generation scratch init + closures (diag -1 == exact zeros)
    gbh[1] = jnp.zeros((P, Lbr), jnp.float32)
    gbl[1] = jnp.zeros((P, Lbr), jnp.float32)
    gen_G, gen_inc = _make_inc_gen(
        (xh_ref, xl_ref, sxh_ref, sxl_ref, yrh_ref, yrl_ref,
         syh_ref, syl_ref, rsh_ref, rsl_ref),
        gdh, gdl, gbh, gbl, Mb=Mb_r, Nb=Nb_r, refine=f)
    g0h, g0l = gen_G(0)
    gdh[0], gdl[0] = g0h, g0l
    g1h, g1l = gen_G(1)
    gdh[1], gdl[1] = g1h, g1l

    def flush(slot, k_entry):
        pltpu.make_async_copy(obuf.at[_ix(slot)],
                              out_hbm.at[_ix(k_entry + 2)],
                              isem.at[_ix(2 + slot)]).wait()
        obuf[slot] = acc[slot]
        acc[slot] = zslab
        pltpu.make_async_copy(obuf.at[_ix(slot)],
                              out_hbm.at[_ix(k_entry + 2)],
                              isem.at[_ix(2 + slot)]).start()

    def accumulate_planes(prods, q_mod_f, k_par):
        """prods[p] joins base diag k (acc[k_par]) when p <= q_mod_f,
        else k-1 -- the plane index IS the refined residue (static)."""
        hi_sum = lo_sum = None
        for p in range(f):
            if p <= q_mod_f:
                hi_sum = prods[p] if hi_sum is None else hi_sum + prods[p]
            else:
                lo_sum = prods[p] if lo_sum is None else lo_sum + prods[p]
        if hi_sum is not None:
            acc[k_par] = acc[k_par] + hi_sum
        if lo_sum is not None:
            acc[1 - k_par] = acc[1 - k_par] + lo_sum

    # seed the per-slot flush-wait chains (entries V+2, V+3 never read)
    V = n_slots + 1
    obuf[0] = zslab
    obuf[1] = zslab
    pltpu.make_async_copy(obuf.at[_ix(0)], out_hbm.at[_ix(V + 2)],
                          isem.at[_ix(2)]).start()
    pltpu.make_async_copy(obuf.at[_ix(1)], out_hbm.at[_ix(V + 3)],
                          isem.at[_ix(3)]).start()

    # pre-loop: cotangent diagonals q1 = T-1, q2 = T-2 have A2 = 1
    pre1 = pltpu.make_async_copy(fstk_hbm.at[_ix(n_steps - 3 + pad_f)],
                                 fbuf.at[_ix(0), _ix(0)], isem.at[_ix(0)])
    pre2 = pltpu.make_async_copy(fstk_hbm.at[_ix(n_steps - 4 + pad_f)],
                                 fbuf.at[_ix(0), _ix(1)], isem.at[_ix(1)])
    pre1.start()
    pre2.start()
    pre1.wait()
    pre2.wait()
    q1, q2 = n_steps - 1, n_steps - 2
    k1, k2 = q1 // f, q2 // f
    accumulate_planes([fbuf[0, 0, p] * gv for p in range(f)],
                      q1 % f, k1 % 2)
    if q1 % f == 0:
        flush(k1 % 2, jnp.int32(k1))
    accumulate_planes([fbuf[0, 1, p] * gv for p in range(f)],
                      q2 % f, k2 % 2)
    # q2 % f == f-1 always (T-2 = f*V - 3): never a flush position

    def in_copies(b, slot):
        E_b = n_steps - 4 - (b + 1) * TFf + pad_f
        return (
            pltpu.make_async_copy(fstk_hbm.at[pl.ds(_ix(E_b), TFf)],
                                  fbuf.at[_ix(slot)],
                                  isem.at[_ix(slot)]),
        )

    for c in in_copies(0, 0):
        c.start()

    def make_body(ws=None, W=None, guarded=True):
        wsb = None if ws is None else ws // f
        Wb = None if ws is None else W // f
        iibw = None if ws is None else (
            lax.broadcasted_iota(jnp.int32, (P, Wb), 1) + jnp.int32(wsb))

        def when_q(q_r):
            if guarded:
                return pl.when(q_r < n_steps)
            return lambda fn: fn()

        iiw = iib if wsb is None else iibw

        def gb_win(slot):
            if wsb is None:
                return gbh[slot]
            return gbh[slot, :, wsb:wsb + Wb]

        def step(q_r, k_r, s_i, sp, t, cur, prev, fb_idx, bslot):
            vm2, vm1 = sp, 1 - sp

            def st(slot, p):
                if wsb is None:
                    return state[slot, p]
                return state[slot, p, :, wsb:wsb + Wb]

            k10 = [st(vm1, p) for p in range(f)]
            p2 = [st(vm2, p) for p in range(f)]
            roll1 = lambda x: pltpu.roll(x, jnp.int32(1), axis=1)
            k01 = [roll1(k10[f - 1])] + k10[:f - 1]
            k00 = [roll1(p2[f - 1])] + p2[:f - 1]
            u = [roll1(cur if s_i == f - 1 else prev)] + \
                [(cur if p <= s_i else prev) for p in range(f - 1)]

            p_star = (s_i + 2) % f
            off = (s_i + 2 - p_star) // f
            hit_lane = jnp.int32(0) + k_r + off

            vs = []
            for p in range(f):
                v = _scheme(k00[p], k01[p], k10[p], u[p], naive)
                mask = iiw > (NN - p) // f
                if p == p_star:
                    mask = mask | (iiw == hit_lane)
                if p == 0:
                    mask = mask | (iiw == 0)
                v = jnp.where(mask, one, v)
                if wsb is not None and wsb > 0 and p == 0:
                    v = jnp.where(iiw == wsb, p2[0], v)
                vs.append(v)
            for p in range(f):
                if wsb is None:
                    state[vm2, p] = vs[p]
                else:
                    state[vm2, p, :, wsb:wsb + Wb] = vs[p]

            q = n_steps - 3 - q_r

            @pl.when(q >= 0)
            def _():
                # refined alignment shift sigma = (MM - 3 - q_r) mod L_r
                # decomposes as sigma = f*sq + sr with sr static (f | MM,
                # q_r = k_r f + s_i): product plane p reads reverse plane
                # (p - sr) mod f rolled by sq (+1 when p < sr)
                sr = (-3 - s_i) % f
                d = jnp.int32(MM - 3) - jnp.int32(0) - q_r
                sig = lax.rem(d + jnp.int32(2 * L_r), jnp.int32(L_r))
                sq = lax.div(sig, jnp.int32(f))
                prods = []
                for p in range(f):
                    src = (p - sr) % f
                    sh = sq + (1 if p < sr else 0)
                    # full-width state plane: frozen rows hold finals
                    A2 = pltpu.roll(state[vm2, src], sh, axis=1)[:, :Lbf]
                    F = fbuf[bslot, fb_idx, p]
                    F = jnp.where(q >= 2, F, one)
                    prods.append(F * A2 * gv)
                c = 1 if s_i > r0 else 0
                k_par = (A + t + c) % 2
                accumulate_planes(prods, (r0 - s_i) % f, k_par)
                if s_i == r0:
                    k_dyn = _ix(A) - lax.div(_ix(q_r), jnp.int32(f))
                    flush(k_par, k_dyn)

        def body(b, _):
            bslot = lax.rem(b, jnp.int32(2))

            @pl.when(b + 1 < n_batches)
            def _():
                for c in in_copies(b + 1, 1 - bslot):
                    c.start()

            for c in in_copies(b, bslot):
                c.wait()

            for t in range(T_b):
                k_r = b * T_b + t

                @when_q(k_r * f)   # whole base slot off the end: skip
                def _(k_r=k_r, t=t):
                    gen_inc(k_r, t, wsb, Wb)
                    cur = gb_win(t % 2)
                    prev = gb_win(1 - t % 2)
                    for s_i in range(f):
                        q_r = k_r * f + s_i
                        sp = s_i % 2   # == q_r % 2 (f even)

                        @when_q(q_r)
                        def _(q_r=q_r, k_r=k_r, t=t, s_i=s_i, sp=sp):
                            step(q_r, k_r, s_i, sp, t, cur, prev,
                                 TFf - 1 - (t * f + s_i), bslot)
            return 0
        return body

    if phases is None:
        lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), make_body(), 0)
    else:
        for (b0, b1, ws_p, W_p) in phases:
            guarded = b1 * spb > n_steps
            lax.fori_loop(jnp.int32(b0), jnp.int32(b1),
                          make_body(ws_p, W_p, guarded), 0)

    pltpu.make_async_copy(obuf.at[_ix(0)], out_hbm.at[_ix(2)],
                          isem.at[_ix(2)]).wait()
    pltpu.make_async_copy(obuf.at[_ix(1)], out_hbm.at[_ix(3)],
                          isem.at[_ix(3)]).wait()


def adjoint_planes_collapsed_gen(Xp, Yp, sigma, g, naive: bool,
                                 dyadic_order: int, fwd_stack) -> jnp.ndarray:
    """Base-resolution increment cotangent via IN-KERNEL reverse-stream
    generation: per-pair paths + the gen forward's plane-layout stack in,
    cotangent out -- no increment grid, no reverse stream, none of the
    unshear/flip/transpose/re-shear XLA passes of
    :func:`adjoint_planes_collapsed`. The stack must be emitted with
    ``stack_pad=_pad_f_gen(f)``. Caller gates on :func:`planes_adj_ok` +
    ``pallas_df64.gen_supported``."""
    f = 2 ** dyadic_order
    from . import pallas_df64
    from .pallas_solver import WINDOW_SEG

    B0, M, _ = Xp.shape
    N = Yp.shape[1]
    Mb, Nb = M - 1, N - 1
    MM, NN = Mb * f, Nb * f
    T = MM + NN - 1
    pad_f = _pad_f_gen(f)
    chunk = shared_chunk(MM, NN)

    def one_core(Xc, Yc, g_c, S_f):
        B = Xc.shape[0]
        P = ceil_to(B, SUBLANES)
        Lbf = ceil_to(Mb + 1, LANES)
        Lbr = ceil_to(Nb + 1, LANES)
        assert S_f.shape[1:] == (f, P, Lbf), (S_f.shape, (f, P, Lbf))

        # reverse-role point slabs: x-role = flip(y), y-role = flip(x)
        ins = pallas_df64._gen_point_slabs(jnp.flip(Yc, 1), jnp.flip(Xc, 1),
                                           sigma, P, Lbr)
        gp = jnp.pad(g_c.astype(jnp.float32), (0, P - B))[:, None]

        V = -(-T // f) + 1
        Tp_out = ceil_to(V + 4, LANES)
        kernel = functools.partial(
            _product_collapse_planes_gen_kernel, n_steps=T, MM=MM, NN=NN,
            Lbf=Lbf, naive=naive, pad_f=pad_f, refine=f, Mb_r=Nb, Nb_r=Mb,
            window_seg=WINDOW_SEG)
        cot_b = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Tp_out, P, Lbf), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10
                     + [pl.BlockSpec(memory_space=pl.ANY),
                        pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, f, P, Lbr), jnp.float32),          # state
                pltpu.VMEM((2, pallas_df64.T_GEN * f, f, P, Lbf),
                           jnp.float32),                          # fbuf
                pltpu.VMEM((2, P, Lbf), jnp.float32),             # acc
                pltpu.VMEM((2, P, Lbf), jnp.float32),             # obuf
                pltpu.VMEM((3, P, Lbr), jnp.float32),             # gdh
                pltpu.VMEM((3, P, Lbr), jnp.float32),             # gdl
                pltpu.VMEM((2, P, Lbr), jnp.float32),             # gbh
                pltpu.VMEM((2, P, Lbr), jnp.float32),             # gbl
                pltpu.SemaphoreType.DMA((4,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(*ins, S_f, gp)

        # base unshear (entry kb at kb + 2), exact 1/f^2 scale; products
        # are already at base lanes -- no block-sum pass
        Ds = cot_b[:, :, :Mb]
        DT = jnp.transpose(Ds, (1, 2, 0))                  # (P, Mb, Tp_out)
        flat = jnp.pad(DT.reshape(P, Mb * Tp_out), ((0, 0), (0, Mb)))
        K = flat.reshape(P, Mb, Tp_out + 1)[:, :, 2: 2 + Nb]
        return K[:B] * jnp.float32(1.0 / (f * f))

    g32 = g.astype(jnp.float32)
    if B0 <= chunk:
        return one_core(Xp, Yp, g32, fwd_stack[0])
    Bp = ceil_to(B0, chunk)
    nc = Bp // chunk
    assert fwd_stack.shape[0] == nc, (fwd_stack.shape, nc)
    Xq = jnp.pad(Xp, ((0, Bp - B0), (0, 0), (0, 0))).reshape(
        nc, chunk, M, -1)
    Yq = jnp.pad(Yp, ((0, Bp - B0), (0, 0), (0, 0))).reshape(
        nc, chunk, N, -1)
    g4 = jnp.pad(g32, (0, Bp - B0)).reshape(nc, chunk)
    out = jax.lax.map(lambda a: one_core(a[0], a[1], a[2], a[3]),
                      (Xq, Yq, g4, fwd_stack))
    return out.reshape(Bp, Mb, Nb)[:B0]


def _product_collapse_planes_gen_df_kernel(
        xh_ref, xl_ref, sxh_ref, sxl_ref, yrh_ref, yrl_ref,
        syh_ref, syl_ref, rsh_ref, rsl_ref, fstkh_hbm, fstkl_hbm,
        outh_hbm, outl_hbm,
        stateh, statel, fbufh, fbufl, acch, accl, obufh, obufl,
        gdh, gdl, gbh, gbl, isem,
        *, n_steps, MM, NN, Lbf, naive, pad_f, refine, Mb_r, Nb_r,
        window_seg=0):
    """DOUBLE-FLOAT plane-split collapse adjoint with in-kernel reverse
    generation: the f64-grade backward of the gen route.

    Mirror of :func:`_product_collapse_planes_gen_kernel` with every stage
    lifted to double-float (the stream-free df adjoint: nothing but the
    two forward solution stacks touches HBM between the paths and the
    base-resolution cotangent):

    - the reverse sweep state is a DF pair (``stateh``/``statel``) updated
      by ``pallas_df64._df_scheme_gen`` on the DF increments the generation
      closures already produce;
    - the product reads BOTH planes of the forward stack
      (``fstkh``/``fstkl``, emitted by the forward's ``lo_stack=True``
      mode) and forms ``KK = K * K_rev`` in DF (``_df_mul``) -- the f32
      route's ~2.7e-2 gradient error is the 2^-24 *representation* noise
      of KK entering the double-difference VJP's discrete Laplacian, so
      both factors must carry better-than-f32 accuracy;
    - accumulation into the base-diagonal cotangent runs in DF
      (``_df_add``), emitted as hi/lo stacks and combined to f64 outside.

    The upstream cotangent ``g`` (a per-pair scalar) is NOT applied here:
    the caller multiplies in f64 after the unshear (exact linearity, one
    fewer in-kernel operand). Replaces the default-grade backward's
    ``_grid_route_bwd`` (two full DF grid solves + streams: a 27 GB XLA
    program at the 10k-pair benchmark chunk; docs/BENCHMARKS.md round 4).
    Reference parity target: the any-size f64 CPU gradient path,
    reference sigkernel/cython_backend.pyx:64-119 + sigkernel.py:419-502.
    """
    from .pallas_df64 import (T_GEN, _df_add, _df_mul, _df_scheme_gen,
                              _make_inc_gen)

    P = stateh.shape[2]
    Lbr = stateh.shape[3]
    f = refine
    T_b = T_GEN
    TFf = T_b * f
    n_slots = pl.cdiv(n_steps, f)
    n_batches = pl.cdiv(n_slots, T_b)
    iib = lax.broadcasted_iota(jnp.int32, (P, Lbr), 1)
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    zslab = jnp.zeros((P, Lbf), jnp.float32)
    L_r = f * Lbr

    from .pallas_solver import _window_phases
    spb = T_b * f
    phases = None
    if window_seg:
        phases = _window_phases(n_batches, spb, n_steps, MM, L_r,
                                window_seg, margin_top=max(8, 3 * f + 2),
                                align=f * LANES)
    A = (n_steps - 3) // f
    r0 = (n_steps - 3) % f

    for p in range(f):
        stateh[0, p] = jnp.ones((P, Lbr), jnp.float32)
        stateh[1, p] = jnp.ones((P, Lbr), jnp.float32)
        statel[0, p] = jnp.zeros((P, Lbr), jnp.float32)
        statel[1, p] = jnp.zeros((P, Lbr), jnp.float32)
    acch[0] = zslab
    acch[1] = zslab
    accl[0] = zslab
    accl[1] = zslab

    # generation scratch init + closures (diag -1 == exact zeros)
    gbh[1] = jnp.zeros((P, Lbr), jnp.float32)
    gbl[1] = jnp.zeros((P, Lbr), jnp.float32)
    gen_G, gen_inc = _make_inc_gen(
        (xh_ref, xl_ref, sxh_ref, sxl_ref, yrh_ref, yrl_ref,
         syh_ref, syl_ref, rsh_ref, rsl_ref),
        gdh, gdl, gbh, gbl, Mb=Mb_r, Nb=Nb_r, refine=f)
    g0h, g0l = gen_G(0)
    gdh[0], gdl[0] = g0h, g0l
    g1h, g1l = gen_G(1)
    gdh[1], gdl[1] = g1h, g1l

    def flush(slot, k_entry):
        pltpu.make_async_copy(obufh.at[_ix(slot)],
                              outh_hbm.at[_ix(k_entry + 2)],
                              isem.at[_ix(4 + slot)]).wait()
        pltpu.make_async_copy(obufl.at[_ix(slot)],
                              outl_hbm.at[_ix(k_entry + 2)],
                              isem.at[_ix(6 + slot)]).wait()
        obufh[slot] = acch[slot]
        obufl[slot] = accl[slot]
        acch[slot] = zslab
        accl[slot] = zslab
        pltpu.make_async_copy(obufh.at[_ix(slot)],
                              outh_hbm.at[_ix(k_entry + 2)],
                              isem.at[_ix(4 + slot)]).start()
        pltpu.make_async_copy(obufl.at[_ix(slot)],
                              outl_hbm.at[_ix(k_entry + 2)],
                              isem.at[_ix(6 + slot)]).start()

    def accumulate_planes(prods, q_mod_f, k_par):
        """DF plane products join base diag k (acc[k_par]) when
        p <= q_mod_f, else k-1 (acc[1-k_par]); sums and accumulator
        updates are double-float."""
        a_sum = b_sum = None
        for p in range(f):
            if p <= q_mod_f:
                a_sum = (prods[p] if a_sum is None
                         else _df_add(*a_sum, *prods[p]))
            else:
                b_sum = (prods[p] if b_sum is None
                         else _df_add(*b_sum, *prods[p]))
        if a_sum is not None:
            acch[k_par], accl[k_par] = _df_add(acch[k_par], accl[k_par],
                                               *a_sum)
        if b_sum is not None:
            acch[1 - k_par], accl[1 - k_par] = _df_add(
                acch[1 - k_par], accl[1 - k_par], *b_sum)

    # seed the per-slot flush-wait chains (entries V+2, V+3 never read)
    V = n_slots + 1
    obufh[0] = zslab
    obufh[1] = zslab
    obufl[0] = zslab
    obufl[1] = zslab
    pltpu.make_async_copy(obufh.at[_ix(0)], outh_hbm.at[_ix(V + 2)],
                          isem.at[_ix(4)]).start()
    pltpu.make_async_copy(obufh.at[_ix(1)], outh_hbm.at[_ix(V + 3)],
                          isem.at[_ix(5)]).start()
    pltpu.make_async_copy(obufl.at[_ix(0)], outl_hbm.at[_ix(V + 2)],
                          isem.at[_ix(6)]).start()
    pltpu.make_async_copy(obufl.at[_ix(1)], outl_hbm.at[_ix(V + 3)],
                          isem.at[_ix(7)]).start()

    # pre-loop: cotangent diagonals q1 = T-1, q2 = T-2 have A2 = 1
    pres = (
        pltpu.make_async_copy(fstkh_hbm.at[_ix(n_steps - 3 + pad_f)],
                              fbufh.at[_ix(0), _ix(0)], isem.at[_ix(0)]),
        pltpu.make_async_copy(fstkh_hbm.at[_ix(n_steps - 4 + pad_f)],
                              fbufh.at[_ix(0), _ix(1)], isem.at[_ix(1)]),
        pltpu.make_async_copy(fstkl_hbm.at[_ix(n_steps - 3 + pad_f)],
                              fbufl.at[_ix(0), _ix(0)], isem.at[_ix(2)]),
        pltpu.make_async_copy(fstkl_hbm.at[_ix(n_steps - 4 + pad_f)],
                              fbufl.at[_ix(0), _ix(1)], isem.at[_ix(3)]),
    )
    for c in pres:
        c.start()
    for c in pres:
        c.wait()
    q1, q2 = n_steps - 1, n_steps - 2
    k1, k2 = q1 // f, q2 // f
    accumulate_planes([(fbufh[0, 0, p], fbufl[0, 0, p]) for p in range(f)],
                      q1 % f, k1 % 2)
    if q1 % f == 0:
        flush(k1 % 2, jnp.int32(k1))
    accumulate_planes([(fbufh[0, 1, p], fbufl[0, 1, p]) for p in range(f)],
                      q2 % f, k2 % 2)
    # q2 % f == f-1 always (T-2 = f*V - 3): never a flush position

    def in_copies(b, slot):
        E_b = n_steps - 4 - (b + 1) * TFf + pad_f
        return (
            pltpu.make_async_copy(fstkh_hbm.at[pl.ds(_ix(E_b), TFf)],
                                  fbufh.at[_ix(slot)],
                                  isem.at[_ix(slot)]),
            pltpu.make_async_copy(fstkl_hbm.at[pl.ds(_ix(E_b), TFf)],
                                  fbufl.at[_ix(slot)],
                                  isem.at[_ix(2 + slot)]),
        )

    for c in in_copies(0, 0):
        c.start()

    def make_body(ws=None, W=None, guarded=True):
        wsb = None if ws is None else ws // f
        Wb = None if ws is None else W // f
        iibw = None if ws is None else (
            lax.broadcasted_iota(jnp.int32, (P, Wb), 1) + jnp.int32(wsb))

        def when_q(q_r):
            if guarded:
                return pl.when(q_r < n_steps)
            return lambda fn: fn()

        iiw = iib if wsb is None else iibw

        def gb_win(slot):
            if wsb is None:
                return gbh[slot], gbl[slot]
            return (gbh[slot, :, wsb:wsb + Wb],
                    gbl[slot, :, wsb:wsb + Wb])

        def step(q_r, k_r, s_i, sp, t, cur, prev, fb_idx, bslot):
            vm2, vm1 = sp, 1 - sp

            def st(slot, p):
                if wsb is None:
                    return stateh[slot, p], statel[slot, p]
                return (stateh[slot, p, :, wsb:wsb + Wb],
                        statel[slot, p, :, wsb:wsb + Wb])

            k10 = [st(vm1, p) for p in range(f)]
            p2 = [st(vm2, p) for p in range(f)]

            def rolled(pair):
                return (pltpu.roll(pair[0], jnp.int32(1), axis=1),
                        pltpu.roll(pair[1], jnp.int32(1), axis=1))

            k01 = [rolled(k10[f - 1])] + k10[:f - 1]
            k00 = [rolled(p2[f - 1])] + p2[:f - 1]
            u = [rolled(cur if s_i == f - 1 else prev)] + \
                [(cur if p <= s_i else prev) for p in range(f - 1)]

            p_star = (s_i + 2) % f
            off = (s_i + 2 - p_star) // f
            hit_lane = jnp.int32(0) + k_r + off

            vs = []
            for p in range(f):
                vh, vl = _df_scheme_gen(k00[p][0], k00[p][1],
                                        k01[p][0], k01[p][1],
                                        k10[p][0], k10[p][1],
                                        u[p][0], u[p][1], naive)
                mask = iiw > (NN - p) // f
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
            for p in range(f):
                if wsb is None:
                    stateh[vm2, p] = vs[p][0]
                    statel[vm2, p] = vs[p][1]
                else:
                    stateh[vm2, p, :, wsb:wsb + Wb] = vs[p][0]
                    statel[vm2, p, :, wsb:wsb + Wb] = vs[p][1]

            q = n_steps - 3 - q_r

            @pl.when(q >= 0)
            def _():
                # refined alignment shift (see the f32 gen kernel): product
                # plane p reads reverse plane (p - sr) mod f rolled by sq
                sr = (-3 - s_i) % f
                d = jnp.int32(MM - 3) - jnp.int32(0) - q_r
                sig = lax.rem(d + jnp.int32(2 * L_r), jnp.int32(L_r))
                sq = lax.div(sig, jnp.int32(f))
                prods = []
                for p in range(f):
                    src = (p - sr) % f
                    sh = sq + (1 if p < sr else 0)
                    # full-width state planes: frozen rows hold finals
                    A2h = pltpu.roll(stateh[vm2, src], sh, axis=1)[:, :Lbf]
                    A2l = pltpu.roll(statel[vm2, src], sh, axis=1)[:, :Lbf]
                    Fh = fbufh[bslot, fb_idx, p]
                    Fl = fbufl[bslot, fb_idx, p]
                    Fh = jnp.where(q >= 2, Fh, one)
                    Fl = jnp.where(q >= 2, Fl, zero)
                    prods.append(_df_mul(Fh, Fl, A2h, A2l))
                c = 1 if s_i > r0 else 0
                k_par = (A + t + c) % 2
                accumulate_planes(prods, (r0 - s_i) % f, k_par)
                if s_i == r0:
                    k_dyn = _ix(A) - lax.div(_ix(q_r), jnp.int32(f))
                    flush(k_par, k_dyn)

        def body(b, _):
            bslot = lax.rem(b, jnp.int32(2))

            @pl.when(b + 1 < n_batches)
            def _():
                for c in in_copies(b + 1, 1 - bslot):
                    c.start()

            for c in in_copies(b, bslot):
                c.wait()

            for t in range(T_b):
                k_r = b * T_b + t

                @when_q(k_r * f)   # whole base slot off the end: skip
                def _(k_r=k_r, t=t):
                    gen_inc(k_r, t, wsb, Wb)
                    cur = gb_win(t % 2)
                    prev = gb_win(1 - t % 2)
                    for s_i in range(f):
                        q_r = k_r * f + s_i
                        sp = s_i % 2   # == q_r % 2 (f even)

                        @when_q(q_r)
                        def _(q_r=q_r, k_r=k_r, t=t, s_i=s_i, sp=sp):
                            step(q_r, k_r, s_i, sp, t, cur, prev,
                                 TFf - 1 - (t * f + s_i), bslot)
            return 0
        return body

    if phases is None:
        lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), make_body(), 0)
    else:
        for (b0, b1, ws_p, W_p) in phases:
            guarded = b1 * spb > n_steps
            lax.fori_loop(jnp.int32(b0), jnp.int32(b1),
                          make_body(ws_p, W_p, guarded), 0)

    pltpu.make_async_copy(obufh.at[_ix(0)], outh_hbm.at[_ix(2)],
                          isem.at[_ix(4)]).wait()
    pltpu.make_async_copy(obufh.at[_ix(1)], outh_hbm.at[_ix(3)],
                          isem.at[_ix(5)]).wait()
    pltpu.make_async_copy(obufl.at[_ix(0)], outl_hbm.at[_ix(2)],
                          isem.at[_ix(6)]).wait()
    pltpu.make_async_copy(obufl.at[_ix(1)], outl_hbm.at[_ix(3)],
                          isem.at[_ix(7)]).wait()


def adjoint_planes_gen_df(Xp, Yp, sigma, naive: bool, dyadic_order: int):
    """Stream-free df64-grade gen adjoint: per-pair paths in, DF
    base-resolution cotangent pair out.

    Per chunk (inside ONE ``lax.map`` iteration, so nothing outlives it):
    the forward gen solve emits BOTH solution-stack planes
    (``lo_stack=True``), then :func:`_product_collapse_planes_gen_df_kernel`
    regenerates the reverse increment stream in-kernel, sweeps the reverse
    solve in DF, products against the DF forward stack and collapses to
    the base grid in DF. Residual HBM per chunk = the two stacks
    (2 x ~4.3 GB at the benchmark geometry) -- the whole point: the
    default-grade backward previously needed two full DF grid solves plus
    their streams (27 GB at the 10k-pair pair_chunk=128; docs/BENCHMARKS.md).

    Returns ``(ct_hi, ct_lo)`` f32 arrays ``(B, Mb, Nb)`` whose f64 sum is
    the cotangent of the final values w.r.t. the BASE increments (the
    upstream per-pair cotangent ``g`` and any weighting applied by the
    caller in f64). Caller gates on :func:`planes_adj_ok` +
    ``pallas_df64.gen_supported`` (via ``routes.resolve_hybrid_bwd``).
    """
    f = 2 ** dyadic_order
    from . import pallas_df64
    from .pallas_solver import WINDOW_SEG

    B0, M, _ = Xp.shape
    N = Yp.shape[1]
    Mb, Nb = M - 1, N - 1
    MM, NN = Mb * f, Nb * f
    T = MM + NN - 1
    pad_f = _pad_f_gen(f)
    chunk = shared_chunk(MM, NN)

    def one_core(Xc, Yc):
        B = Xc.shape[0]
        P = ceil_to(B, SUBLANES)
        Lbf = ceil_to(Mb + 1, LANES)
        Lbr = ceil_to(Nb + 1, LANES)

        _, S_h, S_l = pallas_df64._solve_final_one_df_gen(
            Xc, Yc, sigma, naive, dyadic_order, stack_pad=pad_f,
            lo_stack=True)

        # reverse-role point slabs: x-role = flip(y), y-role = flip(x)
        ins = pallas_df64._gen_point_slabs(jnp.flip(Yc, 1), jnp.flip(Xc, 1),
                                           sigma, P, Lbr)

        V = -(-T // f) + 1
        Tp_out = ceil_to(V + 4, LANES)
        kernel = functools.partial(
            _product_collapse_planes_gen_df_kernel, n_steps=T, MM=MM,
            NN=NN, Lbf=Lbf, naive=naive, pad_f=pad_f, refine=f, Mb_r=Nb,
            Nb_r=Mb, window_seg=WINDOW_SEG)
        cot_h, cot_l = pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((Tp_out, P, Lbf), jnp.float32),
                       jax.ShapeDtypeStruct((Tp_out, P, Lbf), jnp.float32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10
                     + [pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pl.ANY)),
            scratch_shapes=[
                pltpu.VMEM((2, f, P, Lbr), jnp.float32),          # stateh
                pltpu.VMEM((2, f, P, Lbr), jnp.float32),          # statel
                pltpu.VMEM((2, pallas_df64.T_GEN * f, f, P, Lbf),
                           jnp.float32),                          # fbufh
                pltpu.VMEM((2, pallas_df64.T_GEN * f, f, P, Lbf),
                           jnp.float32),                          # fbufl
                pltpu.VMEM((2, P, Lbf), jnp.float32),             # acch
                pltpu.VMEM((2, P, Lbf), jnp.float32),             # accl
                pltpu.VMEM((2, P, Lbf), jnp.float32),             # obufh
                pltpu.VMEM((2, P, Lbf), jnp.float32),             # obufl
                pltpu.VMEM((3, P, Lbr), jnp.float32),             # gdh
                pltpu.VMEM((3, P, Lbr), jnp.float32),             # gdl
                pltpu.VMEM((2, P, Lbr), jnp.float32),             # gbh
                pltpu.VMEM((2, P, Lbr), jnp.float32),             # gbl
                pltpu.SemaphoreType.DMA((8,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(*ins, S_h, S_l)

        # base unshear (entry kb at kb + 2), exact 1/f^2 scale per plane
        def unshear(cot_b):
            Ds = cot_b[:, :, :Mb]
            DT = jnp.transpose(Ds, (1, 2, 0))              # (P, Mb, Tp_out)
            flat = jnp.pad(DT.reshape(P, Mb * Tp_out), ((0, 0), (0, Mb)))
            K = flat.reshape(P, Mb, Tp_out + 1)[:, :, 2: 2 + Nb]
            return K[:B] * jnp.float32(1.0 / (f * f))

        return unshear(cot_h), unshear(cot_l)

    if B0 <= chunk:
        return one_core(Xp, Yp)
    Bp = ceil_to(B0, chunk)
    nc = Bp // chunk
    Xq = jnp.pad(Xp, ((0, Bp - B0), (0, 0), (0, 0))).reshape(
        nc, chunk, M, -1)
    Yq = jnp.pad(Yp, ((0, Bp - B0), (0, 0), (0, 0))).reshape(
        nc, chunk, N, -1)
    cth, ctl = jax.lax.map(lambda a: one_core(a[0], a[1]), (Xq, Yq))
    return (cth.reshape(Bp, Mb, Nb)[:B0], ctl.reshape(Bp, Mb, Nb)[:B0])


def _product_collapse_planes_gen32_kernel(
        x_ref, sx_ref, yr_ref, syr_ref, rs_ref, fstk_hbm, g_ref, out_hbm,
        state, fbuf, acc, obuf, gd, gb, isem,
        *, n_steps, MM, NN, Lbf, naive, pad_f, refine, Mb_r, Nb_r,
        window_seg=0):
    """f32 plane-split collapse adjoint with IN-KERNEL reverse-stream
    generation: the matched-precision mirror of
    :func:`_product_collapse_planes_gen_kernel` (see its docstring for
    the dataflow contracts). The reverse sweep was already f32 there;
    here the increment GENERATION is f32 too
    (``pallas_gen32._make_inc_gen32``), so the whole backward runs at
    matched precision with ~10x fewer generation ops per cell.
    """
    from .pallas_gen32 import T_GEN, _make_inc_gen32

    P = state.shape[2]
    Lbr = state.shape[3]
    f = refine
    T_b = T_GEN
    TFf = T_b * f
    n_slots = pl.cdiv(n_steps, f)
    n_batches = pl.cdiv(n_slots, T_b)
    iib = lax.broadcasted_iota(jnp.int32, (P, Lbr), 1)
    one = jnp.float32(1.0)
    zslab = jnp.zeros((P, Lbf), jnp.float32)
    L_r = f * Lbr

    from .pallas_solver import _window_phases
    spb = T_b * f
    phases = None
    if window_seg:
        phases = _window_phases(n_batches, spb, n_steps, MM, L_r,
                                window_seg, margin_top=max(8, 3 * f + 2),
                                align=f * LANES)
    A = (n_steps - 3) // f
    r0 = (n_steps - 3) % f

    for p in range(f):
        state[0, p] = jnp.ones((P, Lbr), jnp.float32)
        state[1, p] = jnp.ones((P, Lbr), jnp.float32)
    acc[0] = zslab
    acc[1] = zslab
    gv = g_ref[...]

    gb[1] = jnp.zeros((P, Lbr), jnp.float32)
    gen_G, gen_inc = _make_inc_gen32(
        (x_ref, sx_ref, yr_ref, syr_ref, rs_ref),
        gd, gb, Mb=Mb_r, Nb=Nb_r, refine=f)
    gd[0] = gen_G(0)
    gd[1] = gen_G(1)

    def flush(slot, k_entry):
        pltpu.make_async_copy(obuf.at[_ix(slot)],
                              out_hbm.at[_ix(k_entry + 2)],
                              isem.at[_ix(2 + slot)]).wait()
        obuf[slot] = acc[slot]
        acc[slot] = zslab
        pltpu.make_async_copy(obuf.at[_ix(slot)],
                              out_hbm.at[_ix(k_entry + 2)],
                              isem.at[_ix(2 + slot)]).start()

    def accumulate_planes(prods, q_mod_f, k_par):
        hi_sum = lo_sum = None
        for p in range(f):
            if p <= q_mod_f:
                hi_sum = prods[p] if hi_sum is None else hi_sum + prods[p]
            else:
                lo_sum = prods[p] if lo_sum is None else lo_sum + prods[p]
        if hi_sum is not None:
            acc[k_par] = acc[k_par] + hi_sum
        if lo_sum is not None:
            acc[1 - k_par] = acc[1 - k_par] + lo_sum

    V = n_slots + 1
    obuf[0] = zslab
    obuf[1] = zslab
    pltpu.make_async_copy(obuf.at[_ix(0)], out_hbm.at[_ix(V + 2)],
                          isem.at[_ix(2)]).start()
    pltpu.make_async_copy(obuf.at[_ix(1)], out_hbm.at[_ix(V + 3)],
                          isem.at[_ix(3)]).start()

    pre1 = pltpu.make_async_copy(fstk_hbm.at[_ix(n_steps - 3 + pad_f)],
                                 fbuf.at[_ix(0), _ix(0)], isem.at[_ix(0)])
    pre2 = pltpu.make_async_copy(fstk_hbm.at[_ix(n_steps - 4 + pad_f)],
                                 fbuf.at[_ix(0), _ix(1)], isem.at[_ix(1)])
    pre1.start()
    pre2.start()
    pre1.wait()
    pre2.wait()
    q1, q2 = n_steps - 1, n_steps - 2
    k1, k2 = q1 // f, q2 // f
    accumulate_planes([fbuf[0, 0, p] * gv for p in range(f)],
                      q1 % f, k1 % 2)
    if q1 % f == 0:
        flush(k1 % 2, jnp.int32(k1))
    accumulate_planes([fbuf[0, 1, p] * gv for p in range(f)],
                      q2 % f, k2 % 2)

    def in_copies(b, slot):
        E_b = n_steps - 4 - (b + 1) * TFf + pad_f
        return (
            pltpu.make_async_copy(fstk_hbm.at[pl.ds(_ix(E_b), TFf)],
                                  fbuf.at[_ix(slot)],
                                  isem.at[_ix(slot)]),
        )

    for c in in_copies(0, 0):
        c.start()

    def make_body(ws=None, W=None, guarded=True):
        wsb = None if ws is None else ws // f
        Wb = None if ws is None else W // f
        iibw = None if ws is None else (
            lax.broadcasted_iota(jnp.int32, (P, Wb), 1) + jnp.int32(wsb))

        def when_q(q_r):
            if guarded:
                return pl.when(q_r < n_steps)
            return lambda fn: fn()

        iiw = iib if wsb is None else iibw

        def gb_win(slot):
            if wsb is None:
                return gb[slot]
            return gb[slot, :, wsb:wsb + Wb]

        def step(q_r, k_r, s_i, sp, t, cur, prev, fb_idx, bslot):
            vm2, vm1 = sp, 1 - sp

            def st(slot, p):
                if wsb is None:
                    return state[slot, p]
                return state[slot, p, :, wsb:wsb + Wb]

            k10 = [st(vm1, p) for p in range(f)]
            p2 = [st(vm2, p) for p in range(f)]
            roll1 = lambda x: pltpu.roll(x, jnp.int32(1), axis=1)
            k01 = [roll1(k10[f - 1])] + k10[:f - 1]
            k00 = [roll1(p2[f - 1])] + p2[:f - 1]
            u = [roll1(cur if s_i == f - 1 else prev)] + \
                [(cur if p <= s_i else prev) for p in range(f - 1)]

            p_star = (s_i + 2) % f
            off = (s_i + 2 - p_star) // f
            hit_lane = jnp.int32(0) + k_r + off

            vs = []
            for p in range(f):
                v = _scheme(k00[p], k01[p], k10[p], u[p], naive)
                mask = iiw > (NN - p) // f
                if p == p_star:
                    mask = mask | (iiw == hit_lane)
                if p == 0:
                    mask = mask | (iiw == 0)
                v = jnp.where(mask, one, v)
                if wsb is not None and wsb > 0 and p == 0:
                    v = jnp.where(iiw == wsb, p2[0], v)
                vs.append(v)
            for p in range(f):
                if wsb is None:
                    state[vm2, p] = vs[p]
                else:
                    state[vm2, p, :, wsb:wsb + Wb] = vs[p]

            q = n_steps - 3 - q_r

            @pl.when(q >= 0)
            def _():
                sr = (-3 - s_i) % f
                d = jnp.int32(MM - 3) - jnp.int32(0) - q_r
                sig = lax.rem(d + jnp.int32(2 * L_r), jnp.int32(L_r))
                sq = lax.div(sig, jnp.int32(f))
                prods = []
                for p in range(f):
                    src = (p - sr) % f
                    sh = sq + (1 if p < sr else 0)
                    A2 = pltpu.roll(state[vm2, src], sh, axis=1)[:, :Lbf]
                    F = fbuf[bslot, fb_idx, p]
                    F = jnp.where(q >= 2, F, one)
                    prods.append(F * A2 * gv)
                c = 1 if s_i > r0 else 0
                k_par = (A + t + c) % 2
                accumulate_planes(prods, (r0 - s_i) % f, k_par)
                if s_i == r0:
                    k_dyn = _ix(A) - lax.div(_ix(q_r), jnp.int32(f))
                    flush(k_par, k_dyn)

        def body(b, _):
            bslot = lax.rem(b, jnp.int32(2))

            @pl.when(b + 1 < n_batches)
            def _():
                for c in in_copies(b + 1, 1 - bslot):
                    c.start()

            for c in in_copies(b, bslot):
                c.wait()

            for t in range(T_b):
                k_r = b * T_b + t

                @when_q(k_r * f)
                def _(k_r=k_r, t=t):
                    gen_inc(k_r, t, wsb, Wb)
                    cur = gb_win(t % 2)
                    prev = gb_win(1 - t % 2)
                    for s_i in range(f):
                        q_r = k_r * f + s_i
                        sp = s_i % 2

                        @when_q(q_r)
                        def _(q_r=q_r, k_r=k_r, t=t, s_i=s_i, sp=sp):
                            step(q_r, k_r, s_i, sp, t, cur, prev,
                                 TFf - 1 - (t * f + s_i), bslot)
            return 0
        return body

    if phases is None:
        lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), make_body(), 0)
    else:
        for (b0, b1, ws_p, W_p) in phases:
            guarded = b1 * spb > n_steps
            lax.fori_loop(jnp.int32(b0), jnp.int32(b1),
                          make_body(ws_p, W_p, guarded), 0)

    pltpu.make_async_copy(obuf.at[_ix(0)], out_hbm.at[_ix(2)],
                          isem.at[_ix(2)]).wait()
    pltpu.make_async_copy(obuf.at[_ix(1)], out_hbm.at[_ix(3)],
                          isem.at[_ix(3)]).wait()


def adjoint_planes_collapsed_gen32(Xp, Yp, sigma, g, naive: bool,
                                   dyadic_order: int,
                                   fwd_stack) -> jnp.ndarray:
    """f32 base-resolution increment cotangent via in-kernel reverse-stream
    generation (matched-precision mirror of
    :func:`adjoint_planes_collapsed_gen`). The stack must come from
    ``pallas_gen32.solve_final_f32_gen_stack`` with
    ``stack_pad=_pad_f_gen(f)``."""
    f = 2 ** dyadic_order
    from . import pallas_gen32
    from .pallas_solver import WINDOW_SEG

    B0, M, _ = Xp.shape
    N = Yp.shape[1]
    Mb, Nb = M - 1, N - 1
    MM, NN = Mb * f, Nb * f
    T = MM + NN - 1
    pad_f = _pad_f_gen(f)
    chunk = shared_chunk(MM, NN)

    def one_core(Xc, Yc, g_c, S_f):
        B = Xc.shape[0]
        P = ceil_to(B, SUBLANES)
        Lbf = ceil_to(Mb + 1, LANES)
        Lbr = ceil_to(Nb + 1, LANES)
        assert S_f.shape[1:] == (f, P, Lbf), (S_f.shape, (f, P, Lbf))

        ins = pallas_gen32._gen_point_slabs32(
            jnp.flip(Yc, 1), jnp.flip(Xc, 1), sigma, P, Lbr)
        gp = jnp.pad(g_c.astype(jnp.float32), (0, P - B))[:, None]

        V = -(-T // f) + 1
        Tp_out = ceil_to(V + 4, LANES)
        kernel = functools.partial(
            _product_collapse_planes_gen32_kernel, n_steps=T, MM=MM, NN=NN,
            Lbf=Lbf, naive=naive, pad_f=pad_f, refine=f, Mb_r=Nb, Nb_r=Mb,
            window_seg=WINDOW_SEG)
        cot_b = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Tp_out, P, Lbf), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
                     + [pl.BlockSpec(memory_space=pl.ANY),
                        pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, f, P, Lbr), jnp.float32),          # state
                pltpu.VMEM((2, pallas_gen32.T_GEN * f, f, P, Lbf),
                           jnp.float32),                          # fbuf
                pltpu.VMEM((2, P, Lbf), jnp.float32),             # acc
                pltpu.VMEM((2, P, Lbf), jnp.float32),             # obuf
                pltpu.VMEM((3, P, Lbr), jnp.float32),             # gd
                pltpu.VMEM((2, P, Lbr), jnp.float32),             # gb
                pltpu.SemaphoreType.DMA((4,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(*ins, S_f, gp)

        Ds = cot_b[:, :, :Mb]
        DT = jnp.transpose(Ds, (1, 2, 0))                  # (P, Mb, Tp_out)
        flat = jnp.pad(DT.reshape(P, Mb * Tp_out), ((0, 0), (0, Mb)))
        K = flat.reshape(P, Mb, Tp_out + 1)[:, :, 2: 2 + Nb]
        return K[:B] * jnp.float32(1.0 / (f * f))

    g32 = g.astype(jnp.float32)
    if B0 <= chunk:
        return one_core(Xp, Yp, g32, fwd_stack[0])
    Bp = ceil_to(B0, chunk)
    nc = Bp // chunk
    assert fwd_stack.shape[0] == nc, (fwd_stack.shape, nc)
    Xq = jnp.pad(Xp, ((0, Bp - B0), (0, 0), (0, 0))).reshape(
        nc, chunk, M, -1)
    Yq = jnp.pad(Yp, ((0, Bp - B0), (0, 0), (0, 0))).reshape(
        nc, chunk, N, -1)
    g4 = jnp.pad(g32, (0, Bp - B0)).reshape(nc, chunk)
    out = jax.lax.map(lambda a: one_core(a[0], a[1], a[2], a[3]),
                      (Xq, Yq, g4, fwd_stack))
    return out.reshape(Bp, Mb, Nb)[:B0]


def ckpt_pairs(T: int, f: int) -> int:
    """Checkpoint pairs in the sparse forward stack for a T-step sweep.

    One pair per adjoint DMA window (entries ``(T-6-m*C, T-5-m*C)``,
    ``C = TB*f``) plus one anchor pair for the last window. The stack
    allocates ``2*ckpt_pairs(T, f) + 2`` slabs (2 seed slots at the tail).
    """
    C = TB * f
    n_batches = -(-(-(-T // f)) // TB)
    return n_batches + 1


def ckpt_supported(T: int, f: int) -> bool:
    """Sparse-stack geometry gate: the residue algebra needs the top
    stored pair (T-6, T-5) to exist and a full first window."""
    return f in (2, 4) and T - 6 >= TB * f


def _product_ckpt_kernel(rinc_hbm, fsk_hbm, ckpt_hbm, g_ref, out_hbm,
                         state, ibuf, fibuf, pibuf, cbuf, block, fstate,
                         acc, obuf, isem, carry,
                         *, n_steps, MM, NN, L_f, naive, refine):
    """Collapse-product kernel consuming a SPARSE (checkpointed) forward
    stack: only 2 of every ``C = TB*refine`` forward diagonals were stored
    (the per-window checkpoint pair); the other ``C-2`` are recomputed here
    by an in-kernel f32 forward sweep re-anchored on the stored pair each
    batch. Cuts the forward-stack HBM traffic (the backward's largest
    pass) ``C/2``-fold at the cost of ~one extra f32 sweep of VPU work
    (measured nearly free: the wavefront is issue-bound, not the budget).

    Inputs vs :func:`_product_collapse_kernel`:
    - fsk_hbm: FORWARD-orientation row-stretched base increment stream
      (base slot k at index k, slabs (P, L_f)) -- the same stream the
      forward solve consumes, reused for the recompute.
    - ckpt_hbm: sparse stack, pair m = entries ``(T-6-m*C, T-5-m*C)`` at
      slabs ``(2m, 2m+1)``; junk wherever the entry index is negative
      (this kernel substitutes the boundary-ones initial state there).

    Scratch: fibuf (2, TB+2, P, L_f) forward-stream windows (base slots
    ``[(E_b - rho)/f - 1, ...]``); pibuf (3, P, L_f) pre-loop window; cbuf
    (3, 2, P, L_f) checkpoint pairs (pair m at slot m%3: pairs b, b+1,
    b+2 are live during batch b); block (C, P, L_f) the reconstructed
    forward window, consumed descending; fstate (2, P, L_f) recompute
    ping-pong (entry e at slot e%2). Semaphores: 0-1 rinc, 2-3 fsk,
    4-5 obuf flush, 6-8 cbuf (by pair%3), 9 pibuf.
    """
    P = state.shape[1]
    L_r = state.shape[2]
    f = refine
    C = TB * f
    FT = TB + 2
    n_slots = pl.cdiv(n_steps, f)
    n_batches = pl.cdiv(n_slots, TB)
    T = n_steps
    rho = (T - 4) % f          # E_b mod f, the same for every window
    pi0 = (T - 4) % 2          # E_b mod 2 (C is even)
    ii = lax.broadcasted_iota(jnp.int32, (P, L_r), 1)
    iif = lax.broadcasted_iota(jnp.int32, (P, L_f), 1)
    one = jnp.float32(1.0)
    ones_f = jnp.ones((P, L_f), jnp.float32)
    zslab = jnp.zeros((P, L_f), jnp.float32)
    A = (T - 3) // f           # flush index algebra (as collapse kernel)
    r0 = (T - 3) % f

    state[0] = jnp.ones((P, L_r), jnp.float32)
    state[1] = jnp.ones((P, L_r), jnp.float32)
    acc[0] = zslab
    acc[1] = zslab

    # ---- forward-recompute helpers -------------------------------------

    def f_u(kk, s_e, fb, base):
        """Refined forward increment for recomputed diagonal ``e``:
        parity-select between base slots ``kk = e//f`` (traced) and
        ``kk-1`` then roll -- the forward kernel's in-kernel refinement.
        ``fb``: callable slot -> slab (buffer abstraction); ``base``: the
        base slot held at buffer position 0. Out-of-range slots read
        clamped junk and are substituted with exact zeros."""
        cur = fb(lax.max(kk - base, jnp.int32(0)))
        prv = fb(lax.max(kk - 1 - base, jnp.int32(0)))
        cur = jnp.where(kk >= 0, cur, 0.0)
        prv = jnp.where(kk - 1 >= 0, prv, 0.0)
        sel = lax.rem(iif, jnp.int32(f)) <= s_e
        pre = jnp.where(sel, cur, prv)
        return pltpu.roll(pre, jnp.int32(1), axis=1)

    def f_step(e, u, j, out_j):
        """One f32 forward step producing diagonal ``e = E + j`` into
        ``block[out_j]``; ping-pong slot of entry e is e%2 = (pi0 + j)%2
        (static per unrolled j)."""
        sp = (pi0 + j) % 2
        vm1 = fstate[1 - sp]
        k01 = pltpu.roll(vm1, jnp.int32(1), axis=1)
        k00 = pltpu.roll(fstate[sp], jnp.int32(1), axis=1)
        v = _scheme(k00, k01, vm1, u, naive)
        v = jnp.where((iif == 0) | (iif == e + 2) | (iif > MM), one, v)
        fstate[sp] = v
        block[out_j] = v

    # ---- collapse/flush (same dataflow as _product_collapse_kernel) ----

    def flush(slot, k_entry):
        pltpu.make_async_copy(obuf.at[_ix(slot)],
                              out_hbm.at[_ix(k_entry + 2)],
                              isem.at[_ix(4 + slot)]).wait()
        obuf[slot] = acc[slot]
        acc[slot] = zslab
        pltpu.make_async_copy(obuf.at[_ix(slot)],
                              out_hbm.at[_ix(k_entry + 2)],
                              isem.at[_ix(4 + slot)]).start()

    def accumulate(prod, q_mod_f, k_par):
        sel = lax.rem(iif, jnp.int32(f)) <= q_mod_f
        acc[k_par] = acc[k_par] + jnp.where(sel, prod, 0.0)
        acc[1 - k_par] = acc[1 - k_par] + jnp.where(sel, 0.0, prod)

    # seed the per-slot flush-wait chains (entries V+2, V+3 never read)
    V = n_slots + 1
    obuf[0] = zslab
    obuf[1] = zslab
    pltpu.make_async_copy(obuf.at[_ix(0)], out_hbm.at[_ix(V + 2)],
                          isem.at[_ix(4)]).start()
    pltpu.make_async_copy(obuf.at[_ix(1)], out_hbm.at[_ix(V + 3)],
                          isem.at[_ix(5)]).start()

    # ---- batch-b input set: rinc/fsk windows b, checkpoint pair b+1 ----

    def in_copies(b, slot):
        E_b = T - 4 - (b + 1) * C
        s_b = lax.max(lax.div(E_b - jnp.int32(rho), jnp.int32(f)) - 1,
                      jnp.int32(0))
        m = b + 1
        return (
            pltpu.make_async_copy(rinc_hbm.at[pl.ds(_ix(b * TB), TB)],
                                  ibuf.at[_ix(slot)], isem.at[_ix(slot)]),
            pltpu.make_async_copy(fsk_hbm.at[pl.ds(_ix(s_b), FT)],
                                  fibuf.at[_ix(slot)],
                                  isem.at[_ix(2 + slot)]),
            pltpu.make_async_copy(
                ckpt_hbm.at[pl.ds(_ix(2 * m), 2)],
                cbuf.at[_ix(lax.rem(jnp.int32(m), jnp.int32(3)))],
                isem.at[_ix(6 + lax.rem(jnp.int32(m), jnp.int32(3)))]),
        )

    # ---- pre-loop: load pair 0, recompute entries T-4, T-3, emit the
    # boundary cotangent diagonals q = T-1, T-2 ---------------------------
    pre_c = pltpu.make_async_copy(ckpt_hbm.at[pl.ds(_ix(0), 2)],
                                  cbuf.at[_ix(0)], isem.at[_ix(6)])
    s_pre = max((T - 4) // f - 1, 0)
    pre_f = pltpu.make_async_copy(fsk_hbm.at[pl.ds(_ix(s_pre), 3)],
                                  pibuf, isem.at[_ix(9)])
    pre_c.start()
    pre_f.start()
    for c in in_copies(0, 0):
        c.start()
    pre_c.wait()
    pre_f.wait()
    gv = g_ref[...]
    # pair 0 = entries (T-6, T-5) = anchors of the virtual window E = T-4
    # (both >= 2 by the ckpt_supported gate); entry e at fstate[e % 2]
    fstate[pi0] = cbuf[0, 0]           # T-6 == E-2 == pi0 (mod 2)
    fstate[1 - pi0] = cbuf[0, 1]       # T-5
    pfb = lambda idx: pibuf[idx]
    f_step(jnp.int32(T - 4),
           f_u(jnp.int32((T - 4) // f), (T - 4) % f, pfb, s_pre), 0, 0)
    f_step(jnp.int32(T - 3),
           f_u(jnp.int32((T - 3) // f), (T - 3) % f, pfb, s_pre), 1, 1)
    q1, q2 = T - 1, T - 2
    k1, k2 = q1 // f, q2 // f
    accumulate(block[1] * gv, q1 % f, k1 % 2)      # F = S_f[T-3]
    if q1 % f == 0:
        flush(k1 % 2, jnp.int32(k1))
    accumulate(block[0] * gv, q2 % f, k2 % 2)      # F = S_f[T-4]
    # q2 % f == f-1 always (T-2 = f*V - 3): never a flush position

    # ---- steady-state loop ---------------------------------------------

    def body(b, _):
        bslot = lax.rem(b, jnp.int32(2))

        @pl.when(b + 1 < n_batches)
        def _():
            for c in in_copies(b + 1, 1 - bslot):
                c.start()

        for c in in_copies(b, bslot):
            c.wait()

        # -- rebuild the forward window: block[j] = S_f[E_b + j] ---------
        E_b = T - 4 - (b + 1) * C
        s_b = lax.max(lax.div(E_b - jnp.int32(rho), jnp.int32(f)) - 1,
                      jnp.int32(0))
        anc = cbuf[lax.rem(b + 1, jnp.int32(3))]
        fstate[pi0] = jnp.where(E_b - 2 >= 0, anc[0], ones_f)
        fstate[1 - pi0] = jnp.where(E_b - 1 >= 0, anc[1], ones_f)
        ffb = lambda idx: fibuf[bslot, idx]
        for j in range(C - 2):
            e_mod_f = (rho + j) % f                # static
            kk = lax.div(E_b + jnp.int32(j - e_mod_f), jnp.int32(f))
            f_step(E_b + jnp.int32(j), f_u(kk, e_mod_f, ffb, s_b), j, j)
        top = cbuf[lax.rem(b, jnp.int32(3))]       # pair b = window top two
        block[C - 2] = jnp.where(E_b + C - 2 >= 0, top[0], ones_f)
        block[C - 1] = jnp.where(E_b + C - 1 >= 0, top[1], ones_f)

        # -- reverse sweep + in-flight product + collapse ----------------
        for t in range(TB):
            for s_i in range(f):
                q_r = (b * TB + t) * f + s_i
                sp = s_i % 2   # == q_r % 2 (f even)

                @pl.when(q_r < n_steps)
                def _(q_r=q_r, t=t, s_i=s_i, sp=sp):
                    prev = carry[0] if t == 0 else ibuf[bslot, t - 1]
                    sel = lax.rem(ii, jnp.int32(f)) <= s_i
                    pre = jnp.where(sel, ibuf[bslot, t], prev)
                    u = pltpu.roll(pre, jnp.int32(1), axis=1)
                    vm1 = state[1 - sp]
                    k01 = pltpu.roll(vm1, jnp.int32(1), axis=1)
                    k00 = pltpu.roll(state[sp], jnp.int32(1), axis=1)
                    v = _scheme(k00, k01, vm1, u, naive)
                    v = jnp.where((ii == 0) | (ii == q_r + 2) | (ii > NN),
                                  one, v)
                    state[sp] = v

                    q = n_steps - 3 - q_r

                    @pl.when(q >= 0)
                    def _():
                        # product stored at lane i-1 (as collapse kernel)
                        s = jnp.int32(MM - 3 - q_r) % jnp.int32(L_r)
                        A2 = pltpu.roll(v, s, axis=1)[:, :L_f]
                        F = block[C - 1 - (t * f + s_i)]
                        F = jnp.where(q >= 2, F, one)
                        prod = F * A2 * g_ref[...]
                        c = 1 if s_i > r0 else 0
                        k_par = (A + t + c) % 2    # k = A - m - c
                        accumulate(prod, (r0 - s_i) % f, k_par)
                        if s_i == r0:              # q % f == 0: k complete
                            k_dyn = _ix(A) - lax.div(_ix(q_r),
                                                     jnp.int32(f))
                            flush(k_par, k_dyn)
        carry[0] = ibuf[bslot, TB - 1]
        return 0

    lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), body, 0)

    # drain both flush chains
    pltpu.make_async_copy(obuf.at[_ix(0)], out_hbm.at[_ix(2)],
                          isem.at[_ix(4)]).wait()
    pltpu.make_async_copy(obuf.at[_ix(1)], out_hbm.at[_ix(3)],
                          isem.at[_ix(5)]).wait()


def supported(MM: int, NN: int) -> bool:
    """Both refined sides must fit the VMEM diagonal bound."""
    return (max(MM, NN) + 1 <= MAX_ROWS) and MM + NN - 1 >= 4


def adjoint_fused(inc3: jnp.ndarray, g: jnp.ndarray, naive: bool,
                  dyadic_order: int = 0) -> jnp.ndarray:
    """Refined-increment cotangent via the fused product kernel.

    ``inc3``: (B, M-1, N-1) base increments (any float dtype; compute f32).
    ``g``: (B,) output cotangent. Returns refined f32 cotangent (B, MM, NN).
    Falls back to :func:`..pallas_solver.adjoint_dd` when only the shorter
    side fits VMEM.
    """
    inc32 = inc3.astype(jnp.float32)
    f = 2 ** dyadic_order
    MM = inc3.shape[-2] * f
    NN = inc3.shape[-1] * f
    if not supported(MM, NN):
        return adjoint_dd(inc3, g, naive, dyadic_order)
    if ceil_to(MM + 1, LANES) > ceil_to(NN + 1, LANES):
        # the in-flight product needs the forward lane extent within the
        # reverse state's (L_f <= L_r); wide rectangles run transposed --
        # the final corner and the increment cotangent commute with it
        ct = adjoint_fused(jnp.swapaxes(inc3, -1, -2), g, naive,
                           dyadic_order)
        return jnp.swapaxes(ct, -1, -2)
    T = MM + NN - 1

    # pairs-on-sublanes only: the product aligns row slabs of both sweeps
    chunk = min(pair_chunk(MM, NN, planes=2), PS_LAYOUT_MAX_B)

    def one(args):
        inc_c, g_c = args
        B = inc_c.shape[0]
        P = ceil_to(B, SUBLANES)
        L_f = ceil_to(MM + 1, LANES)
        L_r = ceil_to(NN + 1, LANES)

        # in-kernel refinement for the reverse stream; f > 4 would blow the
        # fbuf window (2 * TB * f forward-stack slabs), so stream refined
        f_k = 2 ** dyadic_order if 2 ** dyadic_order <= 4 else 1
        pad_f = _pad_f(f_k)

        # 1) forward stack with headroom (pairs-on-sublanes: B <= 64)
        S_f = _solve_stack_one(inc_c, naive, dyadic_order, out_pad=pad_f)
        assert S_f.shape[1:] == (P, L_f), "fused adjoint needs P-S layout"

        # 2) transposed-reversed increments, sheared (flip commutes with
        #    the dyadic repeat, so flip at base resolution)
        rbase = jnp.swapaxes(jnp.flip(jnp.flip(inc_c, -1), -2), -1, -2)
        from .pallas_solver import (_stretch_stream, _aligned_streams_ps,
                                    _use_aligned)

        if f_k > 1:
            rb = rbase * jnp.float32(1.0 / (f_k * f_k))    # (B, Nb, Mb)
            if _use_aligned(B, (P, L_r), 1):
                (sk,) = _aligned_streams_ps([rb], f_k, TB, (P, L_r))
            else:
                sk = _stretch_stream(rb, f_k, TB, 1, (P, L_r))
        else:
            rinc = dyadic_refine(rbase, dyadic_order)      # (B, NN, MM)
            if _use_aligned(B, (P, L_r), 1):
                (sk,) = _aligned_streams_ps([rinc.astype(jnp.float32)], 1,
                                            TB, (P, L_r))
            else:
                sk, n_steps, row_axis, slab = _pad_shear(rinc, TB)
                assert (row_axis == 1 and slab == (P, L_r)
                        and n_steps == T)

        gp = jnp.pad(g_c.astype(jnp.float32), (0, P - B))[:, None]

        # aligned cotangent-stack extent; entries land at q + 2
        Tp_out = ceil_to(T + 2, LANES)
        kernel = functools.partial(_product_kernel, n_steps=T, MM=MM,
                                   NN=NN, L_f=L_f, naive=naive,
                                   pad_f=pad_f, refine=f_k)
        cot = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Tp_out, P, L_f), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, P, L_r), jnp.float32),
                pltpu.VMEM((2, TB, P, L_r), jnp.float32),
                pltpu.VMEM((2, TB * f_k, P, L_f), jnp.float32),
                pltpu.VMEM((2, P, L_f), jnp.float32),
                pltpu.SemaphoreType.DMA((6,)),
                pltpu.VMEM((1, P, L_r), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(sk, S_f, gp)

        grid = _stack_to_grid(cot, 1, MM, NN, B, pre=2)    # (B, MM+1, NN+1)
        return grid[:, 1:, 1:]

    return _chunk_map(one, (inc32, g.astype(jnp.float32)), chunk)


def solve_final_f32_stack(inc3, naive: bool, dyadic_order: int):
    """f32 final-corner solve that ALSO emits per-chunk diagonal stacks
    (entry q at q + ``_pad_f(f)``) for :func:`adjoint_fused_collapsed` --
    one forward sweep serves both the value and the backward's in-flight
    product, mirroring the df path's ``solve_final_df_stack``.

    Returns ``(values (B,), stacks (nc, Tp, P, L_f))``; chunked with
    ``shared_chunk`` so the adjoint consumes stacks chunk-by-chunk.
    Caller gates on :func:`stack_shareable` (and residual capacity).
    """
    f = 2 ** dyadic_order
    B, Mb, Nb = inc3.shape
    MM, NN = Mb * f, Nb * f
    T = MM + NN - 1
    pad = _pad_f(f)
    chunk = shared_chunk(MM, NN)

    def one(c):
        S = _solve_stack_one(c, naive, dyadic_order, out_pad=pad)
        # the final corner lives on the last diagonal at row MM
        val = S[T - 1 + pad, :, MM]
        return val, S

    if B <= chunk:
        val, S = one(inc3)
        return val[:B], S[None]
    Bp = ceil_to(B, chunk)
    inc4 = jnp.pad(inc3, ((0, Bp - B), (0, 0), (0, 0)))
    inc4 = inc4.reshape(Bp // chunk, chunk, Mb, Nb)
    val, stk = jax.lax.map(one, inc4)
    return val.reshape(Bp)[:B], stk


def solve_final_f32_stack_pl(inc3, naive: bool, dyadic_order: int):
    """Plane-split analogue of :func:`solve_final_f32_stack`: values plus
    per-chunk PLANE-layout stacks for :func:`adjoint_planes_collapsed`.
    Caller gates on :func:`planes_adj_ok`."""
    from .pallas_solver import _solve_final_one_f32_pl

    f = 2 ** dyadic_order
    B, Mb, Nb = inc3.shape
    MM, NN = Mb * f, Nb * f
    pad = _pad_f(f)
    chunk = shared_chunk(MM, NN)

    def one(c):
        return _solve_final_one_f32_pl(c, naive, dyadic_order,
                                       stack_pad=pad)

    if B <= chunk:
        val, S = one(inc3)
        return val, S[None]
    Bp = ceil_to(B, chunk)
    inc4 = jnp.pad(inc3, ((0, Bp - B), (0, 0), (0, 0)))
    inc4 = inc4.reshape(Bp // chunk, chunk, Mb, Nb)
    val, stk = jax.lax.map(one, inc4)
    return val.reshape(Bp)[:B], stk


def shared_chunk(MM: int, NN: int) -> int:
    """The pair-chunk size BOTH the stack-emitting df64 forward and the
    collapsed adjoint must use for their per-chunk stacks to pair up."""
    return min(pair_chunk(MM, NN, planes=2), PS_LAYOUT_MAX_B)


def stack_shareable(B: int, Mb: int, Nb: int, dyadic_order: int) -> bool:
    """Can a forward-emitted hi stack drive the collapsed adjoint? Needs
    the in-kernel-collapse geometry (f in (2, 4), both sides in VMEM,
    pairs-on-sublanes); any batch size -- the forward emits one stack per
    shared chunk and the adjoint consumes them chunk-by-chunk."""
    del B
    f = 2 ** dyadic_order
    MM, NN = Mb * f, Nb * f
    return (f in (2, 4) and supported(MM, NN) and MM + 1 <= MAX_ROWS
            # forward lane extent must fit the reverse state's (the
            # in-flight product slices L_f lanes out of L_r); wide
            # rectangles fall back to the non-shared transposed adjoint
            and ceil_to(MM + 1, LANES) <= ceil_to(NN + 1, LANES))


def adjoint_fused_collapsed(inc3: jnp.ndarray, g: jnp.ndarray, naive: bool,
                            dyadic_order: int = 0,
                            fwd_stack=None) -> jnp.ndarray:
    """Increment cotangent COLLAPSED to base resolution ``(B, M-1, N-1)``.

    With ``dyadic_order in (1, 2)`` on a supported geometry this runs the
    in-kernel collapse product kernel -- the refined cotangent stack (the
    backward's largest HBM pass) never exists; the emitted base stack is
    ``f``x smaller and the unshear runs on base-sized data. Otherwise it
    falls back to collapsing :func:`adjoint_fused`'s refined output.

    ``fwd_stack``: an optional precomputed forward diagonal stack (entry q
    at q + ``_pad_f(f)``; e.g. the df64 forward's f32-rounded hi stack) --
    the backward then skips its own forward re-solve. Caller must have
    checked :func:`stack_shareable`.
    """
    from .solve import _collapse_refined

    f = 2 ** dyadic_order
    inc32 = inc3.astype(jnp.float32)
    B0, Mb, Nb = inc32.shape
    MM, NN = Mb * f, Nb * f
    if f == 1 or f > 4 or not supported(MM, NN):
        assert fwd_stack is None
        KK = adjoint_fused(inc3, g, naive, dyadic_order)
        return _collapse_refined(KK, dyadic_order, jnp.float32)
    if ceil_to(MM + 1, LANES) > ceil_to(NN + 1, LANES):
        # wide rectangles run transposed (see adjoint_fused); the
        # stack-sharing gate excludes this orientation
        assert fwd_stack is None
        ct = adjoint_fused_collapsed(jnp.swapaxes(inc3, -1, -2), g, naive,
                                     dyadic_order)
        return jnp.swapaxes(ct, -1, -2)

    T = MM + NN - 1
    pad_f = _pad_f(f)
    chunk = shared_chunk(MM, NN)

    def one_core(inc_c, g_c, S_f):
        from .pallas_solver import (_stretch_stream, _aligned_streams_ps,
                                    _use_aligned)

        B = inc_c.shape[0]
        P = ceil_to(B, SUBLANES)
        L_f = ceil_to(MM + 1, LANES)
        L_r = ceil_to(NN + 1, LANES)
        assert S_f.shape[1:] == (P, L_f), "fused adjoint needs P-S layout"

        rbase = jnp.swapaxes(jnp.flip(jnp.flip(inc_c, -1), -2), -1, -2)
        rb = rbase * jnp.float32(1.0 / (f * f))            # (B, Nb, Mb)
        if _use_aligned(B, (P, L_r), 1):
            (sk,) = _aligned_streams_ps([rb], f, TB, (P, L_r))
        else:
            sk = _stretch_stream(rb, f, TB, 1, (P, L_r))
        L_in = sk.shape[-1]

        gp = jnp.pad(g_c.astype(jnp.float32), (0, P - B))[:, None]

        V = -(-T // f) + 1
        Tp_out = ceil_to(V + 4, LANES)
        from .pallas_solver import WINDOW_SEG as _WSEG

        compact = COLLAPSE_COMPACT and L_f % f == 0
        L_out = L_f // f if compact else L_f
        kernel = functools.partial(_product_collapse_kernel, n_steps=T,
                                   MM=MM, NN=NN, L_f=L_f, naive=naive,
                                   pad_f=pad_f, refine=f,
                                   window_seg=_WSEG, compact=compact)
        cot_b = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Tp_out, P, L_out), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, P, L_r), jnp.float32),
                pltpu.VMEM((2, TB, P, L_in), jnp.float32),
                pltpu.VMEM((2, TB * f, P, L_f), jnp.float32),
                pltpu.VMEM((2, P, L_f), jnp.float32),
                pltpu.VMEM((2, P, L_out), jnp.float32),
                pltpu.SemaphoreType.DMA((6,)),
                pltpu.VMEM((1, P, L_in), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(sk, S_f, gp)

        # base unshear (entry kb at kb + 2: flat-stride, tail pad only),
        # exact 1/f^2 scale; without in-kernel compaction an f-aligned
        # lane-block sum comes first (products live at lane i-1)
        if compact:
            Ds = cot_b[:, :, :Mb]
        else:
            Ds = cot_b[:, :, : f * Mb].reshape(Tp_out, P, Mb, f).sum(-1)
        DT = jnp.transpose(Ds, (1, 2, 0))                  # (P, Mb, Tp_out)
        flat = jnp.pad(DT.reshape(P, Mb * Tp_out), ((0, 0), (0, Mb)))
        K = flat.reshape(P, Mb, Tp_out + 1)[:, :, 2: 2 + Nb]
        return K[:B] * jnp.float32(1.0 / (f * f))

    g32 = g.astype(jnp.float32)
    if fwd_stack is None:
        def one(args):
            inc_c, g_c = args
            S_f = _solve_stack_one(inc_c, naive, dyadic_order,
                                   out_pad=pad_f)
            return one_core(inc_c, g_c, S_f)

        return _chunk_map(one, (inc32, g32), chunk)

    # per-chunk stacks from the stack-emitting forward (same shared chunk)
    if B0 <= chunk:
        # single launch: the forward ran at the NATURAL batch (its stack
        # slab is ceil(B0, SUBLANES) wide, not chunk) -- mirror it
        return one_core(inc32, g32, fwd_stack[0])
    Bp = ceil_to(B0, chunk)
    nc = Bp // chunk
    assert fwd_stack.shape[0] == nc, (fwd_stack.shape, nc)
    inc4 = jnp.pad(inc32, ((0, Bp - B0), (0, 0), (0, 0))).reshape(
        nc, chunk, Mb, Nb)
    g4 = jnp.pad(g32, (0, Bp - B0)).reshape(nc, chunk)
    out = jax.lax.map(lambda a: one_core(a[0], a[1], a[2]),
                      (inc4, g4, fwd_stack))
    return out.reshape(Bp, Mb, Nb)[:B0]


def adjoint_ckpt_collapsed(inc3: jnp.ndarray, g: jnp.ndarray, naive: bool,
                           dyadic_order: int, ckpt_stack) -> jnp.ndarray:
    """Base-resolution increment cotangent from a SPARSE forward stack.

    ``ckpt_stack``: per-chunk checkpoint stacks emitted by
    :func:`..pallas_df64.solve_final_df_ckpt` -- shape
    ``(n_chunks, 2*ckpt_pairs(T, f) + 2, P, L_f)`` with pair m (forward
    diagonals ``(T-6-m*C, T-5-m*C)``, ``C = TB*f``) at slabs
    ``(2m, 2m+1)``. The product kernel recomputes the other ``C-2``
    diagonals per window in-kernel from the forward-orientation base
    stream, so the backward's forward-stack read shrinks ``C/2``-fold.
    Caller must have checked :func:`ckpt_supported` (and
    :func:`stack_shareable` for the chunk pairing).
    """
    f = 2 ** dyadic_order
    inc32 = inc3.astype(jnp.float32)
    B0, Mb, Nb = inc32.shape
    MM, NN = Mb * f, Nb * f
    T = MM + NN - 1
    assert ckpt_supported(T, f)
    chunk = shared_chunk(MM, NN)

    def one_core(inc_c, g_c, CK):
        from .pallas_solver import (_stretch_stream, _aligned_streams_ps,
                                    _use_aligned)

        B = inc_c.shape[0]
        P = ceil_to(B, SUBLANES)
        L_f = ceil_to(MM + 1, LANES)
        L_r = ceil_to(NN + 1, LANES)
        assert CK.shape[1:] == (P, L_f), "ckpt adjoint needs P-S layout"

        s = jnp.float32(1.0 / (f * f))
        rbase = jnp.swapaxes(jnp.flip(jnp.flip(inc_c, -1), -2), -1, -2)
        rb = rbase * s                                     # (B, Nb, Mb)
        fb = inc_c * s                                     # (B, Mb, Nb)
        if _use_aligned(B, (P, L_r), 1):
            (rsk,) = _aligned_streams_ps([rb], f, TB, (P, L_r))
        else:
            rsk = _stretch_stream(rb, f, TB, 1, (P, L_r))
        if _use_aligned(B, (P, L_f), 1):
            (fsk,) = _aligned_streams_ps([fb], f, TB + 4, (P, L_f))
        else:
            fsk = _stretch_stream(fb, f, TB + 4, 1, (P, L_f))

        gp = jnp.pad(g_c.astype(jnp.float32), (0, P - B))[:, None]

        V = -(-T // f) + 1
        Tp_out = ceil_to(V + 4, LANES)
        C = TB * f
        kernel = functools.partial(_product_ckpt_kernel, n_steps=T,
                                   MM=MM, NN=NN, L_f=L_f, naive=naive,
                                   refine=f)
        cot_b = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Tp_out, P, L_f), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, P, L_r), jnp.float32),       # state
                pltpu.VMEM((2, TB, P, L_r), jnp.float32),   # ibuf
                pltpu.VMEM((2, TB + 2, P, L_f), jnp.float32),  # fibuf
                pltpu.VMEM((3, P, L_f), jnp.float32),       # pibuf
                pltpu.VMEM((3, 2, P, L_f), jnp.float32),    # cbuf
                pltpu.VMEM((C, P, L_f), jnp.float32),       # block
                pltpu.VMEM((2, P, L_f), jnp.float32),       # fstate
                pltpu.VMEM((2, P, L_f), jnp.float32),       # acc
                pltpu.VMEM((2, P, L_f), jnp.float32),       # obuf
                pltpu.SemaphoreType.DMA((10,)),
                pltpu.VMEM((1, P, L_r), jnp.float32),       # carry
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(rsk, fsk, CK, gp)

        # f-aligned lane-block sum (products live at lane i-1), base
        # unshear (entry kb at kb + 2: flat-stride, tail pad only), scale
        Ds = cot_b[:, :, : f * Mb].reshape(Tp_out, P, Mb, f).sum(-1)
        DT = jnp.transpose(Ds, (1, 2, 0))                  # (P, Mb, Tp_out)
        flat = jnp.pad(DT.reshape(P, Mb * Tp_out), ((0, 0), (0, Mb)))
        K = flat.reshape(P, Mb, Tp_out + 1)[:, :, 2: 2 + Nb]
        return K[:B] * jnp.float32(1.0 / (f * f))

    g32 = g.astype(jnp.float32)
    if B0 <= chunk:
        return one_core(inc32, g32, ckpt_stack[0])
    Bp = ceil_to(B0, chunk)
    nc = Bp // chunk
    assert ckpt_stack.shape[0] == nc, (ckpt_stack.shape, nc)
    inc4 = jnp.pad(inc32, ((0, Bp - B0), (0, 0), (0, 0))).reshape(
        nc, chunk, Mb, Nb)
    g4 = jnp.pad(g32, (0, Bp - B0)).reshape(nc, chunk)
    out = jax.lax.map(lambda a: one_core(a[0], a[1], a[2]),
                      (inc4, g4, ckpt_stack))
    return out.reshape(Bp, Mb, Nb)[:B0]
