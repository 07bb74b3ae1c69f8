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
        if f_k > 1:
            from .pallas_solver import _stretch_stream

            rb = rbase * jnp.float32(1.0 / (f_k * f_k))    # (B, Nb, Mb)
            sk = _stretch_stream(rb, f_k, TB, 1, (P, L_r))
        else:
            rinc = dyadic_refine(rbase, dyadic_order)      # (B, NN, MM)
            sk, n_steps, row_axis, slab = _pad_shear(rinc, TB)
            assert row_axis == 1 and slab == (P, L_r) and n_steps == T

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
