"""Blocked (row-stripe) Pallas wavefront: refined grids beyond the VMEM
diagonal bound.

The single-slab kernel (:mod:`.pallas_solver`) keeps one anti-diagonal of
the solution in VMEM, bounding the *shorter* refined side to ``MAX_ROWS``
(8192). This module removes that bound -- the capability the reference
loses entirely at its 1024-thread CUDA cap (reference
sigkernel/sigkernel.py:222) and SURVEY S7's tier-3 blocked solver.

Decomposition: the refined grid is cut into horizontal stripes of at most
``MAX_ROWS - 1`` rows. Each stripe is an ordinary wavefront sweep whose
north boundary (local row 0) is not the constant 1 but the previous
stripe's bottom solution row:

- the boundary value ``K[0_local, j]`` enters the slab's row 0 at step
  ``q = j - 2`` as a tiny per-step DMA stream alongside the increments;
- the stripe's bottom row ``K[MM_local, j]`` leaves the kernel one value
  per step (``row[q] = K[MM, q + 2 - MM]``, a single lane-column DMA of
  the live diagonal), giving the next stripe's boundary without ever
  materialising the stripe's solution grid.

The west boundary stays the global ``K[:, 0] = 1`` for every stripe (the
stripes span all columns), so only the north row travels. Zero-increment
padding rows copy the row above (``K[i,j] = K[i-1,j] + K[i,j-1] -
K[i-1,j-1]`` telescopes when the west boundary matches), so bottom-padding
the last stripe is exact.

Stripes run sequentially (true data dependence); pairs provide the
parallelism, chunked to an HBM budget -- a 16k x 16k refined grid streams
~1.5 GB of sheared increments per pair-chunk stripe.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import scan_solver
from .pallas_solver import (LANES, SUBLANES, MAX_ROWS, IN_OFF,
                            _ix, _scheme, _chunk_map)

# Own HBM budget: blocked problems are enormous per pair and their stripe
# streams still use the legacy (unaligned) shear with ~3x XLA copies; the
# solver module's budget was raised for 128-pair aligned chunks and would
# overshoot here.
CHUNK_BYTES = 9 << 29
from ..utils import ceil_to, dyadic_refine

DMA_BATCH = 4


def supported(inc) -> bool:
    """TPU + f32/f64 + too big for the single-slab kernels (either order).

    This tier complements :func:`..pallas_solver.supported`; the dispatcher
    tries the single-slab kernels first. f64 increments run the
    double-double stripe kernel.
    """
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    if platform not in ("tpu", "axon"):
        return False
    if inc.dtype not in (jnp.float32, jnp.float64):
        return False
    MM, NN = inc.shape[-2], inc.shape[-1]
    return MM > 0 and NN > 0 and min(MM, NN) + 1 > MAX_ROWS


def _stripe_kernel(inc_hbm, bd01_ref, rows_ref, state, ibuf, oreg,
                   isem, osem, *, MM, naive, n_loop):
    """One stripe sweep, pairs-on-sublanes layout only (slab = (P, L)).

    inc_hbm: (Tp, P, L) sheared increments with the north-boundary stream
    packed into lane 0 (``inc_hbm[q, :, 0] = bd[q + 2]`` -- lane 0 is the
    shear's pad row, so the boundary rides the increment DMA for free;
    Mosaic cannot DMA 1-lane slices). bd01_ref: (2, P, 1) VMEM, boundary
    values bd[0], bd[1] for the two initial diagonals.
    rows_ref: (n_loop // LANES, P, LANES) HBM out; lane ``l`` of batch ``c``
    holds ``K[MM, q + 2 - MM]`` for ``q = LANES*c + LANES-1 - l`` (bottom
    values are pushed into a right-rolling register at lane 0 and flushed
    whole once per LANES steps -- single-lane DMAs violate Mosaic's lane
    tiling; the XLA side flips lanes back).
    All ``n_loop`` (LANES-aligned) steps run (q >= n_steps computes padding
    garbage that is never read back), keeping the flush cadence exact with
    no tail logic.
    """
    T = DMA_BATCH
    P, L = state.shape[1], state.shape[2]
    n_batches = n_loop // T
    ii = lax.broadcasted_iota(jnp.int32, (P, L), 1)
    jj = lax.broadcasted_iota(jnp.int32, (P, LANES), 1)
    one = jnp.float32(1.0)

    init0 = jnp.ones((P, L), jnp.float32)
    state[0] = jnp.where(ii == 0, bd01_ref[0], init0)  # diag p=0: K[0,0]
    state[1] = jnp.where(ii == 0, bd01_ref[1], init0)  # diag p=1: K[0,1]
    oreg[...] = jnp.zeros((P, LANES), jnp.float32)

    def in_copy(b, slot):
        return pltpu.make_async_copy(
            inc_hbm.at[pl.ds(_ix(b * T + IN_OFF), T)],
            ibuf.at[_ix(slot)], isem.at[_ix(slot)])

    in_copy(0, 0).start()

    def body(b, _):
        bslot = lax.rem(b, jnp.int32(2))

        @pl.when(b + 1 < n_batches)
        def _():
            in_copy(b + 1, 1 - bslot).start()

        in_copy(b, bslot).wait()

        for t in range(T):  # static unroll: ping-pong slots compile-time
            q = b * T + t
            vm2_s, vm1_s = t % 2, 1 - (t % 2)

            u = ibuf[bslot, t]
            vm1 = state[vm1_s]
            k10 = vm1
            k01 = pltpu.roll(vm1, jnp.int32(1), axis=1)
            k00 = pltpu.roll(state[vm2_s], jnp.int32(1), axis=1)
            v = _scheme(k00, k01, k10, u, naive)
            # row 0 carries the streamed north boundary (lane 0 of u);
            # west boundary (ii == p) and pad rows stay 1
            v = jnp.where(ii == 0, jnp.broadcast_to(u[:, 0:1], (P, L)), v)
            v = jnp.where((ii == q + 2) | (ii > MM), one, v)
            state[vm2_s] = v

            # push K[MM, q + 2 - MM] into the bottom-row register
            bot = v[:, MM:MM + 1]
            oreg[...] = jnp.where(jj == 0, jnp.broadcast_to(bot, (P, LANES)),
                                  pltpu.roll(oreg[...], jnp.int32(1), axis=1))

            @pl.when(lax.rem(q + 1, jnp.int32(LANES)) == 0)
            def _():
                c = lax.div(_ix(q), jnp.int32(LANES))
                cp = pltpu.make_async_copy(oreg, rows_ref.at[c], osem)
                cp.start()
                cp.wait()  # sync: ~LANES*P floats per LANES slab steps
        return 0

    lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), body, 0)


def _stripe_bottom_row(inc_s: jnp.ndarray, bd: jnp.ndarray,
                       naive: bool) -> jnp.ndarray:
    """Sweep one refined stripe; return its bottom solution row.

    ``inc_s``: (B, MM_s, NN) refined stripe increments (MM_s + 1 <= 8192).
    ``bd``: (B, NN + 1) north boundary row. Returns (B, NN + 1).
    """
    B, MM, NN = inc_s.shape
    n_steps = MM + NN - 1
    sk, bd01, (P, L, Tp) = _stripe_io(inc_s, bd)

    kernel = functools.partial(_stripe_kernel, MM=MM, naive=naive,
                               n_loop=Tp)
    rows = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Tp // LANES, P, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, P, L), jnp.float32),
            pltpu.VMEM((2, DMA_BATCH, P, L), jnp.float32),
            pltpu.VMEM((P, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(sk, bd01)

    # row[q] = K[MM, q + 2 - MM]  ->  bd_next[j] = row[MM - 2 + j], j >= 1
    rowsT = _unpack_rows(rows)                            # (P, Tp)
    vals = lax.dynamic_slice_in_dim(rowsT, MM - 1, NN, axis=1)
    out = jnp.concatenate(
        [jnp.ones((P, 1), jnp.float32), vals], axis=1)
    return out[:B]


def _unpack_rows(rows: jnp.ndarray) -> jnp.ndarray:
    """(Tp // LANES, P, LANES) flushed bottom-row batches -> (P, Tp) by
    step ``q`` (batch ``q // LANES``, lane ``LANES-1 - q % LANES``)."""
    Cp, P, _ = rows.shape
    r = jnp.flip(rows, axis=-1)
    return jnp.transpose(r, (1, 0, 2)).reshape(P, Cp * LANES)


def _stripe_kernel_grid(inc_hbm, bd01_ref, out_ref, state, ibuf,
                        isem, *, n_steps, MM, naive):
    """Stripe sweep with the boundary stream in lane 0 of the increment
    slab (see :func:`_stripe_kernel`), streaming ALL diagonals to HBM
    (the striped adjoint's grid recompute). out_ref: (Tp, P, L)."""
    T = DMA_BATCH
    P, L = state.shape[1], state.shape[2]
    n_batches = pl.cdiv(n_steps, T)
    ii = lax.broadcasted_iota(jnp.int32, (P, L), 1)
    one = jnp.float32(1.0)

    init0 = jnp.ones((P, L), jnp.float32)
    state[0] = jnp.where(ii == 0, bd01_ref[0], init0)
    state[1] = jnp.where(ii == 0, bd01_ref[1], init0)

    def in_copy(b, slot):
        return pltpu.make_async_copy(
            inc_hbm.at[pl.ds(_ix(b * T + IN_OFF), T)],
            ibuf.at[_ix(slot)], isem.at[_ix(slot)])

    in_copy(0, 0).start()

    def body(b, _):
        bslot = lax.rem(b, jnp.int32(2))

        @pl.when(b + 1 < n_batches)
        def _():
            in_copy(b + 1, 1 - bslot).start()

        in_copy(b, bslot).wait()

        for t in range(T):
            q = b * T + t
            vm2_s, vm1_s = t % 2, 1 - (t % 2)

            @pl.when(q < n_steps)
            def _():
                u = ibuf[bslot, t]
                vm1 = state[vm1_s]
                k10 = vm1
                k01 = pltpu.roll(vm1, jnp.int32(1), axis=1)
                k00 = pltpu.roll(state[vm2_s], jnp.int32(1), axis=1)
                v = _scheme(k00, k01, k10, u, naive)
                v = jnp.where(ii == 0,
                              jnp.broadcast_to(u[:, 0:1], (P, L)), v)
                v = jnp.where((ii == q + 2) | (ii > MM), one, v)

                @pl.when(q >= 2)
                def _():
                    pltpu.make_async_copy(state.at[_ix(vm2_s)],
                                          out_ref.at[_ix(q)],
                                          isem.at[_ix(2 + t % 2)]).wait()
                state[vm2_s] = v
                pltpu.make_async_copy(state.at[_ix(vm2_s)],
                                      out_ref.at[_ix(q + 2)],
                                      isem.at[_ix(2 + t % 2)]).start()
        return 0

    lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), body, 0)

    last = (n_steps - 1) % 2
    pltpu.make_async_copy(state.at[_ix(last)],
                          out_ref.at[_ix(n_steps + 1)],
                          isem.at[_ix(2 + last)]).wait()
    @pl.when(n_steps >= 2)
    def _():
        pltpu.make_async_copy(state.at[_ix(1 - last)],
                              out_ref.at[_ix(n_steps)],
                              isem.at[_ix(2 + (1 - last))]).wait()


def _stripe_io(inc_s, bd, fill=1.0):
    """Shared stripe input prep: sheared increments with the north-boundary
    stream packed into lane 0 (the shear's pad row), plus the (2, P, 1)
    initial-diagonal boundary values. ``fill`` pads the boundary stream's
    tail (1 for solution planes, 0 for double-double lo planes).

    Aligned construction (see ``pallas_solver._pad_shear``): ONE aligned
    pad/concat realises slab geometry, shear (flat-stride view, stream
    offset ``IN_OFF``) AND the lane-0 boundary packing -- row 0 of the
    padded grid IS the shear's pad row, so the boundary values are written
    there before the view instead of a full-stream ``.set`` copy (which,
    with the old odd-width shear pad, dominated long-path solves).
    ``Tp`` in the returned geometry is the kernel's step-loop extent
    (LANES-aligned for the bottom-row flush cadence), decoupled from the
    stream's width.
    """
    B, MM, NN = inc_s.shape
    n_steps = MM + NN - 1
    P = ceil_to(B, SUBLANES)
    L = ceil_to(MM + 1, LANES)
    Tp = ceil_to(n_steps, max(LANES, DMA_BATCH))

    W0 = ceil_to(max(Tp + IN_OFF + 1, NN + L + 1), LANES)
    W = W0 - 1
    bdp = jnp.pad(bd, ((0, P - B), (0, 0)), constant_values=fill)
    # row 0: S[p, 0, t] = bd[t + 1] = bd[q + 2] at stream index t = q + 1
    row0 = jnp.pad(bdp[:, 1:], ((0, 0), (0, W0 - NN)),
                   constant_values=fill)[:, None, :]       # (P, 1, W0)
    body = jnp.pad(inc_s, ((0, P - B), (0, L - 1 - MM), (0, W0 - NN)))
    x0 = jnp.concatenate([row0, body], axis=1)             # (P, L, W0)
    flat = x0.reshape(P, L * W0)[:, : L * W]
    sk = jnp.transpose(flat.reshape(P, L, W), (2, 0, 1))   # (W, P, L)

    bd01 = jnp.transpose(bdp[:, :2], (1, 0))[:, :, None]   # (2, P, 1)
    return sk, bd01, (P, L, Tp)


def _stripe_grid(inc_s: jnp.ndarray, bd: jnp.ndarray,
                 naive: bool) -> jnp.ndarray:
    """Full solution grid of one stripe given its north boundary row.

    ``inc_s``: (B, MM_s, NN); ``bd``: (B, NN + 1). Returns
    (B, MM_s + 1, NN + 1) with row 0 = ``bd`` and column 0 = 1.
    """
    from .pallas_solver import _stack_to_grid

    B, MM, NN = inc_s.shape
    n_steps = MM + NN - 1
    sk, bd01, (P, L, Tp) = _stripe_io(inc_s, bd)
    Tp2 = ceil_to(n_steps + 2, LANES)   # entries at q + 2 (fast unshear)
    kernel = functools.partial(_stripe_kernel_grid, n_steps=n_steps, MM=MM,
                               naive=naive)
    stack = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Tp2, P, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, P, L), jnp.float32),
            pltpu.VMEM((2, DMA_BATCH, P, L), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(sk, bd01)
    grid = _stack_to_grid(stack, 1, MM, NN, B, pre=2)
    return grid.at[:, 0, :].set(bd[:, : NN + 1])


# stripe height of the striped adjoint: smaller than the forward's to keep
# the per-stripe diagonal stacks (~(Rb + NN) * Rb floats) HBM-reasonable
ADJ_ROWS = 2048


def adjoint_blocked(inc3: jnp.ndarray, g: jnp.ndarray, naive: bool,
                    dyadic_order: int = 0) -> jnp.ndarray:
    """Increment cotangent for grids beyond the VMEM bound on both sides.

    Checkpoints the stripe-boundary rows of the forward and reversed
    sweeps, then recomputes one stripe-grid pair at a time and forms the
    classic variation-of-parameters product per stripe
    (``cot_s = K_s[:, :-1, :-1] * flip2(Krev_t[:, 1:, 1:]) * g`` with
    ``t = S - 1 - s``). Rows are zero-padded to stripe alignment first --
    zero increments copy rows exactly, and the reversed solve of the padded
    problem shifts identically, so the sliced cotangent is exact.

    Returns the cotangent COLLAPSED to base resolution (B, M-1, N-1) f32
    (per-stripe collapse keeps the refined grid from ever materialising).
    """
    from .solve import _collapse_refined  # local import: no cycle at load

    inc32 = inc3.astype(jnp.float32)
    f = 2 ** dyadic_order
    B0, Mb, Nb = inc32.shape
    NN = Nb * f

    Rb = min(ADJ_ROWS, (MAX_ROWS - 1)) // f * f
    Mb_pad = -(-Mb * f // Rb) * Rb // f     # base rows, stripe-aligned
    inc32 = jnp.pad(inc32, ((0, 0), (0, Mb_pad - Mb), (0, 0)))
    MM = Mb_pad * f
    S = MM // Rb

    inc_rev = jnp.flip(jnp.flip(inc32, -1), -2)
    chunk = max(_pair_chunk_blocked(Rb, NN) // 4, SUBLANES)

    def boundaries(inc_c):
        """North-boundary row of every stripe (S entries, [0] = ones)."""
        B = inc_c.shape[0]
        bds = [jnp.ones((B, NN + 1), jnp.float32)]
        for s in range(S - 1):
            stripe = dyadic_refine(
                inc_c[:, s * Rb // f:(s + 1) * Rb // f, :], dyadic_order)
            bds.append(_stripe_bottom_row(stripe, bds[-1], naive))
        return bds

    def one(args):
        inc_c, rev_c, g_c = args
        bd_f = boundaries(inc_c)
        bd_r = boundaries(rev_c)
        gb = g_c.astype(jnp.float32)[:, None, None]
        cot_rows = []
        for s in range(S):
            t = S - 1 - s
            stripe_f = dyadic_refine(
                inc_c[:, s * Rb // f:(s + 1) * Rb // f, :], dyadic_order)
            stripe_r = dyadic_refine(
                rev_c[:, t * Rb // f:(t + 1) * Rb // f, :], dyadic_order)
            K_s = _stripe_grid(stripe_f, bd_f[s], naive)
            R_t = _stripe_grid(stripe_r, bd_r[t], naive)
            R_t = jnp.flip(jnp.flip(R_t, -1), -2)  # flip BEFORE slicing
            cot = K_s[:, :-1, :-1] * R_t[:, 1:, 1:] * gb
            cot_rows.append(_collapse_refined(cot, dyadic_order,
                                              jnp.float32))
        return jnp.concatenate(cot_rows, axis=1)

    out = _chunk_map(one, (inc32, inc_rev, g.astype(jnp.float32)), chunk)
    return out[:, :Mb, :]


# ---------------------------------------------------------------------------
# Double-double stripes: the same decomposition with (hi, lo) planes
# ---------------------------------------------------------------------------

def _stripe_kernel_df(inch_hbm, incl_hbm, bd01_ref, rowh_ref, rowl_ref,
                      sh, sl, ibh, ibl, oregh, oregl, isem, osem,
                      *, MM, naive, n_loop):
    """Double-double stripe sweep (hi/lo planes throughout).

    Boundary streams ride lane 0 of the hi/lo increment slabs; bottom rows
    accumulate in rolling (P, LANES) registers flushed once per LANES
    steps, exactly as in :func:`_stripe_kernel`. bd01_ref: (2, 2, P, 1)
    VMEM -- (component, diag) initial boundary. isem: 4 in-semaphores
    (inc-h/l, 2 slots each); osem: 2 out-semaphores (rows-h/l).
    """
    from .pallas_df64 import _df_scheme

    T = DMA_BATCH
    P, L = sh.shape[1], sh.shape[2]
    n_batches = n_loop // T
    ii = lax.broadcasted_iota(jnp.int32, (P, L), 1)
    jj = lax.broadcasted_iota(jnp.int32, (P, LANES), 1)
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)

    init1 = jnp.ones((P, L), jnp.float32)
    init0 = jnp.zeros((P, L), jnp.float32)
    sh[0] = jnp.where(ii == 0, bd01_ref[0, 0], init1)
    sh[1] = jnp.where(ii == 0, bd01_ref[0, 1], init1)
    sl[0] = jnp.where(ii == 0, bd01_ref[1, 0], init0)
    sl[1] = jnp.where(ii == 0, bd01_ref[1, 1], init0)
    oregh[...] = jnp.zeros((P, LANES), jnp.float32)
    oregl[...] = jnp.zeros((P, LANES), jnp.float32)

    def in_copies(b, slot):
        ds = pl.ds(_ix(b * T + IN_OFF), T)
        return (
            pltpu.make_async_copy(inch_hbm.at[ds], ibh.at[_ix(slot)],
                                  isem.at[_ix(slot)]),
            pltpu.make_async_copy(incl_hbm.at[ds], ibl.at[_ix(slot)],
                                  isem.at[_ix(2 + slot)]),
        )

    for c in in_copies(0, 0):
        c.start()

    def body(b, _):
        bslot = lax.rem(b, jnp.int32(2))

        @pl.when(b + 1 < n_batches)
        def _():
            for c in in_copies(b + 1, 1 - bslot):
                c.start()

        for c in in_copies(b, bslot):
            c.wait()

        for t in range(T):
            q = b * T + t
            vm2, vm1 = t % 2, 1 - (t % 2)

            uh, ul = ibh[bslot, t], ibl[bslot, t]
            k10h, k10l = sh[vm1], sl[vm1]
            k01h = pltpu.roll(k10h, jnp.int32(1), axis=1)
            k01l = pltpu.roll(k10l, jnp.int32(1), axis=1)
            k00h = pltpu.roll(sh[vm2], jnp.int32(1), axis=1)
            k00l = pltpu.roll(sl[vm2], jnp.int32(1), axis=1)
            vh, vl = _df_scheme(k00h, k00l, k01h, k01l, k10h, k10l,
                                uh, ul, naive)
            vh = jnp.where(ii == 0, jnp.broadcast_to(uh[:, 0:1], (P, L)), vh)
            vl = jnp.where(ii == 0, jnp.broadcast_to(ul[:, 0:1], (P, L)), vl)
            west = (ii == q + 2) | (ii > MM)
            vh = jnp.where(west, one, vh)
            vl = jnp.where(west, zero, vl)
            sh[vm2] = vh
            sl[vm2] = vl

            oregh[...] = jnp.where(
                jj == 0, jnp.broadcast_to(vh[:, MM:MM + 1], (P, LANES)),
                pltpu.roll(oregh[...], jnp.int32(1), axis=1))
            oregl[...] = jnp.where(
                jj == 0, jnp.broadcast_to(vl[:, MM:MM + 1], (P, LANES)),
                pltpu.roll(oregl[...], jnp.int32(1), axis=1))

            @pl.when(lax.rem(q + 1, jnp.int32(LANES)) == 0)
            def _():
                c = lax.div(_ix(q), jnp.int32(LANES))
                cph = pltpu.make_async_copy(oregh, rowh_ref.at[c],
                                            osem.at[_ix(0)])
                cpl = pltpu.make_async_copy(oregl, rowl_ref.at[c],
                                            osem.at[_ix(1)])
                cph.start()
                cpl.start()
                cph.wait()
                cpl.wait()
        return 0

    lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), body, 0)


def _stripe_bottom_row_df(hi_s, lo_s, bd, naive):
    """DF stripe sweep; returns the DF bottom row.

    ``hi_s``/``lo_s``: (B, MM_s, NN) refined stripe component planes.
    ``bd``: DF pair of (B, NN + 1). Returns a DF pair of (B, NN + 1).
    """
    B, MM, NN = hi_s.shape
    bdh, bdl = bd
    skh, bdh01, (P, L, Tp) = _stripe_io(hi_s, bdh, fill=1.0)
    skl, bdl01, _ = _stripe_io(lo_s, bdl, fill=0.0)
    bd01 = jnp.stack([bdh01, bdl01])            # (2, 2, P, 1)

    kernel = functools.partial(_stripe_kernel_df, MM=MM, naive=naive,
                               n_loop=Tp)
    rows_h, rows_l = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((Tp // LANES, P, LANES),
                                        jnp.float32),) * 2,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),) * 2,
        scratch_shapes=[
            pltpu.VMEM((2, P, L), jnp.float32),
            pltpu.VMEM((2, P, L), jnp.float32),
            pltpu.VMEM((2, DMA_BATCH, P, L), jnp.float32),
            pltpu.VMEM((2, DMA_BATCH, P, L), jnp.float32),
            pltpu.VMEM((P, LANES), jnp.float32),
            pltpu.VMEM((P, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(skh, skl, bd01)

    def unpack(rows, fill):
        rT = _unpack_rows(rows)
        vals = lax.dynamic_slice_in_dim(rT, MM - 1, NN, axis=1)
        first = jnp.full((P, 1), fill, jnp.float32)
        return jnp.concatenate([first, vals], axis=1)[:B]

    return unpack(rows_h, 1.0), unpack(rows_l, 0.0)


def _stripe_kernel_grid_df(inch_hbm, incl_hbm, bd01_ref, outh_ref, outl_ref,
                           sh, sl, ibh, ibl, isem,
                           *, n_steps, MM, naive):
    """DF stripe sweep streaming ALL (hi, lo) diagonals to HBM -- the
    double-double analogue of :func:`_stripe_kernel_grid` for the
    f64-grade striped adjoint's grid recompute. Boundary streams ride
    lane 0 of the component increment slabs; bd01_ref is (2, 2, P, 1)
    (component, diag). isem: 8 (4 in + 4 out write-back)."""
    from .pallas_df64 import _df_scheme

    T = DMA_BATCH
    P, L = sh.shape[1], sh.shape[2]
    n_batches = pl.cdiv(n_steps, T)
    ii = lax.broadcasted_iota(jnp.int32, (P, L), 1)
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)

    init1 = jnp.ones((P, L), jnp.float32)
    init0 = jnp.zeros((P, L), jnp.float32)
    sh[0] = jnp.where(ii == 0, bd01_ref[0, 0], init1)
    sh[1] = jnp.where(ii == 0, bd01_ref[0, 1], init1)
    sl[0] = jnp.where(ii == 0, bd01_ref[1, 0], init0)
    sl[1] = jnp.where(ii == 0, bd01_ref[1, 1], init0)

    def in_copies(b, slot):
        ds = pl.ds(_ix(b * T + IN_OFF), T)
        return (
            pltpu.make_async_copy(inch_hbm.at[ds], ibh.at[_ix(slot)],
                                  isem.at[_ix(slot)]),
            pltpu.make_async_copy(incl_hbm.at[ds], ibl.at[_ix(slot)],
                                  isem.at[_ix(2 + slot)]),
        )

    for c in in_copies(0, 0):
        c.start()

    def body(b, _):
        bslot = lax.rem(b, jnp.int32(2))

        @pl.when(b + 1 < n_batches)
        def _():
            for c in in_copies(b + 1, 1 - bslot):
                c.start()

        for c in in_copies(b, bslot):
            c.wait()

        for t in range(T):
            q = b * T + t
            vm2, vm1 = t % 2, 1 - (t % 2)

            @pl.when(q < n_steps)
            def _():
                uh, ul = ibh[bslot, t], ibl[bslot, t]
                k10h, k10l = sh[vm1], sl[vm1]
                k01h = pltpu.roll(k10h, jnp.int32(1), axis=1)
                k01l = pltpu.roll(k10l, jnp.int32(1), axis=1)
                k00h = pltpu.roll(sh[vm2], jnp.int32(1), axis=1)
                k00l = pltpu.roll(sl[vm2], jnp.int32(1), axis=1)
                vh, vl = _df_scheme(k00h, k00l, k01h, k01l, k10h, k10l,
                                    uh, ul, naive)
                vh = jnp.where(ii == 0,
                               jnp.broadcast_to(uh[:, 0:1], (P, L)), vh)
                vl = jnp.where(ii == 0,
                               jnp.broadcast_to(ul[:, 0:1], (P, L)), vl)
                west = (ii == q + 2) | (ii > MM)
                vh = jnp.where(west, one, vh)
                vl = jnp.where(west, zero, vl)

                @pl.when(q >= 2)
                def _():
                    pltpu.make_async_copy(sh.at[_ix(vm2)],
                                          outh_ref.at[_ix(q)],
                                          isem.at[_ix(4 + t % 2)]).wait()
                    pltpu.make_async_copy(sl.at[_ix(vm2)],
                                          outl_ref.at[_ix(q)],
                                          isem.at[_ix(6 + t % 2)]).wait()
                sh[vm2] = vh
                sl[vm2] = vl
                pltpu.make_async_copy(sh.at[_ix(vm2)],
                                      outh_ref.at[_ix(q + 2)],
                                      isem.at[_ix(4 + t % 2)]).start()
                pltpu.make_async_copy(sl.at[_ix(vm2)],
                                      outl_ref.at[_ix(q + 2)],
                                      isem.at[_ix(6 + t % 2)]).start()
        return 0

    lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), body, 0)

    last = (n_steps - 1) % 2
    for ref, base in ((outh_ref, 4), (outl_ref, 6)):
        pltpu.make_async_copy((sh if base == 4 else sl).at[_ix(last)],
                              ref.at[_ix(n_steps + 1)],
                              isem.at[_ix(base + last)]).wait()

        @pl.when(n_steps >= 2)
        def _(ref=ref, base=base):
            pltpu.make_async_copy(
                (sh if base == 4 else sl).at[_ix(1 - last)],
                ref.at[_ix(n_steps)],
                isem.at[_ix(base + (1 - last))]).wait()


def _stripe_grid_df(hi_s, lo_s, bd, naive):
    """Full (hi, lo) solution grids of one DF stripe given its DF north
    boundary. ``hi_s``/``lo_s``: (B, MM_s, NN); ``bd``: DF pair of
    (B, NN + 1). Returns a DF pair of (B, MM_s + 1, NN + 1) grids."""
    from .pallas_solver import _stack_to_grid

    B, MM, NN = hi_s.shape
    n_steps = MM + NN - 1
    bdh, bdl = bd
    skh, bdh01, (P, L, Tp) = _stripe_io(hi_s, bdh, fill=1.0)
    skl, bdl01, _ = _stripe_io(lo_s, bdl, fill=0.0)
    bd01 = jnp.stack([bdh01, bdl01])            # (2, 2, P, 1)

    Tp2 = ceil_to(n_steps + 2, LANES)
    kernel = functools.partial(_stripe_kernel_grid_df, n_steps=n_steps,
                               MM=MM, naive=naive)
    stack_h, stack_l = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((Tp2, P, L), jnp.float32),) * 2,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),) * 2,
        scratch_shapes=[
            pltpu.VMEM((2, P, L), jnp.float32),
            pltpu.VMEM((2, P, L), jnp.float32),
            pltpu.VMEM((2, DMA_BATCH, P, L), jnp.float32),
            pltpu.VMEM((2, DMA_BATCH, P, L), jnp.float32),
            pltpu.SemaphoreType.DMA((8,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(skh, skl, bd01)
    gh = _stack_to_grid(stack_h, 1, MM, NN, B, pre=2)
    gl = _stack_to_grid(stack_l, 1, MM, NN, B, pre=2)
    gh = gh.at[:, 0, :].set(bdh[:, : NN + 1])
    gl = gl.at[:, 0, :].set(bdl[:, : NN + 1])
    # _stack_to_grid hardcodes the west boundary to the solution value 1;
    # the lo component's west boundary is 0
    gl = gl.at[:, 1:, 0].set(0.0)
    return gh, gl


def adjoint_blocked_df(hi3: jnp.ndarray, lo3: jnp.ndarray, g: jnp.ndarray,
                       naive: bool, dyadic_order: int = 0) -> jnp.ndarray:
    """f64-grade increment cotangent for grids beyond the VMEM bound.

    The double-double analogue of :func:`adjoint_blocked`: stripe
    boundaries and stripe grids run as DF (hi, lo) sweeps, the
    variation-of-parameters product and the dyadic collapse run in f64.
    Closes the round-3 gap where f64 increments on the blocked solver
    silently got the f32-grade striped adjoint (reference parity: the
    Cython CPU path is f64 end-to-end at any length,
    reference sigkernel/cython_backend.pyx:64-119).

    Returns the cotangent collapsed to base resolution, f64 (B, Mb, Nb).
    """
    from .solve import _collapse_refined

    f = 2 ** dyadic_order
    B0, Mb, Nb = hi3.shape
    NN = Nb * f

    Rb = min(ADJ_ROWS, (MAX_ROWS - 1)) // f * f
    Mb_pad = -(-Mb * f // Rb) * Rb // f
    hi3 = jnp.pad(hi3, ((0, 0), (0, Mb_pad - Mb), (0, 0)))
    lo3 = jnp.pad(lo3, ((0, 0), (0, Mb_pad - Mb), (0, 0)))
    MM = Mb_pad * f
    S = MM // Rb

    hi_rev = jnp.flip(jnp.flip(hi3, -1), -2)
    lo_rev = jnp.flip(jnp.flip(lo3, -1), -2)
    chunk = max(_pair_chunk_blocked(Rb, NN) // 8, SUBLANES)

    def boundaries(hc, lc):
        B = hc.shape[0]
        bds = [(jnp.ones((B, NN + 1), jnp.float32),
                jnp.zeros((B, NN + 1), jnp.float32))]
        for s in range(S - 1):
            sh = dyadic_refine(hc[:, s * Rb // f:(s + 1) * Rb // f, :],
                               dyadic_order)
            sl = dyadic_refine(lc[:, s * Rb // f:(s + 1) * Rb // f, :],
                               dyadic_order)
            bds.append(_stripe_bottom_row_df(sh, sl, bds[-1], naive))
        return bds

    def one(args):
        hc, lc, hr, lr, g_c = args
        bd_f = boundaries(hc, lc)
        bd_r = boundaries(hr, lr)
        gb = g_c.astype(jnp.float64)[:, None, None]
        cot_rows = []
        for s in range(S):
            t = S - 1 - s

            def stripe(c, idx):
                return dyadic_refine(c[:, idx * Rb // f:(idx + 1) * Rb // f,
                                       :], dyadic_order)

            Kh, Kl = _stripe_grid_df(stripe(hc, s), stripe(lc, s),
                                     bd_f[s], naive)
            Rh, Rl = _stripe_grid_df(stripe(hr, t), stripe(lr, t),
                                     bd_r[t], naive)
            K64 = Kh.astype(jnp.float64) + Kl.astype(jnp.float64)
            R64 = Rh.astype(jnp.float64) + Rl.astype(jnp.float64)
            R64 = jnp.flip(jnp.flip(R64, -1), -2)
            cot = K64[:, :-1, :-1] * R64[:, 1:, 1:] * gb
            cot_rows.append(_collapse_refined(cot, dyadic_order,
                                              jnp.float64))
        return jnp.concatenate(cot_rows, axis=1)

    out = _chunk_map(one, (hi3, lo3, hi_rev, lo_rev,
                           g.astype(jnp.float64)), chunk)
    return out[:, :Mb, :]


@functools.partial(jax.jit, static_argnames=("naive", "dyadic_order"))
def solve_final_df(hi: jnp.ndarray, lo: jnp.ndarray, naive: bool = False,
                   dyadic_order: int = 0) -> jnp.ndarray:
    """Blocked double-double forward solve on DF (hi, lo) increments;
    returns f64 ``K[..., -1, -1]`` for grids beyond the VMEM bound."""
    batch_shape = hi.shape[:-2]
    f = 2 ** dyadic_order
    Mb, Nb = hi.shape[-2], hi.shape[-1]
    MM, NN = Mb * f, Nb * f
    B0 = math.prod(batch_shape)
    hi3 = hi.reshape((B0, Mb, Nb))
    lo3 = lo.reshape((B0, Mb, Nb))

    Rb = (MAX_ROWS - 1) // f * f
    n_stripes = -(-MM // Rb)

    def one(args):
        hi_c, lo_c = args
        B = hi_c.shape[0]
        bd = (jnp.ones((B, NN + 1), jnp.float32),
              jnp.zeros((B, NN + 1), jnp.float32))
        for s in range(n_stripes):
            t0 = s * Rb // f
            t1 = min(Mb, t0 + Rb // f)
            sh = dyadic_refine(hi_c[:, t0:t1, :], dyadic_order)
            sl = dyadic_refine(lo_c[:, t0:t1, :], dyadic_order)
            bd = _stripe_bottom_row_df(sh, sl, bd, naive)
        return bd[0][:, NN].astype(jnp.float64) \
            + bd[1][:, NN].astype(jnp.float64)

    chunk = max(_pair_chunk_blocked(min(Rb, MM), NN) // 2, SUBLANES)
    out = _chunk_map(one, (hi3, lo3), chunk)
    return out.reshape(batch_shape)


@functools.partial(jax.jit, static_argnames=("naive", "dyadic_order"))
def solve_final_f64(inc: jnp.ndarray, naive: bool = False,
                    dyadic_order: int = 0) -> jnp.ndarray:
    """Blocked solve for f64 increments: split once, run the DF stripes."""
    hi = inc.astype(jnp.float32)
    lo = (inc - hi.astype(jnp.float64)).astype(jnp.float32)
    return solve_final_df(hi, lo, naive=naive, dyadic_order=dyadic_order)


def _pair_chunk_blocked(MM_s: int, NN: int) -> int:
    """Pairs per launch: one stripe's sheared stream under the HBM budget
    (sublane-granular -- blocked problems are enormous per pair)."""
    n_steps = MM_s + NN - 1
    per_pair = ceil_to(n_steps, LANES) * ceil_to(MM_s + 1, LANES) * 4
    c = (CHUNK_BYTES // max(per_pair, 1)) // SUBLANES * SUBLANES
    return int(min(max(c, SUBLANES), 64))  # cap: pairs-on-sublanes layout


@functools.partial(jax.jit, static_argnames=("naive", "dyadic_order"))
def solve_final(inc: jnp.ndarray, naive: bool = False,
                dyadic_order: int = 0) -> jnp.ndarray:
    """Blocked forward solve: ``K[..., -1, -1]`` for refined grids whose
    *both* sides exceed the single-slab VMEM bound. f32.

    Stripes are refined lazily (one stripe's refined rows at a time), so the
    full refined increment grid never exists in memory either.
    """
    batch_shape = inc.shape[:-2]
    f = 2 ** dyadic_order
    Mb, Nb = inc.shape[-2], inc.shape[-1]
    MM, NN = Mb * f, Nb * f
    inc3 = inc.reshape((math.prod(batch_shape), Mb, Nb)).astype(jnp.float32)

    # stripe height: largest multiple of f with slab rows <= MAX_ROWS
    Rb = (MAX_ROWS - 1) // f * f
    n_stripes = -(-MM // Rb)

    def one(inc_c):
        B = inc_c.shape[0]
        bd = jnp.ones((B, NN + 1), jnp.float32)
        for s in range(n_stripes):
            lo = s * Rb // f
            hi = min(Mb, lo + Rb // f)
            stripe = dyadic_refine(inc_c[:, lo:hi, :], dyadic_order)
            bd = _stripe_bottom_row(stripe, bd, naive)
        return bd[:, NN]

    out = _chunk_map(one, inc3, _pair_chunk_blocked(min(Rb, MM), NN))
    return out.reshape(batch_shape)
