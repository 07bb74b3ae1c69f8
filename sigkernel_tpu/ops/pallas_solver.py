"""Pallas (Mosaic) TPU wavefront kernels for the Goursat PDE.

The native TPU tier, playing the role of the reference's hand-written CUDA
backend (reference sigkernel/cuda_backend.py:6-49,121-160) with the CUDA
block grid replaced by vector-unit vectorisation. One wavefront step updates
the entire anti-diagonal for all pairs of a tile as a single fused VPU op
over a 2-D slab; increments are pre-sheared to diagonal-major layout in XLA
(pad+reshape, no gathers) and streamed HBM -> VMEM with batched
double-buffered DMA; the two previous diagonals live in a ping-pong VMEM
scratch with compile-time slots.

Two slab layouts, chosen by batch size so neither axis wastes its hardware
padding:

- ``pairs-on-lanes`` (B >= 128): slab ``(L_rows, P_lanes)``; the dependency
  shift ``K[i-1, *]`` is a sublane roll.
- ``pairs-on-sublanes`` (B < 128): slab ``(P_sub, L_lanes)``; the shift is a
  lane roll. Without this, a 16-pair solve pads to 128 lanes and every HBM
  stream costs 8x its useful size.

The 1024-thread CUDA limit does not exist here: the diagonal length is
bounded only by VMEM (~8k rows at f32), and longer paths fall back to the
scan tier until the blocked kernel lands.

Padding is free: a zero increment makes the update an exact no-op
(``(1+1)*(1+0)-1 = 1``), so padded rows/lanes hold the boundary value 1
forever and never contaminate valid cells (junk flows strictly away from
the wavefront's dependency direction).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import scan_solver
from ..utils import ceil_to, dyadic_refine

LANES = 128
SUBLANES = 8
MAX_ROWS = 8192
# Diagonal steps per lane-window phase of the wavefront kernels (see
# _window_phases); 0 disables windowed compute.
import os as _os
WINDOW_SEG = int(_os.environ.get("SIG_WINDOW_SEG", "256"))
# batch threshold between the two slab layouts: up to 128 pairs ride the
# sublane axis -- a (128, L) slab keeps the whole fused-adjoint stack
# machinery (pairs-on-sublanes only) AND makes the aligned pairs-minor
# stream construction's per-row flat shift a full 512-byte vector row
PS_LAYOUT_MAX_B = 128


def supported(inc: jnp.ndarray) -> bool:
    """Gate for the auto dispatcher: TPU backend + f32 + fits in VMEM.

    Only the SHORTER grid side must fit: the recurrence is exactly
    transpose-covariant (``K(inc^T) = K(inc)^T`` -- k01/k10 enter as a sum),
    so long rectangular problems are solved transposed.
    """
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
    return min(MM, NN) + 1 <= MAX_ROWS


def _maybe_transpose(inc3: jnp.ndarray, refined_rows: int):
    """Solve with the shorter side as the diagonal axis (VMEM bound).

    ``refined_rows``: the post-refinement row count the kernel would see.
    """
    if refined_rows + 1 <= MAX_ROWS:
        return inc3, False
    return jnp.swapaxes(inc3, -1, -2), True


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

# Sheared streams carry step q at index q + IN_OFF: the aligned-pad shear
# (see _pad_shear) shifts the stream by the one top boundary row it inserts.
# Kernels add IN_OFF to every input-stream DMA index.
IN_OFF = 1


def _wavefront_kernel(inc_hbm, out_ref, state, ibuf, isem, carry,
                      *, n_steps, MM, row_axis, naive, grid_out,
                      out_offset=0, refine=1, NN=None, window_seg=0):
    """Single-program wavefront sweep over slabs of shape ``state.shape[1:]``.

    ``row_axis``: which slab axis carries the diagonal row index ``i``
    (1 for pairs-on-sublanes, 0 for pairs-on-lanes). The other axis carries
    pairs.

    ``inc_hbm``: sheared increments in HBM/ANY -- a *row-stretched base*
    stream (one slab per base diagonal, ``refine^2``x less data, offset 0)
    when ``refine > 1``, the plain refined stream (step ``q`` at ``q +
    IN_OFF``) otherwise. ``out_ref``: final slab-shaped VMEM output (row
    ``MM`` extracted by the caller), or an (>= n_steps + out_offset, *slab)
    HBM diagonal stack when ``grid_out``. ``state``: (2, *slab) VMEM
    ping-pong diagonals, statically indexed. ``ibuf``: (2, T, *slab) VMEM
    DMA landing slots. ``isem``: 4 DMA semaphores (2 in + 2 write-back).

    In-kernel dyadic refinement (``refine = f = 2^dyadic_order``, f even):
    the refined increment ``u_q[i] = inc_base[(i-1)//f, (q+1-i)//f] / f^2``
    lives on base anti-diagonal ``qb = (i-1)//f + (q+1-i)//f``, which for
    step ``q = f*k + s`` is ``k`` on lanes with ``(i-1) mod f <= s`` and
    ``k-1`` elsewhere. The XLA side delivers base diagonal ``k`` already
    row-stretched to the refined slab (``d_k[i'] = base[i'//f, k-i'//f]``,
    see ``_stretch_stream``), so one step is a compile-time parity select
    between the current and previous buffered diagonals plus a single roll
    (``u[i] = sel[i-1]``). The previous diagonal at a batch boundary comes
    from ``carry`` -- a copy of the batch's last slab taken at the end of
    each body. Reading the other DMA slot directly instead is a RACE: the
    next batch's prefetch into that slot is already in flight (interpret
    mode executes copies synchronously and cannot catch this). At ``k = 0``
    the carry is uninitialised, which is safe: junk only ever reaches lanes
    ahead of the wavefront, and every lane ``i`` is reset to the boundary
    value by the ``i == q+2`` mask at step ``q = i-2`` -- immediately
    before any valid cell consumes it (both its state slots are masked at
    steps ``i-2``/``i-3``).
    """
    T = DMA_BATCH
    f = refine
    slab = state.shape[1:]
    n_slots = pl.cdiv(n_steps, f) if f > 1 else n_steps
    n_batches = pl.cdiv(n_slots, T)
    in_off = IN_OFF if f == 1 else 0
    ii = lax.broadcasted_iota(jnp.int32, slab, row_axis)
    one = jnp.float32(1.0)

    # Lane-window phase plan (see _window_phases): compute only the active
    # sliding row window of each anti-diagonal. Pairs-on-sublanes only.
    spb = T * f if f > 1 else T
    phases = None
    if window_seg and row_axis == 1 and NN is not None:
        phases = _window_phases(n_batches, spb, n_steps, NN, slab[1],
                                window_seg)

    state[0] = jnp.ones(slab, jnp.float32)  # v_0 (and padding steady-state)
    state[1] = jnp.ones(slab, jnp.float32)  # v_1

    def in_copy(b, slot):
        return pltpu.make_async_copy(
            inc_hbm.at[pl.ds(_ix(b * T + in_off), T)],
            ibuf.at[_ix(slot)], isem.at[_ix(slot)])

    in_copy(0, 0).start()

    def step(q, u, vm2_s, vm1_s, sp, ws=None, W=None, iiw=None):
        """One refined wavefront step (sp = q % 2, compile-time)."""
        if ws is None:
            vm1 = state[vm1_s]
            p2 = state[vm2_s]
            ii_loc = ii
        else:
            vm1 = state[vm1_s, :, ws:ws + W]
            p2 = state[vm2_s, :, ws:ws + W]
            ii_loc = iiw
        k10 = vm1
        k01 = pltpu.roll(vm1, jnp.int32(1), axis=row_axis)
        k00 = pltpu.roll(p2, jnp.int32(1), axis=row_axis)
        v = _scheme(k00, k01, k10, u, naive)
        mask = (ii_loc == 0) | (ii_loc == q + 2) | (ii_loc > MM)
        v = jnp.where(mask, one, v)
        if ws is not None and ws > 0:
            # window-bottom margin: the roll wrapped the window's top lane
            # into lane ``ws``; keep the frozen (done) value instead
            v = jnp.where(ii_loc == ws, p2, v)

        if grid_out:
            # the write-back of step q-2 used this same state slot as
            # its source; it must complete before we overwrite it
            @pl.when(q >= 2)
            def _():
                pltpu.make_async_copy(
                    state.at[_ix(vm2_s)],
                    out_ref.at[_ix(q - 2 + out_offset)],
                    isem.at[_ix(2 + sp)]).wait()
        if ws is None:
            state[vm2_s] = v
        else:
            state[vm2_s, :, ws:ws + W] = v
        if grid_out:
            pltpu.make_async_copy(state.at[_ix(vm2_s)],
                                  out_ref.at[_ix(q + out_offset)],
                                  isem.at[_ix(2 + sp)]).start()

    def make_body(ws=None, W=None, iiw=None, guarded=True):
        def when_q(q):
            if guarded:
                return pl.when(q < n_steps)
            return lambda fn: fn()

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

        def body(b, _):
            bslot = lax.rem(b, jnp.int32(2))

            @pl.when(b + 1 < n_batches)
            def _():
                in_copy(b + 1, 1 - bslot).start()

            in_copy(b, bslot).wait()

            for t in range(T):  # static unroll; slots are compile-time
                if f == 1:
                    q = b * T + t

                    @when_q(q)
                    def _(q=q, t=t):
                        step(q, ld(bslot, t), t % 2, 1 - t % 2, t % 2,
                             ws, W, iiw)
                else:
                    k = b * T + t
                    for s in range(f):
                        q = k * f + s
                        sp = s % 2   # == q % 2 (f even)

                        @when_q(q)
                        def _(q=q, t=t, s=s, sp=sp):
                            prev = ldc() if t == 0 else ld(bslot, t - 1)
                            sel = lax.rem(ii_loc, jnp.int32(f)) <= s
                            pre = jnp.where(sel, ld(bslot, t), prev)
                            u = pltpu.roll(pre, jnp.int32(1), axis=row_axis)
                            step(q, u, sp, 1 - sp, sp, ws, W, iiw)
            if f > 1:
                carry[0] = ibuf[bslot, T - 1]
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
        pltpu.make_async_copy(state.at[_ix(last)],
                              out_ref.at[_ix(n_steps - 1 + out_offset)],
                              isem.at[_ix(2 + last)]).wait()
        @pl.when(n_steps >= 2)
        def _():
            pltpu.make_async_copy(state.at[_ix(1 - last)],
                                  out_ref.at[_ix(n_steps - 2 + out_offset)],
                                  isem.at[_ix(2 + (1 - last))]).wait()
    else:
        out_ref[...] = state[last]


# ---------------------------------------------------------------------------
# Layout + shearing
# ---------------------------------------------------------------------------

def _layout(B: int, MM: int):
    """Slab geometry for a (B, MM, NN) problem.

    Returns ``(row_axis, slab, b_pad)`` where ``slab`` is the 2-D slab shape
    and ``b_pad`` the padded pair count.
    """
    if B > PS_LAYOUT_MAX_B:
        L = ceil_to(MM + 1, SUBLANES)
        P = ceil_to(B, LANES)
        return 0, (L, P), P        # pairs on lanes
    L = ceil_to(MM + 1, LANES)
    P = ceil_to(B, SUBLANES)
    return 1, (P, L), P            # pairs on sublanes


def _window_phases(n_batches: int, spb: int, n_steps: int, NN: int, L: int,
                   seg_steps: int = 512, margin_top: int = 8,
                   align: int = LANES):
    """Static phase plan for lane-windowed wavefront compute.

    The active anti-diagonal occupies a contiguous, monotonically sliding
    row window of the slab: at step ``q`` only rows ``[q - NN, q + 2]`` can
    change (rows above the front hold the boundary 1 from init; rows past
    their last column continue constantly under zero increments -- the
    exact-no-op invariant -- so a frozen row equals its computed value
    bit-for-bit). Computing the full ``L``-lane slab every step therefore
    wastes ~half the VPU issue slots over a square sweep.

    Splits the batch loop into segments of ``seg_steps`` diagonal steps and
    assigns each a static lane window ``[ws, ws + W)`` (128-aligned) wide
    enough for every step in the segment, with margin for the roll
    neighbour and the ping-pong slot-equalisation lag. Returns a tuple of
    ``(b0, b1, ws, W)`` phases covering ``[0, n_batches)``, or ``None``
    when a single full-slab phase is all that fits (no saving).

    ``spb``: diagonal steps per loop batch; ``NN``: refined column count
    (rows finish after their ``NN``-th update); ``L``: slab lane count.
    """
    phases = []
    seg_b = max(1, seg_steps // spb)
    b = 0
    while b < n_batches:
        b1 = min(b + seg_b, n_batches)
        s0, s1 = b * spb, b1 * spb
        ws = max(0, s0 - NN - 8) // align * align
        top = min(ceil_to(min(s1 + margin_top, L), align), L)
        W = top - ws
        if phases and phases[-1][2:] == (ws, W):
            phases[-1] = (phases[-1][0], b1, ws, W)
        else:
            phases.append((b, b1, ws, W))
        b = b1
    if len(phases) == 1 and phases[0][2] == 0 and phases[0][3] == L:
        return None
    return tuple(phases)


def _pad_shear(inc: jnp.ndarray, dma_batch: int):
    """(B, MM, NN) -> sheared (W, *slab) stream + geometry, with step ``q``
    at stream index ``q + IN_OFF``.

    ``out[q + IN_OFF, ..row i.., ..pair b..] = inc[b, i-1, q-i+1]`` (zeros
    out of range; axis order per layout). One *aligned* pad realises both
    the slab geometry and the shear: padding each pair's grid to a
    lane-multiple row width ``W0`` and viewing the flat buffer with row
    stride ``W = W0 - 1`` shifts row ``i`` by ``i`` (the flat-stride shear),
    and because the top boundary row is part of the pad, the shift lands at
    ``i`` rather than ``i - 1`` -- hence the constant ``IN_OFF`` stream
    offset instead of a second (misaligned, ~10x slower) pad. The only
    full passes over stream-sized data are the aligned pad, the truncating
    reshape, and one XLA transpose (measured fast; the old odd-width pad
    dominated the entire solve).

    Zero-band proof: for ``t < i`` the flat view reads row ``i-1`` at
    column ``t - i + W0 >= W0 - (rows-1)``; for valid rows ``i <= MM`` this
    is ``>= NN + 2`` with ``W0 >= n_steps + 2``, i.e. inside the zero pad,
    so cells ahead of the wavefront always see zero increments (rows beyond
    ``MM`` are masked by the kernels). Junk slabs past ``n_steps`` are
    DMA'd but guarded off.
    """
    B, MM, NN = inc.shape
    n_steps = MM + NN - 1
    row_axis, slab, b_pad = _layout(B, MM)
    rows_dim = slab[0] if row_axis == 0 else slab[1]
    pairs_dim = slab[1] if row_axis == 0 else slab[0]
    # W must cover the last DMA batch: IN_OFF + ceil(n_steps/T)*T <= W
    W0 = ceil_to(n_steps + IN_OFF + dma_batch, LANES)
    W = W0 - 1
    # x0[p, i, c] = inc[p, i-1, c]; aligned minor width W0
    x0 = jnp.pad(inc, ((0, pairs_dim - B), (1, rows_dim - (MM + 1)),
                       (0, W0 - NN)))
    flat = x0.reshape(pairs_dim, rows_dim * W0)[:, : rows_dim * W]
    S = flat.reshape(pairs_dim, rows_dim, W)   # S[p, i, t] = x0[p, i, t-i]
    if row_axis == 0:  # -> (W, L_rows, P_lanes)
        sk = jnp.transpose(S, (2, 1, 0))
    else:              # -> (W, P_sub, L_lanes)
        sk = jnp.transpose(S, (2, 0, 1))
    return sk, n_steps, row_axis, slab


# ---------------------------------------------------------------------------
# Aligned (pairs-minor) stream construction
#
# The legacy builders above shear with the pair axis MAJOR: the truncating
# flat-stride reshape then shifts each row's flat offset by ONE ELEMENT
# (4 bytes), and XLA lowers that to an element shuffle -- measured 51 GB/s
# against 689 GB/s for a plain copy (scripts/stream_probe.py, round 3; this
# single pass dominated the whole benchmark step). With the PAIR axis minor
# the same trick shifts rows by P*4 bytes -- a whole vector row once
# P*4 >= 256 -- and the reshape becomes an aligned block copy (measured
# 358 GB/s at P=128). The final transpose back into the kernel's
# (W, P, L) slab order is a minor-dim swap, which the TPU does near copy
# speed (~740 GB/s measured).
# ---------------------------------------------------------------------------

# minimum pair-minor byte width for the aligned path to win: 512B (one
# full f32 vector row) runs at ~358 GB/s; 256B was measured still
# shuffle-bound (stream_probe.py round-3 runs C vs H1)
ALIGNED_MIN_PAIR_BYTES = 512


def _aligned_streams_ps(planes, f: int, dma_batch: int, slab,
                        stretch: bool = True):
    """Aligned pairs-minor stream construction for pairs-on-sublanes slabs.

    ``planes``: list of (B, Mb, Nb) base increment grids (all identical
    shape; e.g. the df64 hi/lo pair), already scaled for refinement.
    Returns a list of ``(W, P, L)`` streams matching the legacy
    ``_stretch_stream`` (``f > 1``: entry k = stretched base diagonal k,
    offset 0) / ``_pad_shear`` (``f == 1``: step q at q + IN_OFF) layout.

    Chain: one transpose to pairs-minor (minor swap, fast), pad, ALIGNED
    flat-stride shear, interleaved row-repeat on the major axis, and a
    final minor-swap transpose into slab order.

    ``stretch=False`` (f > 1 only): skip the row-repeat -- streams stay at
    BASE lane width ``(W, P, ceil(L/f))``, f x less stream HBM and two
    passes run on f x less data; the kernel dilates lanes on load
    (``jnp.repeat(_, f, axis=1)``, a cheap Mosaic interleave).
    """
    B, Mb, Nb = planes[0].shape
    P_dim, L = slab                        # pairs-on-sublanes slab
    R_rows = -(-L // f)
    if f > 1:
        V = Mb + Nb
        W0 = ceil_to(max(V + dma_batch + 1, Nb + R_rows + 1), LANES)
        lead = 0                           # kernel roll supplies the i-1
    else:
        n_steps = Mb + Nb - 1
        W0 = ceil_to(n_steps + IN_OFF + dma_batch, LANES)
        lead = 1                           # top boundary row inside the pad
    W = W0 - 1
    R_tot = L if f == 1 else R_rows
    outs = []
    for x in planes:
        xT = jnp.transpose(x, (1, 2, 0))   # (Mb, Nb, B): minor swap, fast
        xp = jnp.pad(xT, ((lead, R_tot - Mb - lead),
                          (0, W0 - Nb), (0, P_dim - B)))
        # truncating flat-stride reshape: row r of the view starts one
        # pair-row (P_dim*4 bytes -- aligned) later each row, realising the
        # shear; the last view row stays in bounds (R_tot*W < R_tot*W0)
        S = xp.reshape(R_tot * W0, P_dim)[: R_tot * W]
        S = S.reshape(R_tot, W, P_dim)
        if f > 1 and stretch:
            S = jnp.repeat(S, f, axis=0)[:L]   # refined rows (major axis)
        outs.append(jnp.transpose(S, (1, 2, 0)))   # (W, P, L | R_rows)
    return outs


def _use_aligned(B: int, slab, row_axis: int, itemsize: int = 4) -> bool:
    """Aligned path gate: pairs-on-sublanes slabs with a wide-enough pair
    minor (the construction pads pairs to the slab's sublane count)."""
    if row_axis != 1:
        return False
    return slab[0] * itemsize >= ALIGNED_MIN_PAIR_BYTES


# HBM budget for one chunk's sheared increment stream (per f32 plane)
# sheared-stream budget per kernel launch. XLA materialises ~3 copies of
# the stream (pad, reshape, transpose), so keep budget*3 well under HBM;
# 4.5 GB keeps the benchmark config (64 f64 pairs at 2046^2, 2 planes,
# ~67 MB/pair) in a single launch, which measured ~12 GB peak HBM.
CHUNK_BYTES = 19 << 29


def pair_chunk(MM: int, NN: int, planes: int = 1) -> int:
    """Pairs per kernel launch, keeping the sheared stream under budget.

    Chunks of >= LANES pairs round to LANES granularity (pairs-on-lanes
    layout); smaller budgets round to SUBLANES (pairs-on-sublanes layout).
    Flooring UP to LANES here would blow the budget ~8x at big grids and
    OOM HBM on the XLA-side stream copies.
    """
    n_steps = MM + NN - 1
    L = ceil_to(MM + 1, SUBLANES)
    per_pair = n_steps * L * 4 * planes
    c = CHUNK_BYTES // max(per_pair, 1)
    if c >= LANES:
        return int(min(c // LANES * LANES, 4096))
    return int(max(c // SUBLANES * SUBLANES, SUBLANES))


def _chunk_map(fn, args, chunk: int):
    """Apply ``fn`` over pair chunks of a pytree of arrays sharing their
    leading (pair) dimension; zero-pads the tail chunk (exact no-ops).
    ``fn`` may return a pytree of arrays (all chunk-leading)."""
    leaves = jax.tree_util.tree_leaves(args)
    B = leaves[0].shape[0]
    if B <= chunk:
        return fn(args)
    Bp = ceil_to(B, chunk)
    args = jax.tree_util.tree_map(
        lambda a: jnp.pad(a, [(0, Bp - B)] + [(0, 0)] * (a.ndim - 1)), args)
    args = jax.tree_util.tree_map(
        lambda a: a.reshape(Bp // chunk, chunk, *a.shape[1:]), args)
    out = jax.lax.map(fn, args)
    return jax.tree_util.tree_map(
        lambda o: o.reshape((Bp,) + o.shape[2:])[:B], out)


# ---------------------------------------------------------------------------
# XLA wrappers
# ---------------------------------------------------------------------------

def _extract_final(out, row_axis, MM, B):
    """Final-output slab -> (B,) vector of K[MM, NN] values."""
    if row_axis == 0:
        return out[MM, :B]
    return out[:B, MM]


def _stack_to_grid(stack, row_axis, MM, NN, B, boundary=1.0, pre=0):
    """Diagonal stack ``(Tp, *slab)`` -> solution grids ``(B, MM+1, NN+1)``.

    ``pre``: stack position of diagonal ``q`` is ``q + pre``. With
    ``pre=2`` (kernels write with ``out_offset=2``) the inverse shear is
    pure flat-stride arithmetic -- ``K[b, i, j] = stack[i + j]`` at row
    ``i`` -- needing only a cheap *tail* pad before the re-view. ``pre=0``
    keeps the legacy path whose 2-element *leading* pad shifts the whole
    (GB-scale) buffer by an unaligned offset (~10x slower on TPU; only the
    adjoint_dd fallback still uses it).
    """
    Tp = stack.shape[0]
    if row_axis == 0:   # (Tp, L, P) -> (P, L, Tp)
        D = jnp.transpose(stack, (2, 1, 0))
    else:               # (Tp, P, L) -> (P, L, Tp)
        D = jnp.transpose(stack, (1, 2, 0))
    P_dim, L_dim, _ = D.shape
    if pre == 2:
        # entry q at q+2: K[i, j] = D[i, i+j]; view row width Tp+1 realises
        # the +i shift, one tail pad supplies the extra row slack
        flat = D.reshape(P_dim, L_dim * Tp)
        flat = jnp.pad(flat, ((0, 0), (0, L_dim)))
        K = flat.reshape(P_dim, L_dim, Tp + 1)[:, :MM + 1, :NN + 1]
        i = jnp.arange(MM + 1)[:, None]
        j = jnp.arange(NN + 1)[None, :]
        K = jnp.where((i == 0) | (j == 0),
                      jnp.asarray(boundary, K.dtype), K)
        return K[:B]
    assert pre == 0, "only pre in (0, 2) is implemented"
    W = Tp + 1
    flat = D.reshape(P_dim, L_dim * Tp)
    flat = jnp.pad(flat, ((0, 0), (2, L_dim * W - L_dim * Tp - 2)))
    Wk = min(ceil_to(NN + 1, LANES), W)
    K = flat.reshape(P_dim, L_dim, W)[:, :MM + 1, :Wk]
    i = jnp.arange(MM + 1)[:, None]
    j = jnp.arange(Wk)[None, :]
    K = jnp.where((i == 0) | (j == 0),
                  jnp.asarray(boundary, K.dtype), K)
    return K[:B, :, :NN + 1]


def _stretch_stream(base3: jnp.ndarray, f: int, dma_batch: int,
                    row_axis: int, slab):
    """Row-stretched base-diagonal stream for in-kernel refinement.

    ``base3``: (B, Mb, Nb) base increments ALREADY scaled by ``1/f^2``.
    Returns a ``(W, *slab)`` stream whose entry ``k`` (offset 0) holds base
    anti-diagonal ``k`` stretched to the refined row axis:
    ``d_k[.. i' ..] = base[i'//f, k - i'//f]`` (zero out of range). Built
    as flat-stride shear at base resolution + row ``repeat`` + one aligned
    transpose -- all passes touch only base-sized (f^2-smaller) data.
    """
    B, Mb, Nb = base3.shape
    L = slab[row_axis]
    P_dim = slab[1 - row_axis]
    R_rows = -(-L // f)                  # f * R_rows >= L
    V = Mb + Nb                          # diag slots incl. 1 virtual
    W0 = ceil_to(max(V + dma_batch + 1, Nb + R_rows + 1), LANES)
    W = W0 - 1
    # x0[p, a, c] = base[p, a, c] (no row shift; the kernel's roll-by-1
    # realises the i -> i-1 increment indexing)
    x0 = jnp.pad(base3, ((0, P_dim - B), (0, R_rows - Mb), (0, W0 - Nb)))
    flat = x0.reshape(P_dim, R_rows * W0)[:, : R_rows * W]
    Sb = flat.reshape(P_dim, R_rows, W)  # Sb[p, a, t] = base[p, a, t-a]
    # transpose BEFORE the f-fold row repeat: the transpose then moves
    # base-sized data and the repeat writes the stretched stream once
    if row_axis == 0:
        R = jnp.transpose(Sb, (2, 1, 0))     # (W, R_rows, P)
        return jnp.repeat(R, f, axis=1)[:, :L, :]
    R = jnp.transpose(Sb, (2, 0, 1))         # (W, P, R_rows)
    return jnp.repeat(R, f, axis=2)[:, :, :L]


def _base_stream(base3: jnp.ndarray, dma_batch: int, P_dim: int, Lb: int,
                 f: int = 2):
    """Base-diagonal stream for the PLANE-SPLIT kernels (pairs-on-sublanes).

    ``base3``: (B, Mb, Nb) base increments, already scaled. Returns a
    ``(W, P, Lb)`` stream whose entry ``k`` (offset 0) holds base
    anti-diagonal ``k`` at base row lanes: ``d_k[a] = base[a, k - a]``
    (zero out of range) -- the un-stretched version of
    :func:`_stretch_stream` (the plane kernels never dilate; Mosaic cannot
    lower any lane-dilation shuffle, see scripts/dilate_probe.py). Uses
    the aligned pairs-minor construction when the pair minor is wide
    enough, else the base flat-stride shear (base-sized data either way).
    """
    B, Mb, Nb = base3.shape
    if _use_aligned(B, (P_dim, f * Lb), 1):
        # the builder's f only sets its base row count R_rows = lanes / f
        (sk,) = _aligned_streams_ps([base3], f, dma_batch, (P_dim, f * Lb),
                                    stretch=False)
        return sk
    V = Mb + Nb
    W0 = ceil_to(max(V + dma_batch + 1, Nb + Lb + 1), LANES)
    W = W0 - 1
    x0 = jnp.pad(base3, ((0, P_dim - B), (0, Lb - Mb), (0, W0 - Nb)))
    flat = x0.reshape(P_dim, Lb * W0)[:, : Lb * W]
    Sb = flat.reshape(P_dim, Lb, W)      # Sb[p, a, t] = base[p, a, t - a]
    return jnp.transpose(Sb, (2, 0, 1))  # (W, P, Lb)


def _stream_geometry(inc3: jnp.ndarray, dyadic_order: int, dma_batch: int):
    """Stream + slab geometry for a solve at ``dyadic_order``.

    Returns ``(sk, n_steps, row_axis, slab, f)``: with ``f > 1`` the stream
    is the row-stretched base stream (offset 0, ``f^2``x smaller); with
    ``f == 1`` the plain refined stream (step ``q`` at ``q+IN_OFF``).
    (A base-lane-width stream variant with in-kernel lane dilation was
    probed and killed in round 3: no dilation spelling lowers on Mosaic --
    scripts/dilate_probe.py.)
    """
    f = 2 ** dyadic_order
    B, Mb, Nb = inc3.shape
    if f == 1:
        row_axis, slab, _ = _layout(B, Mb)
        if _use_aligned(B, slab, row_axis):
            (sk,) = _aligned_streams_ps([inc3.astype(jnp.float32)], 1,
                                        dma_batch, slab)
            return sk, Mb + Nb - 1, row_axis, slab, 1
        sk, n_steps, row_axis, slab = _pad_shear(inc3, dma_batch)
        return sk, n_steps, row_axis, slab, f
    MM, NN = Mb * f, Nb * f
    row_axis, slab, _ = _layout(B, MM)
    base = inc3.astype(jnp.float32) * jnp.float32(1.0 / (f * f))  # exact
    if _use_aligned(B, slab, row_axis):
        (sk,) = _aligned_streams_ps([base], f, dma_batch, slab)
        return sk, MM + NN - 1, row_axis, slab, f
    sk = _stretch_stream(base, f, dma_batch, row_axis, slab)
    return sk, MM + NN - 1, row_axis, slab, f


def _solve_final_one(inc3: jnp.ndarray, naive: bool,
                     dyadic_order: int = 0) -> jnp.ndarray:
    B = inc3.shape[0]
    sk, n_steps, row_axis, slab, f = _stream_geometry(
        inc3, dyadic_order, DMA_BATCH)
    MM = inc3.shape[-2] * f
    kernel = functools.partial(_wavefront_kernel, n_steps=n_steps, MM=MM,
                               row_axis=row_axis, naive=naive,
                               grid_out=False, refine=f,
                               NN=inc3.shape[-1] * f, window_seg=WINDOW_SEG)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(slab, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2,) + slab, jnp.float32),
            pltpu.VMEM((2, DMA_BATCH) + slab, jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.VMEM((1,) + slab, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(sk)
    return _extract_final(out, row_axis, MM, B)


def _solve_grid_one(inc3: jnp.ndarray, naive: bool,
                    dyadic_order: int = 0) -> jnp.ndarray:
    B = inc3.shape[0]
    sk, n_steps, row_axis, slab, f = _stream_geometry(
        inc3, dyadic_order, DMA_BATCH)
    MM, NN = inc3.shape[-2] * f, inc3.shape[-1] * f
    # aligned output extent (the fast unshear transposes it to minor), with
    # entry q written at q + 2 so the unshear needs no leading shift
    Tp = ceil_to(n_steps + 2, LANES)
    kernel = functools.partial(_wavefront_kernel, n_steps=n_steps, MM=MM,
                               row_axis=row_axis, naive=naive, grid_out=True,
                               out_offset=2, refine=f)
    diags = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Tp,) + slab, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2,) + slab, jnp.float32),
            pltpu.VMEM((2, DMA_BATCH) + slab, jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.VMEM((1,) + slab, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(sk)
    return _stack_to_grid(diags, row_axis, MM, NN, B, pre=2)


@functools.partial(jax.jit, static_argnames=("naive", "dyadic_order"))
def solve_final(inc: jnp.ndarray, naive: bool = False,
                dyadic_order: int = 0) -> jnp.ndarray:
    """Pallas forward solve returning ``K[..., -1, -1]``. ``inc`` is the
    base increment grid; refinement happens per pair-chunk in f32."""
    batch_shape = inc.shape[:-2]
    f = 2 ** dyadic_order
    MM, NN = inc.shape[-2] * f, inc.shape[-1] * f
    inc3 = inc.reshape((-1,) + inc.shape[-2:]).astype(jnp.float32)
    inc3, t = _maybe_transpose(inc3, MM)  # final corner transpose-invariant
    if t:
        MM, NN = NN, MM
    out = _chunk_map(lambda c: _solve_final_one(c, naive=naive,
                                                dyadic_order=dyadic_order),
                     inc3, pair_chunk(MM, NN))
    return out.reshape(batch_shape)


@functools.partial(jax.jit, static_argnames=("naive", "dyadic_order"))
def solve_grid(inc: jnp.ndarray, naive: bool = False,
               dyadic_order: int = 0) -> jnp.ndarray:
    """Pallas solve returning the full refined ``(..., MM+1, NN+1)`` grid
    (used by the adjoint backward); diagonals are streamed to HBM and
    unsheared in XLA."""
    batch_shape = inc.shape[:-2]
    f = 2 ** dyadic_order
    MM, NN = inc.shape[-2] * f, inc.shape[-1] * f
    inc3 = inc.reshape((-1,) + inc.shape[-2:]).astype(jnp.float32)
    inc3, transposed = _maybe_transpose(inc3, MM)
    MMs, NNs = (NN, MM) if transposed else (MM, NN)
    grid = _chunk_map(lambda c: _solve_grid_one(c, naive=naive,
                                                dyadic_order=dyadic_order),
                      inc3, pair_chunk(MMs, NNs))
    if transposed:
        grid = jnp.swapaxes(grid, -1, -2)  # K(inc^T)^T == K(inc), exactly
    return grid.reshape(batch_shape + (MM + 1, NN + 1))


# ---------------------------------------------------------------------------
# Plane-split f32 wavefront (see pallas_df64._wavefront_df_planes_kernel
# for the representation; this is its single-precision sibling)
# ---------------------------------------------------------------------------

def _wavefront_f32_planes_kernel(inc_hbm, out_ref, stk_ref, state, ibuf,
                                 isem, carry, *, n_steps, MM, NN, naive,
                                 refine, hi_stack=False, out_offset=0,
                                 window_seg=0):
    """Plane-split f32 wavefront (refine = f >= 2): base-width stream
    (entry k = base diag k, offset 0, pre-scaled 1/f^2), state planes
    ``(2, f, P, Lb)``, optional solution stack ``(Tp, f, P, Lb)`` (entry q
    at q + out_offset) for the plane-split adjoint. Bit-identical values
    to the stretched kernel."""
    T = DMA_BATCH
    f = refine
    n_slots = pl.cdiv(n_steps, f)
    n_batches = pl.cdiv(n_slots, T)
    P, Lb = state.shape[2], state.shape[3]
    iib = lax.broadcasted_iota(jnp.int32, (P, Lb), 1)
    one = jnp.float32(1.0)

    spb = T * f
    phases = None
    if window_seg:
        phases = _window_phases(n_batches, spb, n_steps, NN, f * Lb,
                                window_seg, align=f * LANES)

    for p in range(f):
        state[0, p] = jnp.ones((P, Lb), jnp.float32)
        state[1, p] = jnp.ones((P, Lb), jnp.float32)

    def in_copy(b, slot):
        return pltpu.make_async_copy(inc_hbm.at[pl.ds(_ix(b * T), T)],
                                     ibuf.at[_ix(slot)], isem.at[_ix(slot)])

    in_copy(0, 0).start()

    def step(q, k, s, sp, cur, prev, wsb=None, Wb=None, iibw=None):
        vm2, vm1 = sp, 1 - sp
        iiw = iib if wsb is None else iibw

        def st(slot, p):
            if wsb is None:
                return state[slot, p]
            return state[slot, p, :, wsb:wsb + Wb]

        k10 = [st(vm1, p) for p in range(f)]
        p2 = [st(vm2, p) for p in range(f)]
        roll1 = lambda x: pltpu.roll(x, jnp.int32(1), axis=1)
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
                    state.at[_ix(vm2)],
                    stk_ref.at[_ix(q - 2 + out_offset)],
                    isem.at[_ix(2 + sp)]).wait()
        for p in range(f):
            if wsb is None:
                state[vm2, p] = vs[p]
            else:
                state[vm2, p, :, wsb:wsb + Wb] = vs[p]
        if hi_stack:
            pltpu.make_async_copy(state.at[_ix(vm2)],
                                  stk_ref.at[_ix(q + out_offset)],
                                  isem.at[_ix(2 + sp)]).start()

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
                in_copy(b + 1, 1 - bslot).start()

            in_copy(b, bslot).wait()

            for t in range(T):
                k = b * T + t
                for s in range(f):
                    q = k * f + s
                    sp = s % 2           # == q % 2 (f even)

                    @when_q(q)
                    def _(k=k, t=t, s=s, sp=sp, q=q):
                        cur = sl_in(ibuf[bslot, t])
                        prev = (sl_in(carry[0]) if t == 0
                                else sl_in(ibuf[bslot, t - 1]))
                        step(q, k, s, sp, cur, prev, wsb, Wb, iibw)
            carry[0] = ibuf[bslot, T - 1]
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
        pltpu.make_async_copy(state.at[_ix(last)],
                              stk_ref.at[_ix(n_steps - 1 + out_offset)],
                              isem.at[_ix(2 + last)]).wait()
        @pl.when(n_steps >= 2)
        def _():
            pltpu.make_async_copy(
                state.at[_ix(1 - last)],
                stk_ref.at[_ix(n_steps - 2 + out_offset)],
                isem.at[_ix(2 + (1 - last))]).wait()
    for p in range(f):
        out_ref[p] = state[last, p]


def _solve_final_one_f32_pl(inc3: jnp.ndarray, naive: bool,
                            dyadic_order: int, stack_pad=None,
                            window_seg=None):
    """Plane-split f32 final-corner solve; with ``stack_pad`` also returns
    the solution stack in PLANE layout for the plane-split adjoint."""
    B, Mb, Nb = inc3.shape
    f = 2 ** dyadic_order
    MM, NN = Mb * f, Nb * f
    n_steps = MM + NN - 1
    row_axis, slab, _ = _layout(B, MM)
    assert row_axis == 1, "plane-split kernel is pairs-on-sublanes only"
    P = slab[0]
    Lb = ceil_to(Mb + 1, LANES)
    base = inc3.astype(jnp.float32) * jnp.float32(1.0 / (f * f))
    sk = _base_stream(base, DMA_BATCH, P, Lb, f)

    hi_stack = stack_pad is not None
    if hi_stack:
        Tp = ceil_to(n_steps + 2, LANES) + stack_pad
        stk_shape = (Tp, f, P, Lb)
    else:
        stk_shape = (1, 1, 8, LANES)
    kernel = functools.partial(
        _wavefront_f32_planes_kernel, n_steps=n_steps, MM=MM, NN=NN,
        naive=naive, refine=f, hi_stack=hi_stack,
        out_offset=stack_pad if hi_stack else 0,
        window_seg=WINDOW_SEG if window_seg is None else window_seg)
    out, stk = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((f, P, Lb), jnp.float32),
                   jax.ShapeDtypeStruct(stk_shape, jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((2, f, P, Lb), jnp.float32),
            pltpu.VMEM((2, DMA_BATCH, P, Lb), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.VMEM((1, P, Lb), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(sk)
    val = out[MM % f, :B, MM // f]
    return (val, stk) if hi_stack else val


# ---------------------------------------------------------------------------
# Sheared-space adjoint: dd cotangent straight from the diagonal stacks
# ---------------------------------------------------------------------------

def _solve_stack_one(inc3: jnp.ndarray, naive: bool,
                     dyadic_order: int = 0, out_pad: int = 0):
    """Like :func:`_solve_grid_one` but returns the raw diagonal stack
    ``(Tp, *slab)`` (plus geometry) without unshearing.

    ``out_pad``: leading never-written entries in the output stack (the
    fused adjoint's descending window loads need headroom; entry ``q``
    lands at stack position ``q + out_pad``)."""
    B = inc3.shape[0]
    sk, n_steps, row_axis, slab, f = _stream_geometry(
        inc3, dyadic_order, DMA_BATCH)
    MM = inc3.shape[-2] * f
    Tp = ceil_to(n_steps + 2, LANES)
    kernel = functools.partial(_wavefront_kernel, n_steps=n_steps, MM=MM,
                               row_axis=row_axis, naive=naive, grid_out=True,
                               out_offset=out_pad, refine=f)
    stack = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Tp + out_pad,) + slab, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2,) + slab, jnp.float32),
            pltpu.VMEM((2, DMA_BATCH) + slab, jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.VMEM((1,) + slab, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(sk)
    return stack


def adjoint_dd(inc3: jnp.ndarray, g: jnp.ndarray, naive: bool,
               dyadic_order: int = 0) -> jnp.ndarray:
    """Refined-increment cotangent without materialising solution grids.

    Computes ``dd_cot[a, b] = g * K[a, b] * K_rev[MM-1-a, NN-1-b]`` entirely
    in sheared (diagonal-stack) space: the forward and reversed stacks are
    aligned by full-axis flips and rolls (junk regions never read), boundary
    diagonals are patched with ones, and one inverse shear recovers the
    refined cotangent grid. Replaces two grid unshears + two grid buffers.

    ``inc3``: base increments ``(B, M-1, N-1)`` (any float dtype; compute is
    f32). ``g``: ``(B,)`` output cotangent. Returns refined f32 cotangent
    ``(B, MM, NN)``.
    """
    inc32 = inc3.astype(jnp.float32)
    f = 2 ** dyadic_order
    MM = inc3.shape[-2] * f
    NN = inc3.shape[-1] * f
    if MM + 1 > MAX_ROWS:  # transpose covariance: dd_cot(inc^T)^T == dd_cot
        if NN + 1 > MAX_ROWS:
            raise ValueError(
                "adjoint_dd: both refined sides exceed the VMEM row bound "
                f"({MAX_ROWS}); the caller must take the grid-route backward")
        out = adjoint_dd(jnp.swapaxes(inc3, -1, -2), g, naive, dyadic_order)
        return jnp.swapaxes(out, -1, -2)
    T = MM + NN - 1

    chunk = pair_chunk(MM, NN)
    B = inc32.shape[0]

    def one(args):
        inc_c, g_c = args
        Bc = inc_c.shape[0]
        row_axis, slab, _ = _layout(Bc, MM)
        S_f = _solve_stack_one(inc_c, naive, dyadic_order)        # (Tp,*slab)
        S_r = _solve_stack_one(
            jnp.flip(jnp.flip(inc_c, -1), -2), naive, dyadic_order)
        Tp = S_f.shape[0]
        r_ax = 1 + row_axis  # stack axis carrying rows (pairs on the other)
        L_rows = S_f.shape[r_ax]

        # A1[q, i] = K[i-1, q-i+1] = S_f[q-2, i-1]; q<2 are boundary ones
        A1 = jnp.roll(S_f, 2, axis=0)
        A1 = jnp.roll(A1, 1, axis=r_ax)
        qs = jnp.arange(Tp).reshape((Tp, 1, 1))
        A1 = jnp.where(qs < 2, jnp.float32(1.0), A1)

        # A2[q, i] = K_rev[MM-i, NN-q+i-2] = S_r[T-3-q, MM-i];
        # q in {T-2, T-1} hit K_rev's boundary (ones)
        A2 = jnp.flip(S_r, axis=0)
        A2 = jnp.roll(A2, -(Tp - T + 2), axis=0)     # step T-3-q at q
        A2 = jnp.flip(A2, axis=r_ax)
        A2 = jnp.roll(A2, -(L_rows - (MM + 1)), axis=r_ax)  # row MM-i at i
        A2 = jnp.where((qs >= T - 2) & (qs < T), jnp.float32(1.0), A2)

        gb = g_c.astype(jnp.float32)
        pair_ax = 3 - r_ax  # the other slab axis
        shape = [1, 1, 1]
        shape[pair_ax] = Bc
        gb = gb.reshape(shape)
        pad = [(0, 0), (0, 0), (0, 0)]
        pad[pair_ax] = (0, S_f.shape[pair_ax] - Bc)
        gb = jnp.pad(gb, pad)    # zero for padded pairs; broadcasts on rows
        P = A1 * A2 * gb

        # dd_cot[a, b] = P[a+b, a+1]: the K-grid unshear shifted by one
        grid = _stack_to_grid(P, row_axis, MM, NN, Bc)
        return grid[:, 1:, 1:]

    return _chunk_map(one, (inc32, g.astype(jnp.float32)), chunk)
