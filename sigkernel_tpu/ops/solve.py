"""Differentiable Goursat solve with an adjoint (second PDE sweep) backward.

The reference implements gradients by solving the *same* PDE on the reversed
increment grid and forming ``KK = K[..., :-1, :-1] * K_rev[..., 1:, 1:]``
(variation of parameters; reference sigkernel/sigkernel.py:256-343, 419-502),
never differentiating through the solver loop. We package exactly that trick
as a ``jax.custom_vjp`` on the map ``increments -> K[..., -1, -1]``:

    d(final) / d(inc[a, b]) = K[a, b] * K_rev_flipped[a + 1, b + 1]

Everything upstream of the increments (static kernel Gram, double difference)
is plain JAX, so the chain rule through the static kernel is handled
*analytically* by JAX AD -- replacing the reference's ``h = 1e-9``
finite-difference bump (reference sigkernel.py:314,473) with the exact
derivative.

Dyadic refinement happens *inside* the solver tiers (``dyadic_order`` is an
argument of :func:`solve`): refinement is a repeat + exact power-of-two
scale, so each tier performs it in its cheapest dtype -- the double-double
tier splits the base grid to f32 hi/lo first and refines the components,
avoiding 4x of emulated-f64 data movement. The backward collapses the
refined adjoint back to the base grid (the VJP of the refinement).

Gradient precision (``grad_solver``): a user who handed us float64 inputs
made a precision decision, so ``"auto"`` honours it on the backward too --
f64-grade increments get f64-grade adjoint sweeps (double-double grid
sweeps + f64 VJP chain, ~3x backward cost). ``"f32"`` is the explicit
opt-down to the fast f32 adjoint: measured on hardware at the benchmark
size (len 1024, dyadic 1) it is ~2e-2 max-relative vs the exact f64
adjoint -- the error is NOT the adjoint sweep itself but f32 cancellation
in the double-difference VJP downstream (the discrete Laplacian of the
smooth ``KK`` product loses ~(grid/lambda)^2 digits). This matches the
gradient grade of the reference's f32 CUDA backward at equal sizes (its
CPU path avoids it only by being f64 end-to-end). ``"df64"`` forces the
full-precision route even where ``auto`` would not pick it.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import scan_solver
from . import pallas_solver
from . import pallas_df64
from . import pallas_blocked
from ..utils import dyadic_refine


_SOLVERS = ("scan", "pallas", "auto")


def _refined(inc, dyadic_order):
    """Shape probe helper for dispatch decisions (no computation)."""
    f = 2 ** dyadic_order
    MM, NN = inc.shape[-2] * f, inc.shape[-1] * f
    return jax.ShapeDtypeStruct(inc.shape[:-2] + (MM, NN), inc.dtype)


def _resolve(solver: str, inc, dyadic_order: int) -> str:
    """Pick the concrete tier: ``pallas`` = f32 Mosaic kernel, ``pallas_df64``
    = double-double Mosaic kernel (f64-grade precision on the f32 VPU),
    ``scan`` = pure-XLA fallback (any platform/dtype)."""
    if solver not in _SOLVERS:
        raise ValueError(f"unknown solver {solver!r}; expected one of {_SOLVERS}")
    probe = _refined(inc, dyadic_order)
    if solver in ("auto", "pallas"):
        if pallas_solver.supported(probe):
            return "pallas"
        if pallas_df64.supported(probe):
            return "pallas_df64"
        if pallas_blocked.supported(probe):
            return "pallas_blocked"
        if solver == "pallas":
            raise ValueError(
                "solver='pallas' requires a TPU backend and float32/float64 "
                f"increments; got dtype={inc.dtype}, "
                f"refined shape={probe.shape}")
        return "scan"
    return solver


def _solve_final(inc, naive, solver, dyadic_order):
    s = _resolve(solver, inc, dyadic_order)
    if s == "pallas":
        import math

        B = math.prod(inc.shape[:-2])
        if PLANES and pallas_df64.planes_ok(min(B, 128), inc.shape[-2],
                                            inc.shape[-1], dyadic_order):
            from .pallas_solver import (_chunk_map, _solve_final_one_f32_pl,
                                        pair_chunk)

            f = 2 ** dyadic_order
            MM, NN = inc.shape[-2] * f, inc.shape[-1] * f
            inc3 = inc.reshape((B,) + inc.shape[-2:]).astype(jnp.float32)
            out = _chunk_map(
                lambda c: _solve_final_one_f32_pl(c, naive, dyadic_order),
                inc3, min(pair_chunk(MM, NN), 128))
            return out.reshape(inc.shape[:-2])
        return pallas_solver.solve_final(inc, naive=naive,
                                         dyadic_order=dyadic_order)
    if s == "pallas_df64":
        return pallas_df64.solve_final(inc, naive=naive,
                                       dyadic_order=dyadic_order)
    if s == "pallas_blocked":
        if inc.dtype == jnp.float64:
            return pallas_blocked.solve_final_f64(inc, naive=naive,
                                                  dyadic_order=dyadic_order)
        return pallas_blocked.solve_final(inc, naive=naive,
                                          dyadic_order=dyadic_order)
    return scan_solver.solve_final(dyadic_refine(inc, dyadic_order),
                                   naive=naive)


def _solve_grid(inc, naive, solver, dyadic_order):
    """Full refined-resolution solution grid (backward pass work-horse)."""
    s = _resolve(solver, inc, dyadic_order)
    if s == "pallas":
        return pallas_solver.solve_grid(inc, naive=naive,
                                        dyadic_order=dyadic_order)
    if s == "pallas_df64":
        return pallas_df64.solve_grid(inc, naive=naive,
                                      dyadic_order=dyadic_order)
    return scan_solver.solve_grid(dyadic_refine(inc, dyadic_order),
                                  naive=naive)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _solve_flat(inc: jnp.ndarray, naive: bool, solver: str,
                dyadic_order: int, grad_solver: str):
    """custom_vjp core over a flat ``(B, M-1, N-1)`` batch."""
    return _solve_final(inc, naive, solver, dyadic_order)


def solve(inc: jnp.ndarray, naive: bool = False, solver: str = "auto",
          dyadic_order: int = 0, grad_solver: str = "auto"):
    """Solve the Goursat PDE on the *base* increment grid ``inc``
    (``(..., M-1, N-1)``), refined internally by ``2^dyadic_order``.

    Returns the signature-kernel values ``K[..., -1, -1]`` with the batch
    shape of ``inc``. Differentiable in ``inc`` via the adjoint PDE solve.

    ``grad_solver``: ``"auto"`` matches backward precision to the increment
    dtype (f32 increments -> f32 adjoint, f64 increments -> double-double
    grid sweeps + f64 VJP chain at ~3x backward cost); ``"f32"`` explicitly
    opts f64 increments down to the fast f32-grade adjoint (see module
    docstring for the measured error); ``"df64"`` forces the full-precision
    route.

    Batch dims are flattened around the core: with >1 batch dims (the Gram
    case) XLA's layout assignment may otherwise tile the minor batch axes
    onto lanes/sublanes, inflating the big grid temporaries up to 16x.
    """
    if grad_solver not in ("auto", "f32", "df64"):
        raise ValueError(f"unknown grad_solver {grad_solver!r}; "
                         "expected 'auto', 'f32' or 'df64'")
    batch_shape = inc.shape[:-2]
    # explicit batch size: -1 cannot be inferred when a trailing dim is 0
    # (length-1 paths produce a (..., 0, 0) increment grid)
    import math
    flat = inc.reshape((math.prod(batch_shape),) + inc.shape[-2:])
    out = _solve_flat(flat, naive, solver, dyadic_order, grad_solver)
    return out.reshape(batch_shape)


def _collapse_refined(KK, dyadic_order, dtype):
    """VJP of dyadic refinement: sum each ``f x f`` block, scale ``1/f^2``."""
    if dyadic_order == 0:
        return KK.astype(dtype)
    f = 2 ** dyadic_order
    *batch, MM, NN = KK.shape
    KK = KK.reshape(*batch, MM // f, f, NN // f, f)
    return (KK.sum(axis=(-3, -1)) / (f * f)).astype(dtype)


def _full_stack_bytes(B, Mb, Nb, f):
    """Total bytes of per-chunk forward stacks (all live as residuals)."""
    from . import pallas_adjoint
    from .pallas_solver import LANES as _L
    from ..utils import ceil_to as _ceil

    MM, NN = Mb * f, Nb * f
    chunk = pallas_adjoint.shared_chunk(MM, NN)
    nc = -(-B // chunk)
    slab_rows = _ceil(min(B, chunk), 8)
    Tp = _ceil(MM + NN - 1 + 2, _L) + pallas_adjoint._pad_f(f)
    return nc * Tp * slab_rows * _ceil(MM + 1, _L) * 4


def _f32_stack_gate(inc, dyadic_order: int) -> bool:
    """Share the f32 forward's diagonal stack with the fused adjoint?
    Needs the stack-shareable geometry and the residual capacity budget
    (see ckpt_stack_bytes); static decision."""
    from . import pallas_adjoint

    B, Mb, Nb = inc.shape
    f = 2 ** dyadic_order
    return (pallas_adjoint.stack_shareable(B, Mb, Nb, dyadic_order)
            and _full_stack_bytes(B, Mb, Nb, f) <= ckpt_stack_bytes())


def _f32_planes_gate(inc, dyadic_order: int) -> bool:
    """Plane-split f32 stack-sharing route gate (mirrors the df gate)."""
    from . import pallas_adjoint

    if not PLANES:
        return False
    B, Mb, Nb = inc.shape
    f = 2 ** dyadic_order
    return (pallas_adjoint.planes_adj_ok(min(B, 128), Mb, Nb, dyadic_order)
            and _full_stack_bytes(B, Mb, Nb, f) <= ckpt_stack_bytes())


def _solve_fwd(inc, naive, solver, dyadic_order, grad_solver):
    from .routes import resolve_inc_route

    r = resolve_inc_route(inc, solver, dyadic_order, grad_solver)
    if r.fwd_stack == "planes":
        from . import pallas_adjoint

        val, stk = pallas_adjoint.solve_final_f32_stack_pl(inc, naive,
                                                           dyadic_order)
        return val, (inc, stk)
    if r.fwd_stack == "full":
        from . import pallas_adjoint

        val, stk = pallas_adjoint.solve_final_f32_stack(inc, naive,
                                                        dyadic_order)
        return val, (inc, stk)
    return _solve_final(inc, naive, solver, dyadic_order), (inc, None)


def _grid_route_bwd(inc, g, naive, solver, dyadic_order):
    """Full-precision backward: two grid solves + variation-of-parameters
    product ``KK = K[:-1,:-1] * flip(K_rev)[1:,1:]`` in the working dtype."""
    # one batched sweep over [inc; flip(inc)]: the scan is sequential in
    # n_steps, so doubling the (vectorised) batch halves backward latency
    inc_rev = jnp.flip(jnp.flip(inc, axis=-1), axis=-2)
    both = _solve_grid(jnp.concatenate([inc, inc_rev], axis=0), naive,
                       solver, dyadic_order)
    B = inc.shape[0]
    grid, grid_rev = both[:B], both[B:]
    grid_rev = jnp.flip(jnp.flip(grid_rev, axis=-1), axis=-2)
    KK = grid[..., :-1, :-1] * grid_rev[..., 1:, 1:]
    KK = g[..., None, None].astype(KK.dtype) * KK
    return (_collapse_refined(KK, dyadic_order, inc.dtype),)


def _solve_bwd(naive, solver, dyadic_order, grad_solver, res, g):
    from . import pallas_adjoint
    from .routes import resolve_inc_route

    inc, fstk = res
    r = resolve_inc_route(inc, solver, dyadic_order, grad_solver)
    if r.bwd == "planes":
        # plane-split stack-sharing route (the fwd emitted a plane-layout
        # stack); callers without a shared stack (e.g. the fused route's
        # backward, which recomputes increments) re-run the stack-emitting
        # forward here
        if fstk is None:
            _, fstk = pallas_adjoint.solve_final_f32_stack_pl(
                inc, naive, dyadic_order)
        ct = pallas_adjoint.adjoint_planes_collapsed(
            inc, g, naive=naive, dyadic_order=dyadic_order,
            fwd_stack=fstk)
        return (ct.astype(inc.dtype),)
    if r.bwd == "fused":
        # fused adjoint: the reverse sweep multiplies the forward stack
        # in-flight and collapses the cotangent to base resolution
        # in-kernel (falls back to the sheared-space adjoint_dd for
        # rectangles whose longer side exceeds VMEM); f32 backward, see
        # module doc
        ct = pallas_adjoint.adjoint_fused_collapsed(
            inc, g, naive=naive, dyadic_order=dyadic_order,
            fwd_stack=fstk)
        return (ct.astype(inc.dtype),)
    if r.bwd == "striped":
        # striped adjoint: stripe-grid recompute pairs; returns the
        # cotangent already collapsed to base resolution (f32 backward)
        ct = pallas_blocked.adjoint_blocked(inc, g, naive=naive,
                                            dyadic_order=dyadic_order)
        return (ct.astype(inc.dtype),)
    if r.bwd == "striped_df":
        # f64-grade striped adjoint: DF stripe grids, f64 product/collapse
        hi = inc.astype(jnp.float32)
        lo = (inc - hi.astype(jnp.float64)).astype(jnp.float32)
        ct = pallas_blocked.adjoint_blocked_df(hi, lo, g, naive=naive,
                                               dyadic_order=dyadic_order)
        return (ct.astype(inc.dtype),)
    # full-precision route: scan tier, or grad_solver="df64" on the
    # double-double tier (both grid sweeps + product run f64-grade)
    return _grid_route_bwd(inc, g, naive, solver, dyadic_order)


_solve_flat.defvjp(_solve_fwd, _solve_bwd)


def solve_with_grid(inc: jnp.ndarray, naive: bool = False,
                    solver: str = "auto",
                    dyadic_order: int = 0) -> jnp.ndarray:
    """Non-differentiable full-grid solve (used by tests and diagnostics)."""
    return _solve_grid(inc, naive, solver, dyadic_order)


# ---------------------------------------------------------------------------
# Double-float (paired-f32) increment path: no emulated f64 anywhere
# ---------------------------------------------------------------------------

def _df_supported(hi, dyadic_order):
    from . import pallas_df64 as _df64

    f = 2 ** dyadic_order
    probe = jax.ShapeDtypeStruct(
        hi.shape[:-2] + (hi.shape[-2] * f, hi.shape[-1] * f), jnp.float32)
    return _df64.supported_df(probe)


def _solve_df_final(dd_df, naive, dyadic_order):
    hi, lo = dd_df
    if _df_supported(hi, dyadic_order):
        import math

        B = math.prod(hi.shape[:-2])
        if PLANES and pallas_df64.planes_ok(min(B, 128), hi.shape[-2],
                                            hi.shape[-1], dyadic_order):
            return pallas_df64.solve_final_df_pl(hi, lo, naive=naive,
                                                 dyadic_order=dyadic_order)
        return pallas_df64.solve_final_df(hi, lo, naive=naive,
                                          dyadic_order=dyadic_order)
    f = 2 ** dyadic_order
    probe = jax.ShapeDtypeStruct(
        hi.shape[:-2] + (hi.shape[-2] * f, hi.shape[-1] * f), jnp.float32)
    if pallas_blocked.supported(probe):  # beyond VMEM on both sides
        return pallas_blocked.solve_final_df(hi, lo, naive=naive,
                                             dyadic_order=dyadic_order)
    # portable fallback (CPU tests): combine and run the scan tier at the
    # widest enabled precision
    inc = hi.astype(jnp.float64) + lo.astype(jnp.float64)
    return scan_solver.solve_final(dyadic_refine(inc, dyadic_order),
                                   naive=naive)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _solve_df_flat(dd_df, naive: bool, dyadic_order: int):
    return _solve_df_final(dd_df, naive, dyadic_order)


def _df_stack_gate(hi, dyadic_order: int) -> bool:
    """Share the df64 forward's hi stack with the backward? (Both the df
    tier and the collapse-adjoint geometry must apply; static decision.)"""
    from . import pallas_adjoint

    B, Mb, Nb = hi.shape
    return (_df_supported(hi, dyadic_order)
            and pallas_adjoint.stack_shareable(B, Mb, Nb, dyadic_order))


# Plane-split kernels (refined lanes as f base-width planes): base-width
# streams with no dilation, f x less roll work, free in-kernel collapse.
# SIG_PLANES=0 falls back to the stretched-width kernels.
import os as _os
PLANES = bool(int(_os.environ.get("SIG_PLANES", "1")))


def _df_planes_gate(hi, dyadic_order: int) -> bool:
    """Take the plane-split stack-sharing fwd+bwd route? Requires the
    plane geometry on both orientations and the full-stack residual
    budget (multi-chunk beyond it falls to the sparse-ckpt route).
    Static decision, recomputed identically in fwd and bwd."""
    import math

    from . import pallas_adjoint

    if not PLANES:
        return False
    B, Mb, Nb = hi.shape
    f = 2 ** dyadic_order
    return (_df_supported(hi, dyadic_order)
            and pallas_adjoint.planes_adj_ok(min(B, 128), Mb, Nb,
                                             dyadic_order)
            and _full_stack_bytes(B, Mb, Nb, f) <= ckpt_stack_bytes())


# Full forward stacks beyond the residual budget switch to the sparse
# checkpoint stack. Capacity-driven, NOT a speed gate: slope-profiled on
# chip (scripts/stage_probe.py, round 3), the ckpt route is a net LOSS at
# the benchmark config (fwd 85.5 + adjoint 92.2 ms vs 85.1 + 64.1 full) --
# stack emission rides free under the compute-bound forward, so the
# adjoint's in-kernel recompute buys HBM *space* only. ALL chunk stacks
# live simultaneously as custom_vjp residuals (the backward consumes them
# after every chunk's forward), and XLA's planner showed ~44% HBM
# fragmentation at this size, so two 4.3 GB full stacks (256 benchmark
# pairs) already fail to compile on a 16 GB v5e.
#
# The budget is derived from the device: 5/16 of reported HBM (the measured
# usable-residual fraction on v5e after fragmentation + working set). The
# axon relay returns no memory_stats, so a device_kind table backstops it;
# SIG_CKPT_STACK_BYTES overrides everything.
_HBM_BY_KIND_GIB = (
    ("v5 lite", 16), ("v5e", 16), ("v5p", 95), ("v6 lite", 32),
    ("v6e", 32), ("v4", 32), ("v3", 16), ("v2", 8),
)
_RESIDUAL_FRACTION = 5.0 / 16.0  # measured on v5e (round 3)


@functools.lru_cache(maxsize=1)
def ckpt_stack_bytes() -> int:
    env = _os.environ.get("SIG_CKPT_STACK_BYTES")
    if env:
        return int(env)
    hbm = None
    try:
        dev = jax.devices()[0]
        stats = getattr(dev, "memory_stats", lambda: None)() or {}
        hbm = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        if not hbm:
            kind = (getattr(dev, "device_kind", "") or "").lower()
            for key, gib in _HBM_BY_KIND_GIB:
                if key in kind:
                    hbm = gib << 30
                    break
    except Exception:
        pass
    if not hbm:
        return 5 << 30  # the measured v5e number
    return int(hbm * _RESIDUAL_FRACTION)


def _df_ckpt_gate(hi, dyadic_order: int) -> bool:
    """Use the SPARSE checkpoint stack? Only when the full hi stack would
    not fit the HBM budget (see ``ckpt_stack_bytes``); otherwise the full
    stack is strictly faster. Static decision, recomputed identically in
    fwd and bwd."""
    import math

    from . import pallas_adjoint

    f = 2 ** dyadic_order
    Mb, Nb = hi.shape[-2], hi.shape[-1]
    T = (Mb + Nb) * f - 1
    if not (_df_stack_gate(hi, dyadic_order)
            and pallas_adjoint.ckpt_supported(T, f)):
        return False
    B = math.prod(hi.shape[:-2])
    return _full_stack_bytes(B, Mb, Nb, f) > ckpt_stack_bytes()


def _solve_df_fwd(dd_df, naive, dyadic_order):
    from .routes import resolve_df_route

    hi, lo = dd_df
    r = resolve_df_route(hi, dyadic_order)
    if r.fwd_stack == "planes":
        from . import pallas_adjoint

        val, stk = pallas_df64.solve_final_df_stack_pl(
            hi, lo, naive=naive, dyadic_order=dyadic_order,
            stack_pad=pallas_adjoint._pad_f(2 ** dyadic_order))
        return val, (dd_df, stk)
    if r.fwd_stack == "ckpt":
        val, stk = pallas_df64.solve_final_df_ckpt(
            hi, lo, naive=naive, dyadic_order=dyadic_order)
        return val, (dd_df, stk)
    if r.fwd_stack == "full":
        from . import pallas_adjoint

        val, stk = pallas_df64.solve_final_df_stack(
            hi, lo, naive=naive, dyadic_order=dyadic_order,
            stack_pad=pallas_adjoint._pad_f(2 ** dyadic_order))
        return val, (dd_df, stk)
    return _solve_df_final(dd_df, naive, dyadic_order), (dd_df, None)


def _solve_df_bwd(naive, dyadic_order, res, g):
    from . import pallas_adjoint
    from .routes import resolve_df_route

    dd_df, stk = res
    hi, lo = dd_df
    r = resolve_df_route(hi, dyadic_order)
    if r.bwd == "planes":
        ct = pallas_adjoint.adjoint_planes_collapsed(
            hi.reshape((-1,) + hi.shape[-2:]), g.reshape(-1), naive=naive,
            dyadic_order=dyadic_order, fwd_stack=stk
        ).reshape(hi.shape)
    elif r.bwd == "ckpt":
        ct = pallas_adjoint.adjoint_ckpt_collapsed(
            hi, g, naive=naive, dyadic_order=dyadic_order, ckpt_stack=stk)
    elif r.bwd == "fused":
        ct = pallas_adjoint.adjoint_fused_collapsed(
            hi, g, naive=naive, dyadic_order=dyadic_order, fwd_stack=stk)
    elif r.bwd == "striped":
        ct = pallas_blocked.adjoint_blocked(hi, g, naive=naive,
                                            dyadic_order=dyadic_order)
    else:
        inc = hi.astype(jnp.float64) + lo.astype(jnp.float64)
        (ct64,) = _grid_route_bwd(inc, g, naive, "scan", dyadic_order)
        ct = ct64.astype(jnp.float32)
    # the cotangent is f32-grade by design; its lo plane is identically zero
    return ((ct, jnp.zeros_like(ct)),)


_solve_df_flat.defvjp(_solve_df_fwd, _solve_df_bwd)


def solve_df(dd_df, naive: bool = False, dyadic_order: int = 0):
    """Differentiable Goursat solve on double-float increments.

    ``dd_df``: a ``(hi, lo)`` pair of f32 arrays ``(..., M-1, N-1)`` whose
    unevaluated sum is the f64-grade increment grid (produced by
    :mod:`.df_prep`). Returns f64 ``K[..., -1, -1]``; backward is the
    f32-grade sheared-space adjoint. On TPU this path touches no emulated
    f64 at all between the path points and the final scalar.
    """
    import math

    hi, lo = dd_df
    batch_shape = hi.shape[:-2]
    B = math.prod(batch_shape)
    flat = (hi.reshape((B,) + hi.shape[-2:]),
            lo.reshape((B,) + lo.shape[-2:]))
    out = _solve_df_flat(flat, naive, dyadic_order)
    return out.reshape(batch_shape)
