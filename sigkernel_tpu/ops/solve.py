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

Gradient precision: the ``pallas_df64`` tier runs its *backward* sweeps with
the plain f32 kernel. The adjoint is itself a continuous approximation and
the reference's own gradients carry ~1e-7 relative error from the h=1e-9
bump, so f32-grade backward matches reference gradient quality at a fraction
of the cost; use ``solver="scan"`` for full-f64 adjoints.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import scan_solver
from . import pallas_solver
from . import pallas_df64
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
        if solver == "pallas":
            raise ValueError(
                "solver='pallas' requires a TPU backend, float32/float64 "
                f"increments and <= {pallas_solver.MAX_ROWS} diagonal rows; "
                f"got dtype={inc.dtype}, refined shape={probe.shape}")
        return "scan"
    return solver


def _solve_final(inc, naive, solver, dyadic_order):
    s = _resolve(solver, inc, dyadic_order)
    if s == "pallas":
        return pallas_solver.solve_final(inc, naive=naive,
                                         dyadic_order=dyadic_order)
    if s == "pallas_df64":
        return pallas_df64.solve_final(inc, naive=naive,
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _solve_flat(inc: jnp.ndarray, naive: bool, solver: str,
                dyadic_order: int):
    """custom_vjp core over a flat ``(B, M-1, N-1)`` batch."""
    return _solve_final(inc, naive, solver, dyadic_order)


def solve(inc: jnp.ndarray, naive: bool = False, solver: str = "auto",
          dyadic_order: int = 0):
    """Solve the Goursat PDE on the *base* increment grid ``inc``
    (``(..., M-1, N-1)``), refined internally by ``2^dyadic_order``.

    Returns the signature-kernel values ``K[..., -1, -1]`` with the batch
    shape of ``inc``. Differentiable in ``inc`` via the adjoint PDE solve.

    Batch dims are flattened around the core: with >1 batch dims (the Gram
    case) XLA's layout assignment may otherwise tile the minor batch axes
    onto lanes/sublanes, inflating the big grid temporaries up to 16x.
    """
    batch_shape = inc.shape[:-2]
    # explicit batch size: -1 cannot be inferred when a trailing dim is 0
    # (length-1 paths produce a (..., 0, 0) increment grid)
    import math
    flat = inc.reshape((math.prod(batch_shape),) + inc.shape[-2:])
    out = _solve_flat(flat, naive, solver, dyadic_order)
    return out.reshape(batch_shape)


def _collapse_refined(KK, dyadic_order, dtype):
    """VJP of dyadic refinement: sum each ``f x f`` block, scale ``1/f^2``."""
    if dyadic_order == 0:
        return KK.astype(dtype)
    f = 2 ** dyadic_order
    *batch, MM, NN = KK.shape
    KK = KK.reshape(*batch, MM // f, f, NN // f, f)
    return (KK.sum(axis=(-3, -1)) / (f * f)).astype(dtype)


def _solve_fwd(inc, naive, solver, dyadic_order):
    return _solve_final(inc, naive, solver, dyadic_order), inc


def _solve_bwd(naive, solver, dyadic_order, inc, g):
    s = _resolve(solver, inc, dyadic_order)
    if s in ("pallas", "pallas_df64"):
        # sheared-space adjoint: both sweeps stay as diagonal stacks; no
        # solution grid is ever materialised (f32 backward, see module doc)
        KK = pallas_solver.adjoint_dd(inc, g, naive=naive,
                                      dyadic_order=dyadic_order)
        return (_collapse_refined(KK, dyadic_order, inc.dtype),)
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


_solve_flat.defvjp(_solve_fwd, _solve_bwd)


def solve_with_grid(inc: jnp.ndarray, naive: bool = False,
                    solver: str = "auto",
                    dyadic_order: int = 0) -> jnp.ndarray:
    """Non-differentiable full-grid solve (used by tests and diagnostics)."""
    return _solve_grid(inc, naive, solver, dyadic_order)
