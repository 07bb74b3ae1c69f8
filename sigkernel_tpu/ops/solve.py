"""Differentiable Goursat solve with an adjoint (second PDE sweep) backward.

The reference implements gradients by solving the *same* PDE on the reversed
increment grid and forming ``KK = K[..., :-1, :-1] * K_rev[..., 1:, 1:]``
(variation of parameters; reference sigkernel/sigkernel.py:256-343, 419-502),
never differentiating through the solver loop. We package exactly that trick
as a ``jax.custom_vjp`` on the map ``increments -> K[..., -1, -1]``:

    d(final) / d(inc[a, b]) = K[a, b] * K_rev_flipped[a + 1, b + 1]

Everything upstream of the increments (static kernel Gram, double difference,
dyadic refinement) is plain JAX, so the chain rule through the static kernel
is handled *analytically* by JAX AD -- replacing the reference's ``h = 1e-9``
finite-difference bump (reference sigkernel.py:314,473) with the exact
derivative, as planned in SURVEY.md S7.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import scan_solver
from . import pallas_solver
from . import pallas_df64


_SOLVERS = ("scan", "pallas", "auto")


def _resolve(solver: str, inc: jnp.ndarray) -> str:
    """Pick the concrete tier: ``pallas`` = f32 Mosaic kernel, ``pallas_df64``
    = double-double Mosaic kernel (f64-grade precision on the f32 VPU),
    ``scan`` = pure-XLA fallback (any platform/dtype)."""
    if solver not in _SOLVERS:
        raise ValueError(f"unknown solver {solver!r}; expected one of {_SOLVERS}")
    if solver in ("auto", "pallas"):
        if pallas_solver.supported(inc):
            return "pallas"
        if pallas_df64.supported(inc):
            return "pallas_df64"
        if solver == "pallas":
            raise ValueError(
                "solver='pallas' requires a TPU backend, float32/float64 "
                f"increments and <= {pallas_solver.MAX_ROWS} diagonal rows; "
                f"got dtype={inc.dtype}, shape={inc.shape}")
        return "scan"
    return solver


def _solve_final(inc, naive, solver):
    s = _resolve(solver, inc)
    if s == "pallas":
        return pallas_solver.solve_final(inc, naive=naive)
    if s == "pallas_df64":
        return pallas_df64.solve_final(inc, naive=naive)
    return scan_solver.solve_final(inc, naive=naive)


def _solve_grid(inc, naive, solver):
    s = _resolve(solver, inc)
    if s == "pallas":
        return pallas_solver.solve_grid(inc, naive=naive)
    if s == "pallas_df64":
        return pallas_df64.solve_grid(inc, naive=naive)
    return scan_solver.solve_grid(inc, naive=naive)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def solve(inc: jnp.ndarray, naive: bool = False, solver: str = "auto"):
    """Solve the Goursat PDE on increment grid ``inc`` (``(..., MM, NN)``).

    Returns the signature-kernel values ``K[..., -1, -1]`` with the batch
    shape of ``inc``. Differentiable in ``inc`` via the adjoint PDE solve.
    """
    return _solve_final(inc, naive, solver)


def _solve_fwd(inc, naive, solver):
    grid = _solve_grid(inc, naive, solver)
    return grid[..., -1, -1], (inc, grid)


def _solve_bwd(naive, solver, res, g):
    inc, grid = res
    inc_rev = jnp.flip(jnp.flip(inc, axis=-1), axis=-2)
    grid_rev = _solve_grid(inc_rev, naive, solver)
    grid_rev = jnp.flip(jnp.flip(grid_rev, axis=-1), axis=-2)
    KK = grid[..., :-1, :-1] * grid_rev[..., 1:, 1:]
    return (g[..., None, None] * KK,)


solve.defvjp(_solve_fwd, _solve_bwd)


def solve_with_grid(inc: jnp.ndarray, naive: bool = False,
                    solver: str = "auto") -> jnp.ndarray:
    """Non-differentiable full-grid solve (used by tests and diagnostics)."""
    return _solve_grid(inc, naive, solver)
