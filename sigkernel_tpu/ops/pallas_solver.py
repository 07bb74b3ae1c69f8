"""Pallas (Mosaic) TPU wavefront kernels for the Goursat PDE.

Placeholder module for the native TPU tier: ``supported()`` gates dispatch in
:mod:`sigkernel_tpu.ops.solve`; until the kernels land, everything routes to
the pure-XLA scan solver.
"""
from __future__ import annotations

import jax.numpy as jnp


def supported(inc: jnp.ndarray) -> bool:
    return False


def solve_final(inc: jnp.ndarray, naive: bool = False):  # pragma: no cover
    raise NotImplementedError("pallas solver not yet available")


def solve_grid(inc: jnp.ndarray, naive: bool = False):  # pragma: no cover
    raise NotImplementedError("pallas solver not yet available")
