"""Naive O(MM*NN) Python-loop oracles, kept public "just for testing".

Parity with the reference's deprecated oracles
(reference sigkernel/sigkernel.py:700-807). These run the wavefront cell by
cell in Python/numpy -- slow and trusted; they are the semantic spec the fast
solvers are tested against.

Note: the reference's ``SigKernel_naive`` uses the update
``k10 + k01 + k00*(u - 1)`` while its compiled backends use
``(k01 + k10)(1 + u/2) - k00`` for the "naive" scheme
(cython_backend.pyx:27 vs sigkernel.py:728). We follow the compiled backends
(the live numerical spec) everywhere.
"""
from __future__ import annotations

import numpy as np

from .utils import increment_grid


def _solve_np(inc: np.ndarray, naive: bool) -> np.ndarray:
    """Row-major reference solve. ``inc``: (..., MM, NN) -> grid (..., MM+1, NN+1)."""
    inc = np.asarray(inc)
    MM, NN = inc.shape[-2:]
    K = np.ones(inc.shape[:-2] + (MM + 1, NN + 1), dtype=inc.dtype)
    for i in range(MM):
        for j in range(NN):
            u = inc[..., i, j]
            k00 = K[..., i, j]
            k01 = K[..., i, j + 1]
            k10 = K[..., i + 1, j]
            if naive:
                K[..., i + 1, j + 1] = (k01 + k10) * (1.0 + 0.5 * u) - k00
            else:
                u2 = u * u / 12.0
                K[..., i + 1, j + 1] = (k01 + k10) * (1.0 + 0.5 * u + u2) \
                    - k00 * (1.0 - u2)
    return K


def sig_kernel_naive(X, Y, static_kernel, dyadic_order=0, _naive_solver=False):
    """Pairwise signature kernel via the naive loop (reference sigkernel.py:700)."""
    G = np.asarray(static_kernel.batch_kernel(X, Y))
    inc = np.asarray(increment_grid(G, dyadic_order))
    return _solve_np(inc, _naive_solver)[..., -1, -1]


def sig_gram_naive(X, Y, static_kernel, dyadic_order=0, _naive_solver=False):
    """Gram matrix via the naive loop (reference sigkernel.py:753)."""
    G = np.asarray(static_kernel.Gram_matrix(X, Y))
    inc = np.asarray(increment_grid(G, dyadic_order))
    return _solve_np(inc, _naive_solver)[..., -1, -1]


def sig_loss_naive(X, Y, static_kernel, dyadic_order=0, _naive_solver=False):
    """Signature loss (paired-batch distance) via the naive loop:
    ``mean k(X,X) + mean k(Y,Y) - 2 mean k(X,Y)`` over *paired* batches
    (reference ``SigLoss_naive``, sigkernel.py:736-750)."""
    k_xx = sig_kernel_naive(X, X, static_kernel, dyadic_order, _naive_solver)
    k_yy = sig_kernel_naive(Y, Y, static_kernel, dyadic_order, _naive_solver)
    k_xy = sig_kernel_naive(X, Y, static_kernel, dyadic_order, _naive_solver)
    return k_xx.mean() + k_yy.mean() - 2.0 * k_xy.mean()


class SigLoss_naive:
    """Class-form parity shim for the reference ``SigLoss_naive`` module."""

    def __init__(self, static_kernel, dyadic_order=0, _naive_solver=False):
        self.static_kernel = static_kernel
        self.dyadic_order = dyadic_order
        self._naive_solver = _naive_solver

    def __call__(self, X, Y):
        return sig_loss_naive(X, Y, self.static_kernel, self.dyadic_order,
                              self._naive_solver)

    forward = __call__


def sig_mmd_naive(X, Y, static_kernel, dyadic_order=0, _naive_solver=False):
    """Unbiased MMD^2 via the naive loop (reference sigkernel.py:790)."""
    K_XX = sig_gram_naive(X, X, static_kernel, dyadic_order, _naive_solver)
    K_YY = sig_gram_naive(Y, Y, static_kernel, dyadic_order, _naive_solver)
    K_XY = sig_gram_naive(X, Y, static_kernel, dyadic_order, _naive_solver)
    m, n = K_XX.shape[0], K_YY.shape[0]
    xx = (K_XX.sum() - np.trace(K_XX)) / (m * (m - 1.0))
    yy = (K_YY.sum() - np.trace(K_YY)) / (n * (n - 1.0))
    return xx + yy - 2.0 * K_XY.mean()


# ---------------------------------------------------------------------------
# Reference-name shims (drop-in parity for porting users)
# ---------------------------------------------------------------------------

SigKernel_naive = sig_kernel_naive          # reference sigkernel.py:700
SigKernelGramMat_naive = sig_gram_naive     # reference sigkernel.py:753


class SigMMD_naive:
    """Class-form parity shim (reference sigkernel.py:790)."""

    def __init__(self, static_kernel, dyadic_order=0, _naive_solver=False):
        self.static_kernel = static_kernel
        self.dyadic_order = dyadic_order
        self._naive_solver = _naive_solver

    def __call__(self, X, Y):
        return sig_mmd_naive(X, Y, self.static_kernel, self.dyadic_order,
                             self._naive_solver)

    forward = __call__
