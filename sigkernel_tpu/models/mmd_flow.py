"""Signature-MMD gradient flow: a trainable generative model over paths.

The reference exposes the ingredients (differentiable ``compute_mmd``,
directional-derivative Grams for Hilbert-space gradient flows,
reference sigkernel/sigkernel.py:180-197, 504-593) but no training loop.
This module packages them into the library's "flagship model": a particle
flow ``X <- X - lr * grad_X MMD^2(X, Y)`` matching a target path
distribution ``Y``, with an optax-compatible functional step that jits,
grads, and shards (see :mod:`sigkernel_tpu.parallel`).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..sigkernel import sig_mmd


@functools.partial(jax.jit,
                   static_argnames=("dyadic_order", "naive", "solver"))
def mmd_flow_step(static_kernel, X, Y, lr=0.05, dyadic_order=0, naive=False,
                  solver="auto"):
    """One explicit-Euler step of the signature-MMD particle flow.

    Returns ``(X_next, mmd_value)``. Pure and jittable; the gradient runs
    through the adjoint PDE solve.
    """
    def loss(x):
        return sig_mmd(static_kernel, x, Y, dyadic_order=dyadic_order,
                       naive=naive, solver=solver, max_batch=None)

    value, grad = jax.value_and_grad(loss)(X)
    return X - lr * grad, value


class MMDFlow:
    """Convenience wrapper running the flow for ``n_steps``."""

    def __init__(self, static_kernel, dyadic_order=0, lr=0.05,
                 naive=False, solver="auto"):
        self.static_kernel = static_kernel
        self.dyadic_order = dyadic_order
        self.lr = lr
        self.naive = naive
        self.solver = solver

    def fit(self, X0, Y, n_steps=100, callback=None):
        X = jnp.asarray(X0)
        Y = jnp.asarray(Y)
        history = []
        for t in range(n_steps):
            X, value = mmd_flow_step(
                self.static_kernel, X, Y, lr=self.lr,
                dyadic_order=self.dyadic_order, naive=self.naive,
                solver=self.solver)
            history.append(float(value))
            if callback is not None:
                callback(t, X, value)
        return X, history
