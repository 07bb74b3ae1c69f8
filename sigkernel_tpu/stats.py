"""Hypothesis testing and conditional-independence statistics.

Parity with reference sigkernel/sigkernel.py:618-691. The reference README
documents ``SigCHSIC`` as a method while shipping a module-level function
(README.md:80); we expose it both as :func:`sig_chsic` and the reference-named
alias :data:`SigCHSIC`.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from .sigkernel import sig_gram, sig_mmd


def c_alpha(m: int, alpha: float) -> float:
    """MMD two-sample test threshold ``4 sqrt(-log(alpha) / m)``
    (reference sigkernel.py:621)."""
    return 4.0 * np.sqrt(-np.log(alpha) / m)


def _unwrap(static_kernel, dyadic_order):
    """Accept either a static kernel (reference signature) or a whole
    ``SigKernel`` (a natural mistake -- these functions build one
    internally); unwrapping beats an AttributeError deep in the solve."""
    from .sigkernel import SigKernel

    if isinstance(static_kernel, SigKernel):
        return static_kernel.static_kernel, static_kernel.dyadic_order
    return static_kernel, dyadic_order


def hypothesis_test(y_pred, y_test, static_kernel, confidence_level=0.99,
                    dyadic_order=0, verbose=True):
    """MMD-based two-sample test (reference sigkernel.py:624-640).

    Returns ``(rejected, mmd_statistic, threshold)``; also prints the verdict
    when ``verbose`` for parity with the reference's behaviour.
    """
    static_kernel, dyadic_order = _unwrap(static_kernel, dyadic_order)
    m = max(y_pred.shape[0], y_test.shape[0])
    TU = sig_mmd(static_kernel, y_pred, y_test, dyadic_order=dyadic_order)
    # divergence from the reference: c_alpha expects the SIGNIFICANCE level
    # alpha, but the reference feeds it the confidence level (0.99), making
    # the threshold ~20x too small and the test reject almost always
    # (reference sigkernel.py:633-635)
    c = c_alpha(m, 1.0 - confidence_level)
    rejected = bool(TU > c)
    if verbose:
        if rejected:
            print(f"Hypothesis rejected: distribution are not equal with "
                  f"{confidence_level * 100}% confidence")
        else:
            print(f"Hypothesis accepted: distribution are equal with "
                  f"{confidence_level * 100}% confidence")
    return rejected, TU, c


def sig_chsic(X, Y, Z, static_kernel, dyadic_order=1, eps=0.1,
              max_batch=100):
    """Signature conditional HSIC statistic (reference sigkernel.py:644-691).

    ``X, Y, Z``: ``(batch, length, dim)`` path arrays. Returns a scalar.
    """
    static_kernel, dyadic_order = _unwrap(static_kernel, dyadic_order)
    m = X.shape[0]
    dtype = X.dtype

    kw = dict(dyadic_order=dyadic_order, sym=True, max_batch=max_batch)
    K_X = sig_gram(static_kernel, X, X, **kw)
    K_Y = sig_gram(static_kernel, Y, Y, **kw)
    K_Z = sig_gram(static_kernel, Z, Z, **kw)

    H = jnp.eye(m, dtype=dtype) - jnp.full((m, m), 1.0 / m, dtype=dtype)
    K_X_ = H @ K_X @ H
    K_Y_ = H @ K_Y @ H
    K_Z_ = H @ K_Z @ H

    K_Z_e = K_Z_ + m * eps * jnp.eye(m, dtype=dtype)
    # cholesky_inverse equivalent (reference sigkernel.py:681)
    L = jsl.cholesky(K_Z_e, lower=True)
    K_Z_e_inv = jsl.cho_solve((L, True), jnp.eye(m, dtype=dtype))
    K_Z_e_inv2 = K_Z_e_inv @ K_Z_e_inv

    term_1 = jnp.trace(K_X_ @ K_Y_)
    A = K_Z_ @ K_Z_e_inv2 @ K_Z_
    B = K_X_ @ A @ K_Y_
    term_2 = jnp.trace(B)
    term_3 = jnp.trace(B @ A)

    return (term_1 - 2.0 * term_2 + term_3) / m ** 2


# Reference-compatible name (module-level, as actually shipped upstream).
SigCHSIC = sig_chsic
