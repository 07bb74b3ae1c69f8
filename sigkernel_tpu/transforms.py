"""Path transforms, preprocessing and the truncated-signature baseline.

Parity with reference sigkernel/transformers.py (L0 of the layer map). These
are host-side preprocessing utilities, numpy-based and sklearn-compatible like
the reference; the accelerator path starts downstream at the static kernels.
"""
from __future__ import annotations

import copy
import math

import numpy as np

try:  # sklearn is an optional convenience dependency for the mixin API
    from sklearn.base import BaseEstimator, TransformerMixin
    from sklearn.utils import as_float_array
except Exception:  # pragma: no cover
    class BaseEstimator:  # type: ignore
        pass

    class TransformerMixin:  # type: ignore
        def fit_transform(self, X, y=None):
            return self.fit(X, y).transform(X)

    def as_float_array(x):  # type: ignore
        return np.asarray(x, dtype=float)


# =============================================================================
# Path transforms (reference transformers.py:12-181)
# =============================================================================

def transform(paths, at=False, ll=False, scale=1.0):
    """scale -> LeadLag -> AddTime pipeline (reference transformers.py:12)."""
    paths = scale * np.asarray(paths)
    if ll:
        paths = LeadLag().fit_transform(paths)
    if at:
        paths = AddTime().fit_transform(paths)
    return np.array(paths)


def normalize(sigs, width, depth):
    """Factorial rescaling of truncated signatures (reference transformers.py:20).

    Divergence from the reference: the level-``k+1`` block starts at
    ``sum_{j<=k} width^j = width (width^k - 1) / (width - 1)`` -- the
    reference omits the ``/(width-1)`` (transformers.py:26), silently
    rescaling the wrong slices for any ``width > 2``.
    """
    new_sigs = []
    for sig in sigs:
        new_sig = np.zeros_like(sig)
        for k in range(depth):
            if width == 1:
                lo = k
            else:
                lo = width * (width ** k - 1) // (width - 1)
            new_sig[lo:lo + width ** (k + 1)] = (
                math.factorial(k + 1) * sig[lo:lo + width ** (k + 1)]
            )
        new_sigs.append(new_sig)
    return np.array(new_sigs)


class AddTime(BaseEstimator, TransformerMixin):
    """Prepend a linear time channel (reference transformers.py:30)."""

    def __init__(self, init_time=0.0, total_time=1.0):
        self.init_time = init_time
        self.total_time = total_time

    def fit(self, X, y=None):
        return self

    def transform_instance(self, X):
        # divergence from the reference: honour total_time (the reference
        # hard-codes init_time + 1, transformers.py:39)
        t = np.linspace(self.init_time, self.init_time + self.total_time,
                        len(X))
        return np.c_[t, X]

    def transform(self, X, y=None):
        return [self.transform_instance(x) for x in X]


class Reversion(BaseEstimator, TransformerMixin):
    """Reverse each path in time (reference transformers.py:45)."""

    def fit(self, X, y=None):
        return self

    def transform(self, X, y=None):
        return [as_float_array(x[::-1]) for x in X]


class LeadLag(BaseEstimator, TransformerMixin):
    """Classic lead-lag embedding (reference transformers.py:56)."""

    def fit(self, X, y=None):
        return self

    def transform_instance(self, X):
        X = np.asarray(X)
        if X.ndim == 1:
            X = X[:, None]
        # Interleaved (lag, lead) rows: for each consecutive pair
        # (x_k, x_{k+1}) emit (x_k, x_k) then (x_k, x_{k+1}); terminate
        # with (x_{n-1}, x_{n-1}). Doubling X and offsetting by one yields
        # exactly that sequence.
        doubled = np.repeat(X, 2, axis=0)
        lag = doubled[:-1]
        lead = doubled[1:]
        return np.concatenate([lag, lead], axis=1)

    def transform(self, X, y=None):
        return [self.transform_instance(x) for x in X]


class Dyadic(BaseEstimator, TransformerMixin):
    """Split each path into ``2^depth`` overlapping chunks
    (reference transformers.py:82)."""

    def __init__(self, depth):
        self.depth = depth

    def fit(self, X, y=None):
        return self

    def transform_instance(self, X):
        n_splits = 2 ** self.depth
        intervals = np.array_split(X, n_splits)
        for i in range(1, len(intervals)):
            intervals[i] = np.r_[[intervals[i - 1][-1]], intervals[i]]
        return [as_float_array(interval) for interval in intervals]

    def transform(self, X, y=None):
        return [self.transform_instance(x) for x in X]


class PenOff(BaseEstimator, TransformerMixin):
    """Pen-off + home augmentation for handwriting strokes
    (reference transformers.py:102)."""

    def fit(self, X, y=None):
        return self

    def transform_instance(self, X):
        X_transformed = np.c_[X, np.ones(len(X))]
        last = np.array(copy.deepcopy(X_transformed[-1]))
        last[-1] = 0.0
        X_transformed = np.r_[X_transformed, [last]]
        X_transformed = np.r_[
            np.zeros(X_transformed.shape[1]).reshape(1, -1), X_transformed]
        return X_transformed

    def transform(self, X, Y=None):
        return [self.transform_instance(x) for x in X]


class Stroke_Augment(BaseEstimator, TransformerMixin):
    """Append a per-stroke counter channel (reference transformers.py:127)."""

    def fit(self, X, y=None):
        return self

    def transform_instance(self, X):
        stroke = 0.0
        output = []
        for c in X:
            output += [r + [stroke] for r in c]
            stroke += 1.0
        return np.array(output)

    def transform(self, X, Y=None):
        return [self.transform_instance(x) for x in X]


class Ink_Augment(BaseEstimator, TransformerMixin):
    """Append a cumulative ink channel (reference transformers.py:145)."""

    def fit(self, X, y=None):
        return self

    def transform_instance(self, X):
        output = []
        ink = 0.0
        for c in X:
            for d in c:
                output += d + [ink]
                if d != c[-1]:
                    ink += 1.0
        return np.array(output).reshape(-1, 3)

    def transform(self, X, Y=None):
        return [self.transform_instance(x) for x in X]


class Pen_Augment(BaseEstimator, TransformerMixin):
    """Pen up/down markers around strokes (reference transformers.py:165)."""

    def fit(self, X, y=None):
        return self

    def transform_instance(self, X):
        output = []
        for c in X:
            output += [c[0] + [1.0]]
            output += [r + [0.0] for r in c]
            output += [c[-1] + [1.0]]
        return np.array(output[1:-1])

    def transform(self, X, Y=None):
        return [self.transform_instance(x) for x in X]


# =============================================================================
# Brownian motion simulation (reference transformers.py:188-195)
# =============================================================================

def white(steps, width, time=1.0, rng=None):
    """White-noise increments; pass ``rng`` (np.random.Generator) for
    reproducibility."""
    sigma = math.sqrt(time / steps)
    if rng is None:
        return np.random.normal(0.0, sigma, (steps, width))
    return rng.normal(0.0, sigma, (steps, width))


def brownian(steps, width, time=1.0, rng=None):
    """Brownian path of shape ``(steps + 1, width)`` started at 0."""
    path = np.zeros((steps + 1, width))
    np.cumsum(white(steps, width, time, rng), axis=0, out=path[1:, :])
    return path


# =============================================================================
# Truncated signature kernel (Kiraly-Oberhauser low-rank algorithm;
# reference transformers.py:201-236)
# =============================================================================

def _shift_right(A, axes):
    """Zero-fill shift by +1 along the given axes (exact integer shift;
    replaces the reference's scipy.ndimage.shift spline call)."""
    out = A
    for ax in axes:
        out = np.roll(out, 1, axis=ax)
        idx = [slice(None)] * out.ndim
        idx[ax] = 0
        out[tuple(idx)] = 0.0
    return out


def truncated_sig_kernel(X, Y, num_levels, sigma=1.0, order=-1):
    """Truncated signature kernel matrix of two batches of sequences.

    ``X``: ``(num_seq_X, len_X, feat)``, ``Y``: ``(num_seq_Y, len_Y, feat)``.
    ``num_levels`` signature levels; ``sigma`` scalar or per-level weights;
    ``order`` the Kiraly-Oberhauser approximation order (``-1`` = full).
    Returns ``(num_seq_X, num_seq_Y)``.
    """
    X = np.asarray(X)
    Y = np.asarray(Y)
    order = num_levels if order < 1 else order
    sigma = sigma * np.ones((num_levels + 1,), dtype=X.dtype)

    nx, lx, feat = X.shape
    ny, ly, _ = Y.shape

    M = (X.reshape((-1, feat)) @ Y.reshape((-1, feat)).T).reshape(nx, lx, ny, ly)
    K = sigma[0] * np.ones((nx, ny), dtype=X.dtype) + sigma[1] * M.sum(axis=(1, 3))
    R = M[None, None, ...]

    for m in range(1, num_levels):
        d = min(m + 1, order)
        R_next = np.empty((d, d, nx, lx, ny, ly), dtype=X.dtype)
        R_next[0, 0] = M * _shift_right(
            np.cumsum(np.cumsum(R.sum(axis=(0, 1)), axis=1), axis=3), (1, 3))
        for j in range(1, d):
            R_next[0, j] = (1.0 / (j + 1)) * M * _shift_right(
                np.cumsum(R[:, j - 1].sum(axis=0), axis=1), (1,))
            R_next[j, 0] = (1.0 / (j + 1)) * M * _shift_right(
                np.cumsum(R[j - 1, :].sum(axis=0), axis=3), (3,))
            for i in range(1, d):
                R_next[i, j] = (1.0 / ((j + 1) * (i + 1))) * M * R[i - 1, j - 1]
        R = R_next
        K += sigma[m + 1] * R.sum(axis=(0, 1, 3, 5))
    return K
