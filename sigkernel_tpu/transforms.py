"""Path transforms, preprocessing and the truncated-signature baseline.

Parity with reference sigkernel/transformers.py (L0 of the layer map). These
are host-side preprocessing utilities, numpy-based and sklearn-compatible like
the reference; the accelerator path starts downstream at the static kernels.
"""
from __future__ import annotations

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
        # Chunk boundaries follow numpy's array_split convention; every chunk
        # after the first starts one row early so consecutive chunks share
        # their boundary point (the sub-paths concatenate back to the path).
        X = np.asarray(X)
        n = len(X)
        n_splits = 2 ** self.depth
        base, extra = divmod(n, n_splits)
        sizes = np.full(n_splits, base)
        sizes[:extra] += 1
        ends = np.cumsum(sizes)
        starts = np.maximum(ends - sizes - (np.arange(n_splits) > 0), 0)
        return [as_float_array(X[s:e]) for s, e in zip(starts, ends)]

    def transform(self, X, y=None):
        return [self.transform_instance(x) for x in X]


class PenOff(BaseEstimator, TransformerMixin):
    """Pen-off + home augmentation for handwriting strokes
    (reference transformers.py:102)."""

    def fit(self, X, y=None):
        return self

    def transform_instance(self, X):
        # Layout: row 0 = "home" (all zeros), rows 1..n = the path with a
        # pen-down flag of 1, final row = the last point repeated with the
        # flag dropped to 0 (the pen-off event).
        X = np.asarray(X, dtype=float)
        n, d = X.shape
        out = np.zeros((n + 2, d + 1))
        out[1:n + 1, :d] = X
        out[1:n + 1, d] = 1.0
        out[n + 1, :d] = X[-1]
        return out

    def transform(self, X, Y=None):
        return [self.transform_instance(x) for x in X]


def _strokes_to_arrays(X):
    """Stroke data (list of strokes, each a sequence of coordinate rows)
    -> list of float arrays of shape ``(len_stroke, d)``."""
    return [np.asarray(c, dtype=float).reshape(len(c), -1) for c in X]


class Stroke_Augment(BaseEstimator, TransformerMixin):
    """Append a per-stroke counter channel (reference transformers.py:127)."""

    def fit(self, X, y=None):
        return self

    def transform_instance(self, X):
        strokes = _strokes_to_arrays(X)
        lens = [len(c) for c in strokes]
        counter = np.repeat(np.arange(len(strokes), dtype=float), lens)
        return np.column_stack([np.concatenate(strokes, axis=0), counter])

    def transform(self, X, Y=None):
        return [self.transform_instance(x) for x in X]


class Ink_Augment(BaseEstimator, TransformerMixin):
    """Append a cumulative ink channel (reference transformers.py:145).

    The ink counter advances with every point drawn within a stroke and
    holds still while the pen travels between strokes, so stroke ``k`` spans
    ink values ``[sum_{j<k}(len_j - 1), sum_{j<=k}(len_j - 1)]``.

    Divergence from the reference: the counter is positional. The reference
    compares each row *by value* against the stroke's last row
    (``if d != c[-1]``), which freezes the counter at any interior point
    that happens to coincide with the stroke's endpoint.
    """

    def fit(self, X, y=None):
        return self

    def transform_instance(self, X):
        strokes = _strokes_to_arrays(X)
        lens = np.array([len(c) for c in strokes])
        bases = np.concatenate([[0], np.cumsum(lens - 1)[:-1]])
        ink = np.concatenate(
            [b + np.arange(n, dtype=float) for b, n in zip(bases, lens)])
        return np.column_stack([np.concatenate(strokes, axis=0), ink])

    def transform(self, X, Y=None):
        return [self.transform_instance(x) for x in X]


class Pen_Augment(BaseEstimator, TransformerMixin):
    """Pen up/down markers around strokes (reference transformers.py:165).

    Each stroke is bracketed by copies of its first/last point flagged 1
    (pen in the air), with the stroke body flagged 0; the leading and
    trailing marker of the whole character are trimmed.
    """

    def fit(self, X, y=None):
        return self

    def transform_instance(self, X):
        parts = []
        for c in _strokes_to_arrays(X):
            body = np.column_stack([c, np.zeros(len(c))])
            down = np.append(c[0], 1.0)[None, :]
            up = np.append(c[-1], 1.0)[None, :]
            parts.append(np.concatenate([down, body, up], axis=0))
        return np.concatenate(parts, axis=0)[1:-1]

    def transform(self, X, Y=None):
        return [self.transform_instance(x) for x in X]


# =============================================================================
# Brownian motion simulation (reference transformers.py:188-195)
# =============================================================================

def white(steps, width, time=1.0, rng=None):
    """White-noise increments with per-step variance ``time / steps``; pass
    ``rng`` (np.random.Generator) for reproducibility."""
    gen = np.random.default_rng() if rng is None else rng
    return math.sqrt(time / steps) * gen.standard_normal((steps, width))


def brownian(steps, width, time=1.0, rng=None):
    """Brownian path of shape ``(steps + 1, width)`` started at 0."""
    walk = np.cumsum(white(steps, width, time, rng), axis=0)
    return np.concatenate([np.zeros((1, width)), walk], axis=0)


# =============================================================================
# Truncated signature kernel (Kiraly-Oberhauser low-rank algorithm;
# reference transformers.py:201-236)
# =============================================================================

def _strict_past(A, axis):
    """Exclusive (strictly-earlier) cumulative sum along ``axis``."""
    c = np.cumsum(A, axis=axis)
    out = np.zeros_like(c)
    src = [slice(None)] * c.ndim
    dst = [slice(None)] * c.ndim
    src[axis] = slice(0, -1)
    dst[axis] = slice(1, None)
    out[tuple(dst)] = c[tuple(src)]
    return out


def truncated_sig_kernel(X, Y, num_levels, sigma=1.0, order=-1):
    """Truncated signature kernel matrix of two batches of sequences.

    ``X``: ``(num_seq_X, len_X, feat)``, ``Y``: ``(num_seq_Y, len_Y, feat)``.
    ``num_levels`` signature levels; ``sigma`` scalar or per-level weights;
    ``order`` the Kiraly-Oberhauser approximation order (``-1`` = full).
    Returns ``(num_seq_X, num_seq_Y)``.

    Formulation: a level recursion over partial-sum states ``R[a, b]``,
    where state ``(a, b)`` collects the contraction terms whose current
    sequence indices are repeated ``a + 1`` (resp. ``b + 1``) times -- the
    low-rank decomposition of Kiraly & Oberhauser (arXiv:1601.08169, Alg. 5;
    reference transformers.py:201-236). Each level either opens a fresh
    index pair strictly in the past of the current one (``(0, 0)``, a
    strict-past scan over both length axes), extends one repeated index
    (``(0, j)`` / ``(j, 0)``, one strict-past scan and a ``1/(j+1)``
    multiplicity weight), or extends both (``(i, j)``, pointwise). States
    are kept in a dict keyed by multiplicity, batch axes leading
    (``nx, ny, lx, ly``) so the scans run over the minor axes.
    """
    X = np.asarray(X)
    Y = np.asarray(Y)
    depth = num_levels if order < 1 else min(order, num_levels)
    weights = np.asarray(sigma, dtype=X.dtype) * np.ones(num_levels + 1,
                                                         dtype=X.dtype)

    M = np.einsum("apk,bqk->abpq", X, Y)  # <x_p, y_q> per sequence pair
    K = weights[0] + weights[1] * M.sum(axis=(2, 3))

    R = {(0, 0): M}
    for m in range(1, num_levels):
        d = min(m + 1, depth)
        d_prev = min(m, depth)
        nxt = {}
        opened = _strict_past(_strict_past(sum(R.values()), 2), 3)
        nxt[0, 0] = M * opened
        for j in range(1, d):
            col = sum(R[a, j - 1] for a in range(d_prev))
            nxt[0, j] = (M / (j + 1)) * _strict_past(col, 2)
            row = sum(R[j - 1, b] for b in range(d_prev))
            nxt[j, 0] = (M / (j + 1)) * _strict_past(row, 3)
        for i in range(1, d):
            for j in range(1, d):
                nxt[i, j] = (M / ((i + 1) * (j + 1))) * R[i - 1, j - 1]
        R = nxt
        K = K + weights[m + 1] * sum(S.sum(axis=(2, 3)) for S in R.values())
    return K
