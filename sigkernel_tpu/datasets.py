"""Zero-dependency loaders for UEA/UCR time-series archives.

The reference example loads UEA datasets through ``tslearn``/``sktime``
(reference examples/time_series_classification.py:16,90); neither is a
library dependency here, so this module parses the archive's native
``.ts`` format directly (header ``@key value`` lines, then ``@data`` with
one case per line: dimensions separated by ``:``, values by ``,``, the
class label last). Variable-length cases are padded by repeating the
final point -- mathematically exact for the signature kernel (zero
increments are no-ops; see ``utils.pad_length``).
"""
from __future__ import annotations

import os

import numpy as np


def load_ts_file(path: str):
    """Parse one sktime-format ``.ts`` file.

    Returns ``(X, y)`` with ``X``: float ``(n_cases, max_length, n_dims)``
    (short cases padded by repeating their final point; ``?`` -> NaN) and
    ``y``: object array of class-label strings (empty if the file has
    ``@classLabel false``).
    """
    cases = []
    labels = []
    has_labels = True
    in_data = False
    with open(path) as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            if not in_data:
                low = line.lower()
                if low.startswith("@classlabel"):
                    has_labels = low.split()[1:2] == ["true"]
                if low.startswith("@data"):
                    in_data = True
                continue
            parts = line.split(":")
            if has_labels:
                labels.append(parts[-1].strip())
                parts = parts[:-1]
            dims = []
            for d in parts:
                vals = [np.nan if v.strip() in ("?", "") else float(v)
                        for v in d.split(",")] if d.strip() else []
                dims.append(np.asarray(vals, dtype=float))
            cases.append(dims)

    if not cases:
        raise ValueError(f"no data section found in {path}")
    n_dims = max(len(c) for c in cases)
    max_len = max((len(d) for c in cases for d in c), default=0)
    X = np.zeros((len(cases), max_len, n_dims), dtype=float)
    for i, dims in enumerate(cases):
        for j in range(n_dims):
            v = dims[j] if j < len(dims) else np.asarray([0.0])
            if len(v) == 0:
                v = np.asarray([0.0])
            X[i, : len(v), j] = v
            X[i, len(v):, j] = v[-1]  # exact padding: zero increments
    return X, np.asarray(labels, dtype=object)


def load_uea_dataset(name: str, data_dir: str):
    """Load ``<data_dir>/<name>/<name>_TRAIN.ts`` and ``..._TEST.ts``.

    Returns ``(x_train, y_train, x_test, y_test)`` in the same layout the
    reference's tslearn loader produces.
    """
    base = os.path.join(data_dir, name)
    train = os.path.join(base, f"{name}_TRAIN.ts")
    test = os.path.join(base, f"{name}_TEST.ts")
    for p in (train, test):
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"{p} not found -- download the UEA archive "
                "(timeseriesclassification.com) and point --data-dir at it")
    x_train, y_train = load_ts_file(train)
    x_test, y_test = load_ts_file(test)
    return x_train, y_train, x_test, y_test
