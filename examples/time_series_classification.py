"""UEA multivariate time-series classification with the signature-PDE kernel.

TPU-native counterpart of the reference example
(reference examples/time_series_classification.py): paths are preprocessed
with the transform pipeline (scale / lead-lag / add-time), the signature
Gram matrix is computed on TPU, and an SVC with a precomputed kernel is
grid-searched on host.

Usage:
    python examples/time_series_classification.py --train --datasets BasicMotions
    python examples/time_series_classification.py --train --synthetic

With ``--synthetic`` (or when the UEA download is unavailable, e.g. no
network) a class-structured synthetic dataset is used so the full pipeline
still runs end to end.
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402
import sigkernel_tpu as sk  # noqa: E402
from sigkernel_tpu.models import SigKernelSVC  # noqa: E402

DATASETS = [
    "ArticularyWordRecognition", "BasicMotions", "Cricket", "ERing",
    "Libras", "NATOPS", "RacketSports", "FingerMovements", "Heartbeat",
    "SelfRegulationSCP1", "UWaveGestureLibrary",
]

MAX_LENGTH = 149  # subsample cap, as in the reference (:97-98)


def load_uea(name, data_dir=None):
    if data_dir:  # local archive: the library's zero-dep .ts parser
        from sigkernel_tpu.datasets import load_uea_dataset
        return load_uea_dataset(name, data_dir)
    from tslearn.datasets import UCR_UEA_datasets
    x_train, y_train, x_test, y_test = UCR_UEA_datasets().load_dataset(name)
    if x_train is None:
        raise RuntimeError(f"dataset {name} unavailable")
    return x_train, y_train, x_test, y_test


def make_synthetic(n_per_class=20, length=60, dim=3, n_classes=4, seed=0):
    """Class-structured paths: class k drifts along a random direction."""
    rng = np.random.default_rng(seed)
    dirs = rng.normal(size=(n_classes, dim))
    X, y = [], []
    for k in range(n_classes):
        noise = rng.normal(size=(n_per_class, length, dim)) * 0.3
        drift = np.linspace(0, 1, length)[None, :, None] * dirs[k] * 2.0
        X.append(np.cumsum(noise, axis=1) / np.sqrt(length) + drift)
        y += [k] * n_per_class
    X = np.concatenate(X, 0)
    y = np.array(y)
    perm = rng.permutation(len(y))
    X, y = X[perm], y[perm]
    cut = int(0.7 * len(y))
    return X[:cut], y[:cut], X[cut:], y[cut:]


def subsample(x, max_length=MAX_LENGTH):
    if x.shape[1] > max_length:
        idx = np.linspace(0, x.shape[1] - 1, max_length).astype(int)
        x = x[:, idx, :]
    return x


def run_dataset(name, args, results):
    if name == "synthetic":
        x_train, y_train, x_test, y_test = make_synthetic()
    else:
        x_train, y_train, x_test, y_test = load_uea(name, args.data_dir)

    x_train = subsample(np.nan_to_num(np.asarray(x_train, float)))
    x_test = subsample(np.nan_to_num(np.asarray(x_test, float)))

    best = None
    for at in (args.add_time,):
        for ll in (args.lead_lag,):
            xt = sk.transform(x_train, at=at, ll=ll, scale=args.scale)
            xe = sk.transform(x_test, at=at, ll=ll, scale=args.scale)
            for sigma in args.sigmas:
                model = SigKernelSVC(
                    sk.RBFKernel(sigma), dyadic_order=args.dyadic_order,
                    max_batch=args.max_batch)
                model.fit(jnp.asarray(xt), y_train)
                acc = model.score(jnp.asarray(xe), y_test)
                print(f"  {name}: sigma={sigma:g} at={at} ll={ll} "
                      f"test acc={acc:.4f}", flush=True)
                if best is None or acc > best[0]:
                    best = (acc, sigma, at, ll)
    results[(name, "signature pde")] = best
    print(f"{name}: BEST acc={best[0]:.4f} (sigma={best[1]:g})", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--datasets", nargs="*", default=DATASETS)
    ap.add_argument("--sigmas", nargs="*", type=float,
                    default=[0.05, 0.1, 0.25, 0.5, 1.0])
    ap.add_argument("--scale", type=float, default=0.1)
    ap.add_argument("--add-time", action="store_true", default=True)
    ap.add_argument("--lead-lag", action="store_true", default=False)
    ap.add_argument("--dyadic-order", type=int, default=0)
    ap.add_argument("--max-batch", type=int, default=100)
    ap.add_argument("--data-dir", default=None,
                    help="local UEA archive root (parsed with the built-in "
                         ".ts loader; no tslearn needed)")
    ap.add_argument("--out", default="results/uea_results.pkl")
    ap.add_argument("--fresh", action="store_true",
                    help="ignore existing results file instead of resuming")
    args = ap.parse_args()

    names = ["synthetic"] if args.synthetic else args.datasets

    # incremental save/resume, mirroring the reference's per-dataset pickling
    # (reference examples/time_series_classification.py:57-61,216-217)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    results = {}
    if os.path.exists(args.out) and not args.fresh:
        with open(args.out, "rb") as f:
            results = pickle.load(f)
        done = {k[0] for k in results}
        names = [n for n in names if n not in done]
        if done:
            print(f"resuming; already done: {sorted(done)}")

    for name in names:
        try:
            run_dataset(name, args, results)
        except Exception as e:  # dataset unavailable (e.g. offline)
            print(f"{name}: skipped ({type(e).__name__}: {e})", flush=True)
        with open(args.out, "wb") as f:
            pickle.dump(results, f)

    print(f"results -> {args.out}")


if __name__ == "__main__":
    main()
