"""Fused Pallas triple-derivatives wavefront vs the scan oracle
(interpret on CPU)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

import sigkernel_tpu as sk
from sigkernel_tpu.ops import scan_solver, pallas_derivatives

from conftest import make_paths

ON_TPU = bool(os.environ.get("SIGKERNEL_TEST_TPU"))


@pytest.fixture(autouse=True)
def _interpret_mode():
    if ON_TPU:
        yield
    else:
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            yield


@pytest.mark.parametrize("shape", [(3, 7, 7), (2, 5, 9), (2, 9, 5)])
def test_triple_matches_scan(rng, shape):
    B, M, N = shape
    u = jnp.asarray(rng.normal(size=shape) * 0.1, jnp.float32)
    ud = jnp.asarray(rng.normal(size=shape) * 0.1, jnp.float32)
    us = jnp.asarray(rng.normal(size=shape) * 0.1, jnp.float32)
    want = scan_solver.solve_derivatives_final(
        u.astype(jnp.float64), ud.astype(jnp.float64),
        us.astype(jnp.float64))
    got = pallas_derivatives.solve_derivatives_final(u, ud, us)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=3e-5, atol=3e-6)


def test_triple_gram_batch_shape(rng):
    """(bx, by) Gram-shaped batches flatten and restore correctly."""
    u = jnp.asarray(rng.normal(size=(2, 3, 6, 6)) * 0.1, jnp.float32)
    ud = jnp.asarray(rng.normal(size=(2, 3, 6, 6)) * 0.1, jnp.float32)
    us = jnp.asarray(rng.normal(size=(2, 3, 6, 6)) * 0.1, jnp.float32)
    got = pallas_derivatives.solve_derivatives_final(u, ud, us)
    want = scan_solver.solve_derivatives_final(u, ud, us)
    for g, w in zip(got, want):
        assert g.shape == (2, 3)
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=3e-5, atol=3e-6)


def test_estimator_routes_pallas_derivatives(rng, monkeypatch):
    """sig_kernel_and_derivatives_gram(solver='pallas') runs the Mosaic tier
    (platform check stubbed; interpret mode executes it on CPU)."""

    class _Dev:
        platform = "tpu"

    import jax as _jax
    monkeypatch.setattr(pallas_derivatives.jax, "devices",
                        lambda *a: [_Dev()])
    X = jnp.asarray(make_paths(rng, 2, 8, 2), jnp.float32)
    Y = jnp.asarray(make_paths(rng, 3, 8, 2), jnp.float32)
    gamma = 0.1 * X
    kernel = sk.RBFKernel(1.0)
    got = sk.sig_kernel_and_derivatives_gram(kernel, X, Y, gamma,
                                             dyadic_order=1, solver="pallas")
    want = sk.sig_kernel_and_derivatives_gram(
        kernel, X.astype(jnp.float64), Y.astype(jnp.float64),
        gamma.astype(jnp.float64), dyadic_order=1, solver="scan")
    for g, w in zip(got, want):
        assert g.shape == (2, 3)
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-5)


def test_estimator_pallas_derivatives_unavailable_raises(rng):
    """Off-TPU, solver='pallas' fails loudly instead of silently running
    the scan tier (round-1 advisor finding)."""
    X = jnp.asarray(make_paths(rng, 2, 6, 2))
    with pytest.raises(ValueError, match="pallas"):
        sk.sig_kernel_and_derivatives_gram(sk.RBFKernel(1.0), X, X, 0.1 * X,
                                           solver="pallas")


@pytest.mark.parametrize("dyadic_order", [1, 2])
@pytest.mark.parametrize("shape", [(2, 6, 5), (1, 9, 7)])
def test_triple_base_stream_refinement(rng, shape, dyadic_order):
    """In-kernel refinement of the triple solve == scan on refined grids."""
    from sigkernel_tpu.ops import pallas_derivatives, scan_solver
    from sigkernel_tpu.utils import dyadic_refine

    B = shape[0]
    u = jnp.asarray(rng.normal(size=shape) * 0.1, jnp.float32)
    ud = jnp.asarray(rng.normal(size=shape) * 0.1, jnp.float32)
    us = jnp.asarray(rng.normal(size=shape) * 0.1, jnp.float32)
    got = pallas_derivatives.solve_derivatives_final(
        u, ud, us, dyadic_order=dyadic_order)
    want = scan_solver.solve_derivatives_final(
        dyadic_refine(u, dyadic_order), dyadic_refine(ud, dyadic_order),
        dyadic_refine(us, dyadic_order))
    for g_, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g_), np.asarray(w_),
                                   rtol=3e-5, atol=3e-6)


def test_derivatives_windowed_bitexact(rng, monkeypatch):
    """Lane-windowed triple wavefront == full sweep, bit for bit."""
    import sigkernel_tpu.ops.pallas_solver as ps
    from sigkernel_tpu.ops import pallas_derivatives as pd

    B, Mb, Nb = 4, 85, 85
    u = jnp.asarray(rng.normal(size=(B, Mb, Nb)) * 0.1, jnp.float32)
    ud = jnp.asarray(rng.normal(size=(B, Mb, Nb)) * 0.1, jnp.float32)
    us = jnp.asarray(rng.normal(size=(B, Mb, Nb)) * 0.1, jnp.float32)

    monkeypatch.setattr(ps, "WINDOW_SEG", 0)
    full = [np.asarray(x) for x in pd._solve_one((u, ud, us), 1)]
    monkeypatch.setattr(ps, "WINDOW_SEG", 32)
    win = [np.asarray(x) for x in pd._solve_one((u, ud, us), 1)]
    for w, f_ in zip(win, full):
        np.testing.assert_array_equal(w, f_)


@pytest.mark.parametrize("dyadic", [0, 1, 2])
def test_df_derivatives_match_scan_f64(rng, dyadic):
    """f64-grade double-float triple wavefront vs the f64 scan oracle:
    must agree to f64 grade (~1e-12), not f32 (~1e-6)."""
    from sigkernel_tpu.utils import dyadic_refine

    B, Mb, Nb = 3, 7, 9
    u = jnp.asarray(rng.normal(size=(B, Mb, Nb)) * 0.1)
    ud = jnp.asarray(rng.normal(size=(B, Mb, Nb)) * 0.1)
    us = jnp.asarray(rng.normal(size=(B, Mb, Nb)) * 0.1)
    got = pallas_derivatives.solve_derivatives_final_df(
        u, ud, us, dyadic_order=dyadic)
    want = scan_solver.solve_derivatives_final(
        dyadic_refine(u, dyadic), dyadic_refine(ud, dyadic),
        dyadic_refine(us, dyadic))
    for g, w in zip(got, want):
        scale = max(np.abs(np.asarray(w)).max(), 1e-30)
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-11 * scale, rtol=0)
