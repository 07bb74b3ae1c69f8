"""Matched-precision (f32) in-kernel-generation kernels vs oracles.

Interpret mode on CPU (SIGKERNEL_TEST_TPU=1 compiles to Mosaic). The gen32
forward must match the f64 scan tier to f32 tolerance; the gen32 adjoint
must match the scan-tier adjoint gradient; the full custom_vjp must route
and differentiate through paths and sigma.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import sigkernel_tpu as sk
from sigkernel_tpu.ops import pallas_gen32, pallas_adjoint, scan_solver
from sigkernel_tpu.ops import solve as solve_mod
from sigkernel_tpu.utils import dyadic_refine, double_difference

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


def _inc32(x, y, sigma):
    k = sk.RBFKernel(sigma)
    return double_difference(k.batch_kernel(x, y)).astype(jnp.float32)


@pytest.mark.parametrize("dims,dyadic", [((3, 8, 8), 1), ((2, 9, 6), 1),
                                         ((1, 6, 9), 2), ((4, 7, 7), 2)])
def test_gen32_forward_matches_scan(rng, dims, dyadic):
    B, M, N = dims
    sigma = 0.9
    X = jnp.asarray(make_paths(rng, B, M, 3, scale=0.5), jnp.float32)
    Y = jnp.asarray(make_paths(rng, B, N, 3, scale=0.5), jnp.float32)
    got = np.asarray(pallas_gen32.solve_final_f32_gen(X, Y, sigma,
                                                      dyadic_order=dyadic))
    inc = double_difference(sk.RBFKernel(sigma).batch_kernel(
        X.astype(jnp.float64), Y.astype(jnp.float64)))
    want = np.asarray(scan_solver.solve_final(dyadic_refine(inc, dyadic)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("dims,dyadic", [((3, 8, 8), 1), ((2, 6, 9), 2)])
def test_gen32_stack_values_match_plain(rng, dims, dyadic):
    B, M, N = dims
    sigma = 1.1
    X = jnp.asarray(make_paths(rng, B, M, 2, scale=0.5), jnp.float32)
    Y = jnp.asarray(make_paths(rng, B, N, 2, scale=0.5), jnp.float32)
    plain = np.asarray(pallas_gen32.solve_final_f32_gen(X, Y, sigma,
                                                        dyadic_order=dyadic))
    v_stk, stk = pallas_gen32.solve_final_f32_gen_stack(
        X, Y, sigma, dyadic_order=dyadic,
        stack_pad=pallas_adjoint._pad_f_gen(2 ** dyadic))
    np.testing.assert_array_equal(np.asarray(v_stk), plain)
    # only entries [pad, pad + n_steps) are written (pad slots are
    # uninitialised HBM and never read by the adjoint)
    f = 2 ** dyadic
    pad = pallas_adjoint._pad_f_gen(f)
    n_steps = (M - 1) * f + (N - 1) * f - 1
    written = np.asarray(stk)[:, pad:pad + n_steps]
    assert np.all(np.isfinite(written))


@pytest.mark.parametrize("dims,dyadic", [((3, 8, 8), 1), ((2, 9, 6), 1),
                                         ((1, 6, 9), 2)])
def test_gen32_adjoint_matches_scan_adjoint(rng, dims, dyadic):
    """gen32 cotangent vs the exact scan-tier adjoint of the SAME f32
    increments (isolates the kernel from f32 increment-prep noise)."""
    B, M, N = dims
    sigma = 0.9
    X = jnp.asarray(make_paths(rng, B, M, 3, scale=0.5), jnp.float32)
    Y = jnp.asarray(make_paths(rng, B, N, 3, scale=0.5), jnp.float32)
    g = jnp.asarray(rng.normal(size=(B,)), jnp.float32)

    _, stk = pallas_gen32.solve_final_f32_gen_stack(
        X, Y, sigma, dyadic_order=dyadic,
        stack_pad=pallas_adjoint._pad_f_gen(2 ** dyadic))
    got = np.asarray(pallas_adjoint.adjoint_planes_collapsed_gen32(
        X, Y, sigma, g, False, dyadic, fwd_stack=stk))

    inc64 = double_difference(sk.RBFKernel(sigma).batch_kernel(
        X.astype(jnp.float64), Y.astype(jnp.float64)))
    (want,) = solve_mod._grid_route_bwd(inc64, g.astype(jnp.float64),
                                        False, "scan", dyadic)
    want = np.asarray(want)
    scale = max(np.abs(want).max(), 1e-30)
    np.testing.assert_allclose(got, want, atol=3e-5 * scale, rtol=0)


def test_gen32_custom_vjp_end_to_end(rng, monkeypatch):
    """Force the gen32 family through sig_kernel and check value + grads
    (paths AND sigma) against the scan tier."""
    import sigkernel_tpu.sigkernel as K

    B, M, N, dyadic = 3, 8, 8, 1
    sigma = 0.9
    X = jnp.asarray(make_paths(rng, B, M, 2, scale=0.5), jnp.float32)
    Y = jnp.asarray(make_paths(rng, B, N, 2, scale=0.5), jnp.float32)
    monkeypatch.setattr(K, "_gen32_route", lambda *a, **kw: True)

    k = sk.RBFKernel(sigma)

    def loss(kern, x):
        return sk.sig_kernel(kern, x, Y, dyadic_order=dyadic,
                             max_batch=None).sum()

    v, (gk, gx) = jax.value_and_grad(loss, argnums=(0, 1))(k, X)

    def loss_scan(kern, x):
        return sk.sig_kernel(kern, x.astype(jnp.float64),
                             Y.astype(jnp.float64), dyadic_order=dyadic,
                             solver="scan", max_batch=None).sum()

    v0, (gk0, gx0) = jax.value_and_grad(loss_scan, argnums=(0, 1))(
        k, X.astype(jnp.float64))
    np.testing.assert_allclose(float(v), float(v0), rtol=2e-5)
    scale = max(np.abs(np.asarray(gx0)).max(), 1e-30)
    np.testing.assert_allclose(np.asarray(gx, np.float64), np.asarray(gx0),
                               atol=1e-4 * scale, rtol=0)
    s_leaves = jax.tree.leaves(gk)
    s0_leaves = jax.tree.leaves(gk0)
    np.testing.assert_allclose(np.asarray(s_leaves, np.float64),
                               np.asarray(s0_leaves), rtol=2e-3)


def test_gen32_family_resolution(rng, monkeypatch):
    """f32 + RBF + gen geometry resolves to 'gen32'; f64 stays on 'gen'
    (via df); dyadic 0 falls back to 'fused'."""
    import sigkernel_tpu.sigkernel as K
    from sigkernel_tpu.ops.routes import resolve_family

    X = jnp.asarray(make_paths(rng, 2, 8, 2), jnp.float32)
    k = sk.RBFKernel(1.0)
    monkeypatch.setattr(K, "_gen_route", lambda *a, **kw: True)
    monkeypatch.setattr(K, "_gen_adjoint_on", lambda: True)
    assert resolve_family(k, X, X, "auto", "auto", 1, gram=False) == "gen32"
    assert resolve_family(k, X.astype(jnp.float64), X.astype(jnp.float64),
                          "auto", "auto", 1, gram=False) != "gen32"
    # explicit df64 gradients opt out of the f32 route
    assert resolve_family(k, X, X, "auto", "df64", 1, gram=False) != "gen32"


@pytest.mark.parametrize("dims,dyadic", [((3, 8, 8), 1), ((2, 9, 6), 2)])
def test_gen32_regen_matches_df_regen(rng, dims, dyadic):
    """The f64 gen route's backward with f32 reverse-stream regeneration
    vs DF regeneration: same f32 sweep, generation differs only by f32
    rounding of the increments -> cotangents agree to f32 class."""
    from sigkernel_tpu.ops import pallas_df64

    B, M, N = dims
    sigma = 0.9
    Xp = jnp.asarray(make_paths(rng, B, M, 3, scale=0.5))
    Yp = jnp.asarray(make_paths(rng, B, N, 3, scale=0.5))
    g = jnp.asarray(rng.normal(size=(B,)), jnp.float32)
    _, stk = pallas_df64.solve_final_df_gen_stack(
        Xp, Yp, sigma, False, dyadic,
        stack_pad=pallas_adjoint._pad_f_gen(2 ** dyadic), emit_inc=False)
    want = np.asarray(pallas_adjoint.adjoint_planes_collapsed_gen(
        Xp, Yp, sigma, g, False, dyadic, fwd_stack=stk))
    got = np.asarray(pallas_adjoint.adjoint_planes_collapsed_gen32(
        Xp, Yp, sigma, g, False, dyadic, fwd_stack=stk))
    scale = max(np.abs(want).max(), 1e-30)
    np.testing.assert_allclose(got, want, atol=5e-6 * scale, rtol=0)
