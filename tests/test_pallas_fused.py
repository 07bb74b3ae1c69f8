"""Fused-increment linear-kernel solve vs the general pipeline."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

import sigkernel_tpu as sk
from sigkernel_tpu.ops import pallas_fused

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


@pytest.mark.parametrize("dyadic_order", [0, 1])
@pytest.mark.parametrize("lx,ly", [(6, 6), (5, 9), (9, 5)])
def test_fused_pairwise_matches_general(rng, dyadic_order, lx, ly):
    X = jnp.asarray(make_paths(rng, 3, lx, 2), jnp.float32)
    Y = jnp.asarray(make_paths(rng, 3, ly, 2), jnp.float32)
    want = np.asarray(sk.sig_kernel(sk.LinearKernel(), X, Y,
                                    dyadic_order=dyadic_order,
                                    solver="scan", max_batch=None))
    got = np.asarray(pallas_fused.solve_final_linear(
        X, Y, dyadic_order=dyadic_order))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_fused_scale_and_naive(rng):
    X = jnp.asarray(make_paths(rng, 2, 7, 3), jnp.float32)
    want = np.asarray(sk.sig_kernel(sk.LinearKernel(scale=0.5), X, X,
                                    naive=True, solver="scan",
                                    max_batch=None))
    got = np.asarray(pallas_fused.solve_final_linear(X, X, scale=0.5,
                                                     naive=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_fused_gram_matches_general(rng):
    X = jnp.asarray(make_paths(rng, 3, 6, 2), jnp.float32)
    Y = jnp.asarray(make_paths(rng, 4, 8, 2), jnp.float32)
    want = np.asarray(sk.sig_gram(sk.LinearKernel(), X, Y, solver="scan",
                                  max_batch=None))
    got = np.asarray(pallas_fused.gram_linear_f32(X, Y))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_fused_chunking(rng, monkeypatch):
    from sigkernel_tpu.ops import pallas_fused as pf
    monkeypatch.setattr(pf, "FUSED_CHUNK", 4)
    X = jnp.asarray(make_paths(rng, 10, 6, 2), jnp.float32)
    want = np.asarray(sk.sig_kernel(sk.LinearKernel(), X, X,
                                    solver="scan", max_batch=None))
    got = np.asarray(pf.solve_final_linear(X, X))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("lx,ly", [(6, 6), (5, 9), (9, 5)])
def test_fused_rbf_matches_general(rng, lx, ly):
    from sigkernel_tpu.ops import pallas_fused as pf
    X = jnp.asarray(make_paths(rng, 3, lx, 2), jnp.float32)
    Y = jnp.asarray(make_paths(rng, 3, ly, 2), jnp.float32)
    want = np.asarray(sk.sig_kernel(sk.RBFKernel(0.5), X, Y,
                                    solver="scan", max_batch=None))
    got = np.asarray(pf.solve_final_rbf(X, Y, sigma=0.5))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_fused_rbf_chunking(rng, monkeypatch):
    from sigkernel_tpu.ops import pallas_fused as pf
    monkeypatch.setattr(pf, "FUSED_CHUNK", 4)
    X = jnp.asarray(make_paths(rng, 9, 7, 3), jnp.float32)
    want = np.asarray(sk.sig_kernel(sk.RBFKernel(1.0), X, X,
                                    solver="scan", max_batch=None))
    got = np.asarray(pf.solve_final_rbf(X, X, sigma=1.0))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_solver_fused_api_route(rng):
    X = jnp.asarray(make_paths(rng, 3, 6, 2), jnp.float32)
    want = np.asarray(sk.sig_kernel(sk.LinearKernel(), X, X, solver="scan",
                                    max_batch=None))
    got = np.asarray(sk.sig_kernel(sk.LinearKernel(), X, X, solver="fused"))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)

    g_want = np.asarray(sk.sig_gram(sk.RBFKernel(0.5), X, X, solver="scan",
                                    max_batch=None))
    g_got = np.asarray(sk.sig_gram(sk.RBFKernel(0.5), X, X, solver="fused"))
    np.testing.assert_allclose(g_got, g_want, rtol=2e-4, atol=2e-5)


def test_solver_fused_rejects_unsupported(rng):
    X = jnp.asarray(make_paths(rng, 2, 5, 2), jnp.float32)
    with pytest.raises(ValueError, match="fused"):
        sk.sig_kernel(sk.RBF_ID_Kernel(0.5), X, X, solver="fused")


def test_fused_rbf_sigma_is_traceable(rng):
    """sigma stays a traced operand: one compiled program serves any sigma
    (previously float(sigma) raised TracerError under jit)."""
    import jax

    X = jnp.asarray(make_paths(rng, 2, 6, 2), jnp.float32)
    Y = jnp.asarray(make_paths(rng, 2, 6, 2), jnp.float32)

    @jax.jit
    def f(sigma):
        return pallas_fused.solve_final_rbf(X, Y, sigma).sum()

    for s in (0.7, 1.3):
        want = float(np.asarray(sk.sig_kernel(
            sk.RBFKernel(s), X, Y, solver="scan", max_batch=None)).sum())
        np.testing.assert_allclose(float(f(jnp.float32(s))), want, rtol=2e-5)


@pytest.mark.parametrize("dyadic_order", [1, 2])
@pytest.mark.parametrize("lx,ly", [(6, 6), (5, 9), (9, 5)])
def test_fused_rbf_dyadic_matches_general(rng, dyadic_order, lx, ly):
    """Stretched-register RBF fusion at dyadic order >= 1."""
    X = jnp.asarray(make_paths(rng, 3, lx, 2), jnp.float32)
    Y = jnp.asarray(make_paths(rng, 3, ly, 2), jnp.float32)
    want = np.asarray(sk.sig_kernel(sk.RBFKernel(0.8), X, Y,
                                    dyadic_order=dyadic_order,
                                    solver="scan", max_batch=None))
    got = np.asarray(sk.sig_kernel(sk.RBFKernel(0.8), X, Y,
                                   dyadic_order=dyadic_order,
                                   solver="fused", max_batch=None))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_fused_rbf_dyadic_f1_matches_dyadic0_kernel(rng):
    """The general-f kernel at f=1 agrees with the rolled-diagonal one."""
    X = jnp.asarray(make_paths(rng, 2, 7, 3), jnp.float32)
    Y = jnp.asarray(make_paths(rng, 2, 8, 3), jnp.float32)
    a = np.asarray(pallas_fused.solve_final_rbf_dyadic(X, Y, 0.7, 0))
    b = np.asarray(pallas_fused.solve_final_rbf(X, Y, 0.7))
    np.testing.assert_allclose(a, b, rtol=2e-5)


def test_fused_is_differentiable(rng):
    """solver='fused' carries a custom_vjp: gradients equal the scan route
    (same adjoint on the same increments, bit-for-bit on CPU)."""
    import jax

    X = jnp.asarray(make_paths(rng, 3, 10, 2), jnp.float32)
    Y = jnp.asarray(make_paths(rng, 3, 13, 2), jnp.float32)
    k = sk.RBFKernel(0.8)

    def loss(solver):
        return lambda x: sk.sig_kernel(k, x, Y, dyadic_order=1,
                                       solver=solver, max_batch=None).sum()

    g_fused = jax.grad(loss("fused"))(X)
    g_scan = jax.grad(loss("scan"))(X)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_scan),
                               rtol=1e-6, atol=1e-8)


def test_fused_sigma_gradient_flows(rng):
    """Traceable hyperparameters get cotangents through the fused route."""
    import jax

    X = jnp.asarray(make_paths(rng, 2, 8, 2), jnp.float32)

    def loss(solver):
        return lambda s: sk.sig_kernel(sk.RBFKernel(s), X, X,
                                       dyadic_order=0, solver=solver,
                                       max_batch=None).sum()

    gs_fused = jax.grad(loss("fused"))(jnp.float32(0.7))
    gs_scan = jax.grad(loss("scan"))(jnp.float32(0.7))
    np.testing.assert_allclose(float(gs_fused), float(gs_scan),
                               rtol=1e-5)


def test_fused_gram_differentiable_and_sym(rng):
    import jax

    X = jnp.asarray(make_paths(rng, 4, 9, 2), jnp.float32)
    k = sk.LinearKernel()
    G = sk.sig_gram(k, X, X, dyadic_order=0, solver="fused", sym=True,
                    max_batch=None)
    assert bool(jnp.allclose(G, G.T))
    g = jax.grad(lambda x: sk.sig_gram(k, x, X, dyadic_order=0,
                                       solver="fused",
                                       max_batch=None).sum())(X)
    gw = jax.grad(lambda x: sk.sig_gram(k, x, X, dyadic_order=0,
                                        solver="scan",
                                        max_batch=None).sum())(X)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gw),
                               rtol=1e-5, atol=1e-7)


def test_fused_auto_probe():
    """The auto-route probe requires a TPU backend and bounded sizes."""
    from sigkernel_tpu.ops import pallas_fused
    from sigkernel_tpu.sigkernel import _fused_auto

    # CPU platform in tests: never auto-routed (explicit 'fused' still works)
    X = jnp.zeros((2, 16, 3), jnp.float32)
    assert not _fused_auto(sk.RBFKernel(1.0), X, X, "auto", "auto", 0)
    assert not pallas_fused.supported(16, 16, 3, 0)
