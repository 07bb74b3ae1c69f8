"""Stream-free df64-grade gen adjoint (the honest-default backward).

Interpret mode on CPU (SIGKERNEL_TEST_TPU=1 compiles to Mosaic). The DF
product/collapse adjoint must match the exact f64 grid-route adjoint to
the gen-tier error model (see ``pallas_df64._df_scheme_gen``), and the
``_df_hybrid`` custom_vjp must produce the same gradients through the
gen_df route as through the recompute chain it replaces.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import sigkernel_tpu as sk
from sigkernel_tpu import RBFKernel
from sigkernel_tpu import sigkernel as sk_mod
from sigkernel_tpu.ops import pallas_adjoint, pallas_df64
from sigkernel_tpu.ops.solve import _grid_route_bwd
from sigkernel_tpu.utils import double_difference

ON_TPU = bool(os.environ.get("SIGKERNEL_TEST_TPU"))


@pytest.fixture(autouse=True)
def _interpret_mode():
    if ON_TPU:
        yield
    else:
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            yield


def _paths(rng, B, L, scale=0.1):
    return jnp.asarray(rng.normal(size=(B, L, 3)).cumsum(1) * scale)


def _model_atol(inc, dyadic, ref):
    """Gen-tier error model through BOTH sweeps and the DF product: the
    hi-only u^2/12 chain perturbs each of the two solves by
    <= 3 * u^2 * 2^-23 per update (u = refined increment), entering the
    cotangent product linearly; 8x headroom + the pre-existing gen noise
    floor (~1e-10 of the cotangent scale)."""
    f = 2 ** dyadic
    Mb, Nb = inc.shape[-2], inc.shape[-1]
    n_steps = (Mb + Nb) * f - 1
    u = np.abs(np.asarray(inc)).max() / (f * f)
    sc = np.abs(np.asarray(ref)).max()
    return 8.0 * n_steps * 3.0 * u * u * 2.0 ** -23 * max(sc, 1.0) \
        + 1e-10 * sc


@pytest.mark.parametrize("dims,dyadic", [((3, 8, 8), 1), ((2, 9, 6), 1),
                                         ((1, 6, 9), 2)])
def test_gen_df_adjoint_matches_exact_f64(rng, dims, dyadic):
    """DF gen adjoint cotangent vs the exact f64 scan-tier adjoint."""
    B, M, N = dims
    sigma = 0.9
    X = _paths(rng, B, M)
    Y = _paths(rng, B, N)
    cth, ctl = pallas_adjoint.adjoint_planes_gen_df(X, Y, sigma, False,
                                                    dyadic)
    ct = np.asarray(cth.astype(jnp.float64) + ctl.astype(jnp.float64))

    inc = double_difference(RBFKernel(sigma).batch_kernel(X, Y))
    (want,) = _grid_route_bwd(inc, jnp.ones((B,), jnp.float64), False,
                              "scan", dyadic)
    want = np.asarray(want)
    np.testing.assert_allclose(ct, want, rtol=0,
                               atol=_model_atol(inc, dyadic, want))
    # the DF pair must beat a pure-f32 representation of the cotangent by
    # orders of magnitude (else the lo plane is dead weight)
    err_df = np.abs(ct - want).max()
    err_f32 = np.abs(want.astype(np.float32).astype(np.float64)
                     - want).max()
    assert err_df < err_f32 * 1e-2


@pytest.mark.parametrize("gram", [True, False])
def test_df_hybrid_gen_df_route_matches_chain(rng, gram):
    """The full ``_df_hybrid`` backward through the gen_df route vs the
    recompute chain it replaces (identical gradient contract)."""
    from sigkernel_tpu.ops import routes

    dyadic = 1
    A, B, M, N = (2, 3, 9, 9) if gram else (3, 1, 8, 8)
    X = _paths(rng, A, M)
    Y = _paths(rng, B if gram else A, N)
    w = jnp.asarray(rng.normal(size=((A, B) if gram else (A,))))
    sig0 = jnp.asarray(0.8, jnp.float64)

    def loss(sig, x, y):
        v = sk_mod._df_hybrid(RBFKernel(sigma=sig), x, y, gram, False,
                              dyadic)
        return (v * w).sum()

    def grad_via(route):
        # patch must wrap the WHOLE grad call: the custom_vjp backward
        # (where the route is resolved) runs after the primal returns
        orig = routes.resolve_hybrid_bwd
        routes.resolve_hybrid_bwd = lambda *a: route
        try:
            return jax.grad(loss, argnums=(0, 1, 2))(sig0, X, Y)
        finally:
            routes.resolve_hybrid_bwd = orig

    # forward values identical by construction (same primal); compare
    # the two backward routes' gradients
    g_gen = grad_via("gen_df")
    g_chain = grad_via("chain")
    hi0, _ = sk_mod._df_increments(RBFKernel(sigma=sig0), X, Y, gram)
    for a, b, name in zip(g_gen, g_chain, ("sigma", "X", "Y")):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=0, atol=_model_atol(np.asarray(hi0), dyadic, b),
            err_msg=f"grad wrt {name}")


def test_df_hybrid_gen_df_route_fd_check(rng):
    """Finite-difference sanity check of the gen_df-route gradient.

    The hybrid family's gradient -- like the reference's
    (sigkernel.py:419-502) and every solve adjoint here -- is the
    variation-of-parameters CONTINUOUS adjoint ``K * K_rev`` evaluated on
    the discrete solution, which differs from the exact derivative of the
    discrete loss by O(max base increment) (measured ratio ~3x; it is NOT
    a precision artefact -- the pure-f64 chain route shows the identical
    gap). The FD check therefore asserts at ``5 * max|u|`` relative: it
    catches wiring errors (scaling, transposition, dropped terms), not
    the last digits, which ``test_gen_df_adjoint_matches_exact_f64`` pins
    against the same-contract exact-f64 adjoint instead."""
    from sigkernel_tpu.ops import routes

    dyadic = 1
    X = _paths(rng, 2, 8)
    Y = _paths(rng, 2, 8)
    w = jnp.asarray(rng.normal(size=(2,)))

    def loss(x):
        v = sk_mod._df_hybrid(RBFKernel(sigma=0.9), x, Y, False, False,
                              dyadic)
        return (v * w).sum()

    orig = routes.resolve_hybrid_bwd
    routes.resolve_hybrid_bwd = lambda *a: "gen_df"
    try:
        g = np.asarray(jax.grad(loss)(X))
    finally:
        routes.resolve_hybrid_bwd = orig
    hi0, _ = sk_mod._df_increments(RBFKernel(sigma=0.9), X, Y, False)
    tol = 5.0 * float(np.abs(np.asarray(hi0)).max())
    eps = 1e-5
    rng2 = np.random.default_rng(7)
    for _ in range(4):
        d = jnp.asarray(rng2.normal(size=X.shape))
        fd = (float(loss(X + eps * d)) - float(loss(X - eps * d))) \
            / (2 * eps)
        an = float((g * np.asarray(d)).sum())
        np.testing.assert_allclose(an, fd, rtol=tol)


def test_gen_df_lo_stack_forward_value_unchanged(rng):
    """lo_stack emission must not perturb the forward value or hi stack."""
    dyadic = 1
    X = _paths(rng, 2, 8)
    Y = _paths(rng, 2, 8)
    pad = pallas_adjoint._pad_f_gen(2 ** dyadic)
    v0, stk0 = pallas_df64._solve_final_one_df_gen(
        X, Y, 0.9, False, dyadic, stack_pad=pad)
    v1, stk1, stkl = pallas_df64._solve_final_one_df_gen(
        X, Y, 0.9, False, dyadic, stack_pad=pad, lo_stack=True)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    f = 2 ** dyadic
    n_steps = 7 * f + 7 * f - 1
    a = np.asarray(stk0)[pad:pad + n_steps]
    b = np.asarray(stk1)[pad:pad + n_steps]
    np.testing.assert_array_equal(a, b)
    assert np.all(np.isfinite(np.asarray(stkl)[pad:pad + n_steps]))


def test_gen_df_chunked_matches_single(rng, monkeypatch):
    """Multi-chunk lax.map path of adjoint_planes_gen_df (chunk smaller
    than the batch) must equal the single-chunk result."""
    import sigkernel_tpu.ops.pallas_adjoint as pa

    dyadic = 1
    X = _paths(rng, 5, 7)
    Y = _paths(rng, 5, 7)
    cth1, ctl1 = pa.adjoint_planes_gen_df(X, Y, 1.1, False, dyadic)
    monkeypatch.setattr(pa, "shared_chunk", lambda MM, NN: 2)
    cth2, ctl2 = pa.adjoint_planes_gen_df(X, Y, 1.1, False, dyadic)
    np.testing.assert_array_equal(np.asarray(cth1), np.asarray(cth2))
    np.testing.assert_array_equal(np.asarray(ctl1), np.asarray(ctl2))
