"""Blocked (row-stripe) solver vs the scan oracle (interpret on CPU).

The VMEM row bound is monkeypatched down so multi-stripe paths exercise at
test sizes; on hardware the same code runs with MAX_ROWS = 8192.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sigkernel_tpu.ops import scan_solver, pallas_blocked

from conftest import make_paths  # noqa: F401  (fixture plumbing)

ON_TPU = bool(os.environ.get("SIGKERNEL_TEST_TPU"))


@pytest.fixture(autouse=True)
def _interpret_mode():
    if ON_TPU:
        yield
    else:
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            yield


@pytest.fixture
def small_rows(monkeypatch):
    """Force multi-stripe execution at test sizes."""
    monkeypatch.setattr(pallas_blocked, "MAX_ROWS", 16)
    return 16


@pytest.mark.parametrize("naive", [False, True])
@pytest.mark.parametrize("shape", [(2, 40, 37), (1, 33, 50), (3, 45, 45)])
def test_blocked_matches_scan(rng, small_rows, naive, shape):
    inc = jnp.asarray(rng.normal(size=shape) * 0.05, jnp.float32)
    want = np.asarray(scan_solver.solve_final(inc, naive=naive))
    got = np.asarray(pallas_blocked.solve_final(inc, naive=naive))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=1e-6)


def test_blocked_dyadic_refine_stripes(rng, small_rows):
    """Stripe boundaries stay aligned to the refinement factor."""
    inc = jnp.asarray(rng.normal(size=(2, 20, 18)) * 0.05, jnp.float32)
    want = np.asarray(scan_solver.solve_final(
        jnp.asarray(np.asarray(inc), jnp.float64), naive=False))
    # dyadic_order=1: refined 40 x 36, stripes of 14 (=MAX_ROWS-1 rounded
    # down to a multiple of 2)
    from sigkernel_tpu.utils import dyadic_refine
    want = np.asarray(scan_solver.solve_final(
        dyadic_refine(inc.astype(jnp.float64), 1)))
    got = np.asarray(pallas_blocked.solve_final(inc, dyadic_order=1))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=1e-6)


def test_blocked_single_stripe_degenerates(rng, small_rows):
    """Grids fitting one stripe still go through the boundary-stream path."""
    inc = jnp.asarray(rng.normal(size=(2, 10, 30)) * 0.05, jnp.float32)
    want = np.asarray(scan_solver.solve_final(inc))
    got = np.asarray(pallas_blocked.solve_final(inc))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=1e-6)


def test_dispatch_routes_blocked(rng, monkeypatch):
    """_resolve picks the blocked tier when both sides exceed the bound on
    a TPU platform (platform check stubbed)."""
    from sigkernel_tpu.ops import solve as solve_mod, pallas_solver

    monkeypatch.setattr(pallas_blocked, "MAX_ROWS", 16)
    monkeypatch.setattr(pallas_solver, "MAX_ROWS", 16)

    class _Dev:
        platform = "tpu"

    monkeypatch.setattr(solve_mod.jax, "devices", lambda *a: [_Dev()])
    inc = jnp.zeros((1, 40, 40), jnp.float32)
    assert solve_mod._resolve("auto", inc, 0) == "pallas_blocked"
    inc_small = jnp.zeros((1, 10, 10), jnp.float32)
    assert solve_mod._resolve("auto", inc_small, 0) == "pallas"


@pytest.mark.parametrize("dyadic_order", [0, 1])
def test_blocked_df64_matches_scan_f64(rng, small_rows, dyadic_order):
    """Double-double stripes: f64-grade precision beyond the row bound."""
    from sigkernel_tpu.utils import dyadic_refine

    inc = jnp.asarray(rng.normal(size=(2, 24, 22)) * 0.05)
    assert inc.dtype == jnp.float64
    want = np.asarray(scan_solver.solve_final(
        dyadic_refine(inc, dyadic_order)))
    got = np.asarray(pallas_blocked.solve_final_f64(
        inc, dyadic_order=dyadic_order))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_blocked_df64_boundary_chain(rng, small_rows):
    """Multi-stripe DF boundary handoff keeps df64 accuracy end to end."""
    inc = jnp.asarray(rng.normal(size=(1, 70, 40)) * 0.03)
    want = np.asarray(scan_solver.solve_final(inc))
    got = np.asarray(pallas_blocked.solve_final_f64(inc))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def _oracle_cot_base(inc, g, naive, dyadic_order):
    """Exact base-resolution cotangent via f64 grid solves + collapse."""
    from sigkernel_tpu.utils import dyadic_refine
    from sigkernel_tpu.ops.solve import _collapse_refined

    incr = dyadic_refine(jnp.asarray(inc, jnp.float64), dyadic_order)
    grid = scan_solver.solve_grid(incr, naive=naive)
    grid_r = scan_solver.solve_grid(jnp.flip(jnp.flip(incr, -1), -2),
                                    naive=naive)
    grid_r = jnp.flip(jnp.flip(grid_r, -1), -2)
    KK = grid[..., :-1, :-1] * grid_r[..., 1:, 1:]
    KK = jnp.asarray(g)[:, None, None] * KK
    return np.asarray(_collapse_refined(KK, dyadic_order, jnp.float64))


@pytest.mark.parametrize("dyadic_order", [0, 1])
@pytest.mark.parametrize("shape", [(2, 40, 37), (1, 33, 50)])
def test_striped_adjoint_matches_oracle(rng, small_rows, monkeypatch,
                                        dyadic_order, shape):
    monkeypatch.setattr(pallas_blocked, "ADJ_ROWS", 16)
    inc = jnp.asarray(rng.normal(size=shape) * 0.05, jnp.float32)
    g = jnp.asarray(rng.normal(size=(shape[0],)), jnp.float32)
    want = _oracle_cot_base(inc, g, False, dyadic_order)
    got = np.asarray(pallas_blocked.adjoint_blocked(inc, g, False,
                                                    dyadic_order))
    # f32 forward grids: absolute error scales with the grid magnitude
    np.testing.assert_allclose(got, want, rtol=3e-4,
                               atol=3e-5 * np.abs(want).max())


def test_striped_adjoint_unaligned_rows(rng, small_rows, monkeypatch):
    """Row counts not divisible by the stripe height (exact zero-padding)."""
    monkeypatch.setattr(pallas_blocked, "ADJ_ROWS", 16)
    inc = jnp.asarray(rng.normal(size=(2, 23, 29)) * 0.05, jnp.float32)
    g = jnp.ones((2,), jnp.float32)
    want = _oracle_cot_base(inc, g, False, 1)
    got = np.asarray(pallas_blocked.adjoint_blocked(inc, g, False, 1))
    np.testing.assert_allclose(got, want, rtol=3e-4,
                               atol=3e-5 * np.abs(want).max())


@pytest.mark.parametrize("dyadic_order,shape", [(1, (2, 12, 9)),
                                                (2, (1, 8, 8))])
def test_striped_df_adjoint_matches_f64_oracle(rng, monkeypatch,
                                               dyadic_order, shape):
    """f64-grade striped adjoint vs the exact f64 scan-tier adjoint:
    multi-stripe decomposition (MAX_ROWS monkeypatched down) must agree
    to f64-grade accuracy, not f32."""
    from sigkernel_tpu.ops import solve as solve_mod

    monkeypatch.setattr(pallas_blocked, "MAX_ROWS", 16)
    monkeypatch.setattr(pallas_blocked, "ADJ_ROWS", 16)
    inc = jnp.asarray(rng.normal(size=shape) * 0.1)
    g = jnp.asarray(rng.normal(size=(shape[0],)))
    hi = inc.astype(jnp.float32)
    lo = (inc - hi.astype(jnp.float64)).astype(jnp.float32)
    got = np.asarray(pallas_blocked.adjoint_blocked_df(
        hi, lo, g, naive=False, dyadic_order=dyadic_order))
    (want,) = solve_mod._grid_route_bwd(inc, g, False, "scan", dyadic_order)
    want = np.asarray(want)
    scale = max(np.abs(want).max(), 1e-30)
    np.testing.assert_allclose(got, want, atol=1e-9 * scale, rtol=0)


def test_striped_df_route_end_to_end(rng, monkeypatch):
    """solve() with f64 increments on the blocked tier takes the f64-grade
    striped adjoint under grad_solver='auto' (no silent downgrade)."""
    from sigkernel_tpu.ops import solve as solve_mod
    from sigkernel_tpu.ops.routes import resolve_inc_route

    monkeypatch.setattr(pallas_blocked, "MAX_ROWS", 16)
    monkeypatch.setattr(pallas_blocked, "ADJ_ROWS", 16)
    monkeypatch.setattr(solve_mod, "_resolve", lambda *a: "pallas_blocked")
    inc = jnp.asarray(rng.normal(size=(2, 10, 8)) * 0.1)
    assert resolve_inc_route(inc, "auto", 1, "auto").bwd == "striped_df"

    def loss(i):
        return solve_mod.solve(i, dyadic_order=1).sum()

    v, got = jax.value_and_grad(loss)(inc)

    def loss_scan(i):
        return solve_mod.solve(i, solver="scan", dyadic_order=1).sum()

    v0, want = jax.value_and_grad(loss_scan)(inc)
    np.testing.assert_allclose(float(v), float(v0), rtol=1e-9)
    scale = max(np.abs(np.asarray(want)).max(), 1e-30)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-9 * scale, rtol=0)
