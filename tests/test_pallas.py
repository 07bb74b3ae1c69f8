"""Pallas wavefront kernel vs the scan solver.

On CPU these run in interpreter mode (slow, small shapes only); on a real TPU
(SIGKERNEL_TEST_TPU=1) they compile to Mosaic.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sigkernel_tpu.ops import scan_solver, pallas_solver

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


@pytest.mark.parametrize("naive", [True, False])
@pytest.mark.parametrize("shape", [(3, 6, 6), (2, 5, 9), (2, 9, 5), (1, 1, 1)])
def test_pallas_final_matches_scan(rng, naive, shape):
    inc = jnp.asarray(rng.normal(size=shape) * 0.1, dtype=jnp.float32)
    want = np.asarray(scan_solver.solve_final(inc, naive=naive))
    got = np.asarray(pallas_solver.solve_final(inc, naive=naive))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_pallas_gram_batch_dims(rng):
    inc = jnp.asarray(rng.normal(size=(2, 3, 5, 7)) * 0.1, dtype=jnp.float32)
    want = np.asarray(scan_solver.solve_final(inc))
    got = np.asarray(pallas_solver.solve_final(inc))
    assert got.shape == (2, 3)
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("shape", [(2, 5, 8), (2, 8, 5)])
def test_pallas_grid_matches_scan(rng, shape):
    inc = jnp.asarray(rng.normal(size=shape) * 0.1, dtype=jnp.float32)
    want = np.asarray(scan_solver.solve_grid(inc))
    got = np.asarray(pallas_solver.solve_grid(inc))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_pallas_large_batch_padding(rng):
    """More than one lane-tile of pairs (tests P padding path)."""
    inc = jnp.asarray(rng.normal(size=(150, 4, 4)) * 0.1, dtype=jnp.float32)
    want = np.asarray(scan_solver.solve_final(inc))
    got = np.asarray(pallas_solver.solve_final(inc))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_pallas_transposes_long_rectangular(rng, monkeypatch):
    """Grids whose row count exceeds the VMEM bound are solved transposed
    (exact by transpose covariance). Exercised by shrinking MAX_ROWS."""
    from sigkernel_tpu.ops import pallas_solver as ps
    monkeypatch.setattr(ps, "MAX_ROWS", 16)
    inc = jnp.asarray(rng.normal(size=(2, 30, 8)) * 0.1, dtype=jnp.float32)
    want = np.asarray(scan_solver.solve_final(inc))
    got = np.asarray(ps.solve_final(inc))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)
    wantg = np.asarray(scan_solver.solve_grid(inc))
    gotg = np.asarray(ps.solve_grid(inc))
    np.testing.assert_allclose(gotg, wantg, rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("dyadic_order", [0, 1])
@pytest.mark.parametrize("shape", [(3, 6, 6), (2, 5, 9), (2, 9, 5)])
def test_sheared_adjoint_matches_grid_route(rng, dyadic_order, shape):
    """adjoint_dd (stack-space backward) == the grid-materialising formula."""
    from sigkernel_tpu.ops import scan_solver as ss
    from sigkernel_tpu.utils import dyadic_refine

    B = shape[0]
    inc = jnp.asarray(rng.normal(size=shape) * 0.1, jnp.float32)
    g = jnp.asarray(rng.normal(size=(B,)), jnp.float32)

    got = np.asarray(pallas_solver.adjoint_dd(inc, g, naive=False,
                                              dyadic_order=dyadic_order))

    ref_inc = dyadic_refine(inc, dyadic_order)
    grid = np.asarray(ss.solve_grid(ref_inc))
    grid_rev = np.asarray(ss.solve_grid(
        jnp.flip(jnp.flip(ref_inc, -1), -2)))[..., ::-1, ::-1]
    want = (grid[..., :-1, :-1] * grid_rev[..., 1:, 1:]
            * np.asarray(g)[:, None, None])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_sheared_adjoint_transposes_long_rectangular(rng, monkeypatch):
    from sigkernel_tpu.ops import pallas_solver as ps
    from sigkernel_tpu.ops import scan_solver as ss
    monkeypatch.setattr(ps, "MAX_ROWS", 16)
    inc = jnp.asarray(rng.normal(size=(2, 30, 8)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.normal(size=(2,)), jnp.float32)
    got = np.asarray(ps.adjoint_dd(inc, g, naive=False))
    grid = np.asarray(ss.solve_grid(inc))
    grid_rev = np.asarray(ss.solve_grid(
        jnp.flip(jnp.flip(inc, -1), -2)))[..., ::-1, ::-1]
    want = (grid[..., :-1, :-1] * grid_rev[..., 1:, 1:]
            * np.asarray(g)[:, None, None])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("dyadic_order", [0, 1])
def test_grad_through_pallas_solver_matches_scan(rng, dyadic_order,
                                                 monkeypatch):
    """The full custom_vjp route with the pallas tier (sheared-space
    backward) must match the scan-tier gradient."""
    from sigkernel_tpu.ops.solve import solve
    from sigkernel_tpu.ops import pallas_solver as ps

    # the platform gate says no on CPU; force the tier (interpret mode)
    monkeypatch.setattr(ps, "supported",
                        lambda probe: probe.dtype == jnp.float32)

    inc = jnp.asarray(rng.normal(size=(3, 5, 7)) * 0.1, jnp.float32)
    g_pal = jax.grad(lambda u: solve(u, False, "pallas", dyadic_order).sum())(inc)
    g_scan = jax.grad(lambda u: solve(u, False, "scan", dyadic_order).sum())(inc)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_scan),
                               rtol=2e-4, atol=2e-6)


@pytest.mark.parametrize("shape,dyadic_order", [
    ((2, 64, 64), 1),    # MM = 128: L == f * cdiv(L, f) boundary exactly
    ((2, 63, 65), 1),    # MM + 1 = 127 vs L = 128 (roll tail inside pad)
    ((1, 7, 33), 2),     # f = 4, asymmetric
    ((2, 32, 32), 2),    # f = 4, MM = 128 boundary
])
def test_stretched_stream_refinement_corners(rng, shape, dyadic_order):
    """In-kernel dyadic refinement (row-stretched base stream) must match
    the scan tier at lane-alignment boundaries of the stretch geometry."""
    from sigkernel_tpu.ops import scan_solver as ss
    from sigkernel_tpu.utils import dyadic_refine

    inc = jnp.asarray(rng.normal(size=shape) * 0.1, jnp.float32)
    ref = dyadic_refine(inc, dyadic_order)
    want = np.asarray(ss.solve_final(ref))
    got = np.asarray(pallas_solver._solve_final_one(
        inc, False, dyadic_order))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-6)
    wantg = np.asarray(ss.solve_grid(ref))
    gotg = np.asarray(pallas_solver._solve_grid_one(
        inc, False, dyadic_order))
    np.testing.assert_allclose(gotg, wantg, rtol=3e-5, atol=3e-6)


def test_stretched_stream_pairs_on_lanes(rng):
    """Refine machinery on the pairs-on-lanes layout (B > 64, row_axis=0):
    sublane-axis stretch/roll/select."""
    from sigkernel_tpu.ops import scan_solver as ss
    from sigkernel_tpu.utils import dyadic_refine

    inc = jnp.asarray(rng.normal(size=(130, 9, 7)) * 0.1, jnp.float32)
    ref = dyadic_refine(inc, 1)
    want = np.asarray(ss.solve_final(ref))
    got = np.asarray(pallas_solver._solve_final_one(inc, False, 1))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-6)


@pytest.mark.parametrize("dyadic_order", [0, 1])
def test_pallas_wide_sublane_batch(rng, dyadic_order):
    """65..128 pairs now ride the sublane axis as one (128, L) slab (the
    geometry the aligned 512B-shift stream construction requires); the
    legacy threshold sent them to pairs-on-lanes."""
    from sigkernel_tpu.utils import dyadic_refine

    inc = jnp.asarray(rng.normal(size=(96, 5, 6)) * 0.1, dtype=jnp.float32)
    want = np.asarray(scan_solver.solve_final(dyadic_refine(inc, dyadic_order)))
    got = np.asarray(pallas_solver.solve_final(inc, dyadic_order=dyadic_order))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("dyadic", [0, 1])
def test_f32_windowed_phases_match_full(rng, dyadic):
    """Lane-windowed f32 wavefront vs the full-slab sweep: bit-identical
    final values (see the df64 twin test for the invariant argument)."""
    import functools
    from sigkernel_tpu.ops.pallas_solver import _wavefront_kernel

    f = 2 ** dyadic
    shape = (4, 160 // f, 40 // f)
    inc = jnp.asarray(rng.normal(size=shape) * 0.1, jnp.float32)

    def run(seg):
        import sigkernel_tpu.ops.pallas_solver as ps
        old = ps.WINDOW_SEG
        ps.WINDOW_SEG = seg
        try:
            out = ps._solve_final_one(inc, False, dyadic)
            return np.asarray(out)
        finally:
            ps.WINDOW_SEG = old

    from sigkernel_tpu.utils import dyadic_refine
    full = run(0)
    win = run(32)
    np.testing.assert_array_equal(win, full)
    want = np.asarray(scan_solver.solve_final(
        dyadic_refine(inc.astype(jnp.float64), dyadic))).astype(np.float32)
    # secondary sanity vs the f64 oracle (f32 accumulation over ~200 steps)
    np.testing.assert_allclose(win, want, rtol=3e-4, atol=3e-5)


def test_f32_windowed_grid_and_stack_match_full(rng):
    """grid_out (stack-emitting) sweeps under lane windows: the unsheared
    grid and the valid stack region must be bit-equal to the full sweep."""
    import sigkernel_tpu.ops.pallas_solver as ps

    inc = jnp.asarray(rng.normal(size=(4, 80, 20)) * 0.1, jnp.float32)
    old = ps.WINDOW_SEG
    try:
        ps.WINDOW_SEG = 0
        gf = np.asarray(ps._solve_grid_one(inc, False, 1))
        sf = np.asarray(ps._solve_stack_one(inc, False, 1, out_pad=8))
        ps.WINDOW_SEG = 32
        gw = np.asarray(ps._solve_grid_one(inc, False, 1))
        sw = np.asarray(ps._solve_stack_one(inc, False, 1, out_pad=8))
        np.testing.assert_array_equal(gw, gf)
        both = np.isfinite(sf) & np.isfinite(sw)
        np.testing.assert_array_equal(sw[both], sf[both])
    finally:
        ps.WINDOW_SEG = old


def test_f32_stack_sharing_route(rng, monkeypatch):
    """f32 forward-stack sharing: the custom_vjp residual carries the
    forward's diagonal stacks and the backward's fused adjoint consumes
    them -- value and gradient must match the non-shared route."""
    import jax
    from sigkernel_tpu.ops.solve import solve, _f32_stack_gate
    from sigkernel_tpu.ops import solve as solve_mod
    from sigkernel_tpu.ops import pallas_solver as ps
    from sigkernel_tpu.ops import pallas_adjoint as pa

    monkeypatch.setattr(ps, "supported",
                        lambda probe: probe.dtype == jnp.float32)
    monkeypatch.setattr(pa, "supported", lambda MM, NN: True)

    inc = jnp.asarray(rng.normal(size=(3, 6, 5)) * 0.1, jnp.float32)
    assert _f32_stack_gate(inc, 1)

    v_sh, g_sh = jax.value_and_grad(
        lambda u: solve(u, False, "pallas", 1).sum())(inc)

    # disable sharing: same route without the residual stack
    monkeypatch.setattr(solve_mod, "_f32_stack_gate", lambda *a: False)
    v_ns, g_ns = jax.value_and_grad(
        lambda u: solve(u, False, "pallas", 1).sum())(inc)

    np.testing.assert_allclose(float(v_sh), float(v_ns), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ns),
                               rtol=1e-5, atol=1e-6)




@pytest.mark.parametrize("dyadic", [1, 2])
def test_f32_planes_bitexact(rng, dyadic):
    """Plane-split f32 kernel: bit-equal values to the stretched kernel;
    the plane-layout stack drives the plane-split adjoint."""
    from sigkernel_tpu.ops import pallas_adjoint
    from sigkernel_tpu.ops.pallas_solver import (_solve_final_one,
                                                 _solve_final_one_f32_pl)

    B, Mb, Nb = 3, 7, 9
    f = 2 ** dyadic
    inc = jnp.asarray(rng.normal(size=(B, Mb, Nb)) * 0.1, jnp.float32)
    ref = np.asarray(_solve_final_one(inc, False, dyadic))
    got = np.asarray(_solve_final_one_f32_pl(inc, False, dyadic))
    np.testing.assert_array_equal(got, ref)
    win = np.asarray(_solve_final_one_f32_pl(inc, False, dyadic,
                                             window_seg=8))
    np.testing.assert_array_equal(win, ref)
    v, stk = _solve_final_one_f32_pl(inc, False, dyadic,
                                     stack_pad=pallas_adjoint._pad_f(f))
    np.testing.assert_array_equal(np.asarray(v), ref)
    g = jnp.asarray(rng.normal(size=(B,)), jnp.float32)
    ct = np.asarray(pallas_adjoint.adjoint_planes_collapsed(
        inc, g, False, dyadic, fwd_stack=stk[None]))
    want = np.asarray(pallas_adjoint.adjoint_fused_collapsed(
        inc, g, naive=False, dyadic_order=dyadic))
    sc = max(np.abs(want).max(), 1e-30)
    np.testing.assert_allclose(ct, want, atol=2e-5 * sc, rtol=0)
