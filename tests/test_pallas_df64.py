"""Double-double Pallas solver vs the f64 scan oracle (interpret on CPU)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from sigkernel_tpu.ops import scan_solver, pallas_df64

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
@pytest.mark.parametrize("shape", [(2, 6, 6), (2, 5, 9), (1, 9, 5)])
def test_df64_final_precision(rng, naive, shape):
    inc = jnp.asarray(rng.normal(size=shape) * 0.1)
    assert inc.dtype == jnp.float64
    want = np.asarray(scan_solver.solve_final(inc, naive=naive))
    got = np.asarray(pallas_df64.solve_final(inc, naive=naive))
    assert got.dtype == np.float64
    # double-double: ~1e-14 relative at these sizes, far beyond f32's 1e-7
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-13)


def test_df64_beats_f32_precision(rng):
    """The whole point: df64 must be orders of magnitude closer to f64 than
    a plain f32 computation."""
    inc64 = jnp.asarray(rng.normal(size=(4, 30, 30)) * 0.3)
    want = np.asarray(scan_solver.solve_final(inc64))
    got_df = np.asarray(pallas_df64.solve_final(inc64))
    got_f32 = np.asarray(
        scan_solver.solve_final(inc64.astype(jnp.float32))).astype(np.float64)
    err_df = np.abs(got_df - want).max() / np.abs(want).max()
    err_f32 = np.abs(got_f32 - want).max() / np.abs(want).max()
    assert err_df < 1e-11
    assert err_df < err_f32 * 1e-3


def test_df64_grid_matches_scan(rng):
    inc = jnp.asarray(rng.normal(size=(2, 5, 8)) * 0.1)
    want = np.asarray(scan_solver.solve_grid(inc))
    got = np.asarray(pallas_df64.solve_grid(inc))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-13)


def test_df64_transposes_long_rectangular(rng, monkeypatch):
    from sigkernel_tpu.ops import pallas_solver as ps, pallas_df64 as pd
    monkeypatch.setattr(ps, "MAX_ROWS", 16)
    monkeypatch.setattr(pd, "MAX_ROWS", 16)
    inc = jnp.asarray(rng.normal(size=(2, 24, 7)) * 0.1)
    want = np.asarray(scan_solver.solve_final(inc))
    got = np.asarray(pd.solve_final(inc))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-13)
    wantg = np.asarray(scan_solver.solve_grid(inc))
    gotg = np.asarray(pd.solve_grid(inc))
    np.testing.assert_allclose(gotg, wantg, rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize("dyadic_order", [0, 1])
def test_df64_solve_final_df_inputs(rng, dyadic_order):
    """DF (hi, lo) inputs through the kernel == f64 inputs split internally."""
    from sigkernel_tpu.ops import df32

    inc = jnp.asarray(rng.normal(size=(2, 7, 5)) * 0.1)
    hi, lo = df32.from_f64(inc)
    want = np.asarray(pallas_df64.solve_final(inc, dyadic_order=dyadic_order))
    got = np.asarray(pallas_df64.solve_final_df(hi, lo,
                                                dyadic_order=dyadic_order))
    np.testing.assert_allclose(got, want, rtol=1e-13)


@pytest.mark.parametrize("dyadic_order", [1, 2])
def test_hi_stack_matches_stack_solve(rng, dyadic_order):
    """The df64 forward's hi-plane stack == the f32 stack solve the fused
    adjoint would otherwise run (up to f32-vs-df64 rounding), and feeding
    it back through adjoint_fused_collapsed reproduces the cotangent."""
    from sigkernel_tpu.ops import pallas_df64, pallas_adjoint
    from sigkernel_tpu.ops.pallas_solver import _solve_stack_one

    B, Mb, Nb = 2, 6, 5
    f = 2 ** dyadic_order
    n_steps = Mb * f + Nb * f - 1
    pad_f = pallas_adjoint._pad_f(f)
    inc = jnp.asarray(rng.normal(size=(B, Mb, Nb)) * 0.1, jnp.float32)
    hi = inc
    lo = jnp.zeros_like(inc)

    val, stk = pallas_df64.solve_final_df_stack(
        hi, lo, dyadic_order=dyadic_order, stack_pad=pad_f)
    want_stack = np.asarray(_solve_stack_one(inc, False, dyadic_order,
                                             out_pad=pad_f))
    assert stk.shape[0] == 1  # one shared chunk at this batch
    got = np.asarray(stk)[0, pad_f:pad_f + n_steps]
    np.testing.assert_allclose(got, want_stack[pad_f:pad_f + n_steps],
                               rtol=2e-5, atol=2e-6)

    # value consistency with the plain df solve
    want_val = np.asarray(pallas_df64.solve_final_df(
        hi, lo, dyadic_order=dyadic_order))
    np.testing.assert_allclose(np.asarray(val), want_val, rtol=1e-12)

    # the adjoint driven by the shared stack == self-solved
    g = jnp.asarray(rng.normal(size=(B,)), jnp.float32)
    ct_shared = np.asarray(pallas_adjoint.adjoint_fused_collapsed(
        inc, g, naive=False, dyadic_order=dyadic_order, fwd_stack=stk))
    ct_self = np.asarray(pallas_adjoint.adjoint_fused_collapsed(
        inc, g, naive=False, dyadic_order=dyadic_order))
    np.testing.assert_allclose(ct_shared, ct_self, rtol=2e-5, atol=2e-6)


def test_stack_shared_vjp_route(rng, monkeypatch):
    """The df custom_vjp's stack-sharing residual path end-to-end: force
    the platform gates open and check gradients against the scan adjoint."""
    import jax
    import sigkernel_tpu as sk
    from sigkernel_tpu.ops import solve as solve_mod
    from conftest import make_paths

    monkeypatch.setattr(solve_mod, "_df_supported", lambda *a: True)
    X = jnp.asarray(make_paths(rng, 2, 12, 2))
    Y = jnp.asarray(make_paths(rng, 2, 12, 2))
    kernel = sk.RBFKernel(1.0)

    assert solve_mod._df_stack_gate(
        jnp.zeros((2, 11, 11), jnp.float32), 1)

    v_df, g_df = jax.value_and_grad(
        lambda x: sk.sig_kernel(kernel, x, Y, dyadic_order=1,
                                solver="df").sum())(X)
    v_sc, g_sc = jax.value_and_grad(
        lambda x: sk.sig_kernel(kernel, x, Y, dyadic_order=1,
                                solver="scan").sum())(X)
    np.testing.assert_allclose(float(v_df), float(v_sc), rtol=1e-10)
    scale = np.abs(np.asarray(g_sc)).max()
    np.testing.assert_allclose(np.asarray(g_df), np.asarray(g_sc),
                               atol=3e-5 * scale, rtol=0)


def test_hi_stack_sharing_chunked(rng, monkeypatch):
    """Stack sharing across MULTIPLE pair chunks: the forward emits one
    stack per shared chunk; the adjoint consumes them chunk-by-chunk and
    must match the self-solved cotangent (round-3: sharing no longer
    requires a single launch)."""
    from sigkernel_tpu.ops import pallas_df64, pallas_adjoint

    monkeypatch.setattr(pallas_adjoint, "PS_LAYOUT_MAX_B", 4)
    B, Mb, Nb, dyadic_order = 10, 6, 5, 1
    pad_f = pallas_adjoint._pad_f(2 ** dyadic_order)
    inc = jnp.asarray(rng.normal(size=(B, Mb, Nb)) * 0.1, jnp.float32)
    hi, lo = inc, jnp.zeros_like(inc)

    val, stk = pallas_df64.solve_final_df_stack(
        hi, lo, dyadic_order=dyadic_order, stack_pad=pad_f)
    assert stk.shape[0] == 3  # ceil(10 / 4) chunks
    want_val = np.asarray(pallas_df64.solve_final_df(
        hi, lo, dyadic_order=dyadic_order))
    np.testing.assert_allclose(np.asarray(val), want_val, rtol=1e-12)

    g = jnp.asarray(rng.normal(size=(B,)), jnp.float32)
    ct_shared = np.asarray(pallas_adjoint.adjoint_fused_collapsed(
        inc, g, naive=False, dyadic_order=dyadic_order, fwd_stack=stk))
    ct_self = np.asarray(pallas_adjoint.adjoint_fused_collapsed(
        inc, g, naive=False, dyadic_order=dyadic_order))
    assert ct_shared.shape == (B, Mb, Nb)
    np.testing.assert_allclose(ct_shared, ct_self, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("naive", [True, False])
@pytest.mark.parametrize("shape,dyadic", [((4, 160, 40), 0), ((4, 80, 20), 1),
                                          ((4, 100, 300), 1)])
def test_df64_windowed_phases_match_full(rng, naive, shape, dyadic):
    """Lane-windowed wavefront compute vs the full-slab sweep.

    The final corner must be BIT-identical: active cells only ever read
    real cells of the row below, which both variants compute identically;
    windows only freeze the dead zero-increment continuation of done rows.
    The geometry (MM=160 refined -> 256 lanes, NN=40, seg 32) produces a
    multi-phase plan with both a growing top edge and a nonzero window
    start, exercising the roll-wrap margin.
    """
    from sigkernel_tpu.ops.pallas_solver import _window_phases

    f = 2 ** dyadic
    MM, NN = shape[1] * f, shape[2] * f
    n_steps = MM + NN - 1
    spb = pallas_df64.DMA_BATCH * f if f > 1 else pallas_df64.DMA_BATCH
    phases = _window_phases(-(-(-(-n_steps // f) // pallas_df64.DMA_BATCH)),
                            spb, n_steps, NN, 128 * -(-(MM + 1) // 128), 32)
    assert phases is not None and len(phases) > 1
    assert any(p[2] > 0 for p in phases), "plan must include a ws>0 phase"

    inc = jnp.asarray(rng.normal(size=shape) * 0.1)
    hi, lo = pallas_df64._split_hi_lo(inc)
    full = np.asarray(pallas_df64._solve_final_one_df(
        hi, lo, naive, dyadic, window_seg=0))
    win = np.asarray(pallas_df64._solve_final_one_df(
        hi, lo, naive, dyadic, window_seg=32))
    np.testing.assert_array_equal(win, full)
    from sigkernel_tpu.utils import dyadic_refine
    want = np.asarray(scan_solver.solve_final(
        dyadic_refine(inc, dyadic), naive=naive))
    np.testing.assert_allclose(win, want, rtol=1e-11, atol=1e-12)


def test_df64_windowed_stack_modes(rng):
    """hi_stack / ckpt stacks from the windowed kernel: the values and the
    real-cell region of every stack entry must match the full sweep."""
    inc = jnp.asarray(rng.normal(size=(4, 80, 20)) * 0.1)
    hi, lo = pallas_df64._split_hi_lo(inc)
    vf, sf = pallas_df64._solve_final_one_df(hi, lo, False, 1, stack_pad=8,
                                             window_seg=0)
    vw, sw = pallas_df64._solve_final_one_df(hi, lo, False, 1, stack_pad=8,
                                             window_seg=32)
    np.testing.assert_array_equal(np.asarray(vw), np.asarray(vf))
    # Stack entries: bit-equal wherever both kernels wrote defined values.
    # The full kernel scribbles above-front lanes with garbage derived from
    # the uninitialised refine carry (NaN in interpret mode); windowing
    # freezes them at the boundary 1.0 instead, so the windowed stack's
    # undefined set must be a subset of the full one.
    sf, sw = np.asarray(sf), np.asarray(sw)
    both = np.isfinite(sf) & np.isfinite(sw)
    np.testing.assert_array_equal(sw[both], sf[both])
    assert not (np.isfinite(sf) & ~np.isfinite(sw)).any()


@pytest.mark.parametrize("dyadic", [1, 2])
def test_df64_windowed_and_stack_match_full(rng, dyadic):
    """Windowed and stack-emitting df sweeps must be BIT-equal to the
    plain full sweep (same math order on the same operands)."""
    inc = jnp.asarray(rng.normal(size=(4, 160 // 2 ** dyadic,
                                       40 // 2 ** dyadic)) * 0.1)
    hi, lo = pallas_df64._split_hi_lo(inc)
    full = np.asarray(pallas_df64._solve_final_one_df(hi, lo, False,
                                                      dyadic))
    win = np.asarray(pallas_df64._solve_final_one_df(
        hi, lo, False, dyadic, window_seg=32))
    v_stk, _ = pallas_df64._solve_final_one_df(hi, lo, False, dyadic,
                                               stack_pad=8)
    np.testing.assert_array_equal(win, full)
    np.testing.assert_array_equal(np.asarray(v_stk), full)


@pytest.mark.parametrize("naive", [True, False])
@pytest.mark.parametrize("shape,dyadic", [((3, 7, 7), 1), ((5, 9, 6), 1),
                                          ((2, 6, 11), 2), ((8, 13, 13), 2)])
def test_df64_planes_bitexact(rng, naive, shape, dyadic):
    """Plane-split kernel (refined lanes as f base-width planes): same f32
    ops on the same operands, so values must be BIT-equal to the stretched
    kernel -- plain, windowed, and stack modes."""
    from sigkernel_tpu.ops.pallas_adjoint import _pad_f

    inc = jnp.asarray(rng.normal(size=shape) * 0.1)
    hi, lo = pallas_df64._split_hi_lo(inc)
    f = 2 ** dyadic
    ref = np.asarray(pallas_df64._solve_final_one_df(hi, lo, naive, dyadic))
    got = np.asarray(pallas_df64._solve_final_one_df_pl(hi, lo, naive,
                                                        dyadic))
    np.testing.assert_array_equal(got, ref)
    win = np.asarray(pallas_df64._solve_final_one_df_pl(hi, lo, naive,
                                                        dyadic,
                                                        window_seg=8))
    np.testing.assert_array_equal(win, ref)
    # stack mode: plane layout (Tp, f, P, Lb) must re-interleave to the
    # stretched stack over the written entries
    pad = _pad_f(f)
    n_steps = (shape[1] + shape[2]) * f - 1   # (Mb + Nb) * f - 1
    v_ref, stk_ref = pallas_df64._solve_final_one_df(hi, lo, naive, dyadic,
                                                     stack_pad=pad)
    v_pl, stk_pl = pallas_df64._solve_final_one_df_pl(hi, lo, naive, dyadic,
                                                      stack_pad=pad)
    np.testing.assert_array_equal(np.asarray(v_pl), np.asarray(v_ref))
    Tp, ff, P, Lb = stk_pl.shape
    re = np.moveaxis(np.asarray(stk_pl), 1, -1).reshape(Tp, P, Lb * ff)
    # planes may cover MORE refined lanes than the stretched slab (Lb is
    # 128-aligned independently); compare the common valid extent
    Lc = min(Lb * ff, stk_ref.shape[-1])
    a = re[pad:pad + n_steps, :, :Lc]
    b = np.asarray(stk_ref)[pad:pad + n_steps, :, :Lc]
    np.testing.assert_array_equal(np.nan_to_num(a, nan=3e33),
                                  np.nan_to_num(b, nan=3e33))


def gen_tol(inc, dyadic, want):
    """GEN-tier error-model bound (see ``pallas_df64._df_scheme_gen``):
    the hi-only u^2/12 chain perturbs each update by <= 3 * u^2 * 2^-23
    (u = refined increment), linearly accumulated over the wavefront.
    Returns an atol with 4x headroom, floored at the pre-existing gen
    noise level (~1e-11 relative)."""
    f = 2 ** dyadic
    Mb, Nb = inc.shape[-2], inc.shape[-1]
    n_steps = (Mb + Nb) * f - 1
    u = np.abs(np.asarray(inc)).max() / (f * f)
    vmax = np.abs(np.asarray(want)).max()
    return 4.0 * n_steps * 3.0 * u * u * 2.0 ** -23 + 1e-11 * vmax


@pytest.mark.parametrize("gram", [True, False])
@pytest.mark.parametrize("dims,dyadic", [((2, 2, 8, 8), 1),
                                         ((1, 3, 9, 6), 2)])
def test_df64_inkernel_generation(rng, dims, dyadic, gram):
    """In-kernel RBF increment generation: df64-grade values vs the f64
    scan oracle, emitted hi increments BIT-equal to the DF prep, and the
    emitted solution stack drives the plane-split adjoint to the same
    f32-grade gradients as the df stream route."""
    import jax

    from sigkernel_tpu.ops import df32, df_prep, pallas_adjoint, scan_solver
    from sigkernel_tpu.utils import dyadic_refine

    A, B, M, N = dims
    f = 2 ** dyadic
    sigma = 0.9
    X = jnp.asarray(rng.normal(size=(A, M, 3)).cumsum(1) * 0.1)
    Y = jnp.asarray(rng.normal(size=(B, N, 3)).cumsum(1) * 0.1)
    if gram:
        Xp, Yp = jnp.repeat(X, B, 0), jnp.tile(Y, (A, 1, 1))
    else:
        Yp = jnp.asarray(rng.normal(size=(A, N, 3)).cumsum(1) * 0.1)
        Xp, Y = X, Yp
    v = np.asarray(pallas_df64.solve_final_df_gen(Xp, Yp, sigma, False,
                                                  dyadic))
    hi, lo = df_prep.rbf_increments_df(X, Y, sigma, gram=gram)
    inc = np.asarray(df32.to_f64((hi, lo))).reshape(-1, M - 1, N - 1)
    want = np.asarray(scan_solver.solve_final(
        dyadic_refine(jnp.asarray(inc), dyadic)))
    np.testing.assert_allclose(v, want.reshape(v.shape), rtol=0,
                               atol=gen_tol(inc, dyadic, want))

    from sigkernel_tpu.ops.pallas_adjoint import _pad_f
    v2, stk, hig = pallas_df64.solve_final_df_gen_stack(
        Xp, Yp, sigma, False, dyadic, stack_pad=_pad_f(f))
    np.testing.assert_array_equal(np.asarray(v2), v)
    hi_flat = np.asarray(hi).reshape(-1, M - 1, N - 1)
    np.testing.assert_array_equal(np.asarray(hig), hi_flat)
    g = jnp.asarray(rng.normal(size=(v.size,)), jnp.float32)
    ct = np.asarray(pallas_adjoint.adjoint_planes_collapsed(
        jnp.asarray(hi_flat), g, False, dyadic, fwd_stack=stk))
    from sigkernel_tpu.ops.solve import _grid_route_bwd
    (ct64,) = _grid_route_bwd(jnp.asarray(inc), g.astype(jnp.float64),
                              False, "scan", dyadic)
    sc = np.abs(np.asarray(ct64)).max()
    np.testing.assert_allclose(ct, np.asarray(ct64), atol=2e-5 * sc, rtol=0)


@pytest.mark.parametrize("gram", [True, False])
def test_rbf_gen_route_end_to_end(rng, gram):
    """The ``_rbf_gen`` custom_vjp (the in-kernel-generation route taken by
    ``sig_kernel``/``sig_gram`` when ``grad_solver='f32'`` on TPU): values
    must match the df stream route it replaces to df64 grade, and the
    X/Y/sigma gradient chain (plane-split collapse adjoint + f32 increment
    vjp) must match the stream route's gradients to f32 grade."""
    import jax

    from sigkernel_tpu import sigkernel as sk_mod
    from sigkernel_tpu import RBFKernel
    from sigkernel_tpu.ops.solve import solve_df

    dyadic = 1
    A, B, M, N = (2, 3, 9, 9) if gram else (3, 1, 8, 8)
    X = jnp.asarray(rng.normal(size=(A, M, 3)).cumsum(1) * 0.1)
    Y = jnp.asarray(rng.normal(size=((B if gram else A), N, 3)).cumsum(1)
                    * 0.1)
    w = jnp.asarray(rng.normal(size=((A, B) if gram else (A,))))

    def gen_route(sig, x, y):
        v = sk_mod._rbf_gen(RBFKernel(sigma=sig), x, y, gram, False, dyadic)
        return (v * w).sum(), v

    def stream_route(sig, x, y):
        dd_df = sk_mod._df_increments(RBFKernel(sigma=sig), x, y, gram)
        v = solve_df(dd_df, False, dyadic)
        v = v.reshape(w.shape)
        return (v * w).sum(), v

    sig0 = jnp.asarray(0.8, jnp.float64)
    (_, vg), gg = jax.value_and_grad(gen_route, argnums=(0, 1, 2),
                                     has_aux=True)(sig0, X, Y)
    (_, vs), gs = jax.value_and_grad(stream_route, argnums=(0, 1, 2),
                                     has_aux=True)(sig0, X, Y)
    hi0, _ = sk_mod._df_increments(RBFKernel(sigma=sig0), X, Y, gram)
    np.testing.assert_allclose(np.asarray(vg), np.asarray(vs), rtol=0,
                               atol=gen_tol(np.asarray(hi0), dyadic,
                                            np.asarray(vs)))
    for a, b, name in zip(gg, gs, ("sigma", "X", "Y")):
        a, b = np.asarray(a), np.asarray(b)
        sc = max(np.abs(b).max(), 1e-12)
        np.testing.assert_allclose(a, b, atol=3e-5 * sc, rtol=0,
                                   err_msg=f"grad wrt {name}")
