"""Sparse (checkpointed) forward-stack adjoint vs the full-stack collapse
kernel (interpret on CPU).

The checkpoint stack is synthesized here by slicing the full diagonal
stack, with NaN poison in every slab the kernel must never read (negative
entry indices, seed slots) -- a NaN leaking into the cotangent fails the
comparison loudly.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from sigkernel_tpu.ops import pallas_adjoint, pallas_solver
from sigkernel_tpu.ops.pallas_adjoint import TB, ckpt_pairs, ckpt_supported

ON_TPU = bool(os.environ.get("SIGKERNEL_TEST_TPU"))


@pytest.fixture(autouse=True)
def _interpret_mode():
    if ON_TPU:
        yield
    else:
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            yield


def _make_ckpt(inc, naive, dyadic_order):
    """Checkpoint stack from the full f32 diagonal stack (entry q at q)."""
    f = 2 ** dyadic_order
    Mb, Nb = inc.shape[-2], inc.shape[-1]
    T = (Mb + Nb) * f - f - 1 if False else Mb * f + Nb * f - 1
    C = TB * f
    S = pallas_solver._solve_stack_one(inc.astype(jnp.float32), naive,
                                       dyadic_order, out_pad=0)
    n_pairs = ckpt_pairs(T, f)
    P, L = S.shape[1], S.shape[2]
    ck = np.full((2 * n_pairs + 2, P, L), np.nan, np.float32)
    Sn = np.asarray(S)
    for m in range(n_pairs):
        e_lo, e_hi = T - 6 - m * C, T - 5 - m * C
        if e_lo >= 0:
            ck[2 * m] = Sn[e_lo]
        if e_hi >= 0:
            ck[2 * m + 1] = Sn[e_hi]
    return jnp.asarray(ck)


@pytest.mark.parametrize("naive", [False, True])
@pytest.mark.parametrize("dyadic_order,shape", [
    (1, (2, 8, 8)),     # square
    (1, (1, 10, 6)),    # MM > NN
    (1, (3, 6, 10)),    # NN > MM
    (2, (2, 6, 6)),     # f = 4
])
def test_ckpt_adjoint_matches_full_stack(rng, naive, dyadic_order, shape):
    f = 2 ** dyadic_order
    B, Mb, Nb = shape
    T = Mb * f + Nb * f - 1
    assert ckpt_supported(T, f)
    inc = jnp.asarray(rng.normal(size=shape) * 0.1, jnp.float32)
    g = jnp.asarray(rng.normal(size=(B,)), jnp.float32)
    want = np.asarray(pallas_adjoint.adjoint_fused_collapsed(
        inc, g, naive, dyadic_order))
    ck = _make_ckpt(inc, naive, dyadic_order)
    got = np.asarray(pallas_adjoint.adjoint_ckpt_collapsed(
        inc, g, naive, dyadic_order, ck[None]))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("dyadic_order,shape", [
    (1, (2, 8, 8)),
    (1, (1, 10, 6)),
    (2, (2, 6, 6)),
])
def test_df_ckpt_stack_matches_full(rng, dyadic_order, shape):
    """The df64 forward's sparse stack slabs equal the full-stack slabs at
    the checkpoint entries, and the values are identical."""
    from sigkernel_tpu.ops import pallas_df64
    from sigkernel_tpu.ops.pallas_adjoint import _pad_f

    f = 2 ** dyadic_order
    B, Mb, Nb = shape
    T = Mb * f + Nb * f - 1
    C = TB * f
    inc = rng.normal(size=shape) * 0.1
    hi = jnp.asarray(inc, jnp.float32)
    lo = jnp.asarray(inc - np.asarray(hi, np.float64), jnp.float32)

    pad = _pad_f(f)
    val_full, stk_full = pallas_df64.solve_final_df_stack(
        hi, lo, naive=False, dyadic_order=dyadic_order, stack_pad=pad)
    val_ck, stk_ck = pallas_df64.solve_final_df_ckpt(
        hi, lo, naive=False, dyadic_order=dyadic_order)
    np.testing.assert_array_equal(np.asarray(val_ck), np.asarray(val_full))
    n_pairs = ckpt_pairs(T, f)
    assert stk_ck.shape[1] == 2 * n_pairs + 2
    Sf, Sc = np.asarray(stk_full[0]), np.asarray(stk_ck[0])
    MM = Mb * f
    lanes = np.arange(Sf.shape[-1])
    for m in range(n_pairs):
        for off in range(2):
            e = T - 6 - m * C + off
            if e >= 0:
                # compare only the in-wavefront lanes: lanes in
                # (e+2, MM] hold garbage-in-flight (uninitialized carry
                # propagation), identical in dataflow but NaN on CPU
                valid = (lanes <= e + 2) | (lanes > MM)
                np.testing.assert_array_equal(
                    Sc[2 * m + off][:, valid], Sf[e + pad][:, valid],
                    err_msg=f"pair {m} off {off} (entry {e})")


@pytest.mark.parametrize("dyadic_order,shape", [
    (1, (2, 8, 8)),
    (1, (3, 6, 10)),
    (2, (2, 6, 6)),
])
def test_df_ckpt_adjoint_end_to_end(rng, dyadic_order, shape):
    """forward-ckpt stack -> ckpt adjoint == full stack -> collapse adjoint."""
    from sigkernel_tpu.ops import pallas_df64
    from sigkernel_tpu.ops.pallas_adjoint import _pad_f

    f = 2 ** dyadic_order
    B = shape[0]
    inc = rng.normal(size=shape) * 0.1
    hi = jnp.asarray(inc, jnp.float32)
    lo = jnp.asarray(inc - np.asarray(hi, np.float64), jnp.float32)
    g = jnp.asarray(rng.normal(size=(B,)), jnp.float32)

    _, stk_full = pallas_df64.solve_final_df_stack(
        hi, lo, naive=False, dyadic_order=dyadic_order, stack_pad=_pad_f(f))
    want = np.asarray(pallas_adjoint.adjoint_fused_collapsed(
        hi, g, False, dyadic_order, fwd_stack=stk_full))
    _, stk_ck = pallas_df64.solve_final_df_ckpt(
        hi, lo, naive=False, dyadic_order=dyadic_order)
    got = np.asarray(pallas_adjoint.adjoint_ckpt_collapsed(
        hi, g, False, dyadic_order, stk_ck))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_wide_rectangle_adjoint_transposes(rng):
    """MM >> NN (forward lane extent exceeding the reverse state's) used
    to crash the fused adjoint at trace time; it now runs transposed."""
    from sigkernel_tpu.ops import solve

    B, Mb, Nb, dy = 1, 96, 40, 1
    inc = rng.normal(size=(B, Mb, Nb)) * 0.1
    g = jnp.asarray(rng.normal(size=(B,)), jnp.float32)
    got = np.asarray(pallas_adjoint.adjoint_fused_collapsed(
        jnp.asarray(inc, jnp.float32), g, False, dy))
    (want,) = solve._grid_route_bwd(jnp.asarray(inc),
                                    g.astype(jnp.float64), False, "scan", dy)
    want = np.asarray(want)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 1e-5


def test_ckpt_gate():
    # window algebra needs the first stored pair to exist
    assert not ckpt_supported(10, 2)
    assert ckpt_supported(31, 2)
    assert not ckpt_supported(8 * 4 + 5, 8)   # f must be 2 or 4
