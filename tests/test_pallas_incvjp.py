"""Fused Pallas increment-chain VJP vs the XLA formulation.

The kernel (ops/pallas_incvjp.py) must reproduce df_prep.rbf_dd_vjp
(itself pinned against jax.vjp in test_df_prep.py) at f32 grade for every
pairwise geometry the gate admits. Interpret mode on CPU; the on-chip
value check lives in scripts/onchip_validate.py (interpret mode cannot
catch DMA/compute races).
"""
import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigkernel_tpu.ops import df_prep, pallas_incvjp
from sigkernel_tpu.ops.routes import resolve_incvjp

from conftest import make_paths

ON_TPU = jax.devices()[0].platform in ("tpu", "axon")


@contextlib.contextmanager
def _interpret_mode():
    if ON_TPU:
        yield
    else:
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            yield


@pytest.mark.parametrize("B,M,N,d", [
    (3, 20, 33, 2),     # asymmetric, unaligned
    (2, 9, 9, 3),       # square, d = 3 (the benchmark dim)
    (1, 130, 7, 1),     # M beyond one lane tile, d = 1
    (5, 2, 2, 4),       # minimal grid
])
def test_incvjp_kernel_matches_xla(rng, B, M, N, d):
    X = jnp.asarray(make_paths(rng, B, M, d), jnp.float32)
    Y = jnp.asarray(make_paths(rng, B, N, d), jnp.float32)
    sigma = jnp.float32(1.3)
    ct = jnp.asarray(rng.normal(size=(B, M - 1, N - 1)), jnp.float32)

    ds0, dx0, dy0 = df_prep.rbf_dd_vjp(X, Y, sigma, ct, False)
    assert pallas_incvjp.supported(B, M, N, d)
    with _interpret_mode():
        ds1, dx1, dy1 = pallas_incvjp.rbf_dd_vjp_pallas(X, Y, sigma, ct)

    s = float(jnp.max(jnp.abs(dx0))) + 1e-30
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx0),
                               atol=2e-5 * s)
    np.testing.assert_allclose(np.asarray(dy1), np.asarray(dy0),
                               atol=2e-5 * (float(jnp.max(jnp.abs(dy0)))
                                            + 1e-30))
    np.testing.assert_allclose(float(ds1), float(ds0),
                               rtol=2e-4, atol=1e-6)


def test_incvjp_route_matrix(rng):
    """resolve_incvjp: pallas only on TPU + f32 + pairwise + gate."""
    X = jnp.zeros((2, 64, 3), jnp.float32)
    Y = jnp.zeros((2, 64, 3), jnp.float32)
    want = "pallas" if ON_TPU else "xla"
    assert resolve_incvjp(X, Y, gram=False) == want
    assert resolve_incvjp(X, Y, gram=True) == "xla"
    assert resolve_incvjp(X.astype(jnp.float64), Y, gram=False) == "xla"
    big = jnp.zeros((1, 4000, 3), jnp.float32)   # beyond the VMEM gate
    assert resolve_incvjp(big, big, gram=False) == "xla"
    wide = jnp.zeros((1, 16, 7), jnp.float32)    # d + 2 > SUBLANES
    assert resolve_incvjp(wide, wide, gram=False) == "xla"
