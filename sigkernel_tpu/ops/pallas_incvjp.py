"""Fused RBF increment-chain VJP: one pass over the cotangent grid.

The gen-family backwards end with ``(sigma, X, Y) <- ct`` through
``double_difference(exp(-|x_s - y_t|^2 / sigma))`` (the reference computes
this chain with torch autograd through its Gram prep,
reference sigkernel.py:419-502). The XLA formulation — even hand-fused
(:func:`.df_prep.rbf_dd_vjp`) — materialises the pairwise-distance grid,
the weight grid, and the dd-transposed cotangent as separate HBM arrays:
~10.7 ms of the 128-pair benchmark chunk against a ~1 ms traffic roofline
(docs/BENCHMARKS.md round-5 stage budget).

This kernel reads the cotangent grid ONCE and keeps everything else in
VMEM, one pair per grid step:

- dd-transpose in-kernel: static shifted adds of the (zero-padded)
  cotangent slab (lane roll + sublane concat, masked) — no XLA pad/slice
  chain, no second HBM pass.
- the distance grid via ONE MXU ``dot_general``: the augmented-operand
  trick ``D/sigma = dot([-2x/s; |x|^2/s; 1/s], [y; 1; |y|^2])`` — no
  (M, N) broadcasts of row/column norms, no sublane/lane relayouts.
- ``W = ddT(ct) * exp(-D/sigma) * (-1/sigma)`` fused on the VPU.
- path gradients via two more MXU dots with a ones-row fold: appending a
  ones row to the raw-path operand makes the same dot emit ``W @ Y`` AND
  ``rowsum(W)`` (resp. ``W^T @ X`` / ``colsum(W)``) — the row/column sums
  never exist as separate reductions.
- the sigma cotangent folds into the same pass:
  ``d sigma = -sum(W * (D/sigma))``.

Everything returns in path layout (small); HBM traffic is the ct read
plus KB-scale operands. f32, pairwise layout (the lincomb/bench path);
the Gram layout and f64 grade stay on the XLA formulation
(:func:`.df_prep.rbf_dd_vjp`) — route decided by
:func:`.routes.resolve_incvjp`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_solver import LANES, SUBLANES
from ..utils import ceil_to

# VMEM budget gate: the kernel holds ~5 (Mp, Np) f32 slabs (ct block x2
# buffers, dG, D, W) plus KB-scale operands. 12 MB/slab (~1792^2) keeps
# the total under the 110 MB compiler limit with headroom.
_MAX_SLAB_BYTES = 12 * 1024 * 1024


def supported(B: int, M: int, N: int, d: int) -> bool:
    """Pairwise f32 geometry gate (wrapper pads B/M/N to tiles)."""
    Mp, Np = ceil_to(M, LANES), ceil_to(N, LANES)
    return (d + 2 <= SUBLANES and M >= 2 and N >= 2
            and Mp * Np * 4 <= _MAX_SLAB_BYTES)


def _vjp_kernel(xa_ref, xr_ref, ya_ref, ct_ref,
                dx_ref, dy_ref, ds_ref, *, d):
    """One pair: xa (S, Mp) D-dot operand [-2x/s; |x|^2/s; 1/s; 0...],
    xr (S, Mp) raw [x; 1; 0...], ya (S, Np) raw [y; 1; |y|^2; 0...],
    ct (Mp, Np) zero-padded cotangent PRE-SCALED by -1/sigma (so
    ``W = ddT(ct') * exp(-D/sigma)`` directly -- no in-kernel scalar).
    S = SUBLANES. Outputs: dx (S, Mp) rows [:d], dy (S, Np) rows [:d],
    ds (S, LANES) broadcast scalar."""
    S = xa_ref.shape[1]
    A = ct_ref[0]
    Mp, Np = A.shape
    jj = lax.broadcasted_iota(jnp.int32, (Mp, Np), 1)
    zero = jnp.float32(0.0)

    # dG = ddT(ct): A - A(j-1) - A(i-1) + A(i-1,j-1), zeros flowing in.
    # Factored as the lane difference T = A - A(j-1) followed by the
    # sublane difference T - T(i-1): 5 slab passes instead of 8.
    one_i = jnp.int32(1)  # python-int roll shifts break under x64 (CLAUDE.md)
    T = A - jnp.where(jj == 0, zero, pltpu.roll(A, one_i, axis=1))
    dg = T - jnp.concatenate([jnp.zeros((1, Np), jnp.float32), T[:-1]], 0)

    hi = jax.lax.Precision.HIGHEST
    f32 = jnp.float32
    # D/sigma via the augmented dot (zero pad rows contribute nothing)
    Ds = lax.dot_general(xa_ref[0], ya_ref[0], (((0,), (0,)), ((), ())),
                         precision=hi, preferred_element_type=f32)
    W = dg * jnp.exp(-Ds)
    ds_ref[...] = jnp.full((1, S, ds_ref.shape[2]),
                           -jnp.sum(W * Ds), f32)

    # P[c<d] = W @ y_c, P[d] = rowsum(W)  (ya row d is ones)
    P = lax.dot_general(ya_ref[0], W, (((1,), (1,)), ((), ())),
                        precision=hi, preferred_element_type=f32)
    # Q[c<d] = W^T @ x_c, Q[d] = colsum(W)  (xr row d is ones)
    Q = lax.dot_general(xr_ref[0], W, (((1,), (0,)), ((), ())),
                        precision=hi, preferred_element_type=f32)

    rs = jnp.broadcast_to(P[d:d + 1], (d, Mp))
    cs = jnp.broadcast_to(Q[d:d + 1], (d, Np))
    dx_ref[0, :d] = 2.0 * (rs * xr_ref[0, :d] - P[:d])
    dx_ref[0, d:] = jnp.zeros((S - d, Mp), f32)
    dy_ref[0, :d] = 2.0 * (cs * ya_ref[0, :d] - Q[:d])
    dy_ref[0, d:] = jnp.zeros((S - d, Np), f32)


def rbf_dd_vjp_pallas(X, Y, sigma, ct):
    """Pairwise fused VJP: X (B, M, d), Y (B, N, d) f32, ct (B, M-1, N-1).

    Returns ``(d_sigma, dX, dY)`` matching
    :func:`.df_prep.rbf_dd_vjp(..., gram=False)` at f32 grade.
    """
    B, M, d = X.shape
    N = Y.shape[1]
    assert supported(B, M, N, d), (B, M, N, d)
    Mp, Np = ceil_to(M, LANES), ceil_to(N, LANES)
    S = SUBLANES
    f32 = jnp.float32

    X = X.astype(f32)
    Y = Y.astype(f32)
    inv_sig = (1.0 / jnp.asarray(sigma, f32)).reshape(1)

    def aug(P, L, scaled):
        # (B, L, d) -> (B, S, Lp): rows [paths; ones; |p|^2] or the D-dot
        # operand [-2p/s; |p|^2/s; 1/s] (zero-padded rows + lanes)
        t = jnp.swapaxes(P, 1, 2)                        # (B, d, L)
        sq = jnp.sum(t * t, 1, keepdims=True)            # (B, 1, L)
        ones = jnp.ones((B, 1, P.shape[1]), f32)
        if scaled == "x":
            rows = jnp.concatenate([-2.0 * t, sq, ones], 1) * inv_sig
        elif scaled == "xr":
            rows = jnp.concatenate([t, ones], 1)
        else:                                            # raw y for both dots
            rows = jnp.concatenate([t, ones, sq], 1)
        return jnp.pad(rows, ((0, 0), (0, S - rows.shape[1]),
                              (0, L - P.shape[1])))

    xa = aug(X, Mp, "x")
    xr = aug(X, Mp, "xr")
    ya = aug(Y, Np, "y")
    # -1/sigma folds into the cotangent pad pass: no in-kernel scalar
    # (an SMEM scalar spec's default index map traces i64 under x64,
    # which Mosaic cannot legalize)
    ctp = jnp.pad(ct.astype(f32) * -inv_sig,
                  ((0, 0), (0, Mp - (M - 1)), (0, Np - (N - 1))))

    # index-map zeros derive from b: python-int literals trace to i64
    # under x64 and fail Mosaic legalization (CLAUDE.md)
    imap = lambda b: (b, b * 0, b * 0)
    kernel = functools.partial(_vjp_kernel, d=d)
    grid = (B,)
    dxa, dya, dss = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, S, Mp), imap),
            pl.BlockSpec((1, S, Mp), imap),
            pl.BlockSpec((1, S, Np), imap),
            pl.BlockSpec((1, Mp, Np), imap),
        ],
        out_specs=[
            pl.BlockSpec((1, S, Mp), imap),
            pl.BlockSpec((1, S, Np), imap),
            pl.BlockSpec((1, S, LANES), imap),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S, Mp), f32),
            jax.ShapeDtypeStruct((B, S, Np), f32),
            jax.ShapeDtypeStruct((B, S, LANES), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(xa, xr, ya, ctp)

    dX = jnp.swapaxes(dxa[:, :d, :M], 1, 2)
    dY = jnp.swapaxes(dya[:, :d, :N], 1, 2)
    dsig = jnp.sum(dss[:, 0, 0])
    return dsig, dX, dY
