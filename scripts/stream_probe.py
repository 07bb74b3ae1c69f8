"""Microbenchmark: XLA-side stream pass bandwidth (stretch-shear, unshear).

The remote relay costs ~27 ms per dispatch, which swamps single-pass
timings at these sizes (the round-2 stage profiles suffered exactly this).
Every measurement here is therefore a SLOPE: the pass is repeated K times
inside one jit via lax.scan (inputs perturbed per repetition so nothing is
CSE'd or memoized), timed at K=2 and K=10, and the per-pass cost is the
difference over 8.

Hypothesis under test: the (P, R, W) -> (W, R, P) transposes in the
stretch/unshear chains swap the minor dimension (vreg-shuffle-bound, far
under HBM spec); keeping the pair axis minor end-to-end makes every pass a
major-axis permutation or contiguous broadcast (full-bandwidth copies).

Run: python scripts/stream_probe.py
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from sigkernel_tpu.ops.pallas_solver import _stretch_stream, _layout
from sigkernel_tpu.utils import ceil_to

LANES = 128


def make_rep(fn, x, K):
    """jit a K-fold repetition of ``fn``: input scalar-perturbed per rep by
    the carry (blocks CSE), output consumed by a random-weighted full
    reduction (blocks DCE and algebraic push-through: ``sum(transpose(x))``
    simplifies to ``sum(x)``, ``sum(r * transpose(x))`` costs a transpose of
    either operand). The weight read adds ~one out-sized pass per rep --
    identical across variants, so comparisons stay apples-to-apples."""
    out_shape = jax.eval_shape(fn, x)
    key = jax.random.PRNGKey(0)
    r = jax.random.uniform(key, out_shape.shape, jnp.float32)

    @jax.jit
    def rep(x0, r):
        def one(acc, i):
            out = fn(x0 * (1.0 + 1e-9 * acc + 1e-9 * i))
            return acc + (out * r).sum() * 1e-12, 0.0

        acc, _ = jax.lax.scan(one, jnp.float32(0.0),
                              jnp.arange(K, dtype=jnp.float32))
        return acc

    return functools.partial(rep, r=r)


def slope(fn, x, reps=2):
    """Per-pass seconds via the K=2 / K=10 slope."""
    r2 = make_rep(fn, x, 2)
    r10 = make_rep(fn, x, 10)
    float(r2(x))
    float(r10(x))
    best2 = best10 = float("inf")
    for i in range(reps):
        xi = x * (1.0 + 1e-6 * (i + 1))
        float(xi.ravel()[0])
        t0 = time.perf_counter()
        float(r2(xi))
        best2 = min(best2, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(r10(xi))
        best10 = min(best10, time.perf_counter() - t0)
    return (best10 - best2) / 8.0


def report(name, secs, nbytes):
    print(f"{name:46} {secs*1e3:8.2f} ms  {nbytes/secs/1e9:7.1f} GB/s "
          f"({nbytes/1e9:.2f} GB touched)", flush=True)


def stretch_pairs_minor(base_rcp, f):
    """(R, C, P) base -> (W, R*f, P) stretched stream; pair axis minor
    throughout, no minor-swapping transpose."""
    R, C, P = base_rcp.shape
    W0 = ceil_to(R + C + 8, LANES)
    W = W0 - 1
    x = jnp.pad(base_rcp, ((0, 0), (0, W0 - C), (0, 0)))
    flat = x.reshape(R * W0, P)[: R * W]
    S = flat.reshape(R, W, P)            # S[r, t, p] = base[r, t-r, p]
    St = jnp.transpose(S, (1, 0, 2))     # (W, R, P): major perm, minor kept
    return jnp.repeat(St, f, axis=1)     # interleave rows -> (W, R*f, P)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    B, Rb, Cb, f = 64, 1023, 1023, 2

    # A. reference copy bandwidth
    big = jnp.asarray(rng.normal(size=(256, 1024, 1024)), jnp.float32)
    sec = slope(lambda x: x + 1.0, big)
    report("A. elementwise add (r+w)", sec, 2 * big.size * 4)

    base_brc = jnp.asarray(rng.normal(size=(B, Rb, Cb)), jnp.float32)
    row_axis, slab, _ = _layout(B, Rb * f)

    # B. current stretch chain (pairs-on-sublanes geometry)
    cur = functools.partial(_stretch_stream, f=f, dma_batch=4,
                            row_axis=row_axis, slab=slab)
    sec = slope(cur, base_brc)
    out_sz = cur(base_brc).size
    report("B. current _stretch_stream", sec, (out_sz + base_brc.size) * 4)

    # C. pairs-minor chain
    base_rcp = jnp.asarray(np.moveaxis(np.asarray(base_brc), 0, -1).copy())
    pm = functools.partial(stretch_pairs_minor, f=f)
    sec = slope(pm, base_rcp)
    out_sz = pm(base_rcp).size
    report("C. pairs-minor stretch", sec, (out_sz + base_rcp.size) * 4)

    # B2. current chain with materialisation barriers between stages:
    # if B is slow because XLA fuses pad+reshape+transpose+repeat into one
    # gather-addressed emitter, forcing stage boundaries restores copy BW
    def stretch_barriers(base3):
        from sigkernel_tpu.ops.pallas_solver import _layout as _lay
        R, C = base3.shape[1], base3.shape[2]
        L = slab[1]
        R_rows = -(-L // f)
        V = R + C
        W0 = ceil_to(max(V + 4 + 1, C + R_rows + 1), LANES)
        W = W0 - 1
        x0 = jnp.pad(base3, ((0, slab[0] - B), (0, R_rows - R),
                             (0, W0 - C)))
        x0 = jax.lax.optimization_barrier(x0)
        flat = x0.reshape(x0.shape[0], R_rows * W0)[:, : R_rows * W]
        Sb = flat.reshape(x0.shape[0], R_rows, W)
        Sb = jax.lax.optimization_barrier(Sb)
        Rt = jnp.transpose(Sb, (2, 0, 1))
        Rt = jax.lax.optimization_barrier(Rt)
        return jnp.repeat(Rt, f, axis=2)[:, :, :L]

    sec = slope(stretch_barriers, base_brc)
    out_sz = jax.eval_shape(stretch_barriers, base_brc).size
    report("B2. stretch with stage barriers", sec,
           (out_sz + base_brc.size) * 4)

    # D. transposes in isolation (base-sized)
    sec = slope(lambda x: jnp.transpose(x, (2, 1, 0)), base_brc)
    report("D1. transpose minor swap (B,R,C)->(C,R,B)", sec,
           2 * base_brc.size * 4)
    sec = slope(lambda x: jnp.transpose(x, (1, 0, 2)), base_rcp)
    report("D2. transpose major perm (R,C,P)->(C,R,P)", sec,
           2 * base_rcp.size * 4)

    # E. interleaved repeat alone at refined scale
    St = jnp.asarray(rng.normal(size=(2176, 1023, 64)), jnp.float32)
    sec = slope(lambda x: jnp.repeat(x, f, axis=1), St)
    report("E. jnp.repeat x2 rows (r+2w)", sec, 3 * St.size * 4)

    # F. unshear-style pass at stack scale (current: minor-swap transpose)
    stk = jnp.asarray(rng.normal(size=(2176, 64, 2048)), jnp.float32)

    def unshear_cur(stack):
        Tp = stack.shape[0]
        D = jnp.transpose(stack, (1, 2, 0))   # (P, L, Tp): minor swap!
        P_dim, L_dim, _ = D.shape
        flat = D.reshape(P_dim, L_dim * Tp)
        flat = jnp.pad(flat, ((0, 0), (0, L_dim)))
        return flat.reshape(P_dim, L_dim, Tp + 1)[:, :2047, :2048]

    sec = slope(unshear_cur, stk)
    report("F1. current unshear (minor-swap transpose)", sec,
           4 * stk.size * 4)

    # F2. pairs-minor unshear: stack (Tp, L, P) -> grid (L, W, P)
    stk2 = jnp.asarray(rng.normal(size=(2176, 2048, 64)), jnp.float32)

    def unshear_pm(stack):
        Tp, L, P = stack.shape
        D = jnp.transpose(stack, (1, 0, 2))   # (L, Tp, P): major perm
        flat = D.reshape(L * Tp, P)
        flat = jnp.pad(flat, ((0, L), (0, 0)))
        return flat.reshape(L, Tp + 1, P)[:2047, :2048, :]

    sec = slope(unshear_pm, stk2)
    report("F2. pairs-minor unshear (major-perm)", sec, 4 * stk2.size * 4)

    # F3. current unshear with a barrier after the transpose
    def unshear_bar(stack):
        Tp = stack.shape[0]
        D = jnp.transpose(stack, (1, 2, 0))
        D = jax.lax.optimization_barrier(D)
        P_dim, L_dim, _ = D.shape
        flat = D.reshape(P_dim, L_dim * Tp)
        flat = jnp.pad(flat, ((0, 0), (0, L_dim)))
        return flat.reshape(P_dim, L_dim, Tp + 1)[:, :2047, :2048]

    sec = slope(unshear_bar, stk)
    report("F3. unshear with barrier", sec, 4 * stk.size * 4)

    # G. chain pieces in isolation
    sec = slope(lambda x: jnp.pad(x, ((0, 0), (0, 1), (0, 2176 - Cb))), base_brc)
    report("G1. pad (B,R,C)->(B,R+1,2176)", sec,
           (base_brc.size + 64 * 1024 * 2176) * 4)

    padded = jnp.asarray(rng.normal(size=(B, 1024, 2176)), jnp.float32)

    def flat_reshape(x):
        Wm = 2175
        return x.reshape(B, 1024 * 2176)[:, :1024 * Wm].reshape(B, 1024, Wm)

    sec = slope(flat_reshape, padded)
    report("G2. flat-trick reshape (prefix slice)", sec, 2 * padded.size * 4)

    def flat_transpose(x):
        Wm = 2175
        S = x.reshape(B, 1024 * 2176)[:, :1024 * Wm].reshape(B, 1024, Wm)
        return jnp.transpose(S, (2, 0, 1))

    sec = slope(flat_transpose, padded)
    report("G3. flat reshape + transpose fused", sec, 2 * padded.size * 4)

    def flat_transpose_bar(x):
        Wm = 2175
        S = x.reshape(B, 1024 * 2176)[:, :1024 * Wm].reshape(B, 1024, Wm)
        S = jax.lax.optimization_barrier(S)
        return jnp.transpose(S, (2, 0, 1))

    sec = slope(flat_transpose_bar, padded)
    report("G4. flat reshape | barrier | transpose", sec, 2 * padded.size * 4)

    # H. THE HYPOTHESIS: pair axis minor and padded to 128 makes the
    # flat-trick shear's per-row shift a whole 512-byte vreg row -- an
    # aligned block copy instead of an element-shuffle.
    P128 = 128
    pad_rcp = jnp.asarray(rng.normal(size=(1024, 2176, P128)), jnp.float32)

    def flat_reshape_p128(x):
        R, W0, P = x.shape
        Wm = W0 - 1
        return x.reshape(R * W0, P)[: R * Wm].reshape(R, Wm, P)

    sec = slope(flat_reshape_p128, pad_rcp)
    report("H1. flat reshape, P=128 minor (512B shifts)", sec,
           2 * pad_rcp.size * 4)

    # H2. full pairs-on-lanes stretch chain at P=128:
    # pad -> aligned flat shear -> interleaved row repeat -> major-perm
    base_rcp128 = jnp.asarray(rng.normal(size=(Rb, Cb, P128)), jnp.float32)

    def stretch_pol(x):
        R, C, P = x.shape
        W0 = ceil_to(R + C + 8, LANES)
        Wm = W0 - 1
        xp = jnp.pad(x, ((0, 1), (0, W0 - C), (0, 0)))
        S = xp.reshape((R + 1) * W0, P)[: (R + 1) * Wm]
        S = S.reshape(R + 1, Wm, P)[:R]      # S[r, t, p] = x[r, t-r, p]
        L = jnp.repeat(S, f, axis=0)         # rows -> refined rows
        return jnp.transpose(L, (1, 0, 2))   # (W, L, P): major perm only

    sec = slope(stretch_pol, base_rcp128)
    out_sz = jax.eval_shape(stretch_pol, base_rcp128).size
    report("H2. pairs-on-lanes stretch chain (P=128)", sec,
           (out_sz + base_rcp128.size) * 4)

    # H3. unshear equivalent at P=128 minor: stack (L, Tp, P) flat trick
    stk3 = jnp.asarray(rng.normal(size=(2048, 2176, P128 // 2)), jnp.float32)

    def unshear_p64(stack):
        Lr, Tp, P = stack.shape
        flat = stack.reshape(Lr * Tp, P)
        flat = jnp.pad(flat, ((0, Tp), (0, 0)))
        return flat.reshape(Lr, Tp + 1, P)[:2047, :2048, :]

    sec = slope(unshear_p64, stk3)
    report("H3. pairs-minor unshear (P=64 minor)", sec, 4 * stk3.size * 4)


if __name__ == "__main__":
    main()
