"""Microbenchmark: XLA-side stream pass bandwidth (stretch-shear, unshear).

Round-2 stage profiles put the stretch-shear at ~40 ms (2 planes) and the
stack/cotangent/unshear passes at ~60-80 GB/s effective -- far under HBM
spec. Hypothesis: the (P, R, W) -> (W, R, P) transpose swaps the minor
dimension (vreg-shuffle-bound); keeping the pair axis minor end-to-end
turns every pass into a major-axis permutation or contiguous broadcast
(full-bandwidth copies).

Measures, at the benchmark geometry (B=64 pairs, base 1023^2, f=2):
  A. reference copy bandwidth (big add)
  B. current _stretch_stream chain ((B, R, C) input)
  C. pairs-minor variant ((R, C, B) input): shear, major-perm transpose,
     interleaved repeat -- no minor swap anywhere
  D. the transposes in isolation

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


def timeit(fn, *args, reps=3, scale=True):
    out = fn(*args)
    float(jnp.asarray(out).ravel()[0])
    best = float("inf")
    for i in range(reps):
        a2 = [a * (1.0 + 1e-6 * (i + 1)) if scale else a for a in args]
        for a in a2:
            float(jnp.asarray(a).ravel()[0])
        t0 = time.perf_counter()
        out = fn(*a2)
        float(jnp.asarray(out).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best, out


def report(name, secs, nbytes):
    print(f"{name:44} {secs*1e3:8.2f} ms  {nbytes/secs/1e9:7.1f} GB/s "
          f"({nbytes/1e9:.2f} GB touched)", flush=True)


@functools.partial(jax.jit, static_argnames=("f",))
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
    sec, _ = timeit(jax.jit(lambda x: x + 1.0), big)
    report("A. elementwise add (r+w)", sec, 2 * big.size * 4)

    base_brc = jnp.asarray(rng.normal(size=(B, Rb, Cb)), jnp.float32)
    row_axis, slab, _ = _layout(B, Rb * f)

    # B. current stretch chain (pairs-on-sublanes geometry)
    cur = jax.jit(functools.partial(_stretch_stream, f=f, dma_batch=4,
                                    row_axis=row_axis, slab=slab))
    sec, out = timeit(cur, base_brc)
    nbytes = (out.size + base_brc.size) * 4
    report(f"B. current _stretch_stream out={out.shape}", sec, nbytes)

    # C. pairs-minor chain
    base_rcp = jnp.asarray(np.moveaxis(np.asarray(base_brc), 0, -1).copy())
    sec, out2 = timeit(stretch_pairs_minor, base_rcp, f)
    nbytes = (out2.size + base_rcp.size) * 4
    report(f"C. pairs-minor stretch out={out2.shape}", sec, nbytes)

    # D. transposes in isolation (base-sized)
    t_bad = jax.jit(lambda x: jnp.transpose(x, (2, 1, 0)))   # minor swap
    sec, _ = timeit(t_bad, base_brc)
    report("D1. transpose (B,R,C)->(C,R,B) minor swap", sec,
           2 * base_brc.size * 4)
    t_good = jax.jit(lambda x: jnp.transpose(x, (1, 0, 2)))  # major perm
    sec, _ = timeit(t_good, base_rcp)
    report("D2. transpose (R,C,P)->(C,R,P) major perm", sec,
           2 * base_rcp.size * 4)

    # E. interleaved repeat alone at refined scale
    St = jnp.asarray(rng.normal(size=(2176, 1023, 64)), jnp.float32)
    sec, _ = timeit(jax.jit(lambda x: jnp.repeat(x, f, axis=1)), St)
    report("E. jnp.repeat x2 rows (r+2w)", sec, 3 * St.size * 4)

    # F. unshear-style flat-pad pass at stack scale
    stk = jnp.asarray(rng.normal(size=(4224, 64, 2048)), jnp.float32)

    @jax.jit
    def unshear(stack):
        Tp = stack.shape[0]
        D = jnp.transpose(stack, (1, 2, 0))   # (P, L, Tp): minor swap!
        P_dim, L_dim, _ = D.shape
        flat = D.reshape(P_dim, L_dim * Tp)
        flat = jnp.pad(flat, ((0, 0), (0, L_dim)))
        return flat.reshape(P_dim, L_dim, Tp + 1)[:, :2047, :2048]

    sec, _ = timeit(unshear, stk)
    report("F. current unshear (stack->grid)", sec, 4 * stk.size * 4)


if __name__ == "__main__":
    main()
