"""On-chip check of the in-kernel-generation df64 kernel.

The decisive question only silicon can answer: do the error-free
transformations inside ``_df_exp`` / the DF cross-term survive the real
Mosaic compilation (excess precision, FMA contraction)? If they do, gen
values sit within ~1e-12 of the stream route; if any EFT is folded away
they collapse to ~1e-7 (plain f32).

Checks at small + benchmark geometry (128 pairs, len 1024, dyadic 1):
1. gen values vs the df stream route (rel <= 5e-11 at bench grid);
2. emitted hi increments vs the XLA DF prep's hi plane;
3. slope timing: gen(values+stack+inc) vs prep+streams+fwd(stack).

Run: timeout 4000 python -u scripts/onchip_gen_check.py
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sigkernel_tpu.ops import df_prep, pallas_adjoint, pallas_df64 as pd

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(13)
FAIL = []
SIGMA = 1.0


def case(A, B, LEN, dy, label, rel_budget):
    f = 2 ** dy
    X = jnp.asarray(rng.normal(size=(A, LEN, 3)).cumsum(1)
                    / np.sqrt(LEN))
    Y = jnp.asarray(rng.normal(size=(B, LEN, 3)).cumsum(1)
                    / np.sqrt(LEN))
    Xp = jnp.repeat(X, B, 0)
    Yp = jnp.tile(Y, (A, 1, 1))
    jax.block_until_ready((Xp, Yp))

    @jax.jit
    def gen(Xp, Yp):
        return pd.solve_final_df_gen_stack(
            Xp, Yp, SIGMA, False, dy, stack_pad=pallas_adjoint._pad_f(f))

    @jax.jit
    def stream(X, Y):
        hi, lo = df_prep.rbf_increments_df(X, Y, SIGMA, gram=True)
        hi3 = hi.reshape(A * B, LEN - 1, LEN - 1)
        lo3 = lo.reshape(A * B, LEN - 1, LEN - 1)
        v = pd.solve_final_df_pl(hi3, lo3, False, dy)
        return v, hi3

    vg, stk, hig = gen(Xp, Yp)
    vs, hi3 = stream(X, Y)
    vg, hig, vs, hi3 = (np.asarray(a) for a in (vg, hig, vs, hi3))
    rel = np.abs(vg - vs).max() / np.abs(vs).max()
    hs = max(np.abs(hi3).max(), 1e-30)
    hrel = np.abs(hig - hi3).max() / hs
    ok = rel < rel_budget and hrel < 1e-6
    print(f"{label}: values rel={rel:.2e} (budget {rel_budget:.0e}) "
          f"emitted-hi rel={hrel:.2e} {'OK' if ok else 'BAD'}", flush=True)
    if not ok:
        FAIL.append(label)
    return X, Y, Xp, Yp


case(2, 4, 64, 1, "small len64 f=2", 1e-11)
case(2, 2, 33, 2, "small len33 f=4", 1e-11)
X, Y, Xp, Yp = case(8, 16, 1024, 1, "bench len1024 f=2", 5e-10)


def slope(fn, x0, *extras, n_lo=2, n_hi=6):
    def chain(x, *e, n):
        def body(c, _):
            out = fn(c, *e)
            return c * (1.0 + 1e-12 * out).astype(c.dtype), 0
        c, _ = jax.lax.scan(body, x, jnp.arange(n))
        return c.sum()

    f2 = jax.jit(functools.partial(chain, n=n_lo))
    f6 = jax.jit(functools.partial(chain, n=n_hi))
    float(f2(x0, *extras)); float(f6(x0, *extras))
    t0 = time.perf_counter(); float(f2(x0, *extras)); t2 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(f6(x0, *extras)); t6 = time.perf_counter() - t0
    return (t6 - t2) / (n_hi - n_lo) * 1e3, t2 * 1e3, t6 * 1e3


A, B, LEN, dy = 8, 16, 1024, 1
f = 2 ** dy


def gen_full(Xp, Yp):
    v, stk, hig = pd.solve_final_df_gen_stack(
        Xp, Yp, SIGMA, False, dy, stack_pad=pallas_adjoint._pad_f(f))
    return v.sum() + stk[0, ::131].sum() + hig[::7].sum()


def stream_full(X, Y):
    hi, lo = df_prep.rbf_increments_df(X, Y, SIGMA, gram=True)
    hi3 = hi.reshape(A * B, LEN - 1, LEN - 1)
    lo3 = lo.reshape(A * B, LEN - 1, LEN - 1)
    v, stk = pd.solve_final_df_stack_pl(
        hi3, lo3, False, dy, stack_pad=pallas_adjoint._pad_f(f))
    return v.sum() + stk[0, ::131].sum() + hi3[::7].sum()


ms, t2, t6 = slope(gen_full, Xp, Yp)
print(f"gen  fwd(stack+inc):        {ms:7.2f} ms/iter (t2={t2:.0f} t6={t6:.0f})",
      flush=True)
ms, t2, t6 = slope(stream_full, X, Y)
print(f"prep+streams+fwd(stack):    {ms:7.2f} ms/iter (t2={t2:.0f} t6={t6:.0f})",
      flush=True)

print("FAILED:" if FAIL else "ALL OK", FAIL, flush=True)
sys.exit(1 if FAIL else 0)
