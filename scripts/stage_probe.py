"""Slope-based stage budget of the benchmark fwd+bwd step (round 3).

Times each pipeline stage of the df64 stack-shared Gram step at the exact
benchmark geometry (128 pairs, len 1024, dyadic 1) by chaining N data-
dependent iterations inside one jit (the relay's ~27 ms dispatch cost and
any constant folding amortize across N; per-iter cost is the slope between
two N values). All stage operands are passed as jit ARGUMENTS -- a
closed-over 0.5 GB array becomes an HLO constant and blows the remote
compiler's request-size limit (HTTP 413).

Run on the chip:  python scripts/stage_probe.py 2>&1 | grep -v WARNING
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
# persistent compile cache: remote compiles at benchmark shapes take tens
# of minutes; share them across probe scripts and bench.py
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sigkernel_tpu.ops import df_prep, pallas_df64, pallas_adjoint
from sigkernel_tpu.ops.pallas_df64 import (_pad_skew_components,
                                           _solve_final_one_df)
from sigkernel_tpu.ops.pallas_adjoint import _pad_f

A, B, LEN, D, DYADIC = 8, 16, 1024, 3, 1
SIGMA = 1.0
F = 2 ** DYADIC

rng = np.random.default_rng(0)
X = jnp.asarray(rng.normal(size=(A, LEN, D)).cumsum(1) / np.sqrt(LEN))
Y = jnp.asarray(rng.normal(size=(B, LEN, D)).cumsum(1) / np.sqrt(LEN))


def chain(fn, x0, n):
    """Run fn n times with data dependence; returns a scalar."""
    def body(c, _):
        out = fn(c)
        # fold the output back into the carry so nothing is elided
        return c * (1.0 + 1e-12 * out).astype(c.dtype), out.astype(c.dtype)
    c, outs = jax.lax.scan(body, x0, jnp.arange(n))
    return outs.sum()


def timeit(label, make_fn, x0, *extras, ns=(2, 6)):
    """make_fn(c, *extras) -> scalar; extras are jit args, not constants."""
    ts = {}
    for n in ns:
        f = jax.jit(lambda x, *e, n=n: chain(
            lambda c: make_fn(c, *e), x, n))
        float(f(x0, *extras))            # compile + warm
        best = 1e9
        for _ in range(2):
            jax.block_until_ready(x0)
            t0 = time.perf_counter()
            float(f(x0, *extras))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    slope = (ts[ns[1]] - ts[ns[0]]) / (ns[1] - ns[0])
    print(f"{label:36s} {slope*1e3:9.2f} ms/iter   "
          f"(t{ns[0]}={ts[ns[0]]*1e3:.1f} t{ns[1]}={ts[ns[1]]*1e3:.1f})",
          flush=True)
    return slope


print("devices:", jax.devices())

# ---- stage 1: df prep forward ------------------------------------------
def prep(X):
    hi, lo = df_prep.rbf_increments_df(X, Y, SIGMA, gram=True)
    return hi.sum() + lo.sum()

timeit("1. df_prep fwd (RBF dd, 128 prs)", prep, X)

# materialize prep outputs for later stages
hi4, lo4 = df_prep.rbf_increments_df(X, Y, SIGMA, gram=True)
hi3 = hi4.reshape(A * B, LEN - 1, LEN - 1)
lo3 = lo4.reshape(A * B, LEN - 1, LEN - 1)
jax.block_until_ready((hi3, lo3))

# ---- stage 2: stream construction --------------------------------------
def streams(h, l):
    skh, skl, *_ = _pad_skew_components(h, l, DYADIC)
    return skh[::97].sum() + skl[::97].sum()

timeit("2. fwd stream construction", streams, hi3, lo3)

# ---- stage 3: df64 forward kernel + stack emission ---------------------
PADF = _pad_f(F)

def fwd_kernel(h, l):
    val, stk = _solve_final_one_df(h, l, False, DYADIC, stack_pad=PADF)
    return val.sum() + stk[::131].sum()

timeit("3. df64 fwd kernel (+full stack)", fwd_kernel, hi3, lo3)

def fwd_nostack(h, l):
    val = _solve_final_one_df(h, l, False, DYADIC)
    return val.sum()

timeit("3b. df64 fwd kernel (no stack)", fwd_nostack, hi3, lo3)

def fwd_ckpt(h, l):
    val, stk = _solve_final_one_df(h, l, False, DYADIC, ckpt=True)
    return val.sum() + stk[::131].sum()

timeit("3c. df64 fwd kernel (ckpt stack)", fwd_ckpt, hi3, lo3)

# ---- stage 4: fused collapsed adjoint (with given stack) ---------------
# stacks are GBs: materialize/free them one at a time (a live full stack
# plus the ckpt solve's transient streams exhausted HBM once)
g = jnp.ones((A * B,), jnp.float32)
val, stk = _solve_final_one_df(hi3, lo3, False, DYADIC, stack_pad=PADF)
jax.block_until_ready(stk)
del val

def adj(h, s):
    ct = pallas_adjoint.adjoint_fused_collapsed(
        h, g, naive=False, dyadic_order=DYADIC, fwd_stack=s[None])
    return ct.sum()

timeit("4. fused collapsed adjoint", adj, hi3, stk)
del stk

_, stk_ck = _solve_final_one_df(hi3, lo3, False, DYADIC, ckpt=True)
jax.block_until_ready(stk_ck)

def adj_ck(h, s):
    ct = pallas_adjoint.adjoint_ckpt_collapsed(
        h, g, naive=False, dyadic_order=DYADIC, ckpt_stack=s[None])
    return ct.sum()

timeit("4c. ckpt adjoint (sparse stack)", adj_ck, hi3, stk_ck)
del stk_ck

def adj_own(h):
    ct = pallas_adjoint.adjoint_fused_collapsed(
        h, g, naive=False, dyadic_order=DYADIC)
    return ct.sum()

timeit("4b. adjoint incl. own stack solve", adj_own, hi3)

# ---- stage 5: prep VJP --------------------------------------------------
ct = jnp.ones((A, B, LEN - 1, LEN - 1), jnp.float32)
x32 = X.astype(jnp.float32)
y32 = Y.astype(jnp.float32)

def prep_vjp(x, ctv):
    _, vjp = jax.vjp(
        lambda a: df_prep._rbf_dd_f32(a, y32, jnp.float32(SIGMA), True), x)
    (gx,) = vjp(ctv)
    return gx.sum()

timeit("5. df_prep VJP (f32)", prep_vjp, x32, ct)

print("done")
