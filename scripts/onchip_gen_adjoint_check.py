"""On-chip check of the gen ADJOINT (in-kernel reverse-stream generation).

Interpret mode runs async copies synchronously and cannot catch
DMA/compute races; the gen adjoint has a new fstk DMA cadence (T_GEN
base slots per batch vs TB) and interleaves generation with the reverse
sweep, so the decisive questions only silicon can answer:

1. values: cotangent of ``adjoint_planes_collapsed_gen`` vs the streamed
   ``adjoint_planes_collapsed`` on the same forward (expected BIT-equal:
   interpret mode agrees to 0.0, the generated reverse diagonals are the
   DF-commuted transposed-flipped forward increments, and the products
   accumulate in the same order);
2. the end-to-end ``_rbf_gen`` gradient with SIG_GEN_ADJOINT=1 vs =0;
3. slope timing of the full fwd+bwd both ways at the benchmark geometry.

Run: timeout 4000 python -u scripts/onchip_gen_adjoint_check.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sigkernel_tpu.ops import pallas_adjoint, pallas_df64 as pd

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(17)
FAIL = []
SIGMA = 1.0


def case(B, M, N, dy, label, budget=1e-6):
    f = 2 ** dy
    Xp = jnp.asarray(rng.normal(size=(B, M, 3)).cumsum(1) / np.sqrt(M))
    Yp = jnp.asarray(rng.normal(size=(B, N, 3)).cumsum(1) / np.sqrt(N))
    g = jnp.asarray(rng.normal(size=(B,)), jnp.float32)
    jax.block_until_ready((Xp, Yp))

    @jax.jit
    def streamed(Xp, Yp, g):
        _, stk, hig = pd.solve_final_df_gen_stack(
            Xp, Yp, SIGMA, False, dy, stack_pad=pallas_adjoint._pad_f(f))
        return pallas_adjoint.adjoint_planes_collapsed(
            hig, g, False, dy, fwd_stack=stk)

    @jax.jit
    def gen(Xp, Yp, g):
        _, stk = pd.solve_final_df_gen_stack(
            Xp, Yp, SIGMA, False, dy,
            stack_pad=pallas_adjoint._pad_f_gen(f), emit_inc=False)
        return pallas_adjoint.adjoint_planes_collapsed_gen(
            Xp, Yp, SIGMA, g, False, dy, fwd_stack=stk)

    want = np.asarray(streamed(Xp, Yp, g))
    got = np.asarray(gen(Xp, Yp, g))
    scale = max(np.abs(want).max(), 1e-30)
    rel = np.abs(got - want).max() / scale
    ok = rel < budget
    print(f"{label}: cot rel={rel:.2e} (budget {budget:.0e}) "
          f"{'OK' if ok else 'BAD'}", flush=True)
    if not ok:
        FAIL.append(label)


case(8, 65, 65, 1, "small len65 f=2")
case(4, 33, 33, 2, "small len33 f=4")
case(128, 1024, 1024, 1, "bench 128p len1024 f=2", budget=1e-6)


# --- end-to-end gradient: _rbf_gen with the gen adjoint vs streamed ---
from sigkernel_tpu import RBFKernel
from sigkernel_tpu import sigkernel as sk_mod

A, B, LEN, dy = 8, 16, 1024, 1
X = jnp.asarray(rng.normal(size=(A, LEN, 3)).cumsum(1) / np.sqrt(LEN))
Y = jnp.asarray(rng.normal(size=(B, LEN, 3)).cumsum(1) / np.sqrt(LEN))
w = jnp.asarray(rng.normal(size=(A, B)))
jax.block_until_ready((X, Y))


def loss(x, y):
    v = sk_mod._rbf_gen(RBFKernel(sigma=SIGMA), x, y, True, False, dy)
    return (v * w).sum()


os.environ["SIG_GEN_ADJOINT"] = "0"
g_stream = jax.jit(jax.grad(loss, argnums=(0, 1)))
gs = jax.block_until_ready(g_stream(X, Y))
os.environ["SIG_GEN_ADJOINT"] = "1"
g_gen = jax.jit(jax.grad(loss, argnums=(0, 1)))
gg = jax.block_until_ready(g_gen(X, Y))
for name, a, b in (("dX", gs[0], gg[0]), ("dY", gs[1], gg[1])):
    a, b = np.asarray(a), np.asarray(b)
    rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
    ok = rel < 1e-6
    print(f"e2e grad {name}: rel={rel:.2e} {'OK' if ok else 'BAD'}",
          flush=True)
    if not ok:
        FAIL.append(f"e2e {name}")


def slope(fn, n_lo=2, n_hi=6):
    def chain(x, y, n):
        def body(c, _):
            gx, gy = fn(c[0], c[1])
            return ((c[0] * (1.0 + 1e-12 * gx.sum()).astype(c[0].dtype),
                     c[1] * (1.0 + 1e-12 * gy.sum()).astype(c[1].dtype)),
                    0)
        c, _ = jax.lax.scan(body, (x, y), jnp.arange(n))
        return c[0].sum() + c[1].sum()

    f2 = jax.jit(functools.partial(chain, n=n_lo))
    f6 = jax.jit(functools.partial(chain, n=n_hi))
    float(f2(X, Y)); float(f6(X, Y))
    t0 = time.perf_counter(); float(f2(X, Y)); t2 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(f6(X, Y)); t6 = time.perf_counter() - t0
    return (t6 - t2) / (n_hi - n_lo) * 1e3, t2 * 1e3, t6 * 1e3


os.environ["SIG_GEN_ADJOINT"] = "0"
ms, t2, t6 = slope(lambda x, y: jax.grad(loss, argnums=(0, 1))(x, y))
print(f"fwd+bwd streamed adjoint: {ms:7.2f} ms/iter (t2={t2:.0f} t6={t6:.0f})",
      flush=True)
os.environ["SIG_GEN_ADJOINT"] = "1"
ms, t2, t6 = slope(lambda x, y: jax.grad(loss, argnums=(0, 1))(x, y))
print(f"fwd+bwd gen adjoint:      {ms:7.2f} ms/iter (t2={t2:.0f} t6={t6:.0f})",
      flush=True)

print("FAILED:" if FAIL else "ALL OK", FAIL, flush=True)
sys.exit(1 if FAIL else 0)
