"""Stage budget of the f32 matched-precision (gen32) fwd+bwd at the
benchmark config — the roofline case for verdict item 5 (round 5).

Decomposes one 128-pair chunk of the 10k-pair lincomb into cumulative
stages, each timed with the honest protocol (inputs varied per iteration
so the relay cannot replay a memoised dispatch; scalar fetched inside the
timed region):

  a. fwd, no stack          solve_final_f32_gen
  b. fwd + stack write      solve_final_f32_gen_stack
  c. b + gen32 adjoint      + adjoint_planes_collapsed_gen32 (stack read,
                              reverse sweep regenerated in-kernel, collapse)
  d. full custom_vjp grad   + dd/RBF increment VJP chain (base cotangent
                              -> path gradient)

Stage costs are the successive differences. HBM/VPU roofline notes:
the forward stack at this config is n_steps x B x Lbf f32 (~4.3 GB);
stage b-a is its write cost, c-b bounds the adjoint's read+sweep.

Run:  python -u scripts/gen32_profile.py  [B [LENGTH [DYADIC]]]
"""
import os
import sys
import time

os.environ.setdefault("JAX_ENABLE_X64", "true")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import sigkernel_tpu as sk
from sigkernel_tpu import sigkernel as sk_mod
from sigkernel_tpu.ops import pallas_adjoint, pallas_gen32

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
LENGTH = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
DY = int(sys.argv[3]) if len(sys.argv) > 3 else 1
ITERS = int(os.environ.get("PROFILE_ITERS", "3"))
SIGMA = 1.0

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
X0 = jnp.asarray(rng.normal(size=(B, LENGTH, 3)).cumsum(1)
                 * (1.0 / np.sqrt(LENGTH)), jnp.float32)
Y0 = jnp.asarray(rng.normal(size=(B, LENGTH, 3)).cumsum(1)
                 * (1.0 / np.sqrt(LENGTH)), jnp.float32)
pad = pallas_adjoint._pad_f_gen(2 ** DY)


def stage_a(X, Y):
    return pallas_gen32.solve_final_f32_gen(X, Y, SIGMA, dyadic_order=DY)


def stage_b(X, Y):
    v, stk = pallas_gen32.solve_final_f32_gen_stack(
        X, Y, SIGMA, dyadic_order=DY, stack_pad=pad)
    # consume one stack element so XLA cannot DCE the emission
    # (stack layout: (nc, Tp, f, P, L))
    return v + stk[0, 0, 0, 0, 0] * jnp.float32(1e-30)


def stage_c(X, Y):
    v, stk = pallas_gen32.solve_final_f32_gen_stack(
        X, Y, SIGMA, dyadic_order=DY, stack_pad=pad)
    ct = pallas_adjoint.adjoint_planes_collapsed_gen32(
        X, Y, SIGMA, jnp.ones((B,), jnp.float32), naive=False,
        dyadic_order=DY, fwd_stack=stk)
    return v.sum() + ct.sum()


def stage_d(X, Y):
    k = sk.RBFKernel(SIGMA)

    def loss(x):
        return sk_mod._rbf_gen32(k, x, Y, False, False, DY).sum()

    return jax.value_and_grad(loss)(X)[1].sum()


def measure(name, fn):
    jfn = jax.jit(fn)
    out = jfn(X0, Y0)
    float(jnp.asarray(out).ravel()[0])  # compile + warm
    ts = []
    for i in range(ITERS):
        Xi = X0 * (1.0 + np.float32(1e-4) * (i + 1))
        float(Xi.ravel()[0])
        t0 = time.perf_counter()
        out = jfn(Xi, Y0)
        float(jnp.asarray(out).ravel()[0])
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"{name}: {t*1e3:.1f} ms  ({B/t:.1f} pairs/s)", flush=True)
    return t


ta = measure("a fwd_nostack      ", stage_a)
tb = measure("b fwd+stack        ", stage_b)
tc = measure("c fwd+stack+adjoint", stage_c)
td = measure("d full grad        ", stage_d)

n_steps = ((LENGTH - 1) * 2 ** DY) * 2 - 1
stack_gb = n_steps * B * ((LENGTH - 1) * 2 ** DY + 256) * 4 / 1e9
print(f"\nstage deltas (B={B}, len={LENGTH}, dyadic={DY}):", flush=True)
print(f"  sweep+gen (a)        : {ta*1e3:8.1f} ms", flush=True)
print(f"  stack write (b-a)    : {(tb-ta)*1e3:8.1f} ms  "
      f"(~{stack_gb:.1f} GB -> {stack_gb/max(tb-ta,1e-9):.0f} GB/s)",
      flush=True)
print(f"  adjoint (c-b)        : {(tc-tb)*1e3:8.1f} ms", flush=True)
print(f"  inc-VJP chain (d-c)  : {(td-tc)*1e3:8.1f} ms", flush=True)
print("GEN32_PROFILE_OK", flush=True)
