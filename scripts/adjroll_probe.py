"""Is the gen32 adjoint's per-step DYNAMIC-shift roll the 22-25 ms cost?

The product stage of `_product_collapse_planes_gen32_kernel` rolls the
reverse-sweep state by a per-step traced shift (`pltpu.roll(state, sh,
axis=1)`) before multiplying with the forward-stack slab — the forward
sweep only ever uses static shift-1 rolls, and the adjoint measures ~3x
its DMA+sweep roofline (docs/BENCHMARKS.md round-5 stage budget).

This probe monkeypatches `pltpu.roll` so TRACED-shift rolls become
identity (static ones untouched), retimes stages b (fwd+stack) and c
(fwd+stack+adjoint) from scripts/gen32_profile.py, and prints the deltas.
RESULTS ARE NUMERICALLY WRONG — timing only. If (c-b) collapses toward
the roofline, the dynamic roll is the lever.

Run:  python -u scripts/adjroll_probe.py  [B [LENGTH [DYADIC]]]
"""
import os
import sys
import time

os.environ.setdefault("JAX_ENABLE_X64", "true")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

from jax.experimental.pallas import tpu as pltpu

_orig_roll = pltpu.roll


def _roll_shim(x, shift, axis=0, **kw):
    if isinstance(shift, jax.core.Tracer):
        return x  # dynamic roll -> identity (timing probe only)
    return _orig_roll(x, shift, axis=axis, **kw)


pltpu.roll = _roll_shim

from sigkernel_tpu.ops import pallas_adjoint, pallas_gen32  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
LENGTH = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
DY = int(sys.argv[3]) if len(sys.argv) > 3 else 1
SIGMA = 1.0

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
X0 = jnp.asarray(rng.normal(size=(B, LENGTH, 3)).cumsum(1)
                 * (1.0 / np.sqrt(LENGTH)), jnp.float32)
Y0 = jnp.asarray(rng.normal(size=(B, LENGTH, 3)).cumsum(1)
                 * (1.0 / np.sqrt(LENGTH)), jnp.float32)
pad = pallas_adjoint._pad_f_gen(2 ** DY)


def stage_b(X, Y):
    v, stk = pallas_gen32.solve_final_f32_gen_stack(
        X, Y, SIGMA, dyadic_order=DY, stack_pad=pad)
    return v + stk[0, 0, 0, 0, 0] * jnp.float32(1e-30)


def stage_c(X, Y):
    v, stk = pallas_gen32.solve_final_f32_gen_stack(
        X, Y, SIGMA, dyadic_order=DY, stack_pad=pad)
    ct = pallas_adjoint.adjoint_planes_collapsed_gen32(
        X, Y, SIGMA, jnp.ones((B,), jnp.float32), naive=False,
        dyadic_order=DY, fwd_stack=stk)
    return v.sum() + ct.sum()


def measure(name, fn):
    jfn = jax.jit(fn)
    out = jfn(X0, Y0)
    float(jnp.asarray(out).ravel()[0])
    ts = []
    for i in range(3):
        Xi = X0 * (1.0 + np.float32(1e-4) * (i + 1))
        float(Xi.ravel()[0])
        t0 = time.perf_counter()
        out = jfn(Xi, Y0)
        float(jnp.asarray(out).ravel()[0])
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"{name}: {t*1e3:.1f} ms", flush=True)
    return t


tb = measure("b fwd+stack (noroll)", stage_b)
tc = measure("c +adjoint  (noroll)", stage_c)
print(f"adjoint delta WITHOUT dynamic rolls: {(tc-tb)*1e3:.1f} ms "
      f"(with: ~22-25 ms)", flush=True)
print("ADJROLL_PROBE_OK", flush=True)
