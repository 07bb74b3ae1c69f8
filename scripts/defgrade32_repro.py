"""Minimal repro / bisection for the round-4 chunk-32 TPU worker crash.

Round-4 record (docs/BENCHMARKS.md): the default-grade (grid-route df64)
backward at the 10k-pair benchmark config, pair_chunk=32, COMPILED and then
crashed the TPU worker (UNAVAILABLE, restart) on first execution
(/tmp/defgrade32.log). A compiled config that kills the worker is a latent
kernel fault until proven otherwise (possible out-of-bounds DMA at the
small-chunk slab geometry).

The suspect dataflow: `_grid_route_bwd` at chunk 32 concatenates inc +
flipped inc -> 64 pairs, and `pallas_df64.solve_grid` emits BOTH full
diagonal stacks (grid_out=True) at slab (64, 2048). This script isolates
each stage at exactly that geometry, smallest-first, fetching a scalar
after every stage so the crash point is unambiguous in the log:

  1. df64 final-corner solve, 64 pairs, len-1024 dyadic-1   (no stacks)
  2. solve_grid same geometry                               (both stacks + unshear)
  3. _grid_route_bwd end-to-end                             (2x solve_grid + KK)
  4. the full default-grade lincomb chunk backward (old chain route,
     SIG route forced via grad_solver='df64' -> grid route)
  5. the full 10k-pair lincomb at pair_chunk=32, TODAY'S default
     (grad_solver='auto' -> stream-free gen_df adjoint)
  6. the full 10k-pair lincomb at pair_chunk=32 on the ROUND-4 route
     (grad_solver='df64' -> grid route) — the exact crashing program

Run:  python -u scripts/defgrade32_repro.py [stages...]
      (default: 1 2 3 4; the lincomb stages are opt-in: `5`, `6`)
"""
import os, sys, time
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
from sigkernel_tpu.ops import pallas_df64, scan_solver, solve as solve_mod
from sigkernel_tpu.utils import double_difference

LENGTH = int(os.environ.get("REPRO_LENGTH", 1024))
CHUNK = int(os.environ.get("REPRO_CHUNK", 32))
DY = 1

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
X = jnp.asarray(rng.normal(size=(CHUNK, LENGTH, 3)).cumsum(1)
                * (1.0 / np.sqrt(LENGTH)))
Y = jnp.asarray(rng.normal(size=(CHUNK, LENGTH, 3)).cumsum(1)
                * (1.0 / np.sqrt(LENGTH)))
k = sk.RBFKernel(1.0)
inc = double_difference(k.batch_kernel(X, Y))
inc_rev = jnp.flip(jnp.flip(inc, axis=-1), axis=-2)
both = jnp.concatenate([inc, inc_rev], axis=0)
jax.block_until_ready(both)
stages = sys.argv[1:] or ["1", "2", "3", "4"]

if "1" in stages:
    t0 = time.time()
    v = pallas_df64.solve_final(both, dyadic_order=DY)
    print(f"stage1 final-corner 2x{CHUNK} pairs: {float(v[0]):.6f} "
          f"({time.time()-t0:.1f}s)", flush=True)

if "2" in stages:
    t0 = time.time()
    g = pallas_df64.solve_grid(both, dyadic_order=DY)
    print(f"stage2 solve_grid: corner={float(g[0, -1, -1]):.6f} "
          f"({time.time()-t0:.1f}s)", flush=True)
    del g

if "3" in stages:
    t0 = time.time()
    (ct,) = solve_mod._grid_route_bwd(inc, jnp.ones((CHUNK,)), False,
                                      "auto", DY)
    print(f"stage3 grid_route_bwd: |ct|max={float(jnp.abs(ct).max()):.3e} "
          f"({time.time()-t0:.1f}s)", flush=True)
    del ct

if "5" in stages or "6" in stages:
    # The round-4 crash context was NOT a single chunk: it was the full
    # 10k-pair lincomb program at pair_chunk=32 (313 scan iterations over
    # the batch-100 Gram). Stage 5 runs today's production default
    # (grad_solver='auto' -> stream-free gen_df adjoint) at that chunk;
    # stage 6 reproduces the round-4 route exactly (grad_solver='df64'
    # -> grid route, per-chunk stream + both diagonal stacks).
    A = int(os.environ.get("REPRO_GRAM", 100))
    Xg = jnp.asarray(rng.normal(size=(A, LENGTH, 3)).cumsum(1)
                     * (1.0 / np.sqrt(LENGTH)))
    Yg = jnp.asarray(rng.normal(size=(A, LENGTH, 3)).cumsum(1)
                     * (1.0 / np.sqrt(LENGTH)))
    W = jnp.asarray(rng.normal(size=(A, A)))
    jax.block_until_ready(W)

    def lincomb_grad(gs):
        def loss(x):
            return sk.sig_gram_lincomb(k, x, Yg, W, dyadic_order=DY,
                                       grad_solver=gs, pair_chunk=CHUNK)
        t0 = time.time()
        v, g = jax.value_and_grad(loss)(Xg)
        v, gm = float(v), float(jnp.abs(g).max())
        return v, gm, time.time() - t0

    if "5" in stages:
        v, gm, dt = lincomb_grad("auto")
        print(f"stage5 lincomb-{A * A}p chunk-{CHUNK} default-grade: "
              f"S={v:.6f} |g|max={gm:.3e} ({dt:.1f}s)", flush=True)
    if "6" in stages:
        v, gm, dt = lincomb_grad("df64")
        print(f"stage6 lincomb-{A * A}p chunk-{CHUNK} df64 grid route "
              f"(round-4 path): S={v:.6f} |g|max={gm:.3e} ({dt:.1f}s)",
              flush=True)

if "4" in stages:
    t0 = time.time()
    # the exact round-4 path: grad_solver='df64' forces the chain route
    # (resolve_hybrid_bwd only fires for 'auto'-graded df_hybrid; 'df64'
    # in _df_route returns False -> inc route -> grid bwd)
    def loss(x):
        v = sk.sig_kernel(k, x, Y, dyadic_order=DY, grad_solver="df64",
                          max_batch=None)
        return v.sum()
    g = jax.grad(loss)(X)
    print(f"stage4 df64-grade chunk bwd: |g|max={float(jnp.abs(g).max()):.3e} "
          f"({time.time()-t0:.1f}s)", flush=True)

print("DEFGRADE32_REPRO_OK", flush=True)
