"""On-chip validation + timing of the lane-windowed wavefront compute.

Interpret mode cannot catch DMA/compute races; any kernel dataflow change
needs an on-chip value check before its numbers can be trusted (CLAUDE.md).

Checks, at the benchmark geometry (128 pairs, len 1024, dyadic 1):
1. windowed vs full final values -- must be BIT-equal (active cells only
   ever read real cells; windows freeze only dead continuation rows);
2. windowed vs full cotangents through the stack-sharing adjoint;
3. slope-timed forward kernel cost windowed vs full (two step counts).

Run: timeout 3000 python -u scripts/onchip_window_check.py
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

from sigkernel_tpu.ops import pallas_df64, pallas_adjoint
from sigkernel_tpu.ops.pallas_adjoint import _pad_f

print("devices:", jax.devices())
rng = np.random.default_rng(11)
FAIL = []

B, Mb, Nb, dy = 128, 1023, 1023, 1
f = 2 ** dy

inc = rng.normal(size=(B, Mb, Nb)) * 0.05
hi = jnp.asarray(inc, jnp.float32)
lo = jnp.asarray(inc - np.asarray(hi, np.float64), jnp.float32)
g = jnp.asarray(rng.normal(size=(B,)), jnp.float32)
jax.block_until_ready((hi, lo, g))

import functools


@functools.partial(jax.jit, static_argnames=("seg",))
def val_only(h, l, seg):
    v = pallas_df64._solve_final_one_df(h, l, False, dy, window_seg=seg)
    return v


@functools.partial(jax.jit, static_argnames=("seg",))
def val_stack(h, l, seg):
    return pallas_df64._solve_final_one_df(h, l, False, dy,
                                           stack_pad=_pad_f(f),
                                           window_seg=seg)


import os
MODE = os.environ.get("WINCHECK_MODE", "all")

vfull = np.asarray(val_only(hi, lo, 0)) if MODE in ("all", "val") else None
vwin = np.asarray(val_only(hi, lo, 512)) if MODE in ("all", "val") else None
if MODE in ("all", "val"):
    bit = np.array_equal(vwin, vfull)
    print(f"{'1. windowed final values bit-equal':44s}"
          f" {'OK ' if bit else 'BAD'}"
          f" maxdiff={np.max(np.abs(vwin - vfull)):.3e}")
    if not bit:
        FAIL.append("values")
    del vfull, vwin

if MODE in ("all", "adj"):
    # stack-consuming adjoint A/B: one jit so the stack never leaves the
    # arena (an eager s[None] reshape copies 4.3 GB and OOMs the chip)
    @functools.partial(jax.jit, static_argnames=("seg",))
    def _ct(h, l, gv, seg):
        v, s = pallas_df64._solve_final_one_df(h, l, False, dy,
                                               stack_pad=_pad_f(f),
                                               window_seg=seg)
        return pallas_adjoint.adjoint_fused_collapsed(
            h, gv, naive=False, dyadic_order=dy, fwd_stack=s[None])

    def ct_for(seg):
        return np.asarray(_ct(hi, lo, g, seg))

    ctf = ct_for(0)
    ctw = ct_for(512)
    scale = max(float(np.max(np.abs(ctf))), 1e-30)
    err = float(np.max(np.abs(ctw - ctf)) / scale)
    ok = err < 1e-6 and np.isfinite(ctw).all()
    print(f"{'2. adjoint cotangent (windowed stack)':44s}"
          f" {'OK ' if ok else 'BAD'} scaled_err={err:.3e}")
    if not ok:
        FAIL.append("cotangent")


def slope(fn, n_lo=2, n_hi=6):
    """Per-iteration cost via two chained-dispatch step counts."""
    def chain(h, l, n):
        def body(c, _):
            out = fn(c, l)
            return c * (1.0 + 1e-12 * out.sum()).astype(c.dtype), 0
        c, _ = jax.lax.scan(body, h, jnp.arange(n))
        return c.sum()

    f2 = jax.jit(lambda h, l: chain(h, l, n_lo))
    f6 = jax.jit(lambda h, l: chain(h, l, n_hi))
    float(f2(hi, lo)); float(f6(hi, lo))
    t0 = time.perf_counter(); float(f2(hi, lo)); t2 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(f6(hi, lo)); t6 = time.perf_counter() - t0
    return (t6 - t2) / (n_hi - n_lo) * 1e3, t2 * 1e3, t6 * 1e3


for seg in ((0, 512, 256) if MODE in ("all", "time") else ()):
    ms, t2, t6 = slope(lambda h, l, seg=seg:
                       pallas_df64._solve_final_one_df(h, l, False, dy,
                                                       window_seg=seg))
    print(f"3. fwd kernel seg={seg:4d}: {ms:7.2f} ms/iter "
          f"(t2={t2:.1f} t6={t6:.1f})")

if MODE == "awin":
    # Adjoint reverse-solve windowing A/B: cotangent must be bit-equal.
    import sigkernel_tpu.ops.pallas_solver as ps

    @jax.jit
    def _ct3(h, l, gv):
        v, s = pallas_df64._solve_final_one_df(h, l, False, dy,
                                               stack_pad=_pad_f(f))
        return pallas_adjoint.adjoint_fused_collapsed(
            h, gv, naive=False, dyadic_order=dy, fwd_stack=s[None])

    def ct_seg(seg):
        ps.WINDOW_SEG = seg
        jax.clear_caches()
        return np.asarray(_ct3(hi, lo, g))

    cf = ct_seg(0)
    cw = ct_seg(256)
    bit = np.array_equal(cw, cf)
    print(f"{'A1. windowed-adjoint cotangent bit-equal':44s}"
          f" {'OK ' if bit else 'BAD'}"
          f" maxdiff={np.max(np.abs(cw - cf)):.3e}", flush=True)
    if not bit:
        FAIL.append("awin")
    ps.WINDOW_SEG = 256

if MODE == "wprobe":
    # Pure windowed-step cost at fixed W for the WHOLE sweep (garbage
    # values; timing only): if cost scales ~W/L, windows are fine and the
    # phase-mix math is the discrepancy; if not, per-step overhead = f(W).
    n_b = 1023   # cdiv(cdiv(4091, 2), 2)
    for (ws, W) in ((0, 2048), (0, 1024), (0, 640), (1408, 640), (0, 256)):
        fp = ((0, n_b, ws, W),)
        ms, t2, t6 = slope(lambda h, l, fp=fp:
                           pallas_df64._solve_final_one_df(
                               h, l, False, dy, forced_phases=fp))
        print(f"W1. fixed window ws={ws:4d} W={W:4d}: {ms:7.2f} ms/iter "
              f"(t2={t2:.1f} t6={t6:.1f})", flush=True)

if MODE == "dil":
    print("dil mode removed: base-lane streams were deleted in round 4 "
          "(no dilation spelling lowers on Mosaic; scripts/dilate_probe.py)",
          flush=True)


if MODE == "dma":
    # Retest DMA batch size with honest slope timing (the round-2 "flat in
    # DMA_BATCH" conclusion came from single-dispatch measurements that
    # only saw the relay's fixed dispatch cost). DMA_BATCH is read as a
    # module global by both the stream builder and the scratch shapes.
    for T in (2, 4, 8):
        pallas_df64.DMA_BATCH = T
        for seg in (0, 512):
            ms, t2, t6 = slope(lambda h, l, seg=seg:
                               pallas_df64._solve_final_one_df(
                                   h, l, False, dy, window_seg=seg))
            print(f"4. fwd kernel T={T} seg={seg:4d}: {ms:7.2f} ms/iter "
                  f"(t2={t2:.1f} t6={t6:.1f})", flush=True)
    pallas_df64.DMA_BATCH = 2

print("FAILED:" if FAIL else "ALL OK", FAIL)
sys.exit(1 if FAIL else 0)
