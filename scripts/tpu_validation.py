"""Hardware validation of interpret-verified features (run on a real TPU).

Round-2 surface: df32 XLA-level error-free transforms (the excess-precision
folding hazard interpret mode cannot catch), double-float increment prep,
solve_df, the fused adjoint, the Pallas derivatives tier, fused
linear/RBF kernels, the df64 value path, the blocked long-path solver, and
a gradient-accuracy pin at the benchmark size. Ordered smallest-first so a
relay death still leaves a usable partial record; every line flushes.

Usage:  python -u scripts/tpu_validation.py [--quick] | tee .round2/tpu_val.log
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

import sigkernel_tpu as sk
from sigkernel_tpu.ops import (scan_solver, pallas_solver, pallas_fused,
                               pallas_adjoint, pallas_blocked,
                               pallas_derivatives, df32, df_prep)
from sigkernel_tpu.utils.profiling import sync

QUICK = "--quick" in sys.argv
rng = np.random.default_rng(0)
ok = True


def check(tag, got, want, rtol, atol=1e-7):
    global ok
    got = np.asarray(got)
    want = np.asarray(want)
    err = np.abs(got - want).max()
    rel = err / max(np.abs(want).max(), 1e-30)
    good = rel < rtol or err < atol
    ok = ok and good
    print(f"{'OK ' if good else 'FAIL'} {tag}: rel={rel:.2e} abs={err:.2e}",
          flush=True)
    return rel


def timeit(fn, *args, n=2):
    for a in args:
        sync(a)
    sync(fn(*args))
    ts = []
    for i in range(n):
        a2 = tuple(a * (1 + 1e-9 * (i + 1)) if hasattr(a, "dtype") else a
                   for a in args)
        for a in a2:
            if hasattr(a, "dtype"):
                sync(a)
        t0 = time.perf_counter()
        sync(fn(*a2))
        ts.append(time.perf_counter() - t0)
    return min(ts)


print(f"devices: {jax.devices()}", flush=True)

# ---------------------------------------------------------------------------
# 0. df32 EFT survival in XLA on hardware (--xla_allow_excess_precision can
#    fold (a+b)-a patterns; constants here are numpy-pre-split / barriered)
# ---------------------------------------------------------------------------
x = jnp.asarray(rng.uniform(-50, 2, size=(512,)))
got = df32.to_f64(df32.exp_(df32.from_f64(x)))
want = np.exp(np.asarray(x))
check("df32.exp_ on-chip (EFT survival)", got, want, 1e-12)

a = jnp.asarray(rng.normal(size=(512,)))
b = -a + 1e-9 * jnp.asarray(rng.normal(size=(512,)))
s = df32.to_f64(df32.add_(df32.from_f64(a), df32.from_f64(b)))
check("df32 cancelling add on-chip", s, np.asarray(a + b), 1e-9, atol=1e-13)

m = df32.to_f64(df32.mul_(df32.from_f64(a), df32.from_f64(b)))
check("df32 two-prod on-chip", m, np.asarray(a) * np.asarray(b), 1e-12)

# ---------------------------------------------------------------------------
# 1. double-float increment prep vs emulated-f64 prep
# ---------------------------------------------------------------------------
X = jnp.asarray(rng.normal(size=(3, 40, 3)).cumsum(1) / 6)
Y = jnp.asarray(rng.normal(size=(3, 50, 3)).cumsum(1) / 7)
got = df32.to_f64(df_prep.rbf_increments_df(X, Y, 1.0, False))
from sigkernel_tpu.utils import double_difference
want = double_difference(sk.RBFKernel(1.0).batch_kernel(X, Y))
check("df_prep RBF increments", got, want, 1e-9, atol=5e-13)

# ---------------------------------------------------------------------------
# 2. fused kernels (values) + traced sigma
# ---------------------------------------------------------------------------
# compare against the f64 scan truth: the f32 scan path loses ~3 digits to
# double-difference cancellation, while the fused kernels build increments
# directly from path increments (measured on-chip: fused 2.7e-6 / f32-scan
# 9.9e-3 vs f64 for linear; 2.3e-5 / 3.8e-2 for RBF dyadic 2)
Xl = jnp.asarray(rng.normal(size=(8, 60, 3)).cumsum(1) / 8, jnp.float32)
X64v = Xl.astype(jnp.float64)
w = sk.sig_kernel(sk.LinearKernel(), X64v, X64v, solver="scan",
                  max_batch=None)
check("fused linear vs f64", pallas_fused.solve_final_linear(Xl, Xl), w, 5e-5)
w = sk.sig_kernel(sk.RBFKernel(0.5), X64v, X64v, solver="scan",
                  max_batch=None)
check("fused rbf (traced sigma) vs f64",
      pallas_fused.solve_final_rbf(Xl, Xl, jnp.float32(0.5)), w, 2e-4)
w = sk.sig_kernel(sk.RBFKernel(0.5), X64v, X64v, solver="scan",
                  dyadic_order=2, max_batch=None)
check("fused rbf dyadic 2 vs f64",
      pallas_fused.solve_final_rbf_dyadic(Xl, Xl, jnp.float32(0.5),
                                          dyadic_order=2), w, 2e-4)

# ---------------------------------------------------------------------------
# 3. Pallas derivatives tier vs scan
# ---------------------------------------------------------------------------
# compare against the f32 scan on the SAME increments: measured bit-exact
# on-chip. (Comparing against the f64 scan instead measures the f32
# double-difference cancellation in the increment prep, which both tiers
# share -- ~1e-2 rel at this size, not a kernel property.)
Xf = jnp.asarray(rng.normal(size=(3, 30, 2)).cumsum(1) / 5, jnp.float32)
Yf = jnp.asarray(rng.normal(size=(4, 30, 2)).cumsum(1) / 5, jnp.float32)
gam = 0.1 * Xf
got3 = sk.sig_kernel_and_derivatives_gram(sk.RBFKernel(1.0), Xf, Yf, gam,
                                          dyadic_order=1, solver="pallas")
want3 = sk.sig_kernel_and_derivatives_gram(sk.RBFKernel(1.0), Xf, Yf, gam,
                                           dyadic_order=1, solver="scan")
for name, g_, w_ in zip(("K", "Kdiff", "Kdiffdiff"), got3, want3):
    check(f"pallas derivatives {name} (vs f32 scan)", g_, w_, 1e-6)

# ---------------------------------------------------------------------------
# 4. fused adjoint vs adjoint_dd vs scan gradient (values)
# ---------------------------------------------------------------------------
X32 = jnp.asarray(rng.normal(size=(4, 40, 3)).cumsum(1) / 6, jnp.float32)
Y32 = jnp.asarray(rng.normal(size=(4, 50, 3)).cumsum(1) / 7, jnp.float32)
k = sk.RBFKernel(1.0)
g_pal = jax.grad(lambda x: sk.sig_gram(k, x, Y32, dyadic_order=1,
                                       max_batch=None).sum())(X32)
g_scan = jax.grad(lambda x: sk.sig_gram(k, x, Y32, dyadic_order=1,
                                        solver="scan",
                                        max_batch=None).sum())(X32)
check("fused-adjoint grad vs scan", g_pal, g_scan, 2e-4)

inc = jnp.asarray(rng.normal(size=(4, 63, 70)) * 0.05, jnp.float32)
gct = jnp.asarray(rng.normal(size=(4,)), jnp.float32)
a_f = pallas_adjoint.adjoint_fused(inc, gct, False, 1)
a_d = pallas_solver.adjoint_dd(inc, gct, False, 1)
check("adjoint_fused vs adjoint_dd", a_f, a_d, 1e-5)

# ---------------------------------------------------------------------------
# 5. df64 value path + solve_df end-to-end
# ---------------------------------------------------------------------------
X64 = jnp.asarray(rng.normal(size=(3, 50, 2)).cumsum(1) / 7)
w = sk.sig_kernel(sk.RBFKernel(1.0), X64, X64, solver="scan", max_batch=None)
check("df64 split-input values",
      sk.sig_kernel(sk.RBFKernel(1.0), X64, X64, solver="pallas",
                    max_batch=None), w, 1e-11)
check("solve_df (df prep -> df64 kernel) values",
      sk.sig_kernel(sk.RBFKernel(1.0), X64, X64, solver="df",
                    max_batch=None), w, 1e-10)

if not QUICK:
    # value accuracy AT the benchmark grid (len 1024, dyadic 1): measured
    # ~1.3-1.5e-10 vs the f64 scan -- the 2-float state's coherent rounding
    # drift over the 4093-step sweep (exp Taylor order is NOT the limiter:
    # order 13 measures 1.33e-10, order 10 measures 1.51e-10). Moderate
    # sizes sit at ~3e-13 (pinned above).
    Xbv = jnp.asarray(rng.normal(size=(2, 1024, 3)).cumsum(1) / 32)
    Ybv = jnp.asarray(rng.normal(size=(2, 1024, 3)).cumsum(1) / 32)
    wv = sk.sig_kernel(sk.RBFKernel(1.0), Xbv, Ybv, dyadic_order=1,
                       solver="scan", max_batch=None)
    gv = sk.sig_kernel(sk.RBFKernel(1.0), Xbv, Ybv, dyadic_order=1,
                       solver="df", max_batch=None)
    check("df values at benchmark grid (2-float drift bound)", gv, wv, 5e-10)

# ---------------------------------------------------------------------------
# 6. gradient-accuracy pin at benchmark-like size (VERDICT #7): default TPU
#    path (df route, fused f32 adjoint) vs the exact f64 scan adjoint
# ---------------------------------------------------------------------------
if not QUICK:
    n_pin = 256 if QUICK else 1024
    Xp = jnp.asarray(rng.normal(size=(2, n_pin, 3)).cumsum(1)
                     / np.sqrt(n_pin))
    Yp = jnp.asarray(rng.normal(size=(2, n_pin, 3)).cumsum(1)
                     / np.sqrt(n_pin))
    loss = lambda **kw: (lambda x: sk.sig_kernel(
        sk.RBFKernel(1.0), x, Yp, dyadic_order=1, max_batch=None,
        **kw).sum())
    g_ref = jax.grad(loss(solver="scan"))(Xp)
    # default TPU path (f32-grade fused adjoint): the error is dominated by
    # f32 cancellation in the double-difference VJP (the discrete Laplacian
    # of the smooth KK product loses ~(grid/lambda)^2 digits); measured
    # ~2e-2 max-rel at this size. Record it -- the pin lives on the df64
    # mode below, which is the documented accurate-gradient option.
    g_df = jax.grad(loss(solver="df"))(Xp)
    rel = check(f"grad len{n_pin} dy1: default df-path vs f64 adjoint "
                "(f32-grade, documented)", g_df, g_ref, 1e-1)
    print(f"   (measured default-path gradient rtol: {rel:.2e})", flush=True)
    g_64 = jax.grad(loss(solver="auto", grad_solver="df64"))(Xp)
    rel = check(f"grad pin len{n_pin} dy1: grad_solver='df64' vs f64 "
                "adjoint", g_64, g_ref, 5e-4)
    print(f"   (measured df64-mode gradient rtol: {rel:.2e})", flush=True)

# ---------------------------------------------------------------------------
# 6b. collapsed adjoint, fwd-stack sharing, derivatives refinement
#     (round-2 kernels; all have DMA chains interpret mode cannot race)
# ---------------------------------------------------------------------------
from sigkernel_tpu.ops import pallas_adjoint, pallas_df64
from sigkernel_tpu.ops.solve import _collapse_refined
from sigkernel_tpu.utils import dyadic_refine as _dref

inc_cc = jnp.asarray(rng.normal(size=(2, 40, 50)) * 0.1, jnp.float32)
g_cc = jnp.asarray(rng.normal(size=(2,)), jnp.float32)
for d_ in (1, 2):
    got_c = pallas_adjoint.adjoint_fused_collapsed(inc_cc, g_cc, False, d_)
    KK_c = pallas_adjoint.adjoint_fused(inc_cc, g_cc, False, d_)
    check(f"collapsed adjoint d={d_}", got_c,
          _collapse_refined(KK_c, d_, jnp.float32), 1e-4)
    pf = pallas_adjoint._pad_f(2 ** d_)
    _, stk_c = pallas_df64.solve_final_df_stack(
        inc_cc, jnp.zeros_like(inc_cc), dyadic_order=d_, stack_pad=pf)
    check(f"stack-shared adjoint d={d_}",
          pallas_adjoint.adjoint_fused_collapsed(inc_cc, g_cc, False, d_,
                                                 fwd_stack=stk_c),
          got_c, 1e-4)
    u_, ud_, us_ = (jnp.asarray(rng.normal(size=(2, 30, 25)) * 0.1,
                                jnp.float32) for _ in range(3))
    got3b = pallas_derivatives.solve_derivatives_final(u_, ud_, us_,
                                                       dyadic_order=d_)
    want3b = scan_solver.solve_derivatives_final(
        _dref(u_, d_), _dref(ud_, d_), _dref(us_, d_))
    for nm_, gb_, wb_ in zip(("K", "Kd", "Kdd"), got3b, want3b):
        check(f"deriv base-stream {nm_} d={d_}", gb_, wb_, 1e-4)

# stripe grid + striped adjoint (the beyond-VMEM gradient path)
inc_sg = jnp.asarray(rng.normal(size=(2, 60, 40)) * 0.05, jnp.float32)
grid_sg = scan_solver.solve_grid(inc_sg)
check("stripe grid (north-boundary continuation)",
      pallas_blocked._stripe_grid(inc_sg[:, 20:, :], grid_sg[:, 20, :],
                                  False),
      grid_sg[:, 20:, :], 1e-5)
from sigkernel_tpu.ops.solve import _grid_route_bwd
g_sg = jnp.asarray(rng.normal(size=(2,)), jnp.float32)
(want_ct_sg,) = _grid_route_bwd(inc_sg, g_sg, False, "scan", 0)
check("striped adjoint vs grid route",
      pallas_blocked.adjoint_blocked(inc_sg, g_sg, False, 0),
      want_ct_sg, 1e-4)

# ---------------------------------------------------------------------------
# 7. blocked long-path solver: correctness + >8192-row stress
# ---------------------------------------------------------------------------
inc_b = jnp.asarray(rng.normal(size=(1, 500, 480)) * 0.02, jnp.float32)
w = scan_solver.solve_final(inc_b)
check("blocked solver (multi-stripe small)",
      pallas_blocked.solve_final(inc_b, dyadic_order=0), w, 3e-5)

if not QUICK:
    n_big = 8600  # > MAX_ROWS on both sides
    inc_big = jnp.asarray(
        rng.normal(size=(1, n_big, n_big)) * (0.5 / n_big), jnp.float32)
    t0 = time.perf_counter()
    got = pallas_blocked.solve_final(inc_big)
    sync(got)
    dt = time.perf_counter() - t0
    w = scan_solver.solve_final(inc_big)
    check(f"blocked stress {n_big}^2 (> VMEM bound)", got, w, 5e-4)
    print(f"   blocked {n_big}^2 fwd: {dt:.1f}s (incl. compile)", flush=True)

# ---------------------------------------------------------------------------
# 8. stage timings at the benchmark grid
# ---------------------------------------------------------------------------
if not QUICK:
    P = 64
    Xb = jnp.asarray(rng.normal(size=(P, 1024, 3)).cumsum(1) / 32)
    Yb = jnp.asarray(rng.normal(size=(P, 1024, 3)).cumsum(1) / 32)
    kb = sk.RBFKernel(1.0)

    dt = timeit(jax.jit(lambda a, b: df32.to_f64(
        df_prep.rbf_increments_df(a, b, 1.0, False)).sum()), Xb, Yb)
    print(f"df prep fwd 64p len1024: {dt*1000:.0f} ms", flush=True)

    dt = timeit(jax.jit(lambda a, b: sk.sig_kernel(
        kb, a, b, dyadic_order=1, solver='df', max_batch=None).sum()),
        Xb, Yb)
    print(f"df fwd  64p len1024 dy1: {dt*1000:.0f} ms "
          f"-> {P/dt:.0f} pairs/s", flush=True)

    step = jax.jit(lambda a, b: jax.value_and_grad(
        lambda x: sk.sig_kernel(kb, x, b, dyadic_order=1, solver='df',
                                max_batch=None).sum())(a))
    dt = timeit(lambda a, b: step(a, b)[1], Xb, Yb)
    print(f"df fwd+bwd 64p len1024 dy1: {dt*1000:.0f} ms "
          f"-> {P/dt:.0f} pairs/s", flush=True)

    # A/B: fused adjoint vs adjoint_dd at the benchmark grid
    inc_ab = jnp.asarray(rng.normal(size=(P, 1023, 1023)) * 0.001,
                         jnp.float32)
    g_ab = jnp.ones((P,), jnp.float32)
    dt = timeit(jax.jit(lambda i, g: pallas_adjoint.adjoint_fused(
        i, g, False, 1).sum()), inc_ab, g_ab)
    print(f"adjoint_fused 64p 2046^2: {dt*1000:.0f} ms", flush=True)
    dt = timeit(jax.jit(lambda i, g: pallas_solver.adjoint_dd(
        i, g, False, 1).sum()), inc_ab, g_ab)
    print(f"adjoint_dd    64p 2046^2: {dt*1000:.0f} ms", flush=True)

print("ALL OK" if ok else "FAILURES PRESENT", flush=True)
