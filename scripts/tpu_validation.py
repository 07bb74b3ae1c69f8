"""Hardware validation of interpret-verified features (run on a real TPU chip).

Validates the sheared-space backward, fused linear/RBF kernels and the
double-double value path against the scan oracle on hardware, then compares
fused vs streamed forward throughput at the benchmark grid. Run after any
kernel change once a chip is reachable (the round-1 relay outage prevented
the final on-chip run; see docs/BENCHMARKS.md)."""
import time, jax, jax.numpy as jnp, numpy as np, sys
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), ".."))
import sigkernel_tpu as sk
from sigkernel_tpu.ops import scan_solver, pallas_solver, pallas_fused
from sigkernel_tpu.utils.profiling import sync

rng = np.random.default_rng(0)
ok = True

def check(tag, got, want, rtol, atol=1e-7):
    global ok
    err = np.abs(np.asarray(got)-np.asarray(want)).max()
    rel = err / max(np.abs(np.asarray(want)).max(), 1e-30)
    good = rel < rtol or err < atol
    ok = ok and good
    print(f"{'OK ' if good else 'FAIL'} {tag}: rel={rel:.2e}", flush=True)

# 1. sheared-space backward vs scan gradient (f32, real TPU)
X = jnp.asarray(rng.normal(size=(4, 40, 3)).cumsum(1)/6, jnp.float32)
Y = jnp.asarray(rng.normal(size=(4, 50, 3)).cumsum(1)/7, jnp.float32)
k = sk.RBFKernel(1.0)
g_pal = jax.grad(lambda x: sk.sig_gram(k, x, Y, dyadic_order=1, max_batch=None).sum())(X)
g_scan = jax.grad(lambda x: sk.sig_gram(k, x, Y, dyadic_order=1, solver="scan", max_batch=None).sum())(X)
check("sheared backward vs scan grad", g_pal, g_scan, 2e-4)

# 2. fused kernels vs scan on hardware
Xl = jnp.asarray(rng.normal(size=(8, 60, 3)).cumsum(1)/8, jnp.float32)
w = sk.sig_kernel(sk.LinearKernel(), Xl, Xl, solver="scan", max_batch=None)
g = pallas_fused.solve_final_linear(Xl, Xl)
check("fused linear", g, w, 2e-5)
w = sk.sig_kernel(sk.RBFKernel(0.5), Xl, Xl, solver="scan", max_batch=None)
g = pallas_fused.solve_final_rbf(Xl, Xl, sigma=0.5)
check("fused rbf", g, w, 2e-4)

# 3. f64 value precision via df64 route
X64 = jnp.asarray(rng.normal(size=(3, 50, 2)).cumsum(1)/7)
w = sk.sig_kernel(sk.RBFKernel(1.0), X64, X64, solver="scan", max_batch=None)
g = sk.sig_kernel(sk.RBFKernel(1.0), X64, X64, max_batch=None)  # auto->df64
check("df64 values", g, w, 1e-11)

# 4. perf: fused vs streamed forward at bench grid (64 pairs f32)
def timeit(fn, x, y=None, n=2):
    args = (x,) if y is None else (x, y)
    for a in args: sync(a)
    out = fn(*args); s = sync(out)
    ts=[]
    for i in range(n):
        a2 = tuple(a*(1+1e-9*(i+1)) for a in args)
        for a in a2: sync(a)
        t0=time.perf_counter(); s = sync(fn(*a2)); ts.append(time.perf_counter()-t0)
    return min(ts)

Xb = jnp.asarray(rng.normal(size=(64, 1024, 3)).cumsum(1)/32, jnp.float32)
Yb = jnp.asarray(rng.normal(size=(64, 1024, 3)).cumsum(1)/32, jnp.float32)
dt = timeit(lambda a, b: pallas_fused.solve_final_linear(a, b, dyadic_order=1), Xb, Yb)
print(f"fused linear fwd dy1 64p: {dt*1000:.1f} ms -> {64/dt:.0f} pairs/s", flush=True)
dt = timeit(lambda a, b: sk.sig_kernel(sk.LinearKernel(), a, b, dyadic_order=1, max_batch=None), Xb, Yb)
print(f"streamed linear fwd dy1 64p: {dt*1000:.1f} ms -> {64/dt:.0f} pairs/s", flush=True)

print("ALL OK" if ok else "FAILURES PRESENT", flush=True)
