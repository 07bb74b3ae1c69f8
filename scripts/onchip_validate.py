"""ON-CHIP validation gate: every Pallas tier value-checked on hardware.

Interpret mode executes async copies synchronously and CANNOT catch
DMA/compute races (see CLAUDE.md); this script is the automated gate that
must pass on the real chip after ANY kernel dataflow change. It drives
the canonical user flow end-to-end and value-checks every solver tier
(f32, df64, gen, gen32, blocked striped f32/df, df derivatives) against
the scan oracle, plus the round-4 estimator machinery (sym triangle,
sig_gram_lincomb, chunked MMD).

    python -u scripts/onchip_validate.py        # ~5 min warm, longer cold

Exits non-zero on any failure; prints ONCHIP_VALIDATE_OK at the end.
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
from sigkernel_tpu.ops import (pallas_adjoint, pallas_blocked,
                               pallas_derivatives, pallas_gen32,
                               scan_solver, solve as solve_mod)
from sigkernel_tpu.utils import dyadic_refine, double_difference

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)

def paths(b, l, d, dtype=np.float64, scale=0.3):
    return jnp.asarray(np.cumsum(rng.normal(size=(b, l, d)) * scale / np.sqrt(l), axis=1).astype(dtype))

X = paths(5, 10, 2)
Y = paths(5, 20, 2)
k = sk.RBFKernel(0.5)
sig = sk.SigKernel(k, dyadic_order=1)

# 1. canonical flow, asymmetric lengths
kv = sig.compute_kernel(X, Y)
print("compute_kernel:", np.asarray(kv), flush=True)
G = sig.compute_Gram(X, X, sym=True)
print("Gram sym maxasym:", float(jnp.abs(G - G.T).max()), "G[0,:3]:", np.asarray(G[0, :3]), flush=True)
mmd = sig.compute_mmd(X, Y)
gmmd = jax.grad(lambda x: sk.sig_mmd(k, x, Y, dyadic_order=1))(X)
print("mmd:", float(mmd), "grad norm:", float(jnp.abs(gmmd).max()), flush=True)
gamma = paths(5, 10, 2)
Kd = sig.compute_kernel_and_derivatives_Gram(X, X, gamma)
print("derivs:", [float(t[0, 0]) for t in Kd], flush=True)
Z = paths(5, 10, 2)
print("chsic:", float(sk.sig_chsic(X, Y[:, :10, :], Z, k, dyadic_order=0)), flush=True)
sk.hypothesis_test(np.asarray(X), np.asarray(Y[:, :10, :]), k, dyadic_order=0)

# 2. on-chip tier checks vs scan tier (f64 oracle)
for dy in (0, 1, 2):
    inc = jnp.asarray(rng.normal(size=(4, 24, 16)) * 0.05)
    want = np.asarray(scan_solver.solve_final(dyadic_refine(inc, dy)))
    got_df = np.asarray(solve_mod.solve(inc, solver="auto", dyadic_order=dy))  # df64 tier on chip
    got_f32 = np.asarray(solve_mod.solve(inc.astype(jnp.float32), solver="auto", dyadic_order=dy))
    e_df = np.abs(got_df - want).max() / np.abs(want).max()
    e_f32 = np.abs(got_f32 - want).max() / np.abs(want).max()
    print(f"dy={dy} tier check: df64 rel={e_df:.2e} f32 rel={e_f32:.2e}", flush=True)
    assert e_df < 1e-9, (dy, e_df)
    assert e_f32 < 1e-4, (dy, e_f32)

# gen route (sig_kernel grad_solver=f32 on RBF f64)
Xg, Yg = paths(6, 33, 3), paths(6, 29, 3)
v_gen = sk.sig_kernel(k, Xg, Yg, dyadic_order=1, grad_solver="f32", max_batch=None)
v_scan = sk.sig_kernel(k, Xg, Yg, dyadic_order=1, solver="scan", max_batch=None)
e = float(jnp.abs(v_gen - v_scan).max() / jnp.abs(v_scan).max())
print("gen vs scan rel:", e, flush=True)
assert e < 1e-8, e
g_gen = jax.grad(lambda x: sk.sig_kernel(k, x, Yg, dyadic_order=1, grad_solver="f32", max_batch=None).sum())(Xg)
g_scan = jax.grad(lambda x: sk.sig_kernel(k, x, Yg, dyadic_order=1, solver="scan", max_batch=None).sum())(Xg)
eg = float(jnp.abs(g_gen - g_scan).max() / jnp.abs(g_scan).max())
print("gen grad vs scan-adjoint rel:", eg, flush=True)
assert eg < 5e-2, eg

# 3. sym triangle on chip vs full gram
Gs = sk.sig_gram(k, Xg, Xg, dyadic_order=1, sym=True, max_batch=4)
Gf = sk.sig_gram(k, Xg, Xg, dyadic_order=1, sym=False, max_batch=None)
e = float(jnp.abs(Gs - 0.5 * (Gf + Gf.T)).max() / jnp.abs(Gf).max())
print("sym triangle vs full rel:", e, flush=True)
assert e < 1e-9, e

# 4. lincomb on chip vs direct, value + grad
W = jnp.asarray(rng.normal(size=(6, 6)))
s_lc = sk.sig_gram_lincomb(k, Xg, Yg[:, :33, :] if False else Yg, W, dyadic_order=1, pair_chunk=8)
s_dir = jnp.sum(W * sk.sig_gram(k, Xg, Yg, dyadic_order=1, max_batch=None))
print("lincomb vs direct:", float(s_lc), float(s_dir), flush=True)
assert abs(float(s_lc) - float(s_dir)) < 1e-8 * abs(float(s_dir)) + 1e-12
g_lc = jax.grad(lambda x: sk.sig_gram_lincomb(k, x, Yg, W, dyadic_order=1, pair_chunk=8))(Xg)
g_dir = jax.grad(lambda x: jnp.sum(W * sk.sig_gram(k, x, Yg, dyadic_order=1, max_batch=None)))(Xg)
eg = float(jnp.abs(g_lc - g_dir).max() / jnp.abs(g_dir).max())
print("lincomb grad vs direct rel:", eg, flush=True)
assert eg < 1e-5, eg

# chunked mmd on chip
m_dir = sk.sig_mmd(k, Xg, Yg, dyadic_order=1, max_batch=100)
m_ch = sk.sig_mmd(k, Xg, Yg, dyadic_order=1, max_batch=2, pair_chunk=8)
print("mmd direct vs chunked:", float(m_dir), float(m_ch), flush=True)
assert abs(float(m_dir) - float(m_ch)) < 1e-8 * max(abs(float(m_dir)), 1e-12) + 1e-12

# 5. probes: length-1 paths, f32 dtype, max_batch=1, bogus solver
v1 = sk.sig_kernel(k, X[:, :1, :], Y[:, :1, :], dyadic_order=1)
print("len-1 paths:", np.asarray(v1), flush=True)
assert np.allclose(np.asarray(v1), 1.0)
vf32 = sk.sig_kernel(k, X.astype(jnp.float32), Y.astype(jnp.float32), dyadic_order=1)
assert vf32.dtype == jnp.float32
v_mb1 = sk.sig_kernel(k, X, Y, dyadic_order=1, max_batch=1)
assert np.allclose(np.asarray(v_mb1), np.asarray(kv), rtol=1e-10)
try:
    sk.sig_kernel(k, X, Y, solver="bogus")
    raise SystemExit("bogus solver did not raise")
except ValueError as e:
    print("bogus solver ->", e, flush=True)

print("part 1 (canonical flow + tiers) OK", flush=True)


# ---- round-4 kernels ----
rng = np.random.default_rng(7)


# ---- gen32 on chip --------------------------------------------------------
B, M, N, dy = 8, 33, 29, 1
sigma = 0.9
X = jnp.asarray((rng.normal(size=(B, M, 3)).cumsum(1) * 0.2), jnp.float32)
Y = jnp.asarray((rng.normal(size=(B, N, 3)).cumsum(1) * 0.2), jnp.float32)
got = np.asarray(pallas_gen32.solve_final_f32_gen(X, Y, sigma,
                                                  dyadic_order=dy))
inc = double_difference(sk.RBFKernel(sigma).batch_kernel(
    X.astype(jnp.float64), Y.astype(jnp.float64)))
want = np.asarray(scan_solver.solve_final(dyadic_refine(inc, dy)))
rel = np.abs(got - want).max() / np.abs(want).max()
print("gen32 fwd vs scan rel:", rel, flush=True)
assert rel < 5e-5, rel

k = sk.RBFKernel(sigma)
from sigkernel_tpu.ops.routes import resolve_family
fam = resolve_family(k, X, Y, "auto", "auto", dy, gram=False)
print("f32 family at this geometry:", fam, flush=True)
g32 = jax.grad(lambda x: sk.sig_kernel(k, x, Y, dyadic_order=dy,
                                       max_batch=None).sum())(X)
g0 = jax.grad(lambda x: sk.sig_kernel(k, x, Y.astype(jnp.float64),
                                      dyadic_order=dy, solver="scan",
                                      max_batch=None).sum())(
    X.astype(jnp.float64))
relg = float(jnp.abs(g32 - g0).max() / jnp.abs(g0).max())
print("gen32 grad vs scan-adjoint rel:", relg, flush=True)
assert relg < 5e-2, relg

# dyadic 2 as well
got2 = np.asarray(pallas_gen32.solve_final_f32_gen(X, Y, sigma,
                                                   dyadic_order=2))
want2 = np.asarray(scan_solver.solve_final(dyadic_refine(inc, 2)))
rel2 = np.abs(got2 - want2).max() / np.abs(want2).max()
print("gen32 dy2 fwd rel:", rel2, flush=True)
assert rel2 < 2e-4, rel2  # dy2: 4x steps of f32 accumulation

# ---- striped_df on chip (natural multi-stripe: rows > MAX_ROWS) -----------
# MAX_ROWS=8192 would need huge grids; monkeypatch module constants so the
# stripe machinery multi-stripes at small sizes ON CHIP.
pallas_blocked.MAX_ROWS = 64
pallas_blocked.ADJ_ROWS = 64
inc_b = jnp.asarray(rng.normal(size=(2, 40, 24)) * 0.05)
g_b = jnp.asarray(rng.normal(size=(2,)))
hi = inc_b.astype(jnp.float32)
lo = (inc_b - hi.astype(jnp.float64)).astype(jnp.float32)
got = np.asarray(pallas_blocked.adjoint_blocked_df(hi, lo, g_b, False, 1))
(want,) = solve_mod._grid_route_bwd(inc_b, g_b, False, "scan", 1)
want = np.asarray(want)
scale = np.abs(want).max()
rel = np.abs(got - want).max() / scale
print("striped_df vs f64 scan-adjoint rel:", rel, flush=True)
assert rel < 1e-9, rel
# f32 striped adjoint still fine after the refactor
got32 = np.asarray(pallas_blocked.adjoint_blocked(inc_b, g_b, False, 1))
rel32 = np.abs(got32 - want).max() / scale
print("striped f32 rel (sanity):", rel32, flush=True)
assert rel32 < 5e-4, rel32
pallas_blocked.MAX_ROWS = 8192
pallas_blocked.ADJ_ROWS = 2048

# ---- df triple derivatives on chip ----------------------------------------
u = jnp.asarray(rng.normal(size=(3, 17, 13)) * 0.1)
ud = jnp.asarray(rng.normal(size=(3, 17, 13)) * 0.1)
us = jnp.asarray(rng.normal(size=(3, 17, 13)) * 0.1)
for dyd in (0, 1, 2):
    got = pallas_derivatives.solve_derivatives_final_df(u, ud, us,
                                                        dyadic_order=dyd)
    want = scan_solver.solve_derivatives_final(
        dyadic_refine(u, dyd), dyadic_refine(ud, dyd),
        dyadic_refine(us, dyd))
    rels = [float(jnp.abs(gq - wq).max() / jnp.abs(wq).max())
            for gq, wq in zip(got, want)]
    print(f"df derivs dy={dyd} rels:", rels, flush=True)
    assert max(rels) < 1e-10, rels

# ---- round-5: stream-free df64-grade gen adjoint (the honest default) -----
Xd = jnp.asarray(rng.normal(size=(6, 33, 3)).cumsum(1) * 0.2)
Yd = jnp.asarray(rng.normal(size=(6, 29, 3)).cumsum(1) * 0.2)
cth, ctl = pallas_adjoint.adjoint_planes_gen_df(Xd, Yd, 0.9, False, 1)
ct = np.asarray(cth.astype(jnp.float64) + ctl.astype(jnp.float64))
inc_d = double_difference(sk.RBFKernel(0.9).batch_kernel(Xd, Yd))
(want_d,) = solve_mod._grid_route_bwd(inc_d, jnp.ones((6,), jnp.float64),
                                      False, "scan", 1)
want_d = np.asarray(want_d)
err = np.abs(ct - want_d).max()
rel = err / np.abs(want_d).max()
# tolerance = the documented gen-tier error model (hi-only u^2/12 chain,
# pallas_df64._df_scheme_gen): ~3 * u^2 * 2^-23 per update through both
# sweeps; at this coarse geometry (u ~ 3e-3, 122 steps) that is ~1e-9 rel,
# at the benchmark grid (u ~ 1e-5) it is ~1e-12.
u_d = float(np.abs(np.asarray(inc_d)).max()) / 4.0
n_steps_d = (Xd.shape[1] + Yd.shape[1] - 2) * 2 - 1
tol_d = (8.0 * n_steps_d * 3.0 * u_d * u_d * 2.0 ** -23
         * max(np.abs(want_d).max(), 1.0) + 1e-10 * np.abs(want_d).max())
print("gen_df adjoint vs f64 scan-adjoint rel:", rel,
      "(model bound rel:", tol_d / np.abs(want_d).max(), ")", flush=True)
assert err < tol_d, (err, tol_d)

# full default-grade route end-to-end (grad_solver='auto' on f64 RBF):
# must take the gen_df route on chip AND match the scan-tier adjoint chain
from sigkernel_tpu.ops.routes import resolve_hybrid_bwd
route = resolve_hybrid_bwd(sk.RBFKernel(0.9), Xd, Yd, 1, False)
print("hybrid bwd route at this geometry:", route, flush=True)
assert route == "gen_df", route
kd = sk.RBFKernel(0.9)
g_def = jax.grad(lambda x: sk.sig_kernel(kd, x, Yd, dyadic_order=1,
                                         max_batch=None).sum())(Xd)
g_ref = jax.grad(lambda x: sk.sig_kernel(kd, x, Yd, dyadic_order=1,
                                         solver="scan",
                                         max_batch=None).sum())(Xd)
reld = float(jnp.abs(g_def - g_ref).max() / jnp.abs(g_ref).max())
print("default-grade (gen_df) grad vs scan-adjoint rel:", reld, flush=True)
# the dd-VJP Laplacian amplifies the ct error; at this coarse geometry the
# scheme_gen model error (~2e-9 on ct) bounds it at ~1e-6-grade -- still
# >1e4x tighter than the f32 route's 2.7e-2 (docs/VALIDATION.md). The
# benchmark-scale grade is pinned by the ct check above (model ~1e-12).
assert reld < 1e-5, reld

# ---- round-5: fused Pallas increment-chain VJP vs the XLA formulation ----
from sigkernel_tpu.ops import df_prep, pallas_incvjp
from sigkernel_tpu.ops.routes import resolve_incvjp

Xv = jnp.asarray(rng.normal(size=(5, 130, 3)).cumsum(1) * 0.2, jnp.float32)
Yv = jnp.asarray(rng.normal(size=(5, 77, 3)).cumsum(1) * 0.2, jnp.float32)
ctv = jnp.asarray(rng.normal(size=(5, 129, 76)), jnp.float32)
assert resolve_incvjp(Xv, Yv, gram=False) == "pallas"
ds0, dx0, dy0 = df_prep.rbf_dd_vjp(Xv, Yv, jnp.float32(0.9), ctv, False)
ds1, dx1, dy1 = pallas_incvjp.rbf_dd_vjp_pallas(Xv, Yv, jnp.float32(0.9),
                                                ctv)
rels = [float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-30))
        for a, b in ((dx1, dx0), (dy1, dy0))]
rels.append(abs(float(ds1) - float(ds0)) / (abs(float(ds0)) + 1e-30))
print("incvjp pallas-vs-xla rels (dx, dy, dsig):", rels, flush=True)
assert max(rels) < 1e-4, rels

# k_kgrad end-to-end on chip (f64 -> df tier now)
Xk = jnp.asarray(rng.normal(size=(4, 20, 3)).cumsum(1) * 0.2)
gam = jnp.asarray(rng.normal(size=(4, 20, 3)) * 0.1)
K1 = sk.sig_kernel_and_derivatives_gram(k, Xk, Xk, gam, dyadic_order=1)
K0 = sk.sig_kernel_and_derivatives_gram(k, Xk, Xk, gam, dyadic_order=1,
                                        solver="scan")
rels = [float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-30))
        for a, b in zip(K1, K0)]
print("k_kgrad auto-vs-scan rels:", rels, flush=True)
assert max(rels) < 1e-10, rels

print("ONCHIP_VALIDATE_OK", flush=True)
