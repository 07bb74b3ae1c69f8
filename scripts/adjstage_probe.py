"""In-kernel stage budget of the gen32 adjoint by ablation.

The dynamic-roll probe (scripts/adjroll_probe.py) exonerated the product
stage's traced-shift rolls (delta unchanged without them). This probe
copies `_product_collapse_planes_gen32_kernel` with ablation switches and
times the adjoint delta for each:

  full    — faithful copy (sanity: should match the ~22-25 ms budget)
  noprod  — product/accumulate/flush stripped: reverse sweep + in-kernel
            generation + forward-stack DMA only
  nodma   — additionally no forward-stack DMA: sweep + generation only

RESULTS ARE NUMERICALLY WRONG for the ablated variants — timing only.

Run:  python -u scripts/adjstage_probe.py [B [LENGTH [DYADIC]]]
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_ENABLE_X64", "true")
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_enable_x64", True)
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sigkernel_tpu.ops import pallas_adjoint, pallas_gen32
from sigkernel_tpu.ops.pallas_adjoint import _ix, _pad_f_gen, shared_chunk
from sigkernel_tpu.ops.pallas_solver import (LANES, SUBLANES, _scheme,
                                             _window_phases, WINDOW_SEG)
from sigkernel_tpu.utils import ceil_to

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
LENGTH = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
DY = int(sys.argv[3]) if len(sys.argv) > 3 else 1
SIGMA = 1.0


def _kernel_ablate(x_ref, sx_ref, yr_ref, syr_ref, rs_ref, fstk_hbm, g_ref,
                   out_hbm, state, fbuf, acc, obuf, gd, gb, isem,
                   *, n_steps, MM, NN, Lbf, naive, pad_f, refine, Mb_r,
                   Nb_r, window_seg=0, ablate="full"):
    from sigkernel_tpu.ops.pallas_gen32 import T_GEN, _make_inc_gen32

    P = state.shape[2]
    Lbr = state.shape[3]
    f = refine
    T_b = T_GEN
    TFf = T_b * f
    n_slots = pl.cdiv(n_steps, f)
    n_batches = pl.cdiv(n_slots, T_b)
    iib = lax.broadcasted_iota(jnp.int32, (P, Lbr), 1)
    one = jnp.float32(1.0)
    zslab = jnp.zeros((P, Lbf), jnp.float32)
    L_r = f * Lbr

    spb = T_b * f
    phases = None
    if window_seg:
        phases = _window_phases(n_batches, spb, n_steps, MM, L_r,
                                window_seg, margin_top=max(8, 3 * f + 2),
                                align=f * LANES)
    A = (n_steps - 3) // f
    r0 = (n_steps - 3) % f

    for p in range(f):
        state[0, p] = jnp.ones((P, Lbr), jnp.float32)
        state[1, p] = jnp.ones((P, Lbr), jnp.float32)
    acc[0] = zslab
    acc[1] = zslab
    gv = g_ref[...]

    gb[1] = jnp.zeros((P, Lbr), jnp.float32)
    gen_G, gen_inc = _make_inc_gen32(
        (x_ref, sx_ref, yr_ref, syr_ref, rs_ref),
        gd, gb, Mb=Mb_r, Nb=Nb_r, refine=f)
    gd[0] = gen_G(0)
    gd[1] = gen_G(1)

    def flush(slot, k_entry):
        pltpu.make_async_copy(obuf.at[_ix(slot)],
                              out_hbm.at[_ix(k_entry + 2)],
                              isem.at[_ix(2 + slot)]).wait()
        obuf[slot] = acc[slot]
        acc[slot] = zslab
        pltpu.make_async_copy(obuf.at[_ix(slot)],
                              out_hbm.at[_ix(k_entry + 2)],
                              isem.at[_ix(2 + slot)]).start()

    def accumulate_planes(prods, q_mod_f, k_par):
        hi_sum = lo_sum = None
        for p in range(f):
            if p <= q_mod_f:
                hi_sum = prods[p] if hi_sum is None else hi_sum + prods[p]
            else:
                lo_sum = prods[p] if lo_sum is None else lo_sum + prods[p]
        if hi_sum is not None:
            acc[k_par] = acc[k_par] + hi_sum
        if lo_sum is not None:
            acc[1 - k_par] = acc[1 - k_par] + lo_sum

    V = n_slots + 1
    obuf[0] = zslab
    obuf[1] = zslab
    pltpu.make_async_copy(obuf.at[_ix(0)], out_hbm.at[_ix(V + 2)],
                          isem.at[_ix(2)]).start()
    pltpu.make_async_copy(obuf.at[_ix(1)], out_hbm.at[_ix(V + 3)],
                          isem.at[_ix(3)]).start()

    if ablate == "full":
        pre1 = pltpu.make_async_copy(
            fstk_hbm.at[_ix(n_steps - 3 + pad_f)],
            fbuf.at[_ix(0), _ix(0)], isem.at[_ix(0)])
        pre2 = pltpu.make_async_copy(
            fstk_hbm.at[_ix(n_steps - 4 + pad_f)],
            fbuf.at[_ix(0), _ix(1)], isem.at[_ix(1)])
        pre1.start()
        pre2.start()
        pre1.wait()
        pre2.wait()
        q1, q2 = n_steps - 1, n_steps - 2
        k1, k2 = q1 // f, q2 // f
        accumulate_planes([fbuf[0, 0, p] * gv for p in range(f)],
                          q1 % f, k1 % 2)
        if q1 % f == 0:
            flush(k1 % 2, jnp.int32(k1))
        accumulate_planes([fbuf[0, 1, p] * gv for p in range(f)],
                          q2 % f, k2 % 2)

    def in_copies(b, slot):
        E_b = n_steps - 4 - (b + 1) * TFf + pad_f
        return (
            pltpu.make_async_copy(fstk_hbm.at[pl.ds(_ix(E_b), TFf)],
                                  fbuf.at[_ix(slot)],
                                  isem.at[_ix(slot)]),
        )

    if ablate != "nodma":
        for c in in_copies(0, 0):
            c.start()

    def make_body(ws=None, W=None, guarded=True):
        wsb = None if ws is None else ws // f
        Wb = None if ws is None else W // f

        def when_q(q_r):
            if guarded:
                return pl.when(q_r < n_steps)
            return lambda fn: fn()

        def gb_win(slot):
            if wsb is None:
                return gb[slot]
            return gb[slot, :, wsb:wsb + Wb]

        iibw = iib if wsb is None else (
            lax.broadcasted_iota(jnp.int32, (P, Wb), 1) + jnp.int32(wsb))
        iiw = iibw

        def step(q_r, k_r, s_i, sp, t, cur, prev, fb_idx, bslot):
            vm2, vm1 = sp, 1 - sp

            def st(slot, p):
                if wsb is None:
                    return state[slot, p]
                return state[slot, p, :, wsb:wsb + Wb]

            k10 = [st(vm1, p) for p in range(f)]
            p2 = [st(vm2, p) for p in range(f)]
            roll1 = lambda x: pltpu.roll(x, jnp.int32(1), axis=1)
            k01 = [roll1(k10[f - 1])] + k10[:f - 1]
            k00 = [roll1(p2[f - 1])] + p2[:f - 1]
            u = [roll1(cur if s_i == f - 1 else prev)] + \
                [(cur if p <= s_i else prev) for p in range(f - 1)]

            p_star = (s_i + 2) % f
            off = (s_i + 2 - p_star) // f
            hit_lane = jnp.int32(0) + k_r + off

            vs = []
            for p in range(f):
                v = _scheme(k00[p], k01[p], k10[p], u[p], naive)
                mask = iiw > (NN - p) // f
                if p == p_star:
                    mask = mask | (iiw == hit_lane)
                if p == 0:
                    mask = mask | (iiw == 0)
                v = jnp.where(mask, one, v)
                if wsb is not None and wsb > 0 and p == 0:
                    v = jnp.where(iiw == wsb, p2[0], v)
                vs.append(v)
            for p in range(f):
                if wsb is None:
                    state[vm2, p] = vs[p]
                else:
                    state[vm2, p, :, wsb:wsb + Wb] = vs[p]

            if ablate != "full":
                return

            q = n_steps - 3 - q_r

            @pl.when(q >= 0)
            def _():
                sr = (-3 - s_i) % f
                d = jnp.int32(MM - 3) - jnp.int32(0) - q_r
                sig = lax.rem(d + jnp.int32(2 * L_r), jnp.int32(L_r))
                sq = lax.div(sig, jnp.int32(f))
                prods = []
                for p in range(f):
                    src = (p - sr) % f
                    sh = sq + (1 if p < sr else 0)
                    A2 = pltpu.roll(state[vm2, src], sh, axis=1)[:, :Lbf]
                    F = fbuf[bslot, fb_idx, p]
                    F = jnp.where(q >= 2, F, one)
                    prods.append(F * A2 * gv)
                c = 1 if s_i > r0 else 0
                k_par = (A + t + c) % 2
                accumulate_planes(prods, (r0 - s_i) % f, k_par)
                if s_i == r0:
                    k_dyn = _ix(A) - lax.div(_ix(q_r), jnp.int32(f))
                    flush(k_par, k_dyn)

        def body(b, _):
            bslot = lax.rem(b, jnp.int32(2))

            if ablate != "nodma":
                @pl.when(b + 1 < n_batches)
                def _():
                    for c in in_copies(b + 1, 1 - bslot):
                        c.start()

                for c in in_copies(b, bslot):
                    c.wait()

            for t in range(T_b):
                k_r = b * T_b + t

                @when_q(k_r * f)
                def _(k_r=k_r, t=t):
                    gen_inc(k_r, t, wsb, Wb)
                    cur = gb_win(t % 2)
                    prev = gb_win(1 - t % 2)
                    for s_i in range(f):
                        q_r = k_r * f + s_i
                        sp = s_i % 2

                        @when_q(q_r)
                        def _(q_r=q_r, k_r=k_r, t=t, s_i=s_i, sp=sp):
                            step(q_r, k_r, s_i, sp, t, cur, prev,
                                 TFf - 1 - (t * f + s_i), bslot)
            return 0
        return body

    if phases is None:
        lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), make_body(), 0)
    else:
        for (b0, b1, ws_p, W_p) in phases:
            guarded = b1 * spb > n_steps
            lax.fori_loop(jnp.int32(b0), jnp.int32(b1),
                          make_body(ws_p, W_p, guarded), 0)

    pltpu.make_async_copy(obuf.at[_ix(0)], out_hbm.at[_ix(2)],
                          isem.at[_ix(2)]).wait()
    pltpu.make_async_copy(obuf.at[_ix(1)], out_hbm.at[_ix(3)],
                          isem.at[_ix(3)]).wait()


def adjoint_ablate(Xp, Yp, sigma, g, dyadic_order, fwd_stack, ablate):
    """Wrapper mirror of adjoint_planes_collapsed_gen32 (single core)."""
    f = 2 ** dyadic_order
    B0, M, _ = Xp.shape
    N = Yp.shape[1]
    Mb, Nb = M - 1, N - 1
    MM, NN = Mb * f, Nb * f
    T = MM + NN - 1
    pad_f = _pad_f_gen(f)

    Xc, Yc, g_c, S_f = Xp, Yp, g.astype(jnp.float32), fwd_stack[0]
    Bc = Xc.shape[0]
    P = ceil_to(Bc, SUBLANES)
    Lbf = ceil_to(Mb + 1, LANES)
    Lbr = ceil_to(Nb + 1, LANES)

    ins = pallas_gen32._gen_point_slabs32(
        jnp.flip(Yc, 1), jnp.flip(Xc, 1), sigma, P, Lbr)
    gp = jnp.pad(g_c, (0, P - Bc))[:, None]

    V = -(-T // f) + 1
    Tp_out = ceil_to(V + 4, LANES)
    kernel = functools.partial(
        _kernel_ablate, n_steps=T, MM=MM, NN=NN,
        Lbf=Lbf, naive=False, pad_f=pad_f, refine=f, Mb_r=Nb, Nb_r=Mb,
        window_seg=WINDOW_SEG, ablate=ablate)
    cot_b = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Tp_out, P, Lbf), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
                 + [pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, f, P, Lbr), jnp.float32),
            pltpu.VMEM((2, pallas_gen32.T_GEN * f, f, P, Lbf),
                       jnp.float32),
            pltpu.VMEM((2, P, Lbf), jnp.float32),
            pltpu.VMEM((2, P, Lbf), jnp.float32),
            pltpu.VMEM((3, P, Lbr), jnp.float32),
            pltpu.VMEM((2, P, Lbr), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(*ins, S_f, gp)
    return cot_b


print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
X0 = jnp.asarray(rng.normal(size=(B, LENGTH, 3)).cumsum(1)
                 * (1.0 / np.sqrt(LENGTH)), jnp.float32)
Y0 = jnp.asarray(rng.normal(size=(B, LENGTH, 3)).cumsum(1)
                 * (1.0 / np.sqrt(LENGTH)), jnp.float32)
pad = _pad_f_gen(2 ** DY)
gv = jnp.ones((B,), jnp.float32)


def run(ablate):
    def fn(X, Y):
        v, stk = pallas_gen32.solve_final_f32_gen_stack(
            X, Y, SIGMA, dyadic_order=DY, stack_pad=pad)
        ct = adjoint_ablate(X, Y, SIGMA, gv, DY, stk, ablate)
        return v.sum() + ct[2, 0, 0]
    jfn = jax.jit(fn)
    float(jfn(X0, Y0))
    ts = []
    for i in range(3):
        Xi = X0 * (1.0 + np.float32(1e-4) * (i + 1))
        float(Xi.ravel()[0])
        t0 = time.perf_counter()
        out = jfn(Xi, Y0)
        float(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


# sanity: the faithful copy must reproduce the production cotangent
ct_ref = pallas_adjoint.adjoint_planes_collapsed_gen32(
    X0, Y0, SIGMA, gv, naive=False, dyadic_order=DY,
    fwd_stack=pallas_gen32.solve_final_f32_gen_stack(
        X0, Y0, SIGMA, dyadic_order=DY, stack_pad=pad)[1])
print("ref cot computed", flush=True)

ts = {}
for ab in ("full", "noprod", "nodma"):
    ts[ab] = run(ab)
    print(f"{ab:7s}: {ts[ab]*1e3:6.1f} ms", flush=True)
print(f"\nproduct+flush cost : {(ts['full']-ts['noprod'])*1e3:6.1f} ms",
      flush=True)
print(f"stack-DMA cost     : {(ts['noprod']-ts['nodma'])*1e3:6.1f} ms",
      flush=True)
print("ADJSTAGE_PROBE_OK", flush=True)
