"""Route-resolution matrix: one resolver, every route enumerated.

Part A pins the (tier x gates x grad_solver) -> RouteSpec mapping of
``ops.routes`` with monkeypatched gates, so fwd/bwd agreement and the
route table are explicit and reviewable in one place.

Part B executes every route reachable at small shapes (interpret mode on
CPU) through the PUBLIC ``solve``/``solve_df`` entry points and
cross-checks value AND gradient against the scan tier (f64 oracle).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sigkernel_tpu.ops import scan_solver, solve as solve_mod
from sigkernel_tpu.ops.routes import (IncRoute, DfRoute, resolve_inc_route,
                                      resolve_df_route, resolve_family)
from sigkernel_tpu.utils import dyadic_refine

ON_TPU = bool(os.environ.get("SIGKERNEL_TEST_TPU"))


@pytest.fixture(autouse=True)
def _interpret_mode():
    if ON_TPU:
        yield
    else:
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            yield


# ---------------------------------------------------------------------------
# Part A: the resolver mapping, enumerated
# ---------------------------------------------------------------------------

_P32 = jax.ShapeDtypeStruct((2, 5, 5), jnp.float32)
_P64 = jax.ShapeDtypeStruct((2, 5, 5), jnp.float64)

_INC_MATRIX = [
    # (tier, planes_gate, stack_gate, grad_solver, probe, expected route)
    ("pallas", True, True, "auto", _P32, IncRoute("pallas", "planes", "planes")),
    ("pallas", False, True, "auto", _P32, IncRoute("pallas", "full", "fused")),
    ("pallas", False, False, "auto", _P32, IncRoute("pallas", None, "fused")),
    ("pallas_df64", False, False, "auto", _P64,
     IncRoute("pallas_df64", None, "grid")),
    ("pallas_df64", False, False, "df64", _P64,
     IncRoute("pallas_df64", None, "grid")),
    ("pallas_df64", False, False, "f32", _P64,
     IncRoute("pallas_df64", None, "fused")),
    ("pallas_blocked", False, False, "f32", _P64,
     IncRoute("pallas_blocked", None, "striped")),
    ("pallas_blocked", False, False, "df64", _P64,
     IncRoute("pallas_blocked", None, "striped_df")),
    ("pallas_blocked", False, False, "auto", _P64,
     IncRoute("pallas_blocked", None, "striped_df")),
    ("pallas_blocked", False, False, "auto", _P32,
     IncRoute("pallas_blocked", None, "striped")),
    ("scan", False, False, "auto", _P64, IncRoute("scan", None, "grid")),
]


@pytest.mark.parametrize("tier,pg,sg,gs,probe,want", _INC_MATRIX)
def test_inc_route_matrix(monkeypatch, tier, pg, sg, gs, probe, want):
    monkeypatch.setattr(solve_mod, "_resolve", lambda *a: tier)
    monkeypatch.setattr(solve_mod, "_f32_planes_gate", lambda *a: pg)
    monkeypatch.setattr(solve_mod, "_f32_stack_gate", lambda *a: sg)
    got = resolve_inc_route(probe, "auto", 1, gs)
    assert got[:3] == want[:3]


def test_inc_route_blocked_auto_f64_honest(monkeypatch):
    """f64 increments beyond VMEM get the f64-grade striped adjoint under
    'auto' -- never a silent downgrade to f32 grade."""
    monkeypatch.setattr(solve_mod, "_resolve", lambda *a: "pallas_blocked")
    r = resolve_inc_route(_P64, "auto", 1, "auto")
    assert r.bwd == "striped_df" and r.warn is None


_DF_MATRIX = [
    # (planes, ckpt, stack, supported, blocked, expected)
    (True, False, False, True, False, DfRoute("planes", "planes")),
    (False, True, False, True, False, DfRoute("ckpt", "ckpt")),
    (False, False, True, True, False, DfRoute("full", "fused")),
    (False, False, False, True, False, DfRoute(None, "fused")),
    (False, False, False, False, True, DfRoute(None, "striped")),
    (False, False, False, False, False, DfRoute(None, "grid")),
]


@pytest.mark.parametrize("pg,cg,sg,sup,blk,want", _DF_MATRIX)
def test_df_route_matrix(monkeypatch, pg, cg, sg, sup, blk, want):
    from sigkernel_tpu.ops import pallas_blocked

    monkeypatch.setattr(solve_mod, "_df_planes_gate", lambda *a: pg)
    monkeypatch.setattr(solve_mod, "_df_ckpt_gate", lambda *a: cg)
    monkeypatch.setattr(solve_mod, "_df_stack_gate", lambda *a: sg)
    monkeypatch.setattr(solve_mod, "_df_supported", lambda *a: sup)
    monkeypatch.setattr(pallas_blocked, "supported", lambda *a: blk)
    assert resolve_df_route(_P32, 1) == want


def test_family_matrix(monkeypatch, rng):
    import sigkernel_tpu as sk
    import sigkernel_tpu.sigkernel as K

    kern = sk.RBFKernel(1.0)
    x = jnp.asarray(rng.normal(size=(2, 6, 2)))
    cases = [
        # (fused_auto, df_route, gen_route, solver, grad_solver, want)
        (True, False, False, "auto", "auto", "fused"),
        (False, False, False, "fused", "auto", "fused"),
        (False, False, False, "auto", "auto", "inc"),
        (False, True, False, "auto", "auto", "df_hybrid"),
        (False, True, False, "auto", "df64", "df_hybrid"),
        (False, True, True, "auto", "f32", "gen"),
        (False, True, False, "auto", "f32", "df"),
    ]
    for fa, dfr, gen, solver, gs, want in cases:
        monkeypatch.setattr(K, "_fused_auto", lambda *a, v=fa: v)
        monkeypatch.setattr(K, "_df_route", lambda *a, v=dfr: v)
        monkeypatch.setattr(K, "_gen_route", lambda *a, v=gen, **kw: v)
        got = resolve_family(kern, x, x, solver, gs, 1, gram=False)
        assert got == want, (fa, dfr, gen, solver, gs, got, want)


def test_hybrid_bwd_matrix(monkeypatch, rng):
    """``resolve_hybrid_bwd``: the honest-default backward's route gates
    (gen geometry x plane-adjoint geometry x per-chunk stack budget)."""
    import sigkernel_tpu as sk
    import sigkernel_tpu.sigkernel as K
    from sigkernel_tpu.ops import pallas_adjoint
    from sigkernel_tpu.ops.routes import resolve_hybrid_bwd

    kern = sk.RBFKernel(1.0)
    x = jnp.asarray(rng.normal(size=(2, 6, 2)))
    cases = [
        # (gen_route, planes_adj_ok, budget_ok, want)
        (True, True, True, "gen_df"),
        (False, True, True, "chain"),
        (True, False, True, "chain"),
        (True, True, False, "chain"),
    ]
    for gen, pok, bok, want in cases:
        monkeypatch.setattr(K, "_gen_route", lambda *a, v=gen, **kw: v)
        monkeypatch.setattr(pallas_adjoint, "planes_adj_ok",
                            lambda *a, v=pok: v)
        monkeypatch.setattr(solve_mod, "_full_stack_bytes",
                            lambda *a, v=bok: 0 if v else 1 << 62)
        got = resolve_hybrid_bwd(kern, x, x, 1, False)
        assert got == want, (gen, pok, bok, got, want)


# ---------------------------------------------------------------------------
# Part B: every route executed end-to-end (value + grad vs scan tier)
# ---------------------------------------------------------------------------

def _oracle(inc64, dyadic_order, naive=False):
    """f64 scan-tier value + ADJOINT gradient of sum(K).

    The gradient semantics of the whole library (and the reference) is the
    PDE-level adjoint (second solve on reversed increments), NOT autodiff
    through the discrete scheme -- the two differ by O(h^2) discretisation
    error, so the oracle must be the scan-tier custom_vjp, not
    ``jax.grad`` through ``scan_solver``. Must be called BEFORE any route
    gates are monkeypatched.
    """
    def loss(i):
        return solve_mod.solve(i, solver="scan", dyadic_order=dyadic_order,
                               naive=naive).sum()
    v, g = jax.value_and_grad(loss)(inc64)
    return np.asarray(v), np.asarray(g)


def _force_inc(monkeypatch, tier, planes, stack):
    monkeypatch.setattr(solve_mod, "_resolve", lambda *a: tier)
    monkeypatch.setattr(solve_mod, "_f32_planes_gate", lambda *a: planes)
    monkeypatch.setattr(solve_mod, "_f32_stack_gate", lambda *a: stack)


@pytest.mark.parametrize("tier,planes,stack,dtype", [
    ("pallas", True, False, jnp.float32),    # planes stack fwd + planes bwd
    ("pallas", False, True, jnp.float32),    # full stack fwd + fused bwd
    ("pallas", False, False, jnp.float32),   # plain fwd + fused bwd
    ("scan", False, False, jnp.float64),     # scan fwd + grid bwd
])
def test_inc_routes_execute_and_match_scan(rng, monkeypatch, tier, planes,
                                           stack, dtype):
    dyadic = 1
    inc64 = jnp.asarray(rng.normal(size=(2, 6, 5)) * 0.1)
    v0, g0 = _oracle(inc64, dyadic)
    _force_inc(monkeypatch, tier, planes, stack)
    inc = inc64.astype(dtype)

    def loss(i):
        return solve_mod.solve(i, solver="auto", dyadic_order=dyadic).sum()

    v, g = jax.value_and_grad(loss)(inc)
    np.testing.assert_allclose(float(v), v0, rtol=5e-6)
    scale = max(np.abs(g0).max(), 1e-30)
    np.testing.assert_allclose(np.asarray(g, np.float64), g0,
                               atol=5e-5 * scale, rtol=0)


@pytest.mark.parametrize("grad_solver,bwd", [("f32", "fused"),
                                             ("auto", "grid"),
                                             ("df64", "grid")])
def test_inc_df64_tier_routes_execute(rng, monkeypatch, grad_solver, bwd):
    """The pallas_df64 tier through solve(): f64-grade fwd; bwd per matrix."""
    dyadic = 1
    inc64 = jnp.asarray(rng.normal(size=(2, 6, 5)) * 0.1)
    v0, g0 = _oracle(inc64, dyadic)
    monkeypatch.setattr(solve_mod, "_resolve", lambda *a: "pallas_df64")
    assert resolve_inc_route(inc64, "auto", dyadic, grad_solver).bwd == bwd

    def loss(i):
        return solve_mod.solve(i, solver="auto", dyadic_order=dyadic,
                               grad_solver=grad_solver).sum()

    v, g = jax.value_and_grad(loss)(inc64)
    np.testing.assert_allclose(float(v), v0, rtol=1e-9)
    scale = max(np.abs(g0).max(), 1e-30)
    tol = 5e-5 if bwd == "fused" else 1e-9
    np.testing.assert_allclose(np.asarray(g), g0, atol=tol * scale, rtol=0)


def _split_hi_lo(inc64):
    hi = jnp.asarray(inc64, jnp.float32)
    lo = jnp.asarray(np.asarray(inc64) - np.asarray(hi, np.float64),
                     jnp.float32)
    return hi, lo


@pytest.mark.parametrize("fwd_stack,bwd,gates", [
    ("planes", "planes", dict(planes=True, ckpt=False, stack=False, sup=True)),
    ("full", "fused", dict(planes=False, ckpt=False, stack=True, sup=True)),
    (None, "fused", dict(planes=False, ckpt=False, stack=False, sup=True)),
    (None, "grid", dict(planes=False, ckpt=False, stack=False, sup=False)),
])
def test_df_routes_execute_and_match_scan(rng, monkeypatch, fwd_stack, bwd,
                                          gates):
    dyadic = 1
    inc64 = jnp.asarray(rng.normal(size=(2, 6, 5)) * 0.1)
    v0, g0 = _oracle(inc64, dyadic)
    monkeypatch.setattr(solve_mod, "_df_planes_gate",
                        lambda *a: gates["planes"])
    monkeypatch.setattr(solve_mod, "_df_ckpt_gate", lambda *a: gates["ckpt"])
    monkeypatch.setattr(solve_mod, "_df_stack_gate",
                        lambda *a: gates["stack"])
    monkeypatch.setattr(solve_mod, "_df_supported", lambda *a: gates["sup"])
    hi0, lo0 = _split_hi_lo(inc64)
    assert resolve_df_route(hi0, dyadic) == DfRoute(fwd_stack, bwd)

    def loss(hi):
        return solve_mod.solve_df((hi, lo0), dyadic_order=dyadic).sum()

    v, g = jax.value_and_grad(loss)(hi0)
    np.testing.assert_allclose(float(v), v0, rtol=1e-7)
    scale = max(np.abs(g0).max(), 1e-30)
    np.testing.assert_allclose(np.asarray(g, np.float64), g0,
                               atol=5e-5 * scale, rtol=0)
