"""CPU prototype of the multi-diagonal block-step composite map.

The wavefront recurrence is *affine* in the carried state: with
``y = v_{q-1}``, ``z = v_{q-2}`` and per-cell coefficients from ``inc``
only,

    v_q[i] = m_q[i] * (A_q[i]*(y[i] + y[i-1]) - B_q[i]*z[i-1]) + (1-m_q[i])

(m is the static boundary/head mask). A block of ``s`` consecutive steps is
therefore one banded affine map

    v_{q0+s-1}[i] = sum_d C_d[i]*y[i-d] + sum_d D_d[i]*z[i-d] + E[i]

whose coefficients depend only on increments -- they can be built without
touching the serial chain, then applied as ~4s fused multiply-adds in ONE
chain step instead of ``s`` chained steps. This script validates the band
composition rules against direct iteration (the design basis for
``ops/pallas_block.py``; see docs/BENCHMARKS.md round-3 notes).

Run: python scripts/block_composite_proto.py
"""
from __future__ import annotations

import numpy as np


def step(y, z, A, B, m):
    """Direct kernel-form step: returns v_q (lane roll = shift, index i-1)."""
    y1 = np.roll(y, 1, axis=-1)
    z1 = np.roll(z, 1, axis=-1)
    v = A * (y + y1) - B * z1
    return np.where(m, 1.0, v)


def compose_block(As, Bs, ms, L):
    """Band coefficients of the affine map over steps q0..q0+s-1.

    Returns (C, D, E, Cp, Dp, Ep): bands for the block's last state
    v_{q0+s-1} (C over y = v_{q0-1}, D over z = v_{q0-2}, bias E) and for
    the second-to-last v_{q0+s-2} (primed).
    """
    s = len(As)
    # running maps for (v_{q-1}, v_{q-2}) as bands over (y, z) + bias:
    # start: v_{q0-1} = y (C=delta_0), v_{q0-2} = z
    C = [np.zeros((s + 1, L)), np.zeros((s + 1, L))]   # bands over y
    D = [np.zeros((s + 1, L)), np.zeros((s + 1, L))]   # bands over z
    E = [np.zeros(L), np.zeros(L)]                     # biases
    C[0][0] = 1.0     # v_{q-1} = y
    D[1][0] = 1.0     # v_{q-2} = z
    shift = lambda a: np.roll(a, 1, axis=-1)           # index i-1 with wrap

    for t in range(s):
        A, B, m = As[t], Bs[t], ms[t]
        newC = np.zeros_like(C[0])
        newD = np.zeros_like(D[0])
        # band-e coefficient of v_q:
        #   m*A*(C_e + shift(C_{e-1})) - m*B*shift(C'_{e-1})
        for e in range(t + 2):
            acc = A * C[0][e]
            if e >= 1:
                acc = acc + A * shift(C[0][e - 1]) - B * shift(C[1][e - 1])
            newC[e] = np.where(m, 0.0, acc)
            accd = A * D[0][e]
            if e >= 1:
                accd = accd + A * shift(D[0][e - 1]) - B * shift(D[1][e - 1])
            newD[e] = np.where(m, 0.0, accd)
        newE = A * (E[0] + shift(E[0])) - B * shift(E[1])
        newE = np.where(m, 1.0, newE)
        C = [newC, C[0]]
        D = [newD, D[0]]
        E = [newE, E[0]]
    return C[0], D[0], E[0], C[1], D[1], E[1]


def apply_block(y, z, C, D, E):
    """v = sum_d C_d * roll(y, d) + sum_d D_d * roll(z, d) + E."""
    v = E.copy().astype(y.dtype) + 0.0 * y  # broadcast batch
    yd, zd = y, z
    for d in range(C.shape[0]):
        v = v + C[d] * yd + D[d] * zd
        yd = np.roll(yd, 1, axis=-1)
        zd = np.roll(zd, 1, axis=-1)
    return v


def main():
    rng = np.random.default_rng(0)
    L, MM = 24, 18
    n_steps = 40
    batch = 5

    # random per-step coefficients + the kernel's static masks
    ii = np.arange(L)
    As, Bs, ms = [], [], []
    for q in range(n_steps):
        u = rng.normal(size=L) * 0.3
        As.append(1.0 + 0.5 * u + u * u / 12.0)
        Bs.append(1.0 - u * u / 12.0)
        ms.append((ii == 0) | (ii == q + 2) | (ii > MM))

    y0 = rng.normal(size=(batch, L))
    z0 = rng.normal(size=(batch, L))
    y0[:, 0] = 1.0
    z0[:, 0] = 1.0

    for s in (2, 4, 8, 20):
        assert n_steps % s == 0
        # direct iteration
        y, z = y0.copy(), z0.copy()
        for q in range(n_steps):
            y, z = step(y, z, As[q], Bs[q], ms[q]), y
        # block-composite iteration
        yb, zb = y0.copy(), z0.copy()
        for b in range(n_steps // s):
            sl = slice(b * s, (b + 1) * s)
            C, D, E, Cp, Dp, Ep = compose_block(As[sl], Bs[sl], ms[sl], L)
            v_last = apply_block(yb, zb, C, D, E)
            v_prev = apply_block(yb, zb, Cp, Dp, Ep)
            yb, zb = v_last, v_prev
        err = np.abs(yb - y).max() + np.abs(zb - z).max()
        print(f"s={s:3d}: max err {err:.3e}")
        assert err < 1e-10, "composite disagrees with direct iteration"
    print("block composite OK")


if __name__ == "__main__":
    main()
