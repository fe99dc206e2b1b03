"""Pallas banded wavefront: the span-carrying fitting alignment as ONE
fused kernel loop.

Why this exists: the XLA `lax.scan` wavefront is per-step-overhead-bound —
probe_band measured the same ~48 us/diagonal whether a step touches
[B, 241] lanes or a [B, 82] band (docs/DESIGN.md §12c), so the recorded
banded-lanes lever was NEUTRAL and the only remaining lever is the cost of
the sequential step itself. Here the whole M+N-diagonal loop runs INSIDE
one Pallas program per read-tile: the band state stays in vector registers
across diagonals, each step is a handful of VPU ops, and there are no
per-step kernel boundaries.

Layout: READS on the lane axis (128-wide), band cells on the sublane axis
— the transpose of the XLA formulation.

Mosaic constraint that shaped the design: dynamic-offset vector loads must
be PROVABLY 8-aligned in the sublane dimension (the first kernel draft
died on `cannot statically prove that index ... is a multiple of 8`).
Both sliding windows (the a-diagonal slice moves by -1/0 rows per step,
the band base by 0/+1) are therefore carried as loop VALUES and realigned
with STATIC shifts selected by the step's traced delta; the single row
that enters a window each step is fetched with an (8, TB) load at a
rounded-down multiple-of-8 offset (`pl.multiple_of`) and picked out with
a one-hot masked sum — no unaligned vector load anywhere.

Band contract matches ops.align.fit_distance_span_banded with the
effective off_hi this wrapper reports (the band is widened so the lane
count K lands on a sublane-tile multiple); bit-exactness against the XLA
banded scan at that widened band is asserted by tests/test_pallas.py and
on-device by benchmarks/probe_wavefront.py. Reference anchor: the
reference's only comparison primitive is equal-length Hamming distance
(/root/reference/src/utils/functions/hamming/multi.rs); alignment is
north-star surface, designed TPU-first.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_B = 512  # reads per program

_BIG = np.int32(2**30)
_BIG16 = 2**14  # int16 sentinel: BIG16 + max step cost stays < 2**15
_PAD_A = np.int32(4)
_PAD_B = np.int32(5)


def _row_at(ref, idx, TB, SA):
    """ref[idx, :] as [1, TB] without an unaligned load: (SA, TB) load at
    the rounded-down multiple-of-SA offset + one-hot row pick (SA = the
    dtype's sublane tile: 8 for int32, 16 for int16)."""
    base = pl.multiple_of((idx // SA) * SA, SA)
    raw = ref[pl.ds(base, SA), :]
    sub = jax.lax.broadcasted_iota(jnp.int32, (SA, TB), 0)
    # Mosaic has no int16 reductions: widen for the one-hot sum
    return jnp.sum(
        jnp.where(sub == idx - base, raw, 0).astype(jnp.int32),
        axis=0, keepdims=True,
    ).astype(raw.dtype)


def _window_at_static(ref, idx: int, K: int, SA: int):
    """ref[idx : idx+K, :] for a PYTHON-int idx: aligned over-read +
    static value slice (init-time only)."""
    base = (idx // SA) * SA
    raw = ref[pl.ds(base, K + SA), :]
    r = idx - base
    return jax.lax.slice_in_dim(raw, r, r + K, axis=0)


def _fit_kernel(
    arp_ref,     # [R + 8, TB] int32: reversed-padded a codes, transposed
    bsh_ref,     # [N + 9, TB] int32: b[j-1] with sentinel at j=0, transposed
    la_ref,      # [8, TB] int32 lengths of a (row-replicated)
    lb_ref,      # [8, TB] int32 lengths of b (row-replicated)
    fit_ref,     # [8, TB] int32 out (row-replicated)
    startj_ref,  # [8, TB] int32 out
    endj_ref,    # [8, TB] int32 out
    *,
    M: int,
    N: int,
    K: int,
    off_lo: int,
    mm: int,
    gp: int,
    dt=jnp.int32,
):
    TB = la_ref.shape[1]
    SA = 16 if dt == jnp.int16 else 8
    big = dt(np.int16(_BIG16)) if dt == jnp.int16 else jnp.int32(_BIG)
    mmv = dt(mm)
    gpv = dt(gp)
    la = jax.lax.slice_in_dim(la_ref[:], 0, 1, axis=0)
    lb = jax.lax.slice_in_dim(lb_ref[:], 0, 1, axis=0)
    top = max(0, N + 1 - K)
    T = M + N
    tsub = jax.lax.broadcasted_iota(jnp.int32, (K, TB), 0)
    tsub_d = tsub.astype(dt)

    def pybase(d: int) -> int:
        return min(max((d + off_lo + 1) // 2, 0), top)

    # sublane shifts via pltpu.roll (concat-built shifts hit a Mosaic
    # relayout crash when loop-carried; rolls lower cleanly)
    def shift_up(v):
        return jnp.where(tsub == K - 1, big, pltpu.roll(v, shift=K - 1, axis=0))

    def shift_down(v):
        return jnp.where(tsub == 0, big, pltpu.roll(v, shift=1, axis=0))

    def shift_down_row(v, row):
        return jnp.where(tsub == 0, jnp.broadcast_to(row, (K, TB)),
                         pltpu.roll(v, shift=1, axis=0))

    def shift_up_row(v, row):
        return jnp.where(tsub == K - 1, jnp.broadcast_to(row, (K, TB)),
                         pltpu.roll(v, shift=K - 1, axis=0))

    # d = 0 state (base(0) = 0): D[0,0] = 0, S[0,j] = j. Every [K, TB]
    # carry init is offset by a load-derived zero (znr): splat-initialized
    # carries pick a sublane-REPLICATED layout that the loop back-edge
    # cannot relayout from the body's general layout (Mosaic "Invalid
    # relayout ... replicated in destination but not in source").
    a_diag = _window_at_static(arp_ref, N + 1 + M, K, SA)  # d=0 window
    b_diag = _window_at_static(bsh_ref, 0, K, SA)
    znr = jnp.minimum(a_diag, dt(0))  # zeros, provably non-replicated
    prev = jnp.where(tsub == 0, dt(0), big) + znr
    prev2 = big + znr
    sprev = tsub_d + znr
    sprev2 = znr
    fit = jnp.where(la == 0, 0, _BIG)
    endj = jnp.zeros((1, TB), jnp.int32)
    startj = jnp.zeros((1, TB), jnp.int32)

    def substep(d, carry, d1: int, d2: int):
        """One diagonal step; d traced, the band deltas d1/d2 STATIC."""
        prev, prev2, sprev, sprev2, a_diag, b_diag, fit, endj, startj = carry
        # slide the code windows into position for step d (the a-slice
        # start moves by d1 - 1 in {-1, 0}, the b start by d1 in {0, 1})
        bd = jnp.clip((d + off_lo + 1) // 2, 0, top)
        if d1 == 0:  # a start decreased by one: element enters at t=0
            a_diag = shift_down_row(
                a_diag, _row_at(arp_ref, N + 1 + M - d + bd, TB, SA)
            )
        else:  # b start increased by one: element enters at t=K-1
            b_diag = shift_up_row(
                b_diag, _row_at(bsh_ref, bd + (K - 1), TB, SA)
            )
        sub = jnp.where(a_diag == b_diag, dt(0), mmv)
        c_diag = (shift_down(prev2) if d2 == 0
                  else (prev2 if d2 == 1 else shift_up(prev2))) + sub
        c_up = (prev if d1 == 0 else shift_up(prev)) + gpv
        c_left = (shift_down(prev) if d1 == 0 else prev) + gpv
        diag = jnp.minimum(jnp.minimum(c_diag, c_up), c_left)
        s_dg = (shift_down(sprev2) if d2 == 0
                else (sprev2 if d2 == 1 else shift_up(sprev2)))
        s_up = sprev if d1 == 0 else shift_up(sprev)
        s_left = shift_down(sprev) if d1 == 0 else sprev
        S = jnp.minimum(
            jnp.minimum(
                jnp.where(c_diag == diag, s_dg, big),
                jnp.where(c_up == diag, s_up, big),
            ),
            jnp.where(c_left == diag, s_left, big),
        )
        jj = bd + tsub
        dg0 = (d * jnp.int32(gp)).astype(dt)  # <= T*gp, in-range by the
        diag = jnp.where(jj == 0, dg0, diag)  # wrapper's dtype guard
        S = jnp.where(jj == 0, dt(0), S)
        diag = jnp.where(jj == d, dt(0), diag)  # free b-prefix
        S = jnp.where(jj == d, jj.astype(dt), S)
        diag = jnp.where(jj > d, big, diag)  # i < 0: no such cell
        jm = d - la
        at = (jj == jm) & (jm >= 0) & (jj <= lb)
        # Mosaic has no int16 reductions: widen for the extraction mins
        v = jnp.min(
            jnp.where(at, diag, big).astype(jnp.int32), axis=0, keepdims=True
        )
        st = jnp.min(
            jnp.where(at, S, big).astype(jnp.int32), axis=0, keepdims=True
        )
        bigpy = _BIG16 if dt == jnp.int16 else int(_BIG)
        v = jnp.where(v >= bigpy, _BIG, v)  # re-widen the sentinel
        st = jnp.where(st >= bigpy, _BIG, st)
        better = v < fit
        fit = jnp.minimum(fit, v)
        endj = jnp.where(better, jm, endj)
        startj = jnp.where(better, st, startj)
        return (diag, prev, S, sprev, a_diag, b_diag, fit, endj, startj)

    # the band deltas are pure functions of d: compute them in PYTHON and
    # emit loops over the (at most period-2) repeating phases, so every
    # substep's shifts are static
    deltas = [
        (pybase(d) - pybase(d - 1), pybase(d) - pybase(d - 2))
        for d in range(1, T + 1)
    ]
    carry = (prev, prev2, sprev, sprev2, a_diag, b_diag, fit, endj, startj)
    i = 0
    while i < len(deltas):
        best_p, best_len = 1, 1
        for p in (1, 2):
            L = p
            while (i + L < len(deltas)
                   and deltas[i + L] == deltas[i + (L % p)]):
                L += 1
            L = (L // p) * p
            if L > best_len:
                best_p, best_len = p, L
        if best_len >= 4:
            pat = tuple(deltas[i : i + best_p])
            d0 = i + 1

            def body(kk, c, pat=pat, d0=d0, p=best_p):
                d = d0 + p * kk
                for q, (a, b) in enumerate(pat):
                    c = substep(d + q, c, a, b)
                return c

            carry = jax.lax.fori_loop(0, best_len // best_p, body, carry)
            i += best_len
        else:
            carry = substep(i + 1, carry, *deltas[i])
            i += 1
    fit, endj, startj = carry[6], carry[7], carry[8]
    fit_ref[:] = jnp.broadcast_to(fit, (8, TB))
    endj_ref[:] = jnp.broadcast_to(endj, (8, TB))
    startj_ref[:] = jnp.broadcast_to(
        jnp.where(fit < _BIG, jnp.minimum(startj, endj), 0), (8, TB)
    )


def _band_k8(off_lo: int, off_hi: int, sa: int = 8) -> Tuple[int, int]:
    """(K, effective off_hi): widen the band so K is a sublane-tile
    multiple (the widened band is a superset — never less exact).
    sa: the dtype's sublane tile (8 for int32, 16 for int16)."""
    from ..align import _band_geometry

    K, _ = _band_geometry(off_lo, off_hi, 1 << 30)
    K8 = -(-K // sa) * sa
    return K8, off_lo + 2 * (K8 - 2)


@partial(
    jax.jit,
    static_argnames=("mismatch", "gap", "off_lo", "off_hi", "interpret"),
)
def fit_distance_span_banded_pallas(
    words_a: jax.Array,
    lens_a: jax.Array,
    words_b: jax.Array,
    lens_b: jax.Array,
    mismatch: int = 1,
    gap: int = 1,
    off_lo: int = -16,
    off_hi: int = 96,
    *,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pallas twin of ops.align.fit_distance_span_banded — same band
    contract at the widened off_hi from _band_k8 (bit-exact against the
    XLA banded scan called with that band), same (cost, start_j, end_j).
    mismatch/gap are STATIC here (kernel literals; the XLA twins trace
    them) — the mapper only ever uses one cost model per index anyway.

    Cell dtype: int16 when every DP value provably fits its sentinel
    headroom ((M+N+1)*max(mm,gp) < 2**14 and N < 2**14) — half the vector
    registers per cell, measured faster on chip — int32 otherwise."""
    from ..align import _codes, _rev_padded, _b_shifted, fit_distance_span

    lens_a = jnp.asarray(lens_a, jnp.int32)
    lens_b = jnp.asarray(lens_b, jnp.int32)
    a = _codes(words_a, lens_a, _PAD_A)
    b = _codes(words_b, lens_b, _PAD_B)
    B, M = a.shape
    N = b.shape[-1]
    # int16 cells would halve the vregs/cell and every DP value fits
    # ((M+N+1)*max(mm,gp) < 2**14 at mapper shapes), but this Mosaic
    # version cannot lower the band shifts at 16 bit ("not implemented:
    # Rotate with non-32-bit data") — measured on chip, round 4. The
    # dtype plumbing stays so the guard below can flip when Mosaic grows
    # 16-bit rotates.
    use16 = False
    dt = jnp.int16 if use16 else jnp.int32
    SA = 16 if use16 else 8
    K, _ = _band_k8(off_lo, off_hi, SA)
    if K >= N + 1:  # band covers the window: the plain scan is cheaper
        return fit_distance_span(words_a, lens_a, words_b, lens_b, mismatch, gap)

    Bp = -(-B // TILE_B) * TILE_B
    arp = _rev_padded(a, N + 1)  # [B, M + 2(N+1)]
    bsh = _b_shifted(b)  # [B, N+1]
    arp_t = jnp.pad(
        arp, ((0, Bp - B), (0, SA)), constant_values=_PAD_A
    ).T.astype(dt)
    bsh_t = jnp.pad(
        bsh, ((0, Bp - B), (0, SA)), constant_values=_PAD_B
    ).T.astype(dt)
    la = jnp.broadcast_to(jnp.pad(lens_a, (0, Bp - B))[None, :], (8, Bp))
    lb = jnp.broadcast_to(jnp.pad(lens_b, (0, Bp - B))[None, :], (8, Bp))

    R = arp_t.shape[0]
    grid = (Bp // TILE_B,)
    kern = partial(
        _fit_kernel, M=M, N=N, K=K, off_lo=off_lo,
        mm=int(mismatch), gp=int(gap), dt=dt,
    )
    fit, startj, endj = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((R, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (N + 1 + SA, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((8, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, Bp), jnp.int32),
            jax.ShapeDtypeStruct((8, Bp), jnp.int32),
            jax.ShapeDtypeStruct((8, Bp), jnp.int32),
        ],
        interpret=interpret,
    )(arp_t, bsh_t, la, lb)
    return fit[0, :B], startj[0, :B], endj[0, :B]


# ---------------------------------------------------------------------------
# affine-gap Smith-Waterman as the same fused loop
# ---------------------------------------------------------------------------


def _sw_kernel(
    arp_ref,     # [R + 8, TB] int32 reversed-padded a codes, transposed
    bsh_ref,     # [N + 9, TB] int32 b[j-1] with sentinel, transposed
    la_ref,      # [8, TB] int32 lengths of a (row-replicated)
    lb_ref,      # [8, TB] int32 lengths of b
    best_ref,    # [8, TB] int32 out
    endi_ref,    # [8, TB] int32 out
    endj_ref,    # [8, TB] int32 out
    *,
    M: int,
    N: int,
    mt: int,
    mm: int,
    go: int,
    ge: int,
):
    """ops.align.sw_score's Gotoh recurrence fused into one kernel loop —
    full [N+1]-lane wavefront (local alignments start anywhere, so there
    is no band contract), same tie rules (max score, smallest i+j, then
    smallest j), bit-exact vs the XLA scan (tests/test_pallas.py).

    Unlike the fit kernel there are no sliding deltas: the only dynamic
    slice is the a-diagonal, carried as a value with one entering row per
    step (all loads 8-aligned)."""
    TB = la_ref.shape[1]
    K = N + 1
    mtv = jnp.int32(mt)
    mmv = jnp.int32(mm)
    gov = jnp.int32(go)
    gev = jnp.int32(ge)
    la = jax.lax.slice_in_dim(la_ref[:], 0, 1, axis=0)
    lb = jax.lax.slice_in_dim(lb_ref[:], 0, 1, axis=0)
    T = M + N
    tsub = jax.lax.broadcasted_iota(jnp.int32, (K, TB), 0)

    def shift_down(v, fill):
        return jnp.where(tsub == 0, fill, pltpu.roll(v, shift=1, axis=0))

    a_diag = _window_at_static(arp_ref, N + 1 + M, K, 8)
    znr = jnp.minimum(a_diag, 0)
    h_prev = znr  # H[0, j] = 0
    h_prev2 = znr
    e_prev = -_BIG + znr
    f_prev = -_BIG + znr
    best = jnp.zeros((1, TB), jnp.int32)
    end_i = jnp.zeros((1, TB), jnp.int32)
    end_j = jnp.zeros((1, TB), jnp.int32)

    def body(d, carry):
        h_prev, h_prev2, e_prev, f_prev, a_diag, best, end_i, end_j = carry
        # a-slice start decreases by exactly 1 per step (no band)
        a_diag = jnp.where(
            tsub == 0,
            jnp.broadcast_to(_row_at(arp_ref, N + 1 + M - d, TB, 8), (K, TB)),
            pltpu.roll(a_diag, shift=1, axis=0),
        )
        b_diag = bsh_ref[pl.ds(0, K), :]
        s = jnp.where(a_diag == b_diag, mtv, mmv)
        e = jnp.maximum(
            shift_down(h_prev, -_BIG) + gov, shift_down(e_prev, -_BIG) + gev
        )
        f = jnp.maximum(h_prev + gov, f_prev + gev)
        h = jnp.maximum(
            jnp.maximum(shift_down(h_prev2, -_BIG) + s, jnp.int32(0)),
            jnp.maximum(e, f),
        )
        edge = (tsub == 0) | (tsub == d)
        h = jnp.where(edge, 0, h)
        e = jnp.where(edge, -_BIG, e)
        f = jnp.where(edge, -_BIG, f)
        i = d - tsub
        in_range = (tsub >= 1) & (tsub <= lb) & (i >= 1) & (i <= la)
        hm = jnp.where(in_range, h, -1)
        row_best = jnp.max(hm, axis=0, keepdims=True)
        row_j = jnp.min(
            jnp.where(hm == row_best, tsub, jnp.int32(N + 1)),
            axis=0, keepdims=True,
        )
        upd = row_best > best  # strict: earlier d wins ties
        best = jnp.maximum(best, row_best)
        end_j = jnp.where(upd, row_j, end_j)
        end_i = jnp.where(upd, d - row_j, end_i)
        return (h, h_prev, e, f, a_diag, best, end_i, end_j)

    carry = (h_prev, h_prev2, e_prev, f_prev, a_diag, best, end_i, end_j)
    carry = jax.lax.fori_loop(1, T + 1, body, carry)
    best, end_i, end_j = carry[5], carry[6], carry[7]
    best_ref[:] = jnp.broadcast_to(best, (8, TB))
    endi_ref[:] = jnp.broadcast_to(end_i, (8, TB))
    endj_ref[:] = jnp.broadcast_to(end_j, (8, TB))


@partial(
    jax.jit,
    static_argnames=(
        "match", "mismatch", "gap_open", "gap_extend", "interpret"
    ),
)
def sw_score_pallas(
    words_a: jax.Array,
    lens_a: jax.Array,
    words_b: jax.Array,
    lens_b: jax.Array,
    match: int = 2,
    mismatch: int = -3,
    gap_open: int = -5,
    gap_extend: int = -2,
    *,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pallas twin of ops.align.sw_score (params STATIC here; the XLA twin
    traces them). Returns (score [B], end_i [B], end_j [B]), bit-exact."""
    from ..align import _codes, _rev_padded, _b_shifted

    lens_a = jnp.asarray(lens_a, jnp.int32)
    lens_b = jnp.asarray(lens_b, jnp.int32)
    a = _codes(words_a, lens_a, _PAD_A)
    b = _codes(words_b, lens_b, _PAD_B)
    B, M = a.shape
    N = b.shape[-1]
    Bp = -(-B // TILE_B) * TILE_B
    arp = _rev_padded(a, N + 1)
    bsh = _b_shifted(b)
    arp_t = jnp.pad(
        arp, ((0, Bp - B), (0, 8)), constant_values=_PAD_A
    ).T.astype(jnp.int32)
    bsh_t = jnp.pad(
        bsh, ((0, Bp - B), (0, 8)), constant_values=_PAD_B
    ).T.astype(jnp.int32)
    la = jnp.broadcast_to(jnp.pad(lens_a, (0, Bp - B))[None, :], (8, Bp))
    lb = jnp.broadcast_to(jnp.pad(lens_b, (0, Bp - B))[None, :], (8, Bp))
    R = arp_t.shape[0]
    kern = partial(
        _sw_kernel, M=M, N=N, mt=int(match), mm=int(mismatch),
        go=int(gap_open), ge=int(gap_extend),
    )
    best, endi, endj = pl.pallas_call(
        kern,
        grid=(Bp // TILE_B,),
        in_specs=[
            pl.BlockSpec((R, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (N + 9, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((8, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, Bp), jnp.int32),
            jax.ShapeDtypeStruct((8, Bp), jnp.int32),
            jax.ShapeDtypeStruct((8, Bp), jnp.int32),
        ],
        interpret=interpret,
    )(arp_t, bsh_t, la, lb)
    return best[0, :B], endi[0, :B], endj[0, :B]
