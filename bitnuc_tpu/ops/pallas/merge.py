"""Bitonic MERGE of two sorted lists — the round-5 "sort engine".

A full variadic `lax.sort` costs O(log^2 N) compare-exchange stages; merging
two ALREADY SORTED lists needs only the log2(N) stages of one bitonic merge
(concat [A ascending, sentinel pad, B reversed] is a bitonic sequence).
DESIGN.md 6 ruled out a Pallas *sort* (XLA's flat sort is within ~2x of the
HBM floor and Mosaic cannot lower the lane-strided compare-exchange slices);
this engine is the piece that analysis did NOT cover: the framework's
sort-adjacency idiom (DESIGN.md 7) repeatedly re-sorts concatenations whose
halves are each sorted (counted-set algebra A++B, the streaming
accumulator's pending++batch, the mapper's table++queries), and for THOSE
the stage count drops from ~log^2 to log.

The lane-stride problem is solved the round-4 wavefront way (wavefront.py
Mosaic rules): every compare-exchange partner is fetched with pltpu.roll
(32-bit, supported) and position masks from broadcasted_iota literals —
no strided slices, no minor-dim reshapes. A [R, 128] i32 block holds
element i at (i // 128, i % 128); a merge stage at element distance d is
  d >= 128: roll by d//128 along sublanes (axis 0)
  d <  128: roll by d along lanes (axis 1)
and the roll wraparound is provably harmless: exchanges at distance d only
pair indices whose d-bit differs, which never cross a 2d-aligned boundary.

Structure: stages with d >= TILE (64K elements) run as XLA reshape+select
passes (memory-bound, one pass each); all stages d < TILE run inside ONE
Pallas kernel pass over independent TILE blocks. Keys are 1..3 u32 words
compared lexicographically; any number of u32/i32 payloads ride the swaps.
Not stable across equal full keys (callers needing a tiebreak fold it into
the key words — the framework's existing tag/src idiom).

No reference analog (the reference has no sort surface at all); this is
north-star scaling infrastructure for the counted-list algebra of
ops/setops.py (reference README.md:164-180 HashMap semantics) and the
k=21 streaming accumulator.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# one Pallas block: [TILE_R, 128] i32 per operand
TILE_R = 512
TILE = TILE_R * 128


def _swap_lex(klo, khi) -> jax.Array:
    """True where the lo-side key tuple sorts strictly AFTER the hi side
    (lexicographic over the key words, most significant first)."""
    swap = jnp.zeros(klo[0].shape, bool)
    eq = jnp.ones(klo[0].shape, bool)
    for a, b in zip(klo, khi):
        swap = swap | (eq & (a > b))
        eq = eq & (a == b)
    return swap


def _stage_xla(arrs, n_keys: int, d: int):
    """One compare-exchange stage at element distance d, pure XLA."""
    v = [a.reshape(-1, 2, d) for a in arrs]
    lo = [a[:, 0] for a in v]
    hi = [a[:, 1] for a in v]
    swap = _swap_lex(lo[:n_keys], hi[:n_keys])
    out = []
    for a, b in zip(lo, hi):
        na = jnp.where(swap, b, a)
        nb = jnp.where(swap, a, b)
        out.append(jnp.stack([na, nb], axis=1).reshape(-1))
    return out


def _merge_tail_kernel(n_keys: int, n_arrs: int, rows: int, *refs):
    """All merge stages with d < rows*128 on one [rows, 128] block."""
    ins, outs = refs[:n_arrs], refs[n_arrs:]
    xs = [r[...] for r in ins]
    sub = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    d = rows * 128 // 2
    while d >= 1:
        if d >= 128:
            m = d // 128
            is_lo = (sub & m) == 0
            axis, s, size = 0, m, rows
        else:
            is_lo = (lane & d) == 0
            axis, s, size = 1, d, 128
        # pltpu.roll requires shift >= 0: roll by -s == roll by size - s
        part = [
            jnp.where(
                is_lo,
                pltpu.roll(x, shift=size - s, axis=axis),
                pltpu.roll(x, shift=s, axis=axis),
            )
            for x in xs
        ]
        # lo side swaps when its partner is smaller; hi side when larger.
        # Combined with logical ops, not a select: Mosaic cannot lower a
        # select between two i1 vectors ("Unsupported target bitwidth for
        # truncation", measured round 5 — the i8->i1 trunci it emits).
        swap_lo = _swap_lex(xs[:n_keys], part[:n_keys])
        swap_hi = _swap_lex(part[:n_keys], xs[:n_keys])
        swap = (is_lo & swap_lo) | (~is_lo & swap_hi)
        xs = [jnp.where(swap, p, x) for x, p in zip(xs, part)]
        d //= 2
    for o, x in zip(outs, xs):
        o[...] = x


def _merge_tail(arrs, n_keys: int, interpret: bool):
    """Run every stage below the block size in one Pallas pass."""
    n = arrs[0].shape[0]
    rows = min(TILE_R, n // 128)
    arrs2 = [a.reshape(-1, 128) for a in arrs]
    grid = (arrs2[0].shape[0] // rows,)
    spec = pl.BlockSpec((rows, 128), lambda i: (i, 0))
    out = pl.pallas_call(
        partial(_merge_tail_kernel, n_keys, len(arrs), rows),
        grid=grid,
        in_specs=[spec] * len(arrs),
        out_specs=[spec] * len(arrs),
        out_shape=[
            jax.ShapeDtypeStruct(arrs2[0].shape, a.dtype) for a in arrs2
        ],
        interpret=interpret,
    )(*arrs2)
    return [o.reshape(-1) for o in out]


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def merge_sorted(
    a: Sequence[jax.Array],
    b: Sequence[jax.Array],
    n_keys: int,
    pad_val: Sequence[int] | None = None,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """Merge two sorted operand tuples into one sorted array set.

    a, b: tuples of equal-length-within-tuple 1-D arrays; the first n_keys
    of each are u32 key words (most significant first) and each tuple is
    sorted ascending by its key words. Remaining arrays are payloads.
    Returns arrays of length next_pow2(len_a + len_b): the first
    len_a + len_b + (#pad) rows are the merged result except that pad rows
    (key words all 0xFFFFFFFF, payloads from pad_val, default all-ones /
    -1 pattern 0xFFFFFFFF) sort among equal real sentinel keys arbitrarily
    — callers follow the framework's dead-sentinel convention (DESIGN.md 7)
    and either have no real all-ones keys or treat them uniformly.

    Equivalent (up to ties between identical full key tuples) to
    lax.sort(concat(a, b), num_keys=n_keys) — asserted by the parity tests
    in tests/test_merge_engine.py. interpret=True for CPU testing.
    """
    assert len(a) == len(b) and len(a) >= n_keys >= 1
    na, nb = int(a[0].shape[0]), int(b[0].shape[0])
    n = _next_pow2(max(na + nb, 1))
    if n < 1024:
        # below one VMEM block the engine has no edge: plain sort
        cat = [jnp.concatenate([x, y]) for x, y in zip(a, b)]
        out = jax.lax.sort(tuple(cat), num_keys=n_keys)
        return tuple(
            jnp.concatenate(
                [o, jnp.full((n - na - nb,), _pad_of(i, o.dtype, n_keys, pad_val), o.dtype)]
            )
            for i, o in enumerate(out)
        )
    pad = n - na - nb
    arrs = []
    for i, (x, y) in enumerate(zip(a, b)):
        fill = _pad_of(i, x.dtype, n_keys, pad_val)
        arrs.append(
            jnp.concatenate(
                [x, jnp.full((pad,), fill, x.dtype), y[::-1]]
            )
        )
    d = n // 2
    while d >= TILE:
        arrs = _stage_xla(arrs, n_keys, d)
        d //= 2
    arrs = _merge_tail(arrs, n_keys, interpret)
    # Materialize: the outer stages are an elementwise reshape/select
    # chain, and XLA's producer-into-consumer fusion will RECOMPUTE the
    # whole chain once per downstream consumer (measured round 5: the
    # wired combine_counts lost the engine's full 1.6x to exactly this —
    # three shifted reads of the merged arrays tripled the stage cost).
    return tuple(jax.lax.optimization_barrier(tuple(arrs)))


def _pad_of(i: int, dtype, n_keys: int, pad_val):
    if i < n_keys:
        return jnp.array(0xFFFFFFFF, dtype)  # sentinel key word
    if pad_val is not None:
        return jnp.array(pad_val[i - n_keys], dtype)
    return jnp.array(-1 if jnp.issubdtype(dtype, jnp.signedinteger) else 0xFFFFFFFF, dtype)
