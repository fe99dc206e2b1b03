"""Fused one-strand ORF kernel: codes in, per-read ORF stats out.

The XLA formulation's wall is the strided reverse cummin ("next in-frame
stop at-or-after p"): lax.associative_scan materializes ~log2(L/3) full
[B, L] i32 passes, measured 7.4 of the 8.0 ms one-strand cost at
[16384, 512] (benchmarks/probe_orf.py, 18 GB/s window). This kernel runs
the ENTIRE strand stage on one VMEM block per row-tile: codon build (lane
rolls), stop/start masks, the stride-3 doubling scan (all in registers),
and the per-read winner reduces — HBM traffic drops to one u8 code read
per base plus 3 words per read out.

Mosaic notes (house rules, CLAUDE.md): rolls/reductions are 32-bit
(codes load as u8 and convert); pltpu.roll handles a 512-wide lane axis
(verified on chip, round 5); integer divide-by-3 is avoided via the
multiply-shift (n * 21846) >> 16, exact for 0 <= n < 32768 — the wrapper
gates L accordingly; constants are literals (no captured jnp arrays).

Semantics are exactly orf._best_orf_one_strand (reference has no codon
tier; north-star surface) — bit-identical, asserted by tests/test_orf.py.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 2**30
MAX_LEN = 32767  # multiply-shift div-by-3 exactness bound


def _orf_kernel(codes_ref, len_ref, best_ref, start_ref, stop_ref):
    c = codes_ref[...].astype(jnp.int32)  # [TB, Lp]
    tb, L = c.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (tb, L), 1)
    lens = len_ref[...].astype(jnp.int32)  # [TB, 1]

    # codon = c[p]*16 + c[p+1]*4 + c[p+2]: neighbors via lane rolls
    # (roll by L - s == roll by -s; tails masked, codon validity handles)
    c1 = pltpu.roll(c, shift=L - 1, axis=1)
    c2 = pltpu.roll(c, shift=L - 2, axis=1)
    codon = c * 16 + c1 * 4 + c2
    cvalid = (lane + 3) <= lens  # whole codon inside the read

    is_stop = ((codon == 48) | (codon == 50) | (codon == 56)) & cvalid
    is_start = (codon == 14) & cvalid

    # next in-frame stop at-or-after p: stride-3 reverse doubling, fully
    # in-register (the associative_scan this kernel exists to replace)
    nxt = jnp.where(is_stop, lane, jnp.int32(_BIG))
    s = 3
    while s < L:
        part = pltpu.roll(nxt, shift=L - s, axis=1)
        nxt = jnp.minimum(
            nxt, jnp.where(lane < L - s, part, jnp.int32(_BIG))
        )
        s *= 2

    # open ORFs run to the last whole in-frame codon:
    # p + 3*floor((len-p)/3); exact multiply-shift floor-div for n < 32768
    n = lens - lane  # >= 3 wherever is_start holds
    div3 = (n * 21846) >> 16
    open_end = lane + 3 * div3
    stopped_here = nxt < _BIG
    end = jnp.where(stopped_here, nxt, open_end)
    olen = jnp.where(is_start, end - lane, 0)

    best = jnp.max(olen, axis=1, keepdims=True)  # [TB, 1]
    at_best = (olen == best) & is_start
    start = jnp.min(
        jnp.where(at_best, lane, jnp.int32(_BIG)), axis=1, keepdims=True
    )
    stopped = (
        jnp.max(
            jnp.where(
                at_best & (lane == start) & stopped_here, 1, 0
            ),
            axis=1,
            keepdims=True,
        )
        * jnp.where(best > 0, 1, 0)
    )
    best_ref[...] = jnp.broadcast_to(best, best_ref.shape)
    start_ref[...] = jnp.broadcast_to(start, start_ref.shape)
    stop_ref[...] = jnp.broadcast_to(stopped, stop_ref.shape)


@partial(jax.jit, static_argnames=("interpret",))
def best_orf_one_strand_pallas(
    codes: jax.Array,
    lengths: jax.Array,
    *,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(length [B], start [B], stopped [B]) of the longest same-strand
    ATG..stop ORF — the fused twin of orf._best_orf_one_strand's core.

    codes: [B, L] uint8 2-bit codes (bitops.unpack_words output). Caller
    guarantees L <= MAX_LEN (the div-by-3 multiply-shift bound).
    """
    B, L = codes.shape
    assert L <= MAX_LEN, L
    Lp = -(-L // 128) * 128
    # keep each [TB, Lp] i32 live array ~<= 1 MB of VMEM
    TB = max(8, min(256, ((1 << 20) // (4 * Lp)) // 8 * 8))
    Bp = -(-B // TB) * TB
    c = jnp.pad(codes, ((0, Bp - B), (0, Lp - L)))
    lens2d = jnp.pad(
        jnp.asarray(lengths, jnp.int32)[:, None], ((0, Bp - B), (0, 0))
    )
    grid = (Bp // TB,)
    spec = pl.BlockSpec((TB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    best, start, stopped = pl.pallas_call(
        _orf_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, Lp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[spec, spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, 128), jnp.int32),
            jax.ShapeDtypeStruct((Bp, 128), jnp.int32),
            jax.ShapeDtypeStruct((Bp, 128), jnp.int32),
        ],
        interpret=interpret,
    )(c, lens2d)
    return best[:B, 0], start[:B, 0], stopped[:B, 0] != 0
