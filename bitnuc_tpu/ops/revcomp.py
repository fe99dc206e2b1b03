"""Reverse complement in the packed 2-bit domain (extension beyond the
reference's op set — bitnuc has no revcomp — but required by real k-mer
pipelines, e.g. canonical k-mer counting).

With the code map A=00, C=01, G=10, T=11 (src/utils/packing/naive.rs:10-15),
complement is bitwise NOT of each 2-bit group, and reversal is a 2-bit-group
order reversal. Word-level revcomp uses the classic swap tree (groups-of-2,
nibbles, bytes, halfwords); read-level revcomp composes word reversal with a
length-dependent cross-word shift, all on uint32 lanes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils import bitops


def revcomp_word(w: jax.Array) -> jax.Array:
    """Reverse-complement all 16 bases of each uint32 word (base 0 <-> 15)."""
    x = ~w
    x = ((x & jnp.uint32(0x33333333)) << 2) | ((x >> 2) & jnp.uint32(0x33333333))
    x = ((x & jnp.uint32(0x0F0F0F0F)) << 4) | ((x >> 4) & jnp.uint32(0x0F0F0F0F))
    x = ((x & jnp.uint32(0x00FF00FF)) << 8) | ((x >> 8) & jnp.uint32(0x00FF00FF))
    return ((x & jnp.uint32(0x0000FFFF)) << 16) | (x >> 16)


@jax.jit
def reverse_complement_reads(words: jax.Array, lengths: jax.Array) -> jax.Array:
    """Reverse-complement each read: [..., W] uint32 + lengths -> [..., W].

    Matches decode -> python-reverse-complement -> encode bit-exactly,
    including the zero-padded last word.
    """
    W = words.shape[-1]
    lengths = jnp.asarray(lengths, jnp.int32)

    # word-reverse + per-word revcomp puts base n-1 at position (16W - n)
    rc = revcomp_word(words[..., ::-1])

    # shift the whole packed stream DOWN by (16W - n) bases to align base
    # n-1 to position 0 (cross-word funnel shift, split.rs:83-94 vectorized)
    shift_bases = (16 * W - lengths)[..., None]
    word_shift = shift_bases // 16
    bit_shift = (2 * (shift_bases % 16)).astype(jnp.uint32)

    idx = jnp.arange(W, dtype=jnp.int32)
    src = idx + word_shift  # gather index of the aligned word
    cur = jnp.where(src < W, jnp.take_along_axis(rc, jnp.minimum(src, W - 1), -1), 0)
    nxt = jnp.where(
        src + 1 < W, jnp.take_along_axis(rc, jnp.minimum(src + 1, W - 1), -1), 0
    )
    lo = jnp.where(bit_shift == 0, cur, cur >> bit_shift)
    hi = jnp.where(bit_shift == 0, 0, nxt << (jnp.uint32(32) - bit_shift))
    out = lo | hi
    return out & bitops.word_valid_mask(W, lengths)


def revcomp_key(lo: jax.Array, hi: jax.Array, k: int):
    """Reverse-complement packed k-mer keys (hi<<32|lo layout, k<=32).

    Slots past k hold complement garbage after the per-word reversal (the
    complement of implicit 'A' padding is 'T'); the final down-shift by the
    unused bit count discards it.
    """
    if k <= 16:
        # key lives in lo's low 2k bits; hi is unused (and all-garbage after
        # complementing) — reverse lo alone and drop the 32-2k empty bits
        s = 32 - 2 * k
        out_lo = revcomp_word(lo) >> s if s else revcomp_word(lo)
        return out_lo, jnp.zeros_like(out_lo)
    rlo = revcomp_word(lo)  # bases 0..15 reversed into slots 15..0
    rhi = revcomp_word(hi)  # bases 16..31 reversed
    # 64-bit reverse = swap halves: r64 = rlo << 32 | rhi, then >> (64-2k)
    shift = 64 - 2 * k
    if shift == 0:
        return rhi, rlo
    out_lo = (rhi >> shift) | (rlo << (32 - shift))
    out_hi = rlo >> shift
    return out_lo, out_hi


def canonical_keys(lo: jax.Array, hi: jax.Array, k: int):
    """min(key, revcomp(key)) per window — the canonical k-mer form."""
    rlo, rhi = revcomp_key(lo, hi, k)
    take_rc = (rhi < hi) | ((rhi == hi) & (rlo < lo))
    return jnp.where(take_rc, rlo, lo), jnp.where(take_rc, rhi, hi)
