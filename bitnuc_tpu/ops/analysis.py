"""Sequence analytics computed directly on packed words.

The reference decodes to ASCII first and counts bytes
(src/utils/analysis.rs:8-16, :23-39 — via to_vec -> per-base get). We compute
the same results 16 bases per lane without decoding, using three popcounts:

  lo = word & 0x5555...   (low bit of each 2-bit group)
  hi = (word >> 1) & 0x5555...
  T = popcount(lo & hi); C = popcount(lo) - T; G = popcount(hi) - T
  A = length - C - G - T

since A=00, C=01, G=10, T=11 (src/utils/packing/naive.rs:10-15).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import bitops


@jax.jit
def base_counts_reads(words: jax.Array, lengths: jax.Array) -> jax.Array:
    """Counts of A,C,G,T per read: [..., W] uint32 -> [..., 4] int32.

    Bit-identical to the reference's decoded byte counts
    (src/utils/analysis.rs:23-39).
    """
    W = words.shape[-1]
    lengths = jnp.asarray(lengths, jnp.int32)
    valid = bitops.word_valid_mask(W, lengths)
    lo = words & bitops.LOWER_BITS_32 & valid
    hi = (words >> 1) & bitops.LOWER_BITS_32 & valid

    t = jnp.sum(bitops.popcount32(lo & hi), axis=-1)
    c = jnp.sum(bitops.popcount32(lo), axis=-1) - t
    g = jnp.sum(bitops.popcount32(hi), axis=-1) - t
    a = lengths - c - g - t
    return jnp.stack([a, c, g, t], axis=-1)


@jax.jit
def gc_content_reads(words: jax.Array, lengths: jax.Array) -> jax.Array:
    """GC percentage (0-100) per read; 0.0 for empty reads
    (src/utils/analysis.rs:8-16). float32 on device (the host PackedSequence
    path keeps the reference's f64)."""
    counts = base_counts_reads(words, lengths)
    lengths = jnp.asarray(lengths, jnp.int32)
    gc = (counts[..., 1] + counts[..., 2]).astype(jnp.float32)
    denom = jnp.maximum(lengths, 1).astype(jnp.float32)
    return jnp.where(lengths > 0, gc / denom * 100.0, 0.0)
