"""Per-base Hamming distance on packed words.

TPU-native analog of the reference hdist family
(src/utils/functions/hamming/scalar.rs:11-48, multi.rs:122-160): XOR the
packed streams, collapse each 2-bit group to one bit (lower | upper>>1,
scalar.rs:40-44), mask to the valid length, popcount. All lanes are uint32;
`lax.population_count` is the popcount. Batched over reads and over database
entries — the reference processes one pair per call.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils import bitops


@jax.jit
def hdist_words(words1: jax.Array, words2: jax.Array, n_bases: jax.Array) -> jax.Array:
    """Per-base Hamming distance between paired packed reads.

    words1, words2: [..., W] uint32 packed words.
    n_bases: [...] int32 (or scalar) number of leading bases to compare.
    Returns [...] int32 distances.
    """
    W = words1.shape[-1]
    n_bases = jnp.asarray(n_bases, jnp.int32)
    mask = bitops.word_valid_mask(W, n_bases)
    diff = bitops.basewise_diff(words1, words2) & mask
    return jnp.sum(bitops.popcount32(diff), axis=-1)


@jax.jit
def hdist_one_to_many(query: jax.Array, database: jax.Array, n_bases) -> jax.Array:
    """Distance from one packed query [W] to every database row [D, W].

    The building block of the hdist database scan (BASELINE.json config 5);
    the Pallas kernel in ops/pallas/hamming.py is the throughput twin.
    """
    return hdist_words(query[None, :], database, jnp.asarray(n_bases, jnp.int32))


@partial(jax.jit, static_argnames=("k",))
def hdist_topk(query: jax.Array, database: jax.Array, n_bases, k: int):
    """Top-k nearest database rows by Hamming distance.

    Returns (distances [k], indices [k]) sorted ascending by distance.
    """
    d = hdist_one_to_many(query, database, n_bases)
    neg, idx = jax.lax.top_k(-d, k)
    return -neg, idx
