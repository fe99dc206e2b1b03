"""Barcode demultiplexing on packed reads.

Sample-multiplexed runs prefix each read with a short barcode; demux
assigns every read to its nearest barcode within a mismatch budget
(north-star toolkit surface — the reference's hdist,
/root/reference/src/utils/functions/hamming/multi.rs, is exactly the
needed primitive, applied [B, 1] x [1, N]).

Assignment contract (the common demultiplexer rule): a read is assigned
to barcode argmin iff its best distance is <= max_dist AND the best is
UNIQUE (a tie between two barcodes leaves the read unassigned — never
guess a sample). Winner extraction is masked single-value reduces.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import hamming, split
from ..utils import bitops

_BIG = np.int32(2**30)


@partial(jax.jit, static_argnames=("bc_len",))
def assign_barcodes(
    words: jax.Array,
    lengths: jax.Array,
    bc_words: jax.Array,
    bc_len: int,
    max_dist=1,
) -> Tuple[jax.Array, jax.Array]:
    """(barcode_index [B] int32 — -1 when unassigned, distance [B] int32).

    words/lengths: packed reads; bc_words: [N, Wb] packed barcodes of
    bc_len bases each; a read's FIRST bc_len bases are compared. Reads
    shorter than bc_len are unassigned with distance bc_len (sentinel —
    no real comparison exists). max_dist is traced.
    """
    lengths = jnp.asarray(lengths, jnp.int32)
    Wb = bitops.n_words_for(bc_len)
    head, _ = split.slice_reads(
        words, lengths, jnp.int32(0), jnp.int32(bc_len)
    )
    head = head[:, :Wb]
    bc = jnp.asarray(bc_words, jnp.uint32)[:, :Wb]
    d = hamming.hdist_words(
        head[:, None, :], bc[None, :, :], jnp.int32(bc_len)
    )  # [B, N]
    best = jnp.min(d, axis=1)
    n_best = jnp.sum((d == best[:, None]).astype(jnp.int32), axis=1)
    idx = jnp.min(
        jnp.where(d == best[:, None], jnp.arange(d.shape[1], dtype=jnp.int32), _BIG),
        axis=1,
    )
    too_short = lengths < bc_len
    ok = (
        (best <= jnp.asarray(max_dist, jnp.int32))
        & (n_best == 1)
        & ~too_short
    )
    # reads shorter than the barcode have no meaningful comparison: the
    # zero-padded head would fabricate a distance, so report bc_len (the
    # maximum possible + sentinel) instead
    return (
        jnp.where(ok, idx, -1),
        jnp.where(too_short, jnp.int32(bc_len), best),
    )
