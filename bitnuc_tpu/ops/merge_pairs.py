"""Paired-end overlap merging (PEAR/FLASH-class) on packed reads.

A sequenced fragment shorter than the two read lengths combined leaves
R1's tail overlapping rc(R2)'s head; merging recovers the full fragment.
The reference library has no pairing concept (north-star toolkit
surface; its closest primitive is the fixed-frame hdist,
/root/reference/src/utils/functions/hamming/multi.rs).

TPU formulation: the offset search is a `lax.scan` over the STATIC range
of candidate overlaps — each step shifts the rc(R2) code plane with one
`dynamic_slice` of a padded array and does a masked elementwise compare
plus a row reduce, so the whole search compiles to a fixed-shape loop
with no data-dependent control flow (the gapless sibling of the
alignment wavefront, ops/align.py). Winner selection is masked
single-value updates (fewest mismatches, ties to the LONGEST overlap).
Fragment construction uses one bounded take_along_axis per batch
(docs/DESIGN.md §2's gather budget: B x L_frag elements).

Offset convention: o = fragment_length - len2 is rc(R2)'s start within
the fragment, searched over [0, L1 - min_overlap] (tail overlaps;
read-through cases with o < 0 need adapter awareness — out of scope).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import revcomp as revcomp_ops
from ..utils import bitops

_BIG = np.int32(2**30)


@partial(jax.jit, static_argnames=("min_overlap",))
def merge_pairs(
    words1: jax.Array,
    lens1: jax.Array,
    words2: jax.Array,
    lens2: jax.Array,
    min_overlap: int = 10,
    max_mismatch_frac=0.1,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Merge R1/R2 pairs whose fragment is shorter than lens1 + lens2.

    words1/words2: packed reads, R2 in its AS-SEQUENCED orientation (the
    op reverse-complements it). Returns (merged_words [B, Wm],
    merged_lens [B], merged [B] bool, best_overlap [B], mismatches [B],
    with mismatches = -1 on unmerged rows): rows with merged=False carry
    R1 unchanged (callers keep the pair separate).

    A pair merges when some overlap >= min_overlap has
    mismatches <= floor(max_mismatch_frac * overlap); among qualifying
    offsets the fewest-mismatch one wins, ties to the LONGEST overlap.
    Overlap bases take R1's call (no qualities in the packed domain).
    max_mismatch_frac is traced — tuning it does not recompile.
    """
    lens1 = jnp.asarray(lens1, jnp.int32)
    lens2 = jnp.asarray(lens2, jnp.int32)
    c1 = bitops.unpack_words(words1).astype(jnp.int32)  # [B, L1]
    rc2w = revcomp_ops.reverse_complement_reads(words2, lens2)
    c2 = bitops.unpack_words(rc2w).astype(jnp.int32)  # [B, L2]
    B, L1 = c1.shape
    L2 = c2.shape[-1]
    pos1 = jnp.arange(L1, dtype=jnp.int32)
    in1 = pos1 < lens1[:, None]
    in2 = jnp.arange(L2, dtype=jnp.int32) < lens2[:, None]
    mmf = jnp.asarray(max_mismatch_frac, jnp.float32)

    # pad BOTH sides so "shift right by o" is one dynamic_slice at start
    # L1 - o for every o in [0, L1] — right padding matters when R2's
    # padded width is smaller than R1's (L2 < L1), where an unpadded
    # slice would clamp and silently evaluate the wrong offset
    c2p = jnp.pad(c2, ((0, 0), (L1, L1)), constant_values=-1)  # -1: no match
    in2p = jnp.pad(in2, ((0, 0), (L1, L1)))

    def step(carry, o):
        best_mm, best_o, best_ov = carry
        a2 = jax.lax.dynamic_slice_in_dim(c2p, L1 - o, L1, axis=-1)
        v2 = jax.lax.dynamic_slice_in_dim(in2p, L1 - o, L1, axis=-1)
        both = in1 & v2
        ov = jnp.sum(both.astype(jnp.int32), axis=-1)
        mm = jnp.sum((both & (c1 != a2)).astype(jnp.int32), axis=-1)
        allowed = jnp.floor(mmf * ov.astype(jnp.float32)).astype(jnp.int32)
        mm_q = jnp.where((ov >= min_overlap) & (mm <= allowed), mm, _BIG)
        # o ascends and overlap shrinks with o, so strict < keeps the
        # longest qualifying overlap among equal-mismatch offsets
        better = mm_q < best_mm
        return (
            jnp.where(better, mm_q, best_mm),
            jnp.where(better, o, best_o),
            jnp.where(better, ov, best_ov),
        ), None

    n_off = max(L1 - int(min_overlap) + 1, 0)
    init = (
        jnp.full((B,), _BIG, jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,), jnp.int32),
    )
    # unroll: each offset step touches a few [B] vectors — the scan is
    # loop-overhead-bound like the alignment wavefront (probe_fit_unroll)
    (best_mm, best_o, best_ov), _ = jax.lax.scan(
        step, init, jnp.arange(n_off, dtype=jnp.int32), unroll=8
    )

    merged = best_mm < _BIG
    # containment (rc(R2) inside R1, best_o + lens2 < lens1): the fragment
    # is all of R1 — R1's 3' tail must not be truncated
    frag_len = jnp.where(
        merged, jnp.maximum(best_o + lens2, lens1), lens1
    )

    # fragment codes: R1 verbatim, rc(R2)'s tail from lane lens1 on
    Lm = L1 + L2
    posm = jnp.arange(Lm, dtype=jnp.int32)
    take2 = jnp.clip(posm[None, :] - best_o[:, None], 0, L2 - 1)
    c2m = jnp.take_along_axis(
        jnp.pad(c2, ((0, 0), (0, Lm - L2))), take2, axis=-1
    )  # the one bounded gather
    cm = jnp.where(
        posm[None, :] < lens1[:, None],
        jnp.pad(c1, ((0, 0), (0, Lm - L1))),
        c2m,
    )
    cm = jnp.where(posm[None, :] < frag_len[:, None], cm, 0)
    Wm = bitops.n_words_for(Lm)
    cm = jnp.pad(cm, ((0, 0), (0, Wm * bitops.BASES_PER_WORD - Lm)))
    mwords = bitops.pack_codes(cm)
    out_words = jnp.where(
        merged[:, None],
        mwords,
        jnp.pad(words1, ((0, 0), (0, Wm - words1.shape[-1]))),
    )
    return out_words, frag_len, merged, best_ov, jnp.where(merged, best_mm, -1)
