"""Spectrum-based read error correction (Lighter/BFC-style).

The reference library stops at the k-mer HashMap the caller builds
(/root/reference/README.md:164-180); the classic downstream use of that
table is single-base error correction: a sequencing error poisons every
k-mer window covering it, so a base covered by many weak (low-count)
windows whose substitution turns them all solid is, with high
probability, an error. This module runs that workflow entirely on
device over a packed read batch.

One correction round, per read (all reads in parallel):

1. Look up every window's table count (ops.lookup) and mark weak
   windows (valid and count < min_count).
2. Localize the candidate site p* from the weak-run boundaries: a
   single error at p poisons exactly the valid windows in
   [p-k+1, p], so if a valid window FOLLOWS the last weak window wl,
   the error is at base wl; else if one PRECEDES the first weak
   window wf, it is at wf+k-1. (Coverage peaks mislocate edge
   errors: an error at the last base is covered by one window and
   every base under it ties.) Only when weak spans all valid windows
   fall back to the peak of the width-k sliding weak-coverage sum
   (cumsum difference; first argmax via the masked-min idiom,
   docs/DESIGN.md).
3. Re-derive the window keys of the 3 substituted variants from the
   substituted code arrays (a jnp.where at p* and the O(L log k)
   position-doubling key builder — cheaper and scan-free vs gathering
   and XOR-patching the covering keys).
4. Accept the variant iff EVERY valid window covering p* becomes solid;
   among accepting variants take the one with the highest minimum
   covering-window count (first on ties). No acceptance -> the read is
   left untouched this round.

Each round corrects at most one base per read; reads with multiple
errors converge over `rounds` iterations (errors farther apart than k
never interact). All tie-breaks are deterministic and mirrored exactly
by the python oracle in tests/test_correct.py.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import bitops
from .kmer import kmer_keys, sliding_all, window_valid_mask
from .lookup import lookup_counts

# numpy scalars, NOT jnp: module-level jnp constants initialize the XLA
# backend at import time (see parallel/runtime.py ordering contract)
_BIG = np.int32(2**31 - 1)


def _candidate_keys(codes_c: jax.Array, k: int, canonical: bool):
    lo, hi = kmer_keys(codes_c, k)
    if canonical:
        from .revcomp import canonical_keys

        lo, hi = canonical_keys(lo, hi, k)
    return lo, hi


@partial(jax.jit, static_argnames=("k", "canonical"))
def correct_reads_once(
    words: jax.Array,
    lengths: jax.Array,
    k: int,
    t_lo: jax.Array,
    t_hi: jax.Array,
    t_ct: jax.Array,
    min_count=2,
    canonical: bool = False,
    base_valid=None,
) -> Tuple[jax.Array, jax.Array]:
    """One correction round: at most one base substitution per read.

    words/lengths: packed batch [B, W]/[B]. t_lo/t_hi/t_ct: counted-list
    k-mer table (any layout ops.lookup accepts). base_valid: optional
    [B, L] bool; invalid (e.g. N) bases never participate — windows
    covering them are neither weak nor required to become solid, and the
    site itself is never chosen for correction.

    Returns (new_words [B, W], applied [B] bool). min_count must be >= 1
    (traced: changing it does not recompile).
    """
    lengths = jnp.asarray(lengths, jnp.int32)
    min_count = jnp.asarray(min_count, jnp.int32)
    codes = bitops.unpack_words(words).astype(jnp.int32)
    L = codes.shape[-1]
    pos = jnp.arange(L, dtype=jnp.int32)

    valid = window_valid_mask(L, lengths, k)
    if base_valid is not None:
        bv = jnp.asarray(base_valid)
        if bv.shape[-1] < L:
            bv = jnp.pad(bv, [(0, 0)] * (bv.ndim - 1) + [(0, L - bv.shape[-1])])
        valid = valid & sliding_all(bv, k)

    lo, hi = _candidate_keys(codes, k, canonical)
    counts = lookup_counts(
        lo.reshape(-1), hi.reshape(-1), valid.reshape(-1), t_lo, t_hi, t_ct
    ).reshape(valid.shape)
    weak = valid & (counts < min_count)

    # per-base weak coverage: cov[i] = sum of weak[w] for w in [i-k+1, i]
    c = jnp.cumsum(weak.astype(jnp.int32), axis=-1)
    keep = max(L - k, 0)  # k > L: no window fits (valid is all-False too)
    cov = c - jnp.pad(c[..., :keep], [(0, 0)] * (c.ndim - 1) + [(L - keep, 0)])
    has_weak = jnp.any(weak, axis=-1)
    peak = jnp.max(cov, axis=-1)
    # first argmax, scan-free: min position attaining the peak
    p_peak = jnp.min(
        jnp.where(cov == peak[..., None], pos, jnp.int32(L)), axis=-1
    )
    # boundary localization (window-index space; indices are window starts)
    wl = jnp.max(jnp.where(weak, pos, jnp.int32(-1)), axis=-1)
    wf = jnp.min(jnp.where(weak, pos, jnp.int32(L)), axis=-1)
    lv = jnp.max(jnp.where(valid, pos, jnp.int32(-1)), axis=-1)
    fv = jnp.min(jnp.where(valid, pos, jnp.int32(L)), axis=-1)
    p_star = jnp.where(
        wl < lv, wl, jnp.where(wf > fv, wf + jnp.int32(k - 1), p_peak)
    )

    at = pos == p_star[..., None]  # [B, L] one-hot at the candidate site
    orig = jnp.sum(jnp.where(at, codes, 0), axis=-1)  # [B]
    cand = (orig[None, :] + jnp.arange(1, 4, dtype=jnp.int32)[:, None]) & 3
    codes_c = jnp.where(at[None], cand[..., None], codes[None])  # [3, B, L]

    lo_c, hi_c = _candidate_keys(codes_c, k, canonical)
    covering = valid & (pos >= (p_star - (k - 1))[..., None]) & (
        pos <= p_star[..., None]
    )
    cov3 = jnp.broadcast_to(covering, codes_c.shape)
    counts_c = lookup_counts(
        lo_c.reshape(-1), hi_c.reshape(-1), cov3.reshape(-1), t_lo, t_hi, t_ct
    ).reshape(codes_c.shape)

    all_solid = ~jnp.any(cov3 & (counts_c < min_count), axis=-1)  # [3, B]
    min_cov = jnp.min(jnp.where(cov3, counts_c, _BIG), axis=-1)
    score = jnp.where(all_solid, min_cov, jnp.int32(-1))
    best = jnp.argmax(score, axis=0)  # 3-way: first max = smallest variant
    best_score = jnp.max(score, axis=0)
    best_cand = jnp.sum(
        jnp.where(jnp.arange(3, dtype=jnp.int32)[:, None] == best, cand, 0),
        axis=0,
    )
    applied = has_weak & (best_score > 0)

    new_codes = jnp.where(applied[..., None] & at, best_cand[..., None], codes)
    return bitops.pack_codes(new_codes.astype(jnp.uint32)), applied


def correct_reads(
    words,
    lengths,
    k: int,
    t_lo,
    t_hi,
    t_ct,
    min_count=2,
    rounds: int = 4,
    canonical: bool = False,
    base_valid=None,
) -> Tuple[jax.Array, jax.Array]:
    """Iterated correction: up to `rounds` single-base fixes per read.

    Host loop over the jitted round (one compilation; each extra round is
    one device dispatch) with early exit when a round corrects nothing.
    Returns (new_words [B, W], n_corrected [B] int32).
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    n = jnp.zeros(jnp.asarray(lengths).shape, jnp.int32)
    for _ in range(rounds):
        words, applied = correct_reads_once(
            words, lengths, k, t_lo, t_hi, t_ct,
            min_count=min_count, canonical=canonical, base_valid=base_valid,
        )
        n = n + applied.astype(jnp.int32)
        if not bool(jnp.any(applied)):
            break
    return words, n
