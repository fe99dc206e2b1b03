"""Gapless pileup, consensus, and SNP calling over mapped reads.

Completes the resequencing workflow the mapper opens (map -> pile ->
call): per-reference-position base counts, a consensus sequence, and
substitution calls. The reference library has no analog (its comparison
surface stops at fixed-frame hdist, /root/reference/src/utils/functions/
hamming/multi.rs); this is north-star toolkit surface.

TPU formulation notes:

- The pileup is ONE dense scatter-add into a [ref_len, 4] int32 grid with
  keys (ref_start + read_offset) * 4 + code. Scatter is normally avoided
  in this codebase, but the at-scale measurement behind that rule
  (docs/DESIGN.md §4b: ~137 Mkeys/s on chip) makes it the right tool
  here — a pileup batch is a few Mbases, and the sort-based alternative
  would still need a scatter to densify per-position output. Out-of-range
  contributions (reads hanging off the reference) drop via scatter
  mode='drop'.
- Reverse-strand reads contribute their reverse complement
  (`ops.revcomp.reverse_complement_reads`), i.e. forward-reference bases,
  selected per read with a mask — no data-dependent control flow.
- Consensus/calls are elementwise over the 4 count planes with masked
  single-value reduces (ties -> smallest code; no argmax,
  docs/DESIGN.md §2).

GAPLESS: each read is laid down at its mapped start without gap
projection, the classic fast-pileup compromise — reads with indels
mis-pile downstream of the event. Callers filter those with the mapper's
alignment cost (`max_cost`), which bounds how wrong a kept read can be.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import revcomp as revcomp_ops
from ..utils import bitops


@partial(jax.jit, static_argnames=("ref_len",))
def pileup_counts(
    words: jax.Array,
    lengths: jax.Array,
    ref_start: jax.Array,
    use_rc: jax.Array,
    keep: jax.Array,
    ref_len: int,
) -> jax.Array:
    """Base counts per forward-reference position: [ref_len, 4] int32.

    words/lengths: the reads AS READ (forward orientation); reads with
    use_rc[i] True contribute their reverse complement, matching
    mapper.map_reads' strand convention. keep masks reads out entirely
    (unmapped / cost-filtered). ref_start may be negative or beyond the
    reference (clamped contributions drop).
    """
    lengths = jnp.asarray(lengths, jnp.int32)
    rc_words = revcomp_ops.reverse_complement_reads(words, lengths)
    w = jnp.where(jnp.asarray(use_rc, bool)[:, None], rc_words, words)
    codes = bitops.unpack_words(w).astype(jnp.int32)  # [B, L]
    L = codes.shape[-1]
    pos = jnp.arange(L, dtype=jnp.int32)
    gpos = jnp.asarray(ref_start, jnp.int32)[:, None] + pos
    valid = (
        jnp.asarray(keep, bool)[:, None]
        & (pos < lengths[:, None])
        & (gpos >= 0)
        & (gpos < ref_len)
    )
    key = jnp.where(valid, gpos * 4 + codes, 4 * ref_len)  # OOB -> dropped
    flat = jnp.zeros((4 * ref_len,), jnp.int32)
    flat = flat.at[key.reshape(-1)].add(
        valid.reshape(-1).astype(jnp.int32), mode="drop"
    )
    return flat.reshape(ref_len, 4)


@jax.jit
def consensus_calls(
    counts: jax.Array,
    ref_words: jax.Array,
    min_depth=1,
    min_frac=0.5,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Consensus + substitution calls from a pileup grid.

    counts: [ref_len, 4] int32 (pileup_counts). ref_words: packed
    reference covering ref_len bases. min_depth/min_frac are traced
    (no recompile when tuning).

    Returns (cons [ref_len] int32, depth [ref_len] int32,
    is_variant [ref_len] bool, support [ref_len] int32):
      cons — the majority base code where depth >= min_depth and the
        winner's fraction >= min_frac, else the reference code (ties
        break to the smallest code, deterministically);
      support — the winning base's count.
    """
    ref_len = counts.shape[0]
    refc = (
        bitops.unpack_words(ref_words.reshape(1, -1))
        .astype(jnp.int32)
        .reshape(-1)[:ref_len]
    )
    depth = jnp.sum(counts, axis=-1)
    best = jnp.max(counts, axis=-1)
    code = jnp.arange(4, dtype=jnp.int32)
    winner = jnp.min(
        jnp.where(counts == best[:, None], code, jnp.int32(4)), axis=-1
    )
    confident = (depth >= jnp.asarray(min_depth, jnp.int32)) & (
        best.astype(jnp.float32)
        >= jnp.asarray(min_frac, jnp.float32) * depth.astype(jnp.float32)
    )
    cons = jnp.where(confident, winner, refc)
    is_variant = confident & (winner != refc)
    return cons, depth, is_variant, best


def call_variants(
    index,
    reads,
    map_result: dict,
    max_cost: int = 8,
    min_depth: int = 2,
    min_frac: float = 0.5,
) -> dict:
    """Host convenience: pileup + calls from mapper outputs.

    index: MinimizerIndex (supplies ref_words/ref_len). reads: the
    PackedReads that were mapped. map_result: mapper.map_reads(...) dict.
    Returns numpy arrays {counts [ref_len,4], depth, consensus (codes),
    variant_pos, variant_ref, variant_alt, variant_depth,
    variant_support} — the variant_* arrays list only called sites.
    """
    keep = map_result["mapped"] & (map_result["cost"] <= max_cost)
    counts = pileup_counts(
        reads.words,
        reads.lengths,
        jnp.asarray(map_result["ref_start"], jnp.int32),
        jnp.asarray(map_result["strand"] == b"-"),
        jnp.asarray(keep),
        index.ref_len,
    )
    cons, depth, is_var, support = consensus_calls(
        counts,
        jnp.asarray(index.ref_words),
        np.int32(min_depth),
        np.float32(min_frac),
    )
    counts = np.asarray(counts)
    cons = np.asarray(cons)
    depth = np.asarray(depth)
    support = np.asarray(support)
    vpos = np.nonzero(np.asarray(is_var))[0]
    rw = np.asarray(index.ref_words, np.uint32)
    shifts = np.arange(16, dtype=np.uint32) * 2
    refc = ((rw[:, None] >> shifts[None, :]) & 3).reshape(-1)[
        : index.ref_len
    ].astype(np.int32)
    return {
        "counts": counts,
        "depth": depth,
        "consensus": cons,
        "variant_pos": vpos.astype(np.int64),
        "variant_ref": refc[vpos],
        "variant_alt": cons[vpos],
        "variant_depth": depth[vpos],
        "variant_support": support[vpos],
    }


def pileup_counts_sharded(
    words,
    lengths,
    ref_start,
    use_rc,
    keep,
    ref_len: int,
    mesh,
    axis: str = "data",
):
    """Data-parallel pileup: reads sharded over `axis`, ONE psum of the
    [ref_len, 4] grid per batch (the same merge shape as the sharded
    k-mer histograms — traffic independent of batch size). Results match
    pileup_counts exactly."""
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[axis]
    B = words.shape[0]
    assert B % n == 0, f"mesh axis size {n} must divide batch {B}"

    def local(wd, ln, rs, rc_, kp):
        grid = pileup_counts(wd, ln, rs, rc_, kp, ref_len)
        return jax.lax.psum(grid, axis)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )(
        words,
        jnp.asarray(lengths, jnp.int32),
        jnp.asarray(ref_start, jnp.int32),
        jnp.asarray(use_rc, bool),
        jnp.asarray(keep, bool),
    )
