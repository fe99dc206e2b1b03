"""Compacted de Bruijn graph (unitig) assembly over solid k-mer sets.

The pipeline splits by hardware affinity:

  - DEVICE: spectrum extraction — the sort-based counting engines
    (ops.kmer.count_kmers_runs, any k <= 32) produce the distinct solid
    k-mers of a read set at hundreds of Mkmers/s (docs/DESIGN.md).
  - HOST: graph construction and unitig compaction — metadata passes over
    the distinct-key array (n ~ genome size, not read-set size): sorted-
    array membership joins (np.searchsorted) build the edge structure, and
    Wyllie pointer-doubling list ranking compacts maximal paths in
    O(n log n) fully vectorized numpy — no per-base or per-node Python
    loops anywhere on the hot path.

Reference analog: none — bitnuc (the reference crate) stops at k-mer
counting. Semantics follow the standard compacted-DBG contract (bcalm2-
style unitigs): a unitig is a maximal path whose every edge x -> y
satisfies outdeg(x) == 1 and indeg(y) == 1; every solid k-mer lands in
exactly one unitig; pure cycles (plasmids, perfect repeats) are emitted
once with circular=True, broken at their minimum-key node.

Key encoding matches ops.kmer.kmer_keys: LSB-first, base i of the k-mer
at bits [2i, 2i+2) (reference src/utils/packing/naive.rs:10-15). Hence a
k-mer x's (k-1)-suffix is x >> 2, its (k-1)-prefix is x & (4^(k-1) - 1),
and appending base b yields (x >> 2) | b << 2(k-1).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

_ASCII = np.frombuffer(b"ACGT", np.uint8)
_RC_TABLE = bytes.maketrans(b"ACGT", b"TGCA")


def rc_ascii(seq: bytes) -> bytes:
    """Reverse complement of an ASCII ACGT byte string."""
    return seq.translate(_RC_TABLE)[::-1]


def _member(sorted_keys: np.ndarray, q: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Membership of q in a sorted unique key array: (present, index)."""
    n = sorted_keys.shape[0]
    idx = np.minimum(np.searchsorted(sorted_keys, q), n - 1)
    return sorted_keys[idx] == q, idx


def _wyllie_rank(prev: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """List ranking over a predecessor forest: (rank, chain_start).

    prev[i] = index of i's unique predecessor, or -1 at a chain start.
    Pointer doubling: after ceil(log2 n) + 1 rounds, rank[i] is the exact
    distance to the start and jump[i] IS the start — for chains. Nodes on
    pure cycles never reach a fixed point, so their rank keeps doubling;
    rank >= n is the (exact) cycle detector the caller uses.
    """
    n = prev.shape[0]
    iota = np.arange(n, dtype=np.int64)
    jump = np.where(prev >= 0, prev, iota)
    rank = (prev >= 0).astype(np.int64)
    for _ in range(max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)):
        rank = rank + rank[jump]
        jump = jump[jump]
    return rank, jump


def unitigs_from_keys(
    keys: np.ndarray, k: int
) -> Tuple[List[bytes], List[bool]]:
    """Compact a sorted unique uint64 k-mer key array into unitigs.

    keys: strictly ascending uint64 packed k-mers (LSB-first base order —
    the ops.kmer / compact_runs layout). Returns (seqs, circular): ASCII
    unitig sequences and per-unitig circularity flags. Every input k-mer
    appears in exactly one output unitig; a circular unitig of c nodes is
    emitted linearly as c + k - 1 bases starting at its minimum-key node
    (so its first and last k-1 bases coincide).
    """
    if not 1 <= k <= 32:
        raise ValueError(f"k must be in [1, 32], got {k}")
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    n = keys.shape[0]
    if n == 0:
        return [], []
    if n > 1 and not bool(np.all(keys[1:] > keys[:-1])):
        raise ValueError("keys must be sorted and unique")

    iota = np.arange(n, dtype=np.int64)
    shift_hi = np.uint64(2 * (k - 1))
    mask_km1 = np.uint64((1 << (2 * (k - 1))) - 1)
    suf = keys >> np.uint64(2)
    pre_shifted = (keys & mask_km1) << np.uint64(2)

    # Edge structure via 8 sorted joins: successor y_b = suf | b << 2(k-1),
    # predecessor p_b = (pre << 2) | b.
    succ_ok = np.zeros((4, n), dtype=bool)
    succ_idx = np.zeros((4, n), dtype=np.int64)
    indeg = np.zeros(n, dtype=np.int64)
    for b in range(4):
        ok, idx = _member(keys, suf | (np.uint64(b) << shift_hi))
        succ_ok[b], succ_idx[b] = ok, idx
        ok, _ = _member(keys, pre_shifted | np.uint64(b))
        indeg += ok
    outdeg = succ_ok.sum(axis=0)

    # nxt[i]: unique successor when the edge is "simple" (internal to a
    # unitig): outdeg(x) == 1 and indeg(y) == 1. nxt is then injective, so
    # its inverse prev is a well-defined predecessor forest.
    bsel = succ_ok.argmax(axis=0)
    cand = succ_idx[bsel, iota]
    simple = (outdeg == 1) & (indeg[cand] == 1)
    nxt = np.where(simple, cand, np.int64(-1))
    prev = np.full(n, -1, dtype=np.int64)
    src = np.nonzero(nxt >= 0)[0]
    prev[nxt[src]] = src

    # Rank; break each pure cycle at its minimum-index (= minimum-key,
    # keys are sorted) node, found by min-propagating pointer doubling.
    rank, start = _wyllie_rank(prev)
    circ_start = np.zeros(n, dtype=bool)
    cyc = rank >= n
    if cyc.any():
        mn = iota.copy()
        j2 = np.where(prev >= 0, prev, iota)
        for _ in range(max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)):
            mn = np.minimum(mn, mn[j2])
            j2 = j2[j2]
        brk = cyc & (mn == iota)
        circ_start[brk] = True
        prev[brk] = -1
        rank, start = _wyllie_rank(prev)

    # Emit: order nodes by (chain, rank); chain c of length m spans
    # out[offs[c] : offs[c] + m + k - 1]; the rank-0 node contributes its
    # full k bases, every later node its last base at position k - 1 + rank.
    order = np.lexsort((rank, start))
    ch_s, rk_s = start[order], rank[order]
    first = np.empty(n, dtype=bool)
    first[0] = True
    first[1:] = ch_s[1:] != ch_s[:-1]
    cid = np.cumsum(first) - 1
    lens = np.bincount(cid)
    out_len = lens + (k - 1)
    offs = np.concatenate([[0], np.cumsum(out_len)[:-1]]).astype(np.int64)
    codes = np.zeros(int(out_len.sum()), dtype=np.uint8)
    head_nodes = order[first]
    head_keys = keys[head_nodes]
    for j in range(k):
        codes[offs + j] = (head_keys >> np.uint64(2 * j)) & np.uint64(3)
    tail = ~first
    pos = offs[cid] + (k - 1) + rk_s
    lastb = ((keys[order] >> shift_hi) & np.uint64(3)).astype(np.uint8)
    codes[pos[tail]] = lastb[tail]

    ascii_all = _ASCII[codes]
    ends = offs + out_len
    circ = circ_start[head_nodes]
    seqs = [ascii_all[offs[c] : ends[c]].tobytes() for c in range(len(lens))]
    return seqs, [bool(f) for f in circ]


def _runs_to_keys(lo, hi, counts, min_count: int) -> np.ndarray:
    """Run-start (lo, hi, counts) arrays -> sorted uint64 solid-key array."""
    from .ops import kmer as kmer_ops

    lo, hi, counts = kmer_ops.compact_runs(lo, hi, counts)
    m = counts >= min_count
    return (hi[m].astype(np.uint64) << np.uint64(32)) | lo[m].astype(np.uint64)


def _expand_both_strands(keys: np.ndarray, k: int) -> np.ndarray:
    """Union a solid-key set with its reverse complements (host mirror of
    ops.revcomp.revcomp_key's bit dance, kept on host: metadata-sized)."""
    x = ~keys
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    x = ((x & m2) << np.uint64(2)) | ((x >> np.uint64(2)) & m2)
    x = ((x & m4) << np.uint64(4)) | ((x >> np.uint64(4)) & m4)
    x = x.byteswap()  # full 2-bit-group reversal of the 64-bit word
    rc = x >> np.uint64(64 - 2 * k) if k < 32 else x
    return np.union1d(keys, rc)


def _canonical_rotation(seq: bytes) -> bytes:
    """Minimum rotation over both strands — the rotation/strand-invariant
    identity of a circular unitig (cycles are rare; O(L^2) is fine here)."""
    r = rc_ascii(seq)
    return min(
        min(seq[i:] + seq[:i] for i in range(len(seq))),
        min(r[i:] + r[:i] for i in range(len(r))),
    )


def assemble_keys(
    keys: np.ndarray, k: int, *, both_strands: bool = False
) -> Tuple[List[bytes], List[bool]]:
    """Unitigs from a solid-key set, optionally strand-symmetrized.

    both_strands=True unions in the reverse-complement keys first (the
    usual canonical-spectrum workflow), then deduplicates the resulting
    rc-paired unitigs, keeping the lexicographically smaller strand
    (circular ones compare by minimum rotation over both strands).
    Output is sorted longest-first, ties by sequence.
    """
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    if both_strands:
        keys = _expand_both_strands(keys, k)
    seqs, circ = unitigs_from_keys(keys, k)
    if both_strands:
        kept_s: List[bytes] = []
        kept_c: List[bool] = []
        seen_rot = set()
        for s, c in zip(seqs, circ):
            if c:
                rot = _canonical_rotation(s[: len(s) - (k - 1)] if len(s) > k - 1 else s)
                if rot in seen_rot:
                    continue
                seen_rot.add(rot)
            elif s > rc_ascii(s):
                continue  # its rc twin is (or was) emitted
            kept_s.append(s)
            kept_c.append(c)
        seqs, circ = kept_s, kept_c
    order = sorted(range(len(seqs)), key=lambda i: (-len(seqs[i]), seqs[i]))
    return [seqs[i] for i in order], [circ[i] for i in order]


def assemble_reads(
    reads,
    k: int = 21,
    *,
    min_count: int = 2,
    both_strands: bool = True,
    base_valid=None,
) -> Tuple[List[bytes], List[bool]]:
    """Assemble a PackedReads batch into unitigs.

    Counts canonical k-mers on device (count_kmers_runs), keeps those with
    count >= min_count (the usual error-k-mer filter; pair with
    ops.correct.correct_reads upstream for low-coverage data), and
    compacts the strand-symmetric de Bruijn graph. both_strands=False
    instead builds the strand-specific graph from the reads as written
    (counting non-canonically) — useful for oriented data and tests.
    """
    from .ops import kmer as kmer_ops

    lo, hi, counts, _ = kmer_ops.count_kmers_runs(
        reads.words, reads.lengths, k, canonical=both_strands, base_valid=base_valid
    )
    keys = _runs_to_keys(lo, hi, counts, min_count)
    return assemble_keys(keys, k, both_strands=both_strands)


def assemble_counts(
    counts: dict, k: int, *, min_count: int = 2, both_strands: bool = True
) -> Tuple[List[bytes], List[bool]]:
    """Unitigs from a {packed_kmer: count} dict (pipeline.count_fastq's
    large-k return — the streaming / genome-scale entry point)."""
    solid = np.fromiter(
        (key for key, c in counts.items() if c >= min_count),
        dtype=np.uint64,
        count=-1,
    )
    solid.sort()
    return assemble_keys(solid, k, both_strands=both_strands)


def write_fasta(path, seqs: List[bytes], circular: Optional[List[bool]] = None,
                prefix: str = "utg") -> None:
    """Write unitigs as FASTA: >utg000001 len=... circ=yes|no."""
    with open(path, "wb") as f:
        for i, s in enumerate(seqs):
            c = "yes" if circular and circular[i] else "no"
            f.write(b">%s%06d len=%d circ=%s\n" % (prefix.encode(), i + 1, len(s), c.encode()))
            for j in range(0, len(s), 80):
                f.write(s[j : j + 80] + b"\n")
