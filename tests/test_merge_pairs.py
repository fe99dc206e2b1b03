"""Paired-end overlap merging vs a brute-force python oracle and planted
fragments with exactly known overlaps/mismatch budgets."""

import numpy as np
import pytest

from conftest import random_seq

from bitnuc_tpu.ops import merge_pairs
from bitnuc_tpu.sequence import PackedReads

_RC = bytes.maketrans(b"ACGT", b"TGCA")


def rc(s: bytes) -> bytes:
    return s[::-1].translate(_RC)


def naive_merge(r1: bytes, r2: bytes, min_overlap: int, frac: float):
    """(merged_seq|None, overlap, mismatches) with the op's exact rules:
    offsets o ascending, fewest mismatches wins, strict < keeps the
    longest qualifying overlap."""
    q = rc(r2)
    best = None
    for o in range(0, len(r1) - min_overlap + 1):
        ov_lo, ov_hi = o, min(len(r1), o + len(q))
        ov = max(ov_hi - ov_lo, 0)
        if ov < min_overlap:
            continue
        mm = sum(r1[i] != q[i - o] for i in range(ov_lo, ov_hi))
        if mm <= int(frac * ov) and (best is None or mm < best[2]):
            best = (o, ov, mm)
    if best is None:
        return None, 0, -1
    o, ov, mm = best
    return r1 + q[len(r1) - o :], ov, mm


@pytest.mark.parametrize("min_overlap,frac", [(10, 0.1), (20, 0.0)])
def test_merge_vs_naive_fuzz(rng, min_overlap, frac):
    r1s, r2s = [], []
    for i in range(24):
        frag_len = int(rng.integers(120, 300))
        frag = random_seq(rng, frag_len).upper()
        n1 = int(rng.integers(80, 151))
        n2 = int(rng.integers(80, 151))
        r1 = bytearray(frag[:n1])
        r2s_fwd = bytearray(frag[-n2:])
        for _ in range(int(rng.integers(0, 3))):  # sprinkle errors
            p = int(rng.integers(0, len(r2s_fwd)))  # frag may be < n2
            r2s_fwd[p] = int(rng.choice(np.frombuffer(b"ACGT", np.uint8)))
        r1s.append(bytes(r1))
        r2s.append(rc(bytes(r2s_fwd)))
    # plus guaranteed-disjoint pairs
    r1s.append(random_seq(rng, 100).upper())
    r2s.append(random_seq(rng, 100).upper())

    p1 = PackedReads.from_ascii(r1s)
    p2 = PackedReads.from_ascii(r2s)
    w, l, m, ov, mm = map(
        np.asarray,
        merge_pairs.merge_pairs(
            p1.words, p1.lengths, p2.words, p2.lengths, min_overlap, frac
        ),
    )
    out = PackedReads(words=w, lengths=l).to_ascii()
    for i, (r1, r2) in enumerate(zip(r1s, r2s)):
        want, wov, wmm = naive_merge(r1, r2, min_overlap, frac)
        if want is None:
            assert not m[i], i
            assert l[i] == len(r1) and out[i] == r1  # R1 passes through
        else:
            assert m[i], i
            assert (l[i], ov[i], mm[i]) == (len(want), wov, wmm), i
            # overlap takes R1's call: rebuild expected with that rule
            assert out[i] == want, i


def test_merge_exact_recovery(rng):
    frag = random_seq(rng, 260).upper()
    r1, r2 = frag[:150], rc(frag[-150:])
    p1 = PackedReads.from_ascii([r1])
    p2 = PackedReads.from_ascii([r2])
    w, l, m, ov, mm = map(
        np.asarray, merge_pairs.merge_pairs(p1.words, p1.lengths, p2.words, p2.lengths)
    )
    assert m[0] and l[0] == 260 and ov[0] == 40 and mm[0] == 0
    assert PackedReads(words=w, lengths=l).to_ascii()[0] == frag


def test_merge_ragged_lengths(rng):
    frag = random_seq(rng, 180).upper()
    r1, r2 = frag[:120], rc(frag[-90:])  # overlap 30, different lengths
    filler1 = random_seq(rng, 150).upper()  # batch forces padding on r1
    filler2 = random_seq(rng, 150).upper()
    p1 = PackedReads.from_ascii([r1, filler1])
    p2 = PackedReads.from_ascii([r2, filler2])
    w, l, m, ov, mm = map(
        np.asarray, merge_pairs.merge_pairs(p1.words, p1.lengths, p2.words, p2.lengths)
    )
    assert m[0] and l[0] == 180 and ov[0] == 30
    assert PackedReads(words=w, lengths=l).to_ascii()[0] == frag


def test_merge_r2_shorter_padded_width(rng):
    # R2's padded word width < R1's (80 vs 150 bases): the offset scan
    # must not clamp its shift window (regression: clamped slices
    # evaluated the wrong offset and truncated the fragment)
    frag = random_seq(rng, 214).upper()
    r1 = frag[:150]
    r2 = rc(frag[-80:])  # overlap 16
    p1 = PackedReads.from_ascii([r1])
    p2 = PackedReads.from_ascii([r2])
    w, l, m, ov, mm = map(
        np.asarray, merge_pairs.merge_pairs(p1.words, p1.lengths, p2.words, p2.lengths)
    )
    assert m[0] and (l[0], ov[0], mm[0]) == (214, 16, 0)
    assert PackedReads(words=w, lengths=l).to_ascii()[0] == frag


def test_merge_containment_keeps_full_r1(rng):
    # rc(R2) contained inside R1: the fragment is all of R1 (regression:
    # best_o + lens2 truncated R1's 3' tail)
    r1 = random_seq(rng, 150).upper()
    r2 = rc(r1[20:100])
    filler = random_seq(rng, 150).upper()  # equal padded widths
    p1 = PackedReads.from_ascii([r1, filler])
    p2 = PackedReads.from_ascii([r2, rc(filler)])
    w, l, m, ov, mm = map(
        np.asarray, merge_pairs.merge_pairs(p1.words, p1.lengths, p2.words, p2.lengths)
    )
    assert m[0] and l[0] == 150 and ov[0] == 80 and mm[0] == 0
    assert PackedReads(words=w, lengths=l).to_ascii()[0] == r1
    want, wov, wmm = naive_merge(r1, r2, 10, 0.1)
    assert (len(want), wov, wmm) == (150, 80, 0)  # oracle agrees


def test_packed_scan_equals_codes_scan(rng):
    """The round-5 packed-domain offset scan must be bit-exact with the
    code-plane formulation on ragged, mismatched, and unmergeable pairs
    (every output, including the unmerged passthrough rows)."""
    B = 64
    seqs1, seqs2 = [], []
    for i in range(B):
        frag = random_seq(rng, int(rng.integers(120, 260))).upper()
        l1 = int(rng.integers(40, 151))
        l2 = int(rng.integers(40, 151))
        s1 = frag[:l1]
        s2 = rc(frag[-l2:])
        if i % 4 == 1:  # sprinkle mismatches into R1
            b = bytearray(s1)
            for p in rng.integers(0, l1, size=3):
                b[p] = ord("ACGT"[int(rng.integers(0, 4))])
            s1 = bytes(b)
        if i % 4 == 2:  # unrelated pair (usually unmergeable)
            s2 = random_seq(rng, l2).upper()
        seqs1.append(s1)
        seqs2.append(s2)
    p1 = PackedReads.from_ascii(seqs1)
    p2 = PackedReads.from_ascii(seqs2)
    a = merge_pairs.merge_pairs(
        p1.words, p1.lengths, p2.words, p2.lengths, scan="packed"
    )
    b = merge_pairs.merge_pairs(
        p1.words, p1.lengths, p2.words, p2.lengths, scan="codes"
    )
    for x, y, nm in zip(a, b, ("words", "lens", "merged", "ov", "mm")):
        assert np.array_equal(np.asarray(x), np.asarray(y)), nm


def test_merge_r2_much_shorter_small_offset(rng):
    """Regression (round-5 review): W1 > W2 + 1 with the overlap at a SMALL
    offset — the under-padded shift stack let dynamic_slice clamp and the
    packed scan compared rc(R2) at the wrong word shift, silently dropping
    the merge."""
    r1 = random_seq(rng, 150).upper()           # W1 = 10 words
    r2 = rc(r1[30:90])                          # 60 bases, W2 = 4, offset 30
    p1 = PackedReads.from_ascii([r1])
    p2 = PackedReads.from_ascii([r2])
    for scan in ("packed", "codes"):
        w, l, m, ov, mm = map(
            np.asarray,
            merge_pairs.merge_pairs(
                p1.words, p1.lengths, p2.words, p2.lengths, scan=scan
            ),
        )
        assert m[0] and (l[0], ov[0], mm[0]) == (150, 60, 0), scan
        assert PackedReads(words=w, lengths=l).to_ascii()[0] == r1, scan
    # sweep every offset at this width imbalance: packed == codes
    for off in range(0, 120, 7):
        rr2 = rc(r1[off : off + 60])
        q1 = PackedReads.from_ascii([r1])
        q2 = PackedReads.from_ascii([rr2])
        a = merge_pairs.merge_pairs(
            q1.words, q1.lengths, q2.words, q2.lengths, scan="packed"
        )
        b = merge_pairs.merge_pairs(
            q1.words, q1.lengths, q2.words, q2.lengths, scan="codes"
        )
        for x, y in zip(a, b):
            assert np.array_equal(np.asarray(x), np.asarray(y)), off
