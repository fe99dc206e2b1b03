"""Alignment ops vs exact python DP oracles (bitnuc_tpu.oracle).

Parity is exact integer equality on scores AND end positions (the
tie-break contract is part of the API), across ragged batches, empty
sequences, and traced scoring parameters.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import random_seq

from bitnuc_tpu import oracle
from bitnuc_tpu.ops import align
from bitnuc_tpu.sequence import PackedReads


def _pairs(seqs_a, seqs_b):
    ra = PackedReads.from_ascii(seqs_a)
    rb = PackedReads.from_ascii(seqs_b)
    return ra.words, ra.lengths, rb.words, rb.lengths


def test_edit_distance_golden():
    a = [b"ACGT", b"ACGT", b"AAAA", b"ACGTACGT", b"", b"ACG"]
    b = [b"ACGT", b"AGT", b"TTTT", b"AGGTACT", b"ACG", b""]
    got = np.asarray(align.edit_distance(*_pairs(a, b)))
    assert got.tolist() == [0, 1, 4, 2, 3, 3]


def test_sw_identical_and_disjoint():
    a = [b"ACGTACGTACGT", b"AAAACCCC"]
    b = [b"ACGTACGTACGT", b"GGGGTTTT"]
    s, ei, ej = map(np.asarray, align.sw_score(*_pairs(a, b)))
    assert s[0] == 24 and ei[0] == 12 and ej[0] == 12  # all matches, +2 each
    assert s[1] == 0 and ei[1] == 0 and ej[1] == 0  # nothing aligns


def test_fit_finds_planted_substring(rng):
    ref = random_seq(rng, 200).upper()
    q = ref[63:103]  # exact 40-mer at [63, 103)
    cost, endj = map(
        np.asarray, align.fit_distance(*_pairs([q], [ref]))
    )
    assert cost[0] == 0
    want_cost, want_end = oracle.fit_distance(q, ref)
    assert want_cost == 0
    assert endj[0] == want_end  # ties resolved identically (smallest end)


@pytest.mark.parametrize("mismatch,gap", [(1, 1), (3, 2), (2, 5)])
def test_distance_oracle_fuzz(rng, mismatch, gap):
    seqs_a, seqs_b = [], []
    for _ in range(18):
        seqs_a.append(random_seq(rng, int(rng.integers(0, 40))).upper())
        seqs_b.append(random_seq(rng, int(rng.integers(0, 40))).upper())
    # relatedness: mutated copies exercise the interesting DP paths
    base = random_seq(rng, 30).upper()
    seqs_a += [base, base[3:], base]
    seqs_b += [base[:20] + base[22:], base, base[::-1]]
    wa, la, wb, lb = _pairs(seqs_a, seqs_b)
    got = np.asarray(align.global_distance(wa, la, wb, lb, mismatch, gap))
    for i, (a, b) in enumerate(zip(seqs_a, seqs_b)):
        assert got[i] == oracle.global_distance(a, b, mismatch, gap), (i, a, b)
    if (mismatch, gap) == (1, 1):
        ed = np.asarray(align.edit_distance(wa, la, wb, lb))
        np.testing.assert_array_equal(ed, got)


@pytest.mark.parametrize(
    "match,mismatch,go,ge", [(2, -3, -5, -2), (1, -1, -1, -1), (3, -2, -7, -1)]
)
def test_sw_oracle_fuzz(rng, match, mismatch, go, ge):
    seqs_a, seqs_b = [], []
    for _ in range(14):
        seqs_a.append(random_seq(rng, int(rng.integers(0, 36))).upper())
        seqs_b.append(random_seq(rng, int(rng.integers(0, 36))).upper())
    core = random_seq(rng, 16).upper()
    seqs_a += [random_seq(rng, 8).upper() + core + random_seq(rng, 6).upper()]
    seqs_b += [random_seq(rng, 5).upper() + core + random_seq(rng, 9).upper()]
    wa, la, wb, lb = _pairs(seqs_a, seqs_b)
    s, ei, ej = map(
        np.asarray, align.sw_score(wa, la, wb, lb, match, mismatch, go, ge)
    )
    for i, (a, b) in enumerate(zip(seqs_a, seqs_b)):
        ws, wi, wj = oracle.sw_score(a, b, match, mismatch, go, ge)
        assert (s[i], ei[i], ej[i]) == (ws, wi, wj), (i, a, b)


def test_fit_oracle_fuzz(rng):
    ref = random_seq(rng, 120).upper()
    seqs_a, seqs_b = [], []
    for _ in range(12):
        n = int(rng.integers(0, 30))
        start = int(rng.integers(0, 120 - n + 1))
        q = bytearray(ref[start : start + n])
        for _ in range(int(rng.integers(0, 3))):
            if n:
                p = int(rng.integers(0, n))
                q[p] = ord(bytes([rng.choice(np.frombuffer(b"ACGT", np.uint8))]))
        seqs_a.append(bytes(q))
        seqs_b.append(ref)
    wa, la, wb, lb = _pairs(seqs_a, seqs_b)
    cost, endj = map(np.asarray, align.fit_distance(wa, la, wb, lb, 2, 3))
    for i, (a, b) in enumerate(zip(seqs_a, seqs_b)):
        wc, we = oracle.fit_distance(a, b, 2, 3)
        assert (cost[i], endj[i]) == (wc, we), (i, a)


def test_traced_params_do_not_recompile():
    wa, la, wb, lb = _pairs([b"ACGTACGT"], [b"ACGGACGT"])
    d1 = int(align.global_distance(wa, la, wb, lb, 1, 1)[0])
    d2 = int(align.global_distance(wa, la, wb, lb, 5, 1)[0])
    assert d1 == 1 and d2 == 2  # mismatch=5 > 2 gaps: DP reroutes
    s1 = int(align.sw_score(wa, la, wb, lb, 2, -3, -5, -2)[0][0])
    s2 = int(align.sw_score(wa, la, wb, lb, 2, -1, -5, -2)[0][0])
    assert s1 == oracle.sw_score(b"ACGTACGT", b"ACGGACGT", 2, -3, -5, -2)[0]
    assert s2 == oracle.sw_score(b"ACGTACGT", b"ACGGACGT", 2, -1, -5, -2)[0]


# ---------------------------------------------------------------------------
# traceback (align_ops): exact op-level parity vs a full-DP python oracle
# ---------------------------------------------------------------------------


def _ops_oracle(a: bytes, b: bytes, mismatch: int, gap: int, fit: bool):
    """Full-matrix DP + traceback with the device's exact tie preference
    (CONTINUE the current op when it ties — gap runs coalesce — else
    diag > up > left; fit end_j ties to the smallest j).
    Returns (cost, end_j, ops list of OP_* codes in forward order)."""
    m, n = len(a), len(b)
    D = np.zeros((m + 1, n + 1), np.int64)
    D[1:, 0] = gap * np.arange(1, m + 1)
    if not fit:
        D[0, 1:] = gap * np.arange(1, n + 1)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            sub = 0 if a[i - 1] == b[j - 1] else mismatch
            D[i, j] = min(D[i - 1, j - 1] + sub, D[i - 1, j] + gap,
                          D[i, j - 1] + gap)
    if fit:
        end_j = int(np.argmin(D[m]))  # np.argmin ties to smallest j
        cost = int(D[m, end_j])
    else:
        end_j, cost = n, int(D[m, n])
    i, j, ops = m, end_j, []
    prev = None
    while True:
        if fit and i == 0:
            break
        if not fit and i == 0 and j == 0:
            break
        if j == 0:
            op = align.OP_INS
        elif i == 0:
            op = align.OP_DEL
        else:
            sub = 0 if a[i - 1] == b[j - 1] else mismatch
            diag_ok = D[i, j] == D[i - 1, j - 1] + sub
            up_ok = D[i, j] == D[i - 1, j] + gap
            left_ok = D[i, j] == D[i, j - 1] + gap
            if prev == align.OP_INS and up_ok:
                op = align.OP_INS
            elif prev == align.OP_DEL and left_ok:
                op = align.OP_DEL
            elif diag_ok:
                op = align.OP_EQ if a[i - 1] == b[j - 1] else align.OP_X
            elif up_ok:
                op = align.OP_INS
            else:
                op = align.OP_DEL
        ops.append(op)
        prev = op
        if op in (align.OP_EQ, align.OP_X, align.OP_INS):
            i -= 1
        if op in (align.OP_EQ, align.OP_X, align.OP_DEL):
            j -= 1
    return cost, end_j, ops[::-1]


def _check_ops_valid(a: bytes, b: bytes, end_j: int, ops, fit: bool,
                     mismatch: int, gap: int, want_cost: int):
    """Replaying the ops must consume exactly a and b[start:end_j] and
    re-derive the reported cost — validity independent of tie choices."""
    ncons_b = sum(1 for o in ops if o in (align.OP_EQ, align.OP_X, align.OP_DEL))
    start = end_j - ncons_b
    assert start == 0 or fit
    i, j, cost = 0, start, 0
    for o in ops:
        if o == align.OP_EQ:
            assert a[i] == b[j]; i += 1; j += 1
        elif o == align.OP_X:
            assert a[i] != b[j]; cost += mismatch; i += 1; j += 1
        elif o == align.OP_INS:
            cost += gap; i += 1
        else:
            cost += gap; j += 1
    assert i == len(a) and j == end_j and cost == want_cost


@pytest.mark.parametrize("fit", [False, True])
@pytest.mark.parametrize("mismatch,gap", [(1, 1), (3, 2)])
def test_align_ops_oracle_fuzz(rng, fit, mismatch, gap):
    seqs_a, seqs_b = [], []
    for _ in range(24):
        la = int(rng.integers(0, 28))
        lb = int(rng.integers(0, 36))
        seqs_a.append(random_seq(rng, la).upper())
        seqs_b.append(random_seq(rng, lb).upper())
    # planted near-copies so real alignments (not noise) are covered too
    base = random_seq(rng, 30).upper()
    seqs_a.append(base[:12] + base[15:27])       # 3bp deletion vs b
    seqs_b.append(base[:27])
    seqs_a.append(base[:10] + b"GGG" + base[10:20])  # 3bp insertion vs b
    seqs_b.append(base[:20])
    cost, endj, ops = map(
        np.asarray,
        align.align_ops(*_pairs(seqs_a, seqs_b), mismatch, gap,
                        ends_free_b=fit),
    )
    for r, (a, b) in enumerate(zip(seqs_a, seqs_b)):
        want_cost, want_end, want_ops = _ops_oracle(a, b, mismatch, gap, fit)
        got_ops = [int(o) for o in ops[r] if o != align.OP_STOP]
        assert cost[r] == want_cost, (r, a, b)
        assert endj[r] == want_end, (r, a, b)
        assert got_ops == want_ops, (r, a, b)
        _check_ops_valid(a, b, int(endj[r]), got_ops, fit, mismatch, gap,
                         int(cost[r]))


def test_align_ops_planted_indel_cigars(rng):
    """Exact CIGAR strings for planted events (the VERDICT r3 contract).

    Contexts are chosen so the optimal alignment is UNIQUE (no base of the
    event region matches its flanks), making the exact CIGAR deterministic
    regardless of tie policy; a random-context event is additionally
    checked by op counts (random coincidences can legally split an indel
    across equal-cost placements)."""
    a_del = b"AAAATTTT"                     # ref AAAA GGG TTTT, 3bp deletion
    b_del = b"AAAAGGGTTTT"
    a_ins = b"AAAA" + b"CCCC" + b"TTTT"     # 4bp insertion vs AAAATTTT
    b_ins = b"AAAATTTT"
    a_sub = b"AAAACTTT"                     # one substitution
    b_sub = b"AAAAGTTT"
    cost, endj, ops = align.align_ops(
        *_pairs([a_del, a_ins, a_sub], [b_del, b_ins, b_sub]), 1, 1,
        ends_free_b=False,
    )
    cig = align.cigars(ops)
    assert np.asarray(cost).tolist() == [3, 4, 1]
    assert cig[0] == "4=3D4="
    assert cig[1] == "4=4I4="
    assert cig[2] == "4=1X3="
    # M-collapsed form merges =/X
    assert align.cigars(ops, eqx=False)[2] == "8M"

    # random context: the event may legally split, but op totals are fixed
    ref = random_seq(rng, 80).upper()
    cost, _, ops = align.align_ops(
        *_pairs([ref[10:30] + ref[33:53]], [ref[10:53]]), 1, 1,
    )
    row = [int(o) for o in np.asarray(ops)[0] if o != align.OP_STOP]
    assert int(np.asarray(cost)[0]) == 3
    assert row.count(align.OP_DEL) == 3 and row.count(align.OP_EQ) == 40


def test_align_ops_codes_matches_words(rng):
    from bitnuc_tpu.utils import bitops
    seqs_a = [random_seq(rng, int(n)).upper() for n in rng.integers(5, 30, 8)]
    seqs_b = [random_seq(rng, int(n)).upper() for n in rng.integers(5, 40, 8)]
    wa, la, wb, lb = _pairs(seqs_a, seqs_b)
    want = align.align_ops(wa, la, wb, lb, 1, 1, ends_free_b=True)
    ca = bitops.unpack_words(wa).astype(np.int32)
    cb = bitops.unpack_words(wb).astype(np.int32)
    got = align.align_ops_codes(ca, la, cb, lb, 1, 1, ends_free_b=True)
    for w, g in zip(want, got):
        assert np.array_equal(np.asarray(w), np.asarray(g))


def _fit_span_oracle(a: bytes, b: bytes, mismatch: int, gap: int):
    """Full-DP oracle for fit_distance_span: D as usual (free b ends);
    S[i][j] = min start column over optimal paths to (i, j)."""
    m, n = len(a), len(b)
    BIG = 1 << 30
    D = np.zeros((m + 1, n + 1), np.int64)
    D[1:, 0] = gap * np.arange(1, m + 1)
    S = np.zeros((m + 1, n + 1), np.int64)
    S[0, :] = np.arange(n + 1)
    for i in range(1, m + 1):
        for j in range(0, n + 1):
            if j == 0:
                S[i, 0] = 0
                continue
            sub = 0 if a[i - 1] == b[j - 1] else mismatch
            cands = [
                (D[i - 1, j - 1] + sub, S[i - 1, j - 1]),
                (D[i - 1, j] + gap, S[i - 1, j]),
                (D[i, j - 1] + gap, S[i, j - 1]),
            ]
            best = min(c for c, _ in cands)
            D[i, j] = best
            S[i, j] = min(s for c, s in cands if c == best)
    end = int(np.argmin(D[m]))
    return int(D[m, end]), int(S[m, end]), end


@pytest.mark.parametrize("mismatch,gap", [(1, 1), (3, 2)])
def test_fit_distance_span_oracle_fuzz(rng, mismatch, gap):
    seqs_a, seqs_b = [], []
    for _ in range(20):
        seqs_a.append(random_seq(rng, int(rng.integers(0, 24))).upper())
        seqs_b.append(random_seq(rng, int(rng.integers(0, 40))).upper())
    # planted fits (incl. with indels) so real spans are covered
    base = random_seq(rng, 60).upper()
    seqs_a.append(base[17:44])
    seqs_b.append(base)
    seqs_a.append(base[10:25] + base[28:45])  # 3bp deletion
    seqs_b.append(base)
    cost, start, end = map(
        np.asarray,
        align.fit_distance_span(*_pairs(seqs_a, seqs_b), mismatch, gap),
    )
    for r, (a, b) in enumerate(zip(seqs_a, seqs_b)):
        wc, ws, we = _fit_span_oracle(a, b, mismatch, gap)
        assert (cost[r], start[r], end[r]) == (wc, ws, we), (r, a, b)
    # span-fit cost must equal the classic fit cost everywhere
    c2, e2 = map(np.asarray, align.fit_distance(*_pairs(seqs_a, seqs_b),
                                                mismatch, gap))
    assert np.array_equal(cost, c2)
    assert np.array_equal(end, e2)


# ---------------------------------------------------------------------------
# banded wavefront: exact in-band, upper bound beyond, O(L*band) traceback
# ---------------------------------------------------------------------------


def test_fit_span_banded_matches_full_in_band(rng):
    """Planted fits whose start offset and gap drift are inside the band
    must be bit-identical to the unbanded span fit (the mapper contract)."""
    seqs_a, seqs_b = [], []
    for _ in range(24):
        la = int(rng.integers(5, 120))
        a = random_seq(rng, la).upper()
        lead = random_seq(rng, int(rng.integers(0, 60))).upper()
        mm = bytearray(a)
        for _ in range(int(rng.integers(0, 4))):  # <=3 edits: drift << band
            p = int(rng.integers(0, max(len(mm), 1)))
            op = int(rng.integers(0, 3))
            ch = random_seq(rng, 1).upper()
            if op == 0 and mm:
                mm[p : p + 1] = ch
            elif op == 1 and mm:
                del mm[p]
            else:
                mm.insert(p, ch[0])
        tail = random_seq(rng, int(rng.integers(0, 40))).upper()
        seqs_a.append(a)
        seqs_b.append(lead + bytes(mm) + tail)
    args = _pairs(seqs_a, seqs_b)
    full = [np.asarray(x) for x in align.fit_distance_span(*args)]
    band = [
        np.asarray(x)
        for x in align.fit_distance_span_banded(
            *args, off_lo=-16, off_hi=96
        )
    ]
    for f, g in zip(full, band):
        np.testing.assert_array_equal(f, g)


def test_fit_span_banded_upper_bound_out_of_band(rng):
    """Starts beyond off_hi leave the band: banded cost must still be an
    achievable upper bound (never below the true optimum)."""
    seqs_a = [random_seq(rng, 30).upper() for _ in range(8)]
    seqs_b = [
        random_seq(rng, 200).upper() + a + random_seq(rng, 10).upper()
        for a in seqs_a
    ]
    args = _pairs(seqs_a, seqs_b)
    f = np.asarray(align.fit_distance_span(*args)[0])
    g = np.asarray(
        align.fit_distance_span_banded(*args, off_lo=-16, off_hi=96)[0]
    )
    assert (f == 0).all()  # planted exactly, findable unbanded
    assert (g >= f).all()


def test_fit_span_banded_wide_band_falls_back(rng):
    """A band at least as wide as the window compiles to the full scan."""
    seqs_a = [random_seq(rng, 20).upper() for _ in range(4)]
    seqs_b = [random_seq(rng, 30).upper() for _ in range(4)]
    args = _pairs(seqs_a, seqs_b)
    full = [np.asarray(x) for x in align.fit_distance_span(*args)]
    band = [
        np.asarray(x)
        for x in align.fit_distance_span_banded(
            *args, off_lo=-64, off_hi=64
        )
    ]
    for f, g in zip(full, band):
        np.testing.assert_array_equal(f, g)


@pytest.mark.parametrize("fit", [False, True])
def test_align_ops_banded_matches_full(rng, fit):
    """Banded traceback: identical (cost, end_j, ops) to the full-plane
    version for in-band alignments, in both global and fitting modes."""
    B, LA, LB = 16, 60, 72
    ca = np.zeros((B, LA), np.int32)
    cb = np.zeros((B, LB), np.int32)
    la = np.zeros(B, np.int32)
    lb = np.zeros(B, np.int32)
    for i in range(B):
        m = int(rng.integers(4, LA))
        a = rng.integers(0, 4, m).astype(np.int32)
        bb = list(a)
        for _ in range(int(rng.integers(0, 5))):
            p = int(rng.integers(0, max(len(bb), 1)))
            op = int(rng.integers(0, 3))
            if op == 0 and bb:
                bb[p] = int(rng.integers(0, 4))
            elif op == 1 and bb:
                del bb[p]
            else:
                bb.insert(p, int(rng.integers(0, 4)))
        bb = bb[:LB]
        ca[i, :m] = a
        la[i] = m
        cb[i, : len(bb)] = bb
        lb[i] = len(bb)
    full = align.align_ops_codes(ca, la, cb, lb, 1, 1, ends_free_b=fit)
    band = align.align_ops_codes_banded(
        ca, la, cb, lb, 1, 1, ends_free_b=fit, off_lo=-24, off_hi=24
    )
    for f, g in zip(full, band):
        np.testing.assert_array_equal(np.asarray(f), np.asarray(g))
