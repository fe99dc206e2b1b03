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
