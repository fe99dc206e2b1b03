"""Spectrum error correction vs an exact python oracle.

The oracle mirrors ops.correct's rules bit-for-bit (same site selection,
same candidate order, same tie-breaks) so parity is exact equality on
the corrected words, not a statistical claim. Recovery tests then check
the workflow does what it is for: planted single-base errors come back
to the true genome bases.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import random_seq

from bitnuc_tpu import oracle
from bitnuc_tpu.ops import codec, correct, kmer
from bitnuc_tpu.sequence import PackedReads

_RC = bytes.maketrans(b"ACGT", b"TGCA")
_CODE = {65: 0, 67: 1, 71: 2, 84: 3}
_BASE = b"ACGT"


def _keyf(win: bytes, canonical: bool) -> int:
    key = oracle.as_2bit(win)
    if canonical:
        key = min(key, oracle.as_2bit(win.translate(_RC)[::-1]))
    return key


def _table_dict(seqs, k, canonical=False):
    out = {}
    for s in seqs:
        for p in range(len(s) - k + 1):
            key = _keyf(s[p : p + k], canonical)
            out[key] = out.get(key, 0) + 1
    return out


def _table_arrays(table):
    keys = np.fromiter(table.keys(), np.uint64, len(table))
    vals = np.fromiter(table.values(), np.int64, len(table))
    return (
        jnp.asarray(keys & np.uint64(0xFFFFFFFF), jnp.uint32),
        jnp.asarray(keys >> np.uint64(32), jnp.uint32),
        jnp.asarray(vals, jnp.int32),
    )


def _oracle_round(s, k, table, min_count, canonical, bvalid=None):
    """One correction round on bytes `s`; returns (new_bytes, applied)."""
    n = len(s)
    if bvalid is None:
        bvalid = [True] * n
    nwin = n - k + 1
    wvalid = [
        nwin > 0 and all(bvalid[w : w + k]) for w in range(max(nwin, 0))
    ]
    counts = [
        table.get(_keyf(s[w : w + k], canonical), 0) if v else 0
        for w, v in enumerate(wvalid)
    ]
    weak = [v and c < min_count for v, c in zip(wvalid, counts)]
    if not any(weak):
        return s, False
    weak_idx = [w for w, x in enumerate(weak) if x]
    valid_idx = [w for w, x in enumerate(wvalid) if x]
    if max(weak_idx) < max(valid_idx):
        p = max(weak_idx)
    elif min(weak_idx) > min(valid_idx):
        p = min(weak_idx) + k - 1
    else:
        cov = [
            sum(weak[w] for w in range(max(i - k + 1, 0), min(i + 1, len(weak))))
            for i in range(n)
        ]
        p = cov.index(max(cov))
    best_score, best_code = -1, None
    for j in (1, 2, 3):
        code = (_CODE[s[p]] + j) & 3
        s2 = s[:p] + _BASE[code : code + 1] + s[p + 1 :]
        covering = [
            w
            for w in range(max(p - k + 1, 0), min(p, len(weak) - 1) + 1)
            if wvalid[w]
        ]
        c2 = [table.get(_keyf(s2[w : w + k], canonical), 0) for w in covering]
        if covering and all(x >= min_count for x in c2):
            score = min(c2)
            if score > best_score:
                best_score, best_code = score, code
    if best_score < 1:
        return s, False
    return s[:p] + _BASE[best_code : best_code + 1] + s[p + 1 :], True


def _decode_reads(words, lengths):
    a = np.asarray(codec.decode_reads(words, jnp.asarray(lengths)))
    return [bytes(a[i, : int(l)]) for i, l in enumerate(np.asarray(lengths))]


def _mutate(rng, s: bytes, p: int) -> bytes:
    alt = _BASE[(_CODE[s[p]] + int(rng.integers(1, 4))) & 3]
    return s[:p] + bytes([alt]) + s[p + 1 :]


@pytest.mark.parametrize("k", [15, 21])
def test_single_error_recovery(rng, k):
    genome = random_seq(rng, 600).upper()
    g = PackedReads.from_ascii([genome])
    t_lo, t_hi, t_ct, _ = kmer.count_kmers_sorted(g.words, g.lengths, k)

    truths, reads, sites = [], [], []
    for start, p in [(0, 0), (30, 10), (100, 59), (200, 30)]:
        t = genome[start : start + 60]
        truths.append(t)
        reads.append(_mutate(rng, t, p))
        sites.append(p)
    r = PackedReads.from_ascii(reads)
    new_words, n_corr = correct.correct_reads(
        r.words, r.lengths, k, t_lo, t_hi, t_ct, min_count=1, rounds=2
    )
    got = _decode_reads(new_words, r.lengths)
    for i, t in enumerate(truths):
        assert got[i] == t, (i, sites[i])
    assert np.asarray(n_corr).tolist() == [1, 1, 1, 1]


def test_two_errors_multi_round(rng):
    k = 13
    genome = random_seq(rng, 500).upper()
    g = PackedReads.from_ascii([genome])
    t_lo, t_hi, t_ct, _ = kmer.count_kmers_sorted(g.words, g.lengths, k)
    t = genome[50:150]  # 100bp; errors 60bp apart never share a window
    read = _mutate(rng, _mutate(rng, t, 20), 80)
    r = PackedReads.from_ascii([read, t])
    new_words, n_corr = correct.correct_reads(
        r.words, r.lengths, k, t_lo, t_hi, t_ct, min_count=1, rounds=3
    )
    got = _decode_reads(new_words, r.lengths)
    assert got[0] == t and got[1] == t
    assert np.asarray(n_corr).tolist() == [2, 0]


def test_clean_reads_untouched(rng):
    k = 11
    genome = random_seq(rng, 400).upper()
    g = PackedReads.from_ascii([genome])
    t_lo, t_hi, t_ct, _ = kmer.count_kmers_sorted(g.words, g.lengths, k)
    reads = [genome[i : i + 70] for i in (0, 100, 330)]
    reads.append(genome[:k - 1])  # shorter than k: no windows
    r = PackedReads.from_ascii(reads)
    new_words, applied = correct.correct_reads_once(
        r.words, r.lengths, k, t_lo, t_hi, t_ct, min_count=1
    )
    np.testing.assert_array_equal(np.asarray(new_words), np.asarray(r.words))
    assert not np.asarray(applied).any()


@pytest.mark.parametrize("k,canonical", [(9, False), (21, False), (13, True)])
def test_oracle_parity_fuzz(rng, k, canonical):
    genome = random_seq(rng, 800).upper()
    table = _table_dict([genome], k, canonical)
    t_lo, t_hi, t_ct = _table_arrays(table)

    reads = []
    for _ in range(24):
        n = int(rng.integers(k, 90))
        start = int(rng.integers(0, len(genome) - n + 1))
        s = genome[start : start + n]
        for _ in range(int(rng.integers(0, 3))):  # 0-2 mutations
            s = _mutate(rng, s, int(rng.integers(0, n)))
        reads.append(s)
    reads.append(random_seq(rng, 50).upper())  # pure noise read

    r = PackedReads.from_ascii(reads)
    min_count = 1
    new_words, applied = correct.correct_reads_once(
        r.words, r.lengths, k, t_lo, t_hi, t_ct,
        min_count=min_count, canonical=canonical,
    )
    got = _decode_reads(new_words, r.lengths)
    applied = np.asarray(applied)
    for i, s in enumerate(reads):
        want, want_applied = _oracle_round(s, k, table, min_count, canonical)
        assert got[i] == want, i
        assert applied[i] == want_applied, i


def test_min_count_threshold(rng):
    """min_count=2: singleton k-mers are weak; a read sampled from the
    2-copy region corrects, one matching only the 1-copy region cannot."""
    k = 9
    a = random_seq(rng, 200).upper()
    b = random_seq(rng, 200).upper()
    g = PackedReads.from_ascii([a, a, b])  # a twice, b once
    t_lo, t_hi, t_ct, _ = kmer.count_kmers_sorted(g.words, g.lengths, k)
    table = _table_dict([a, a, b], k)

    ra = _mutate(rng, a[40:100], 30)
    rb = _mutate(rng, b[40:100], 30)
    r = PackedReads.from_ascii([ra, rb])
    new_words, applied = correct.correct_reads_once(
        r.words, r.lengths, k, t_lo, t_hi, t_ct, min_count=2
    )
    got = _decode_reads(new_words, r.lengths)
    exp_a, app_a = _oracle_round(ra, k, table, 2, False)
    exp_b, app_b = _oracle_round(rb, k, table, 2, False)
    assert got[0] == exp_a == a[40:100] and bool(np.asarray(applied)[0]) == app_a
    # every window of the b-read is weak (counts of 1) -> no fix possible
    assert got[1] == exp_b == rb and not app_b


def test_base_valid_n_handling(rng):
    """Ns: windows covering them are out of the game; the N site itself is
    never 'corrected'; a real error elsewhere still gets fixed."""
    k = 9
    genome = random_seq(rng, 300).upper()
    g = PackedReads.from_ascii([genome])
    t_lo, t_hi, t_ct, _ = kmer.count_kmers_sorted(g.words, g.lengths, k)
    table = _table_dict([genome], k)

    t = genome[50:130]  # 80bp
    s = t[:20] + b"N" + t[21:]  # N at 20
    s = _mutate(rng, s, 60)  # real error at 60

    a = np.zeros((1, 80), np.uint8)
    a[0] = np.frombuffer(s, np.uint8)
    lens = np.array([80], np.int32)
    words, _ = codec.encode_reads(jnp.asarray(a), jnp.asarray(lens))
    bv = codec.validity_mask(jnp.asarray(a), jnp.asarray(lens))

    new_words, n_corr = correct.correct_reads(
        words, jnp.asarray(lens), k, t_lo, t_hi, t_ct,
        min_count=1, rounds=2, base_valid=bv,
    )
    out = bytes(np.asarray(codec.decode_reads(new_words, jnp.asarray(lens)))[0][:80])
    bvalid = [c != ord("N") for c in s]
    want, app1 = _oracle_round(s, k, table, 1, False, bvalid)
    assert app1
    # device output decodes the N slot as some ACGT letter; compare around it
    assert out[:20] == want[:20] and out[21:] == want[21:]
    assert out[60:61] == t[60:61]  # the planted error is fixed
    assert int(np.asarray(n_corr)[0]) == 1  # N never counts as a correction


def test_error_at_read_edges(rng):
    k = 11
    genome = random_seq(rng, 400).upper()
    g = PackedReads.from_ascii([genome])
    t_lo, t_hi, t_ct, _ = kmer.count_kmers_sorted(g.words, g.lengths, k)
    t = genome[100:170]
    reads = [_mutate(rng, t, 0), _mutate(rng, t, len(t) - 1)]
    r = PackedReads.from_ascii(reads)
    new_words, _ = correct.correct_reads(
        r.words, r.lengths, k, t_lo, t_hi, t_ct, min_count=1, rounds=2
    )
    got = _decode_reads(new_words, r.lengths)
    assert got[0] == t and got[1] == t
