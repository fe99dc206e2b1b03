"""K-mer table lookup / read screening vs python-dict oracles.

The reference stops at `map[&kmer]` on the caller's HashMap
(/root/reference/README.md:164-180); these tests pin the device lookup to
exactly that semantic over every counted-list layout the engines emit.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import random_seq

from bitnuc_tpu import oracle
from bitnuc_tpu.ops import codec, kmer, lookup
from bitnuc_tpu.sequence import PackedReads

_RC = bytes.maketrans(b"ACGT", b"TGCA")


def _canon_key(win: bytes) -> int:
    return min(oracle.as_2bit(win), oracle.as_2bit(win.translate(_RC)[::-1]))


def _table_dict(seqs, k):
    out = {}
    for s in seqs:
        for key, c in oracle.count_kmers(s, k).items():
            out[key] = out.get(key, 0) + c
    return out


def _split64(keys):
    keys = np.asarray(keys, np.uint64)
    return (
        jnp.asarray(keys & np.uint64(0xFFFFFFFF), jnp.uint32),
        jnp.asarray(keys >> np.uint64(32), jnp.uint32),
    )


@pytest.mark.parametrize("k", [8, 21, 32])
def test_lookup_counts_matches_dict(rng, k):
    seqs = [random_seq(rng, 90).upper() for _ in range(6)]
    table = _table_dict(seqs, k)
    r = PackedReads.from_ascii(seqs)
    t_lo, t_hi, t_ct, _ = kmer.count_kmers_sorted(r.words, r.lengths, k)

    present = rng.choice(np.fromiter(table.keys(), np.uint64), size=40)
    absent = rng.integers(0, 1 << 62, size=40, dtype=np.uint64)
    if k < 32:
        absent |= np.uint64(1) << np.uint64(2 * k)  # out of key range => absent
    q = np.concatenate([present, absent])
    rng.shuffle(q)
    q_valid = rng.random(q.shape[0]) < 0.8

    q_lo, q_hi = _split64(q)
    got = np.asarray(lookup.lookup_counts(q_lo, q_hi, jnp.asarray(q_valid), t_lo, t_hi, t_ct))
    expect = np.array(
        [table.get(int(key), 0) if v else 0 for key, v in zip(q, q_valid)]
    )
    np.testing.assert_array_equal(got, expect)


def test_lookup_counts_runstart_layout_and_dup_rows(rng):
    k = 17
    seqs = [random_seq(rng, 70).upper() for _ in range(4)]
    table = _table_dict(seqs, k)
    r = PackedReads.from_ascii(seqs)
    # run-start layout: counts at first slot of each run, zeros elsewhere
    t_lo, t_hi, t_ct, _ = kmer.count_kmers_runs(r.words, r.lengths, k)

    q = np.fromiter(table.keys(), np.uint64)
    q_lo, q_hi = _split64(q)
    ones = jnp.ones(q.shape[0], bool)
    got = np.asarray(lookup.lookup_counts(q_lo, q_hi, ones, t_lo, t_hi, t_ct))
    np.testing.assert_array_equal(got, [table[int(x)] for x in q])

    # duplicate positive rows for one key must sum (merge_sorted_runs contract)
    t2_lo = jnp.concatenate([t_lo, q_lo[:1]])
    t2_hi = jnp.concatenate([t_hi, q_hi[:1]])
    t2_ct = jnp.concatenate([t_ct, jnp.asarray([5], jnp.int32)])
    got2 = np.asarray(lookup.lookup_counts(q_lo, q_hi, ones, t2_lo, t2_hi, t2_ct))
    expect2 = np.array([table[int(x)] for x in q])
    expect2[0] += 5
    np.testing.assert_array_equal(got2, expect2)


def test_lookup_counts_all_t_sentinel():
    # genuine all-T 32-mer == 0xFFFF...F == the dead-row sentinel bits
    seqs = [b"T" * 40, b"ACGT" * 10]
    table = _table_dict(seqs, 32)
    r = PackedReads.from_ascii(seqs)
    t_lo, t_hi, t_ct, _ = kmer.count_kmers_sorted(r.words, r.lengths, 32)
    key = (1 << 64) - 1
    q_lo, q_hi = _split64(np.array([key], np.uint64))
    got = int(
        lookup.lookup_counts(q_lo, q_hi, jnp.ones(1, bool), t_lo, t_hi, t_ct)[0]
    )
    assert got == table[key] == 9


@pytest.mark.parametrize("k,canonical", [(8, False), (21, False), (15, True)])
def test_kmer_hits_reads_per_window(rng, k, canonical):
    table_seqs = [random_seq(rng, 100).upper() for _ in range(5)]
    read_seqs = [
        table_seqs[0][10:50],  # fully contained
        random_seq(rng, 45).upper(),
        table_seqs[1][:20] + random_seq(rng, 20).upper(),
        random_seq(rng, k - 1).upper(),  # too short: zero windows
    ]
    keyf = _canon_key if canonical else oracle.as_2bit
    table = {}
    for s in table_seqs:
        for p in range(len(s) - k + 1):
            key = keyf(s[p : p + k])
            table[key] = table.get(key, 0) + 1

    tr = PackedReads.from_ascii(table_seqs)
    t_lo, t_hi, t_ct, _ = kmer.count_kmers_sorted(
        tr.words, tr.lengths, k, canonical=canonical
    )
    r = PackedReads.from_ascii(read_seqs)
    counts, valid = lookup.kmer_hits_reads(
        r.words, r.lengths, k, t_lo, t_hi, t_ct, canonical=canonical
    )
    counts, valid = np.asarray(counts), np.asarray(valid)
    for b, s in enumerate(read_seqs):
        nwin = max(len(s) - k + 1, 0)
        assert valid[b].sum() == nwin
        for p in range(nwin):
            assert valid[b, p]
            assert counts[b, p] == table.get(keyf(s[p : p + k]), 0), (b, p)
        assert (counts[b, nwin:] == 0).all()


def test_kmer_hits_reads_base_valid(rng):
    k = 9
    B, L = 4, 60
    a = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=(B, L))
    for _ in range(8):
        a[rng.integers(B), rng.integers(L)] = ord("N")
    lens = np.full(B, L, np.int32)
    words, _ = codec.encode_reads(jnp.asarray(a), jnp.asarray(lens))
    bv = codec.validity_mask(jnp.asarray(a), jnp.asarray(lens))

    table_seqs = [bytes(a[0]).replace(b"N", b"A")]
    tr = PackedReads.from_ascii(table_seqs)
    t_lo, t_hi, t_ct, _ = kmer.count_kmers_sorted(tr.words, tr.lengths, k)
    table = _table_dict(table_seqs, k)

    counts, valid = lookup.kmer_hits_reads(
        words, jnp.asarray(lens), k, t_lo, t_hi, t_ct, base_valid=bv
    )
    counts, valid = np.asarray(counts), np.asarray(valid)
    for b in range(B):
        s = bytes(a[b])
        for p in range(L - k + 1):
            win = s[p : p + k]
            if b"N" in win:
                assert not valid[b, p] and counts[b, p] == 0
            else:
                assert valid[b, p]
                assert counts[b, p] == table.get(oracle.as_2bit(win), 0)


def test_screen_reads_containment(rng):
    k = 11
    genome = random_seq(rng, 400).upper()
    reads = [
        genome[37 : 37 + 60],  # pure target read: full containment
        random_seq(rng, 60).upper(),  # random: ~0 containment
        genome[100:130] + random_seq(rng, 30).upper(),  # half/half
    ]
    g = PackedReads.from_ascii([genome])
    t_lo, t_hi, t_ct, _ = kmer.count_kmers_sorted(g.words, g.lengths, k)
    r = PackedReads.from_ascii(reads)
    n_win, n_solid = lookup.screen_reads(r.words, r.lengths, k, t_lo, t_hi, t_ct)
    n_win, n_solid = np.asarray(n_win), np.asarray(n_solid)
    table = _table_dict([genome], k)
    for b, s in enumerate(reads):
        wins = [s[p : p + k] for p in range(len(s) - k + 1)]
        assert n_win[b] == len(wins)
        assert n_solid[b] == sum(oracle.as_2bit(w) in table for w in wins)
    assert n_solid[0] == n_win[0]  # fully contained
    assert n_solid[1] <= 2  # random read: at most chance hits


def _naive_solid_prefix(s, k, table, min_count):
    nwin = len(s) - k + 1
    if nwin <= 0:
        return len(s)
    weak = [table.get(oracle.as_2bit(s[p : p + k]), 0) < min_count for p in range(nwin)]
    if not any(weak):
        return len(s)
    w = weak.index(True)
    return 0 if w == 0 else min(w + k - 1, len(s))


@pytest.mark.parametrize("min_count", [1, 2])
def test_solid_prefix_len(rng, min_count):
    k = 7
    genome = random_seq(rng, 300).upper()
    reads = [
        genome[5:55],  # all solid -> full length
        random_seq(rng, 50).upper(),  # likely weak at 0
        genome[20:50] + random_seq(rng, 20).upper(),  # weak mid-read
        random_seq(rng, k - 1).upper(),  # no windows -> full length
    ]
    g = PackedReads.from_ascii([genome, genome])  # counts of 2 everywhere
    t_lo, t_hi, t_ct, _ = kmer.count_kmers_sorted(g.words, g.lengths, k)
    table = {key: 2 * c for key, c in _table_dict([genome], k).items()}

    r = PackedReads.from_ascii(reads)
    counts, valid = lookup.kmer_hits_reads(r.words, r.lengths, k, t_lo, t_hi, t_ct)
    keep = np.asarray(
        lookup.solid_prefix_len(counts, valid, r.lengths, k, min_count=min_count)
    )
    for b, s in enumerate(reads):
        assert keep[b] == _naive_solid_prefix(s, k, table, min_count), b


def test_table_adapters(rng):
    k = 6
    seqs = [random_seq(rng, 80).upper() for _ in range(3)]
    table = _table_dict(seqs, k)
    r = PackedReads.from_ascii(seqs)
    hist = kmer.count_kmers_dense(r.words, r.lengths, k)
    lo, hi, ct = lookup.table_from_dense(hist)
    d = {
        (int(h) << 32) | int(l): int(c)
        for l, h, c in zip(np.asarray(lo), np.asarray(hi), np.asarray(ct))
    }
    assert d == table
    lo2, hi2, ct2 = lookup.table_from_dict(table)
    d2 = {
        (int(h) << 32) | int(l): int(c)
        for l, h, c in zip(np.asarray(lo2), np.asarray(hi2), np.asarray(ct2))
    }
    assert d2 == table
