"""Unitig assembly: naive-oracle fuzz, conservation, genome reconstruction.

Oracle = dict-based walk assembler implementing the same compacted-DBG
contract (maximal paths of simple edges; cycles broken at the minimum
packed key). The reference crate has no assembler — semantics are the
standard bcalm2-style unitig definition (see bitnuc_tpu/assemble.py).
"""

import numpy as np
import pytest

from bitnuc_tpu import PackedReads, assemble

CODE = {"A": 0, "C": 1, "G": 2, "T": 3}
BASES = "ACGT"


def packed(s: str) -> int:
    return sum(CODE[c] << (2 * i) for i, c in enumerate(s))


def naive_unitigs(kmers: set, k: int):
    """Walk assembler over a k-mer string set -> [(seq, circular)]."""
    def succs(x):
        return [x[1:] + b for b in BASES if x[1:] + b in kmers]

    def preds(y):
        return [b + y[:-1] for b in BASES if b + y[:-1] in kmers]

    nxt = {}
    for x in kmers:
        s = succs(x)
        if len(s) == 1 and len(preds(s[0])) == 1:
            nxt[x] = s[0]
    has_pred = set(nxt.values())
    out, visited = [], set()
    for s in sorted(x for x in kmers if x not in has_pred):
        seq, cur = s, s
        visited.add(s)
        while cur in nxt:
            cur = nxt[cur]
            seq += cur[-1]
            visited.add(cur)
        out.append((seq, False))
    rem = set(kmers) - visited
    while rem:  # pure cycles: break at min packed key (impl's tie-break)
        s = min(rem, key=packed)
        seq, cur = s, s
        rem.discard(s)
        while nxt[cur] != s:
            cur = nxt[cur]
            seq += cur[-1]
            rem.discard(cur)
        out.append((seq, True))
    return out


def keys_of(kmers, dtype=np.uint64):
    return np.sort(np.array([packed(x) for x in kmers], dtype=dtype))


def windows(seq: str, k: int):
    return [seq[i : i + k] for i in range(len(seq) - k + 1)]


def random_kmer_set(rng, k, mode):
    """Realistic graphs: chains from random sequences + noise + cycles."""
    kmers = set()
    if mode in ("seq", "mixed"):
        for _ in range(rng.integers(1, 4)):
            L = int(rng.integers(k, 6 * k))
            kmers |= set(windows("".join(rng.choice(list(BASES), L)), k))
    if mode in ("noise", "mixed"):
        for _ in range(int(rng.integers(0, 12))):
            kmers.add("".join(rng.choice(list(BASES), k)))
    if mode == "cycle":
        L = int(rng.integers(k + 1, 4 * k))
        g = "".join(rng.choice(list(BASES), L))
        kmers |= set(windows(g + g[: k - 1], k))
    return kmers


@pytest.mark.parametrize("mode", ["seq", "noise", "mixed", "cycle"])
def test_fuzz_vs_oracle(mode):
    rng = np.random.default_rng(hash(mode) % 2**31)
    for trial in range(12):
        k = int(rng.integers(3, 6))
        kmers = random_kmer_set(rng, k, mode)
        if not kmers:
            continue
        seqs, circ = assemble.unitigs_from_keys(keys_of(kmers), k)
        got = sorted((s.decode(), c) for s, c in zip(seqs, circ))
        want = sorted(naive_unitigs(kmers, k))
        assert got == want, (k, sorted(kmers))
        # Conservation: output windows == input k-mer set, each exactly once.
        cover = [w for s in seqs for w in windows(s.decode(), k)]
        assert sorted(cover) == sorted(kmers)


def test_empty_single_and_unsorted():
    assert assemble.unitigs_from_keys(np.array([], np.uint64), 5) == ([], [])
    seqs, circ = assemble.unitigs_from_keys(keys_of({"ACGTA"}), 5)
    assert seqs == [b"ACGTA"] and circ == [False]
    with pytest.raises(ValueError):
        assemble.unitigs_from_keys(np.array([3, 1], np.uint64), 3)


def _genome(rng, n):
    return "".join(rng.choice(list(BASES), n))


def _reads_covering(genome, rlen=100, step=7, wrap=False):
    src = genome + genome[: rlen - 1] if wrap else genome
    reads = [src[i : i + rlen] for i in range(0, len(src) - rlen + 1, step)]
    if not wrap and (len(genome) - rlen) % step:
        reads.append(genome[-rlen:])
    return [r.encode() for r in reads]


def test_genome_reconstruction_strand_specific():
    rng = np.random.default_rng(7)
    genome = _genome(rng, 400)
    reads = PackedReads.from_ascii(_reads_covering(genome))
    seqs, circ = assemble.assemble_reads(reads, 21, min_count=1, both_strands=False)
    assert [s.decode() for s in seqs] == [genome] and circ == [False]


def test_genome_reconstruction_both_strands():
    rng = np.random.default_rng(8)
    genome = _genome(rng, 350)
    reads = PackedReads.from_ascii(_reads_covering(genome))
    seqs, circ = assemble.assemble_reads(reads, 21, min_count=1)
    want = min(genome.encode(), assemble.rc_ascii(genome.encode()))
    assert seqs == [want] and circ == [False]


def test_circular_genome():
    rng = np.random.default_rng(9)
    genome = _genome(rng, 200)
    reads = PackedReads.from_ascii(_reads_covering(genome, wrap=True))
    for both in (False, True):
        seqs, circ = assemble.assemble_reads(reads, 21, min_count=1, both_strands=both)
        assert len(seqs) == 1 and circ == [True]
        s = seqs[0]
        assert len(s) == len(genome) + 20  # c + k - 1, wrap overlap repeated
        assert s[:20] == s[-20:]
        core = s[: len(genome)].decode()
        assert core in genome + genome or (
            both and core in (lambda r: r + r)(assemble.rc_ascii(genome.encode()).decode())
        )


def test_min_count_drops_error_branches():
    rng = np.random.default_rng(10)
    genome = _genome(rng, 300)
    good = _reads_covering(genome) * 2  # every genomic k-mer seen >= 2x
    bad = bytearray(good[3])
    bad[50] = ord("A") if bad[50] != ord("A") else ord("C")  # 1x error read
    reads = PackedReads.from_ascii(good + [bytes(bad)])
    seqs, _ = assemble.assemble_reads(reads, 21, min_count=2, both_strands=False)
    assert [s.decode() for s in seqs] == [genome]


def test_assemble_counts_matches_reads_path():
    rng = np.random.default_rng(11)
    genome = _genome(rng, 250)
    raw = _reads_covering(genome)
    counts = {}
    for r in raw:
        for w in windows(r.decode(), 21):
            key = min(packed(w), packed(w.translate(str.maketrans(BASES, "TGCA"))[::-1]))
            counts[key] = counts.get(key, 0) + 1
    via_counts = assemble.assemble_counts(counts, 21, min_count=1)
    via_reads = assemble.assemble_reads(
        PackedReads.from_ascii(raw), 21, min_count=1
    )
    assert via_counts == via_reads


def test_write_fasta(tmp_path):
    p = tmp_path / "utg.fa"
    assemble.write_fasta(p, [b"ACGT" * 30, b"TTTTT"], [False, True])
    text = p.read_text().splitlines()
    assert text[0] == ">utg000001 len=120 circ=no"
    assert text[1] == "ACGT" * 20 and text[2] == "ACGT" * 10
    assert text[3] == ">utg000002 len=5 circ=yes"


def _mutate(read: bytes, pos: int) -> bytes:
    b = bytearray(read)
    b[pos] = ord("A") if b[pos] != ord("A") else ord("C")
    return bytes(b)


def test_tip_clipping():
    rng = np.random.default_rng(21)
    genome = _genome(rng, 300)
    good = _reads_covering(genome)
    bad = _mutate(good[4], 79)  # error at the read's last base -> a tip
    reads = PackedReads.from_ascii(good + [bad])
    broken, _ = assemble.assemble_reads(reads, 21, min_count=1, both_strands=False)
    assert len(broken) > 1  # the tip shatters the contig without cleaning
    seqs, circ = assemble.assemble_reads(
        reads, 21, min_count=1, both_strands=False, clean=True
    )
    assert [s.decode() for s in seqs] == [genome] and circ == [False]


def test_bubble_popping():
    rng = np.random.default_rng(22)
    genome = _genome(rng, 300)
    good = _reads_covering(genome) * 2  # genomic coverage >= 2
    bad = _mutate(good[6], 40)  # mid-read error, k flank each side -> bubble
    reads = PackedReads.from_ascii(good + [bad])
    broken, _ = assemble.assemble_reads(reads, 21, min_count=1, both_strands=False)
    assert len(broken) > 1
    seqs, _ = assemble.assemble_reads(
        reads, 21, min_count=1, both_strands=False, clean=True
    )
    assert [s.decode() for s in seqs] == [genome]


def test_clean_both_strands():
    rng = np.random.default_rng(23)
    genome = _genome(rng, 260)
    good = _reads_covering(genome) * 2
    reads = PackedReads.from_ascii(
        good + [_mutate(good[4], 79), _mutate(good[6], 40)]
    )
    seqs, _ = assemble.assemble_reads(reads, 21, min_count=1, clean=True)
    want = min(genome.encode(), assemble.rc_ascii(genome.encode()))
    assert seqs == [want]


@pytest.mark.parametrize("mode", ["seq", "mixed", "cycle"])
def test_clean_fuzz_subset_and_fixed_point(mode):
    rng = np.random.default_rng(hash(("clean", mode)) % 2**31)
    for _ in range(8):
        k = int(rng.integers(3, 6))
        kmers = random_kmer_set(rng, k, mode)
        if not kmers:
            continue
        keys = keys_of(kmers)
        cts = rng.integers(1, 30, keys.shape[0]).astype(np.int64)
        ck, cc = assemble.clean_keys(keys, cts, k)
        assert set(ck.tolist()) <= set(keys.tolist())
        assert cc.shape == ck.shape
        ck2, _ = assemble.clean_keys(ck, cc, k)  # fixed point
        assert np.array_equal(ck2, ck)
        seqs, circ = assemble.unitigs_from_keys(ck, k)  # still a valid DBG
        cover = [w for s in seqs for w in windows(s.decode(), k)]
        assert sorted(packed(w) for w in cover) == sorted(ck.tolist())


@pytest.mark.parametrize("mode", ["seq", "noise", "mixed", "cycle"])
def test_unitig_graph_links_vs_overlap_oracle(mode):
    # Edge x->y exists iff both k-mers are in the set and overlap k-1; at
    # unitig level that is exactly: tail (k-1)-suffix of a == head
    # (k-1)-prefix of b. So the full expected link set is enumerable from
    # the unitig sequences alone.
    rng = np.random.default_rng(hash(("gfa", mode)) % 2**31)
    for _ in range(8):
        k = int(rng.integers(3, 6))
        kmers = random_kmer_set(rng, k, mode)
        if not kmers:
            continue
        seqs, circ, links = assemble.unitig_graph(keys_of(kmers), k)
        want = sorted(
            (i, j)
            for i, a in enumerate(seqs)
            for j, b in enumerate(seqs)
            if a[-(k - 1):] == b[: k - 1]
        )
        assert links == want, (k, sorted(kmers))
        # circular unitigs carry their self-link
        for i, c in enumerate(circ):
            if c:
                assert (i, i) in links


def test_write_gfa(tmp_path):
    p = tmp_path / "g.gfa"
    assemble.write_gfa(p, [b"ACGTA", b"GTACG"], [(0, 1)], 4)
    lines = p.read_text().splitlines()
    assert lines[0] == "H\tVN:Z:1.0"
    assert lines[1] == "S\tutg000001\tACGTA\tLN:i:5"
    assert lines[2] == "S\tutg000002\tGTACG\tLN:i:5"
    assert lines[3] == "L\tutg000001\t+\tutg000002\t+\t3M"


def test_least_rotation_matches_naive():
    # Booth's O(L) least rotation == brute-force min over all rotations
    rng = np.random.default_rng(2026)
    for _ in range(200):
        n = int(rng.integers(1, 40))
        s = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), n))
        naive = min(s[i:] + s[:i] for i in range(len(s)))
        assert assemble._least_rotation(s) == naive, s
    # repetitive/periodic worst cases
    for s in (b"AAAA", b"ACAC", b"ACACA", b"TGATGATGA", b"CGCGCGC"):
        naive = min(s[i:] + s[:i] for i in range(len(s)))
        assert assemble._least_rotation(s) == naive, s


def test_write_gfa_circular_tag(tmp_path):
    p = tmp_path / "g.gfa"
    assemble.write_gfa(p, [b"ACGTA", b"GTACG"], [(1, 1)], 4,
                       circular=[False, True])
    lines = p.read_text().splitlines()
    assert lines[1] == "S\tutg000001\tACGTA\tLN:i:5"
    assert lines[2] == "S\tutg000002\tGTACG\tLN:i:5\tCR:i:1"


def test_assemble_reads_sharded_spectrum_equals_local():
    """Mesh-built spectrum (count_kmers_sorted_sharded) feeding the host
    compaction must reproduce the local assemble_reads output exactly."""
    import jax
    import pytest

    from bitnuc_tpu.sequence import PackedReads
    from bitnuc_tpu.ops.codec import validity_mask

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = jax.make_mesh((8, ), ("data", ))
    rng = np.random.default_rng(31)
    genome = rng.choice(np.frombuffer(b"ACGT", np.uint8), 5000)
    reads_arr = []
    for rep in range(3):
        for s in range(0, 4900, 10):
            reads_arr.append(genome[s : s + 100].tobytes())
    # 1471 reads: NOT a device multiple (exercises shard padding)
    pr = PackedReads.from_ascii(reads_arr)
    local = assemble.assemble_reads(pr, 21, min_count=2)
    sharded = assemble.assemble_reads(pr, 21, min_count=2, mesh=mesh)
    assert sharded == local
    assert len(local[0]) >= 1
    top = local[0][0]
    g = genome.tobytes()
    assert top in g or assemble.rc_ascii(top) in g

    # with Ns + base_valid through the sharded path
    noisy = [bytearray(r) for r in reads_arr[:400]]
    for i, r in enumerate(noisy):
        if i % 7 == 0:
            r[i % len(r)] = ord("N")
    noisy = [bytes(r) for r in noisy]
    pn = PackedReads.from_ascii(noisy, validate=False)
    ascii_arr = np.vstack(
        [np.frombuffer(r.ljust(112, b"\0"), np.uint8) for r in noisy]
    )
    bv = np.asarray(validity_mask(ascii_arr, pn.lengths))
    local_n = assemble.assemble_reads(pn, 21, min_count=2, base_valid=bv)
    shard_n = assemble.assemble_reads(pn, 21, min_count=2, base_valid=bv,
                                      mesh=mesh)
    assert shard_n == local_n


def test_native_graph_matches_numpy(rng):
    """The native edge builder / merge join / list rank must reproduce the
    numpy graph field-for-field (incl. cycles broken at min-key nodes)."""
    from conftest import random_seq

    from bitnuc_tpu import native

    if not (native.available() or native.build()):
        pytest.skip("native lib not built")
    k = 9
    g = random_seq(rng, 3000).upper()
    codes = ((np.frombuffer(g, np.uint8) >> 1) ^ (np.frombuffer(g, np.uint8) >> 2)) & 3
    n = len(g) - k + 1
    acc = np.zeros(n, np.uint64)
    for j in range(k):
        acc |= codes[j : n + j].astype(np.uint64) << np.uint64(2 * j)
    # a circular chunk: keys of a small cycle (rotations of one 40-mer)
    circ = random_seq(rng, 40).upper()
    cc = ((np.frombuffer(circ + circ[:k - 1], np.uint8) >> 1)
          ^ (np.frombuffer(circ + circ[:k - 1], np.uint8) >> 2)) & 3
    cacc = np.zeros(40, np.uint64)
    for j in range(k):
        cacc |= cc[j : 40 + j].astype(np.uint64) << np.uint64(2 * j)
    keys = np.unique(np.concatenate([acc, cacc]))
    g1 = assemble._Graph(keys, k)  # native fast path
    orig = (native.graph_edges, native.merge_join, native.list_rank)
    native.graph_edges = lambda *a, **kw: None
    native.merge_join = lambda *a, **kw: None
    native.list_rank = lambda *a, **kw: None
    try:
        g2 = assemble._Graph(keys, k)  # pure numpy
    finally:
        native.graph_edges, native.merge_join, native.list_rank = orig
    for f in ("outdeg", "indeg", "nxt", "prev", "rank", "start",
              "circ_start", "succ_ok", "succ_idx"):
        np.testing.assert_array_equal(
            np.asarray(getattr(g1, f)), np.asarray(getattr(g2, f)), err_msg=f
        )
    m = np.asarray(g1.outdeg) >= 1
    np.testing.assert_array_equal(g1.succ1[m], g2.succ1[m])
    m = np.asarray(g1.indeg) == 1
    np.testing.assert_array_equal(g1.pred1[m], g2.pred1[m])


def _genome_reads(seed, glen=500, rlen=90, step=5):
    rng = np.random.default_rng(seed)
    genome = _genome(rng, glen)
    return genome, PackedReads.from_ascii(_reads_covering(genome, rlen, step))


@pytest.mark.parametrize("both_strands", [False, True])
def test_host_spectrum_equals_device(both_strands):
    """native.spectrum (and its numpy twin) must be bit-identical to the
    device count_kmers_runs spectrum — the engine='host' contract."""
    from bitnuc_tpu import native
    from bitnuc_tpu.ops import kmer as kmer_ops

    _, reads = _genome_reads(33)
    k = 21
    lo, hi, cts, _ = kmer_ops.count_kmers_runs(
        reads.words, reads.lengths, k, canonical=both_strands
    )
    dlo, dhi, dct = kmer_ops.compact_runs(lo, hi, cts)
    dkeys = (dhi.astype(np.uint64) << np.uint64(32)) | dlo.astype(np.uint64)
    for force_np in (False, True):
        if force_np:
            hk, hc = native._np_spectrum(
                np.asarray(reads.words), np.asarray(reads.lengths), k,
                both_strands, None,
            )
        else:
            hk, hc = native.spectrum(
                np.asarray(reads.words), np.asarray(reads.lengths), k,
                canonical=both_strands,
            )
        assert np.array_equal(hk, dkeys), f"keys (numpy={force_np})"
        assert np.array_equal(hc.astype(np.int64), dct.astype(np.int64))


def test_host_spectrum_base_valid():
    from bitnuc_tpu import native
    from bitnuc_tpu.ops import kmer as kmer_ops

    rng = np.random.default_rng(34)
    genome, reads = _genome_reads(34, glen=300, rlen=60, step=3)
    B, W = np.asarray(reads.words).shape
    L = 60
    bv = rng.random((B, L)) > 0.05  # ~5% masked bases
    k = 15
    lo, hi, cts, _ = kmer_ops.count_kmers_runs(
        reads.words, reads.lengths, k, canonical=True,
        base_valid=np.ascontiguousarray(bv),
    )
    dlo, dhi, dct = kmer_ops.compact_runs(lo, hi, cts)
    dkeys = (dhi.astype(np.uint64) << np.uint64(32)) | dlo.astype(np.uint64)
    hk, hc = native.spectrum(
        np.asarray(reads.words), np.asarray(reads.lengths), k,
        canonical=True, valid=bv,
    )
    assert np.array_equal(hk, dkeys)
    assert np.array_equal(hc.astype(np.int64), dct.astype(np.int64))
    nk, nc = native._np_spectrum(
        np.asarray(reads.words), np.asarray(reads.lengths), k, True, bv
    )
    assert np.array_equal(nk, dkeys) and np.array_equal(nc, hc)


def test_host_spectrum_ragged_lengths():
    from bitnuc_tpu import native
    from bitnuc_tpu.ops import kmer as kmer_ops

    rng = np.random.default_rng(35)
    from conftest import random_seq

    seqs = [random_seq(rng, n).upper() for n in (64, 21, 20, 1, 33, 90)]
    reads = PackedReads.from_ascii(seqs)
    k = 21
    lo, hi, cts, _ = kmer_ops.count_kmers_runs(
        reads.words, reads.lengths, k, canonical=True
    )
    dlo, dhi, dct = kmer_ops.compact_runs(lo, hi, cts)
    dkeys = (dhi.astype(np.uint64) << np.uint64(32)) | dlo.astype(np.uint64)
    hk, hc = native.spectrum(
        np.asarray(reads.words), np.asarray(reads.lengths), k, canonical=True
    )
    assert np.array_equal(hk, dkeys)
    assert np.array_equal(hc.astype(np.int64), dct.astype(np.int64))


@pytest.mark.parametrize("both_strands", [False, True])
def test_assemble_engine_host_equals_device(both_strands):
    genome, reads = _genome_reads(36, glen=420)
    a = assemble.assemble_reads(
        reads, 21, min_count=1, both_strands=both_strands, engine="device"
    )
    b = assemble.assemble_reads(
        reads, 21, min_count=1, both_strands=both_strands, engine="host"
    )
    assert a == b


def test_assemble_engine_host_min_count():
    # duplicate coverage + one error read: min_count=2 must drop the
    # error k-mers identically on both engines
    genome, reads = _genome_reads(37, glen=400, rlen=80, step=4)
    arr = np.asarray(
        PackedReads.from_ascii(_reads_covering(genome, 80, 4)).words
    )
    import jax.numpy as jnp

    words2 = np.concatenate([np.asarray(reads.words)] * 2)
    lens2 = np.concatenate([np.asarray(reads.lengths)] * 2)
    from bitnuc_tpu.sequence import PackedReads as PR

    r2 = PR(words=jnp.asarray(words2), lengths=jnp.asarray(lens2))
    a = assemble.assemble_reads(r2, 21, min_count=2, engine="device")
    b = assemble.assemble_reads(r2, 21, min_count=2, engine="host")
    assert a == b
    want = min(genome.encode(), assemble.rc_ascii(genome.encode()))
    assert b[0] == [want]


def test_expand_both_strands_even_k_palindromes():
    """Even k admits palindromic k-mers (rc(x) == x): the searchsorted
    merge must still collapse them to one row (round-5 regression
    coverage for the sorted-half expansion)."""
    from bitnuc_tpu import oracle

    k = 4
    seqs = [b"ACGTACGTAC", b"AATTGGCCAA", b"TTTTACGT"]
    d = {}
    for s in seqs:
        for key, c in oracle.count_kmers(s, k).items():
            rc = int(
                assemble._rc_keys(np.array([key], np.uint64), k)[0]
            )
            canon = min(key, rc)
            d[canon] = d.get(canon, 0) + c
    keys = np.array(sorted(d), dtype=np.uint64)
    cts = np.array([d[int(x)] for x in keys], dtype=np.int64)
    ek, ec = assemble._expand_both_strands(keys, cts, k)
    assert np.all(ek[1:] > ek[:-1])  # strictly ascending, deduped
    # palindromes present exactly once with their original count; every
    # non-palindrome present with its twin
    want = {}
    for key, c in zip(keys.tolist(), cts.tolist()):
        want[key] = c
        want[int(assemble._rc_keys(np.array([key], np.uint64), k)[0])] = c
    got = dict(zip(ek.tolist(), ec.tolist()))
    assert got == want


def test_expand_both_strands_noncanonical_odd_k():
    """Round-5 review regression: a NON-canonical sorted-unique input that
    already contains both strands of some k-mer (legal assemble_keys
    input) must still dedup at odd k — the skip-dedup proof only holds
    for canonical sets."""
    k = 5
    x = np.uint64(0b0110110001)  # arbitrary 5-mer
    rc = assemble._rc_keys(np.array([x], np.uint64), k)[0]
    assert rc != x
    keys = np.unique(np.array([0, int(x), int(rc), 1023], np.uint64))
    cts = np.arange(1, keys.shape[0] + 1, dtype=np.int64)
    ek, ec = assemble._expand_both_strands(keys, cts, k)
    assert np.all(ek[1:] > ek[:-1]), "duplicate keys leaked through"
    # both strands of every input key present exactly once
    want_keys = set(keys.tolist())
    for key in keys.tolist():
        want_keys.add(int(assemble._rc_keys(np.array([key], np.uint64), k)[0]))
    assert set(ek.tolist()) == want_keys
    # and the full assembly entry point accepts it
    seqs, circ = assemble.assemble_keys(keys, k, both_strands=True)
    assert seqs


def test_expand_both_strands_collision_keeps_own_count():
    """Both strands of a k-mer present with DIFFERENT counts: each key
    keeps its OWN input count (A-copy-first merge — the historical stable
    concat+sort semantics, pinned by the round-5 soak)."""
    k = 5
    x = np.uint64(0b0110110001)
    rc = int(assemble._rc_keys(np.array([x], np.uint64), k)[0])
    assert rc != int(x)
    lo_key, hi_key = sorted([int(x), rc])
    keys = np.array([lo_key, hi_key], np.uint64)
    cts = np.array([7, 3], np.int64)
    ek, ec = assemble._expand_both_strands(keys, cts, k)
    got = dict(zip(ek.tolist(), ec.tolist()))
    assert got == {lo_key: 7, hi_key: 3}
