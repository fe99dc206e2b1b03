"""filters.trim_bounds / filter_reads / filter_fastq vs a per-read python
oracle (Trimmomatic LEADING/TRAILING + mean-quality/length/N filters)."""

import numpy as np
import pytest

from conftest import random_seq

from bitnuc_tpu import filters


def _oracle_trim(qual, trim_q):
    q = [b - 33 for b in qual]
    start, end = 0, len(q)
    while start < end and q[start] < trim_q:
        start += 1
    while end > start and q[end - 1] < trim_q:
        end -= 1
    return start, end


def _rect(seqs, quals):
    lens = np.array([len(s) for s in seqs], np.int64)
    L = max(int(lens.max()), 1)
    a = np.zeros((len(seqs), L), np.uint8)
    q = np.zeros((len(seqs), L), np.uint8)
    for i, (s, qq) in enumerate(zip(seqs, quals)):
        a[i, : len(s)] = np.frombuffer(s, np.uint8)
        q[i, : len(qq)] = np.frombuffer(qq, np.uint8)
    return a, q, lens


def test_trim_bounds_vs_oracle(rng):
    seqs, quals = [], []
    for n in rng.integers(5, 60, 40):
        seqs.append(random_seq(rng, int(n)).upper())
        quals.append(bytes(rng.integers(33, 75, int(n)).astype(np.uint8)))
    quals[0] = b"#" * len(seqs[0])  # all-bad read -> empty span
    a, q, lens = _rect(seqs, quals)
    start, end = filters.trim_bounds(q, lens, 20)
    for i, qq in enumerate(quals):
        s0, e0 = _oracle_trim(qq, 20)
        span = (int(end[i]) - int(start[i]))
        assert span == e0 - s0, i
        if e0 > s0:
            assert (int(start[i]), int(end[i])) == (s0, e0), i


def test_filter_reads_mean_q_and_n(rng):
    seqs = [b"ACGTNNACGT", b"ACGTACGTAA", b"AC"]
    quals = [b"I" * 10, b"$" * 10, b"II"]  # I=40, $=3
    a, q, lens = _rect(seqs, quals)
    keep, start, end = filters.filter_reads(
        a, q, lens, min_len=3, min_mean_q=20, max_n=1
    )
    # read 0: quality fine but 2 Ns > 1 -> drop; read 1: mean q 3 < 20 ->
    # drop; read 2: len 2 < 3 -> drop
    assert list(keep) == [False, False, False]
    keep2, _, _ = filters.filter_reads(a, q, lens, max_n=2)
    assert list(keep2) == [True, True, True]


def test_filter_fastq_end_to_end(tmp_path):
    recs = [
        (b"good", b"ACGTACGTACGT", b"IIIIIIIIIIII"),
        (b"trimme", b"TTACGTACGTAA", b"##IIIIIIII##"),  # trims to ACGTACGT
        (b"short", b"ACGT", b"IIII"),
        (b"lowq", b"ACGTACGTACGT", b"############"),
    ]
    p = tmp_path / "in.fq"
    with open(p, "wb") as f:
        for n, s, q in recs:
            f.write(b"@%s\n%s\n+\n%s\n" % (n, s, q))
    out = tmp_path / "out.fq"
    summary = filters.filter_fastq(
        p, out, min_len=6, min_mean_q=20, trim_q=20
    )
    assert summary == {
        "reads_in": 4,
        "reads_out": 2,
        "bases_in": 40,
        "bases_out": 20,
    }
    lines = out.read_bytes().splitlines()
    assert lines[0:4] == [b"@good", b"ACGTACGTACGT", b"+", b"IIIIIIIIIIII"]
    assert lines[4:8] == [b"@trimme", b"ACGTACGT", b"+", b"IIIIIIII"]


def test_filter_cli(tmp_path, capsys):
    p = tmp_path / "in.fq"
    p.write_bytes(b"@a\nACGTACGT\n+\nIIIIIIII\n@b\nAC\n+\nII\n")
    out = tmp_path / "out.fq"
    from bitnuc_tpu import cli

    assert cli.main(
        ["filter", str(p), "-o", str(out), "--min-len", "5"]
    ) == 0
    assert out.read_bytes() == b"@a\nACGTACGT\n+\nIIIIIIII\n"


def test_filtered_output_feeds_pipeline(tmp_path):
    # the filtered file is itself valid pipeline input
    from bitnuc_tpu import pipeline

    p = tmp_path / "in.fq"
    p.write_bytes(b"@a\nACGTNACGT\n+\nIIII#IIII\n")
    out = tmp_path / "out.fq"
    filters.filter_fastq(p, out, trim_q=10)  # N has qual '#'=2 -> stays
    st = pipeline.count_fastq(str(out), 4, on_invalid="skip")
    assert int(np.asarray(st).sum()) == 2  # ACGT at both ends, N-windows skipped


def test_filter_fastq_paired(tmp_path):
    r1 = tmp_path / "r1.fq"
    r2 = tmp_path / "r2.fq"
    # pair 0: both good; pair 1: R2 too short after trim -> pair dropped;
    # pair 2: R1 low quality -> pair dropped
    r1.write_bytes(
        b"@p0/1\nACGTACGT\n+\nIIIIIIII\n"
        b"@p1/1\nACGTACGT\n+\nIIIIIIII\n"
        b"@p2/1\nACGTACGT\n+\n########\n"
    )
    r2.write_bytes(
        b"@p0/2\nTTGGCCAA\n+\nIIIIIIII\n"
        b"@p1/2\nTTGG\n+\n##II\n"
        b"@p2/2\nTTGGCCAA\n+\nIIIIIIII\n"
    )
    o1, o2 = tmp_path / "o1.fq", tmp_path / "o2.fq"
    summary = filters.filter_fastq_paired(
        r1, r2, o1, o2, min_len=3, min_mean_q=20, trim_q=20
    )
    assert summary == {"pairs_in": 3, "pairs_out": 1}
    assert o1.read_bytes() == b"@p0/1\nACGTACGT\n+\nIIIIIIII\n"
    assert o2.read_bytes() == b"@p0/2\nTTGGCCAA\n+\nIIIIIIII\n"


def test_filter_fastq_paired_mismatch(tmp_path):
    r1 = tmp_path / "r1.fq"
    r2 = tmp_path / "r2.fq"
    r1.write_bytes(b"@a/1\nACGT\n+\nIIII\n@b/1\nACGT\n+\nIIII\n")
    r2.write_bytes(b"@a/2\nACGT\n+\nIIII\n")
    with pytest.raises(ValueError):
        filters.filter_fastq_paired(
            r1, r2, tmp_path / "o1.fq", tmp_path / "o2.fq"
        )


def test_filter_cli_paired(tmp_path, capsys):
    r1 = tmp_path / "r1.fq"
    r2 = tmp_path / "r2.fq"
    r1.write_bytes(b"@a/1\nACGTACGT\n+\nIIIIIIII\n")
    r2.write_bytes(b"@a/2\nTTGGCCAA\n+\nIIIIIIII\n")
    from bitnuc_tpu import cli

    o1, o2 = tmp_path / "o1.fq", tmp_path / "o2.fq"
    assert cli.main(
        ["filter", str(r1), "-o", str(o1), "--paired", str(r2),
         "--out2", str(o2), "--min-len", "5"]
    ) == 0
    assert o1.read_bytes().startswith(b"@a/1") and o2.read_bytes().startswith(b"@a/2")


def _oracle_adapter(seq, adapter, e=0.1, min_ov=3):
    n, m = len(seq), len(adapter)
    s = seq.upper()
    for p in range(n):
        ov = min(m, n - p)
        if ov < min_ov:
            break
        mm = sum(1 for j in range(ov) if s[p + j] != adapter[j])
        if mm <= int(ov * e):
            return p
    return n


def test_adapter_positions_vs_oracle(rng):
    adapter = b"AGATCGGAAGAGC"
    seqs = []
    for n in rng.integers(10, 80, 60):
        s = bytearray(random_seq(rng, int(n)).upper())
        r = rng.random()
        if r < 0.4:  # embed the adapter (possibly truncated) at a position
            p = int(rng.integers(0, max(int(n) - 3, 1)))
            frag = adapter[: int(n) - p]
            s[p : p + len(frag)] = frag
        elif r < 0.6:  # embed with one mismatch
            p = int(rng.integers(0, max(int(n) - 10, 1)))
            frag = bytearray(adapter[: int(n) - p])
            if len(frag) >= 10:
                frag[3] = ord(b"A") if frag[3] != ord(b"A") else ord(b"C")
            s[p : p + len(frag)] = frag
        seqs.append(bytes(s))
    lens = np.array([len(s) for s in seqs], np.int64)
    L = int(lens.max())
    a = np.zeros((len(seqs), L), np.uint8)
    for i, s in enumerate(seqs):
        a[i, : len(s)] = np.frombuffer(s, np.uint8)
    got = filters.adapter_positions(a, lens, adapter)
    for i, s in enumerate(seqs):
        assert int(got[i]) == _oracle_adapter(s, adapter), (i, s)


def test_filter_fastq_adapter_end_to_end(tmp_path):
    adapter = b"AGATCGGAAGAGC"
    p = tmp_path / "in.fq"
    read = b"ACGTACGTACGTACGT" + adapter[:8]  # read-through into adapter
    p.write_bytes(b"@a\n%s\n+\n%s\n" % (read, b"I" * len(read)))
    out = tmp_path / "out.fq"
    summary = filters.filter_fastq(p, out, adapter=adapter)
    assert summary["bases_out"] == 16
    assert out.read_bytes() == b"@a\nACGTACGTACGTACGT\n+\nIIIIIIIIIIIIIIII\n"


def test_count_cli_min_count(tmp_path, capsys):
    p = tmp_path / "c.fa"
    p.write_bytes(b">x\nACGTACGTACGT\n")
    from bitnuc_tpu import cli

    assert cli.main(["count", str(p), "-k", "4", "--min-count", "3"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out == ["ACGT\t3"]


def test_complexity_fraction_semantics():
    from bitnuc_tpu.filters import complexity_fraction

    a = np.zeros((3, 20), np.uint8)
    a[0, :] = ord("A")                       # homopolymer -> 0.0
    a[1, :] = np.tile([ord("A"), ord("C")], 10)  # alternating -> 1.0
    a[2, :10] = ord("G")                     # only 1 spanned base -> 1.0
    start = np.array([0, 0, 3], np.int64)
    end = np.array([20, 20, 4], np.int64)
    frac = complexity_fraction(a, start, end)
    assert frac[0] == 0.0 and frac[1] == 1.0 and frac[2] == 1.0
    # span restriction: positions outside [start, end) don't count
    a[0, 10:] = ord("T")
    frac = complexity_fraction(a, np.array([0]*1+[0, 3], np.int64)[:3],
                               np.array([10, 20, 4], np.int64))
    assert frac[0] == 0.0  # the A->T transition at 9->10 is outside


def test_triplet_entropy_bounds(rng):
    from bitnuc_tpu.filters import triplet_entropy

    homo = b"A" * 60
    rand = random_seq(rng, 2000).upper()
    withn = b"ACGT" * 5 + b"N" + b"ACGT" * 5
    L = max(len(homo), len(rand), len(withn))
    a = np.zeros((3, L), np.uint8)
    for i, s in enumerate((homo, rand, withn)):
        a[i, : len(s)] = np.frombuffer(s, np.uint8)
    start = np.zeros(3, np.int64)
    end = np.array([len(homo), len(rand), len(withn)], np.int64)
    h = triplet_entropy(a, start, end)
    assert h[0] == 0.0
    assert 5.0 < h[1] <= 6.0  # random ~ uniform over 64 triplets
    # oracle check on the N-containing read: count valid windows by hand
    import collections, math
    cnt = collections.Counter()
    s = withn
    for p in range(len(s) - 2):
        win = s[p : p + 3]
        if b"N" not in win:
            cnt[bytes(win)] += 1
    n = sum(cnt.values())
    want = -sum(c / n * math.log2(c / n) for c in cnt.values())
    assert abs(h[2] - want) < 1e-9


def test_filter_reads_min_complexity(rng):
    from bitnuc_tpu.filters import filter_reads

    good = random_seq(rng, 100).upper()
    poly = b"T" * 100
    a = np.zeros((2, 100), np.uint8)
    a[0] = np.frombuffer(good, np.uint8)
    a[1] = np.frombuffer(poly, np.uint8)
    q = np.full((2, 100), ord("I"), np.uint8)
    lens = np.array([100, 100], np.int64)
    keep, _, _ = filter_reads(a, q, lens, min_complexity=0.3)
    assert keep.tolist() == [True, False]
    keep, _, _ = filter_reads(a, q, lens)  # off by default
    assert keep.tolist() == [True, True]


def test_filter_reads_min_entropy(rng):
    from bitnuc_tpu.filters import filter_reads

    good = random_seq(rng, 120).upper()
    dimer = b"AC" * 60  # transition fraction 1.0 but entropy ~1 bit
    a = np.zeros((2, 120), np.uint8)
    a[0] = np.frombuffer(good, np.uint8)
    a[1] = np.frombuffer(dimer, np.uint8)
    q = np.full((2, 120), ord("I"), np.uint8)
    lens = np.array([120, 120], np.int64)
    # the transition filter misses the dimer repeat; entropy catches it
    keep, _, _ = filter_reads(a, q, lens, min_complexity=0.3)
    assert keep.tolist() == [True, True]
    keep, _, _ = filter_reads(a, q, lens, min_entropy=2.0)
    assert keep.tolist() == [True, False]


def test_filter_fastq_gz_native_path(tmp_path, rng):
    """filter_fastq over a .gz input through the native full-record
    scanner: output identical to the plain-file run."""
    import gzip

    recs = []
    for i in range(40):
        n = int(rng.integers(30, 90))
        s = random_seq(rng, n).upper()
        q = bytes(33 + rng.integers(0, 40, n).astype(np.uint8))
        recs.append(b"@g%d\n%s\n+\n%s\n" % (i, s, q))
    raw = b"".join(recs)
    p_plain = tmp_path / "f.fq"
    p_gz = tmp_path / "f.fq.gz"
    p_plain.write_bytes(raw)
    p_gz.write_bytes(gzip.compress(raw))
    o1, o2 = tmp_path / "o1.fq", tmp_path / "o2.fq"
    kw = dict(min_len=35, trim_q=8, min_mean_q=12, adapter=b"AGATCGGA")
    s1 = filters.filter_fastq(str(p_plain), str(o1), **kw)
    s2 = filters.filter_fastq(str(p_gz), str(o2), **kw)
    assert s1 == s2
    assert o1.read_bytes() == o2.read_bytes()
