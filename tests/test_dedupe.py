"""mark_duplicates / dedupe_reads vs a python-dict oracle, plus edge cases:
first-occurrence-wins ordering, length-only differences, prefix reads whose
shared words are identical, empty batches."""

import numpy as np
import pytest

from conftest import random_seq

from bitnuc_tpu.ops.dedupe import dedupe_reads, mark_duplicates
from bitnuc_tpu.sequence import PackedReads


def _oracle(seqs):
    first_idx = {}
    counts = {}
    for i, s in enumerate(seqs):
        if s not in first_idx:
            first_idx[s] = i
        counts[s] = counts.get(s, 0) + 1
    keep = [first_idx[s] == i for i, s in enumerate(seqs)]
    cnt = [counts[s] if keep[i] else 0 for i, s in enumerate(seqs)]
    return keep, cnt


def _check(seqs):
    reads = PackedReads.from_ascii(seqs)
    keep, counts = dedupe_reads(reads)
    ek, ec = _oracle(seqs)
    assert list(np.asarray(keep)) == ek
    assert list(np.asarray(counts)) == ec


def test_dedupe_random_with_duplicates(rng):
    base = [random_seq(rng, int(n)).upper() for n in rng.integers(20, 90, 25)]
    seqs = base + [base[i] for i in rng.integers(0, 25, 40)]
    order = rng.permutation(len(seqs))
    _check([seqs[i] for i in order])


def test_dedupe_first_occurrence_wins():
    seqs = [b"ACGTACGT", b"TTTT", b"ACGTACGT", b"TTTT", b"TTTT"]
    reads = PackedReads.from_ascii(seqs)
    keep, counts = mark_duplicates(reads.words, reads.lengths)
    assert list(np.asarray(keep)) == [True, True, False, False, False]
    assert list(np.asarray(counts)) == [2, 3, 0, 0, 0]


def test_dedupe_prefix_not_equal():
    # a read that is a strict prefix shares every padded word with the longer
    # read up to its own span — lengths must separate them
    seqs = [b"ACGTACGTACGTACGTAC", b"ACGTACGTACGTACGTACGT", b"ACGTACGTACGTACGTAC"]
    _check(seqs)


def test_dedupe_all_unique_and_all_same(rng):
    uniq = [random_seq(rng, 33).upper() for _ in range(10)]
    _check(uniq)
    _check([b"ACGT" * 9] * 7)


def test_dedupe_empty_batch():
    keep, counts = mark_duplicates(
        np.zeros((0, 3), np.uint32), np.zeros((0,), np.int32)
    )
    assert keep.shape == (0,) and counts.shape == (0,)


def test_dedupe_cli(tmp_path, capsys):
    seqs = [b"ACGTACGT", b"TTTTCCCC", b"ACGTACGT"]
    p = tmp_path / "d.fq"
    with open(p, "wb") as f:
        for i, s in enumerate(seqs):
            f.write(b"@r%d\n%s\n+\n%s\n" % (i, s, b"I" * len(s)))
    from bitnuc_tpu import cli

    assert cli.main(["dedupe", str(p)]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out == [
        ">r0 count=2", "ACGTACGT",
        ">r1 count=1", "TTTTCCCC",
    ]


def test_stats_cli_and_pipeline(tmp_path, capsys):
    import json

    fa = tmp_path / "s.fa"
    fa.write_bytes(b">a\nACGT\n>b\nGGCC\nGG\n")
    from bitnuc_tpu import cli, pipeline

    assert cli.main(["stats", str(fa)]) == 0
    got = json.loads(capsys.readouterr().out)
    assert got["reads"] == 2 and got["bases"] == 10
    assert (got["a"], got["c"], got["g"], got["t"]) == (1, 3, 5, 1)
    assert got["gc_pct"] == 80.0
    assert got["min_len"] == 4 and got["max_len"] == 6 and got["mean_len"] == 5.0
    assert got["n50"] == 6 and got["l50"] == 1

    fq = tmp_path / "s.fq"
    fq.write_bytes(b"@r\nACGTACGT\n+\nIIIIIIII\n")
    st = pipeline.stats(fq)
    assert st["gc_pct"] == 50.0
    assert st["n50"] == 8 and st["l50"] == 1


def test_stats_n50(tmp_path):
    # lengths [4,3,3,2,2,2], 16 bases: desc cumsum 4,7,10 -> N50=3, L50=3
    fa = tmp_path / "n.fa"
    recs = [b"ACGT", b"ACG", b"TTT", b"AC", b"GG", b"TT"]
    fa.write_bytes(b"".join(b">r%d\n%s\n" % (i, s) for i, s in enumerate(recs)))
    from bitnuc_tpu import pipeline

    st = pipeline.stats(fa)
    assert st["bases"] == 16
    assert st["n50"] == 3 and st["l50"] == 3
