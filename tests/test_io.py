"""I/O subsystem: checkpoint roundtrip, FASTA/FASTQ ingestion."""

import gzip

import numpy as np
import pytest

from bitnuc_tpu import io as bnio
from bitnuc_tpu.sequence import PackedReads

from conftest import random_seq


def test_checkpoint_roundtrip(tmp_path, rng):
    seqs = [random_seq(rng, n) for n in (5, 64, 200)]
    reads = PackedReads.from_ascii(seqs)
    p = tmp_path / "ckpt.npz"
    bnio.save_packed(p, reads)
    back = bnio.load_packed(p)
    assert np.array_equal(np.asarray(back.words), np.asarray(reads.words))
    assert np.array_equal(np.asarray(back.lengths), np.asarray(reads.lengths))
    assert back.to_ascii() == [s.upper() for s in seqs]


def test_read_fasta_multiline(tmp_path):
    fa = b">r1 desc\nACGT\nACGT\n>r2\nTTTT\n>empty\n>r3\ngggg\n"
    names, reads = bnio.read_fasta(fa)
    assert names == [b"r1 desc", b"r2", b"empty", b"r3"]
    assert reads.to_ascii() == [b"ACGTACGT", b"TTTT", b"", b"GGGG"]
    p = tmp_path / "x.fa"
    p.write_bytes(fa)
    names2, reads2 = bnio.read_fasta(p)
    assert names2 == names and reads2.to_ascii() == reads.to_ascii()


def test_read_fastq_and_gz(tmp_path):
    fq = b"@r1\nACGTA\n+\nIIIII\n@r2\nGG\n+\nII\n"
    names, reads = bnio.read_fastq(fq)
    assert names == [b"r1", b"r2"]
    assert reads.to_ascii() == [b"ACGTA", b"GG"]
    p = tmp_path / "x.fq.gz"
    p.write_bytes(gzip.compress(fq))
    names2, reads2 = bnio.read_fastq(p)
    assert names2 == names and reads2.to_ascii() == reads.to_ascii()


def test_iter_fastq_batches(tmp_path, rng):
    seqs = [random_seq(rng, 10 + i) for i in range(10)]
    fq = b"".join(b"@r%d\n%s\n+\n%s\n" % (i, s, b"I" * len(s)) for i, s in enumerate(seqs))
    p = tmp_path / "b.fq"
    p.write_bytes(fq)
    batches = list(bnio.iter_fastq_batches(p, batch_size=4))
    assert [len(b) for b in batches] == [4, 4, 2]
    got = [r for b in batches for r in b.to_ascii()]
    assert got == [s.upper() for s in seqs]


def test_read_fastq_malformed():
    with pytest.raises(ValueError):
        bnio.read_fastq(b"not-a-header\nACGT\n+\nIIII\n")


def test_read_fastq_fast_matches_python(tmp_path, rng):
    from bitnuc_tpu import native

    seqs = [random_seq(rng, 10 + 7 * i) for i in range(9)]
    fq = b"".join(
        b"@r%d some desc\n%s\n+\n%s\n" % (i, s, b"I" * len(s))
        for i, s in enumerate(seqs)
    )
    p = tmp_path / "f.fq"
    p.write_bytes(fq)
    _, py_reads = bnio.read_fastq(p)
    fast = bnio.read_fastq_fast(p)
    assert fast.to_ascii() == py_reads.to_ascii()
    if native.available():
        a, lens = native.fastq_to_batch(fq)
        assert [bytes(a[i, : lens[i]]) for i in range(len(seqs))] == seqs
    # crlf + empty trailing lines
    fq2 = fq.replace(b"\n", b"\r\n") + b"\n\n"
    fast2 = bnio.read_fastq_fast(fq2)
    assert fast2.to_ascii() == py_reads.to_ascii()


def test_fasta_gt_in_description():
    names, reads = bnio.read_fasta(b">seq1 coverage>30\nACGT\n>s2\nTT\n")
    assert names == [b"seq1 coverage>30", b"s2"]
    assert reads.to_ascii() == [b"ACGT", b"TT"]


def test_read_fasta_max_len_truncates():
    names, reads = bnio.read_fasta(b">a\nACGTACGTAC\n>b\nGG\n", max_len=4)
    assert reads.to_ascii() == [b"ACGT", b"GG"]


# -- staged streaming ingestion (native fast path) ----------------------------


def _needs_native():
    from bitnuc_tpu import native

    if not native.available():
        pytest.skip("native library not built")


def _write_fq(path, seqs, crlf=False, blank_between=False):
    eol = b"\r\n" if crlf else b"\n"
    parts = []
    for i, s in enumerate(seqs):
        parts.append(
            b"@r%d%s%s%s+%s%s%s" % (i, eol, s, eol, eol, b"I" * len(s), eol)
        )
        if blank_between:
            parts.append(eol)
    path.write_bytes(b"".join(parts))
    return path


def _batches_equal(a, b):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x.words), np.asarray(y.words))
        assert np.array_equal(np.asarray(x.lengths), np.asarray(y.lengths))


@pytest.mark.parametrize("crlf,blank", [(False, False), (True, False), (False, True)])
def test_staged_matches_python_path(tmp_path, rng, crlf, blank):
    _needs_native()
    seqs = [random_seq(rng, int(n)).upper() for n in rng.integers(1, 90, 37)]
    p = _write_fq(tmp_path / "s.fq", seqs, crlf=crlf, blank_between=blank)
    fast = list(bnio.iter_fastq_batches(p, batch_size=8, max_len=96, staged=True))
    slow = list(bnio.iter_fastq_batches(p, batch_size=8, max_len=96, staged=False))
    _batches_equal(fast, slow)
    got = [r for b in fast for r in b.to_ascii()]
    assert got == seqs


def test_staged_spans_blocks(tmp_path, rng, monkeypatch):
    """Records crossing the read-block boundary must carry over intact."""
    _needs_native()
    monkeypatch.setattr(bnio, "_STREAM_BLOCK", 256)
    seqs = [random_seq(rng, 60).upper() for _ in range(25)]
    p = _write_fq(tmp_path / "blk.fq", seqs)
    fast = list(bnio.iter_fastq_batches(p, batch_size=4, max_len=64, staged=True))
    assert [len(b) for b in fast] == [4] * 6 + [1]
    got = [r for b in fast for r in b.to_ascii()]
    assert got == seqs


def test_staged_no_trailing_newline(tmp_path):
    _needs_native()
    p = tmp_path / "t.fq"
    p.write_bytes(b"@a\nACGT\n+\nIIII\n@b\nGGCC\n+\nIIII")  # no final \n
    out = list(bnio.iter_fastq_batches(p, batch_size=8, staged=True))
    assert [r for b in out for r in b.to_ascii()] == [b"ACGT", b"GGCC"]


def test_staged_gz(tmp_path, rng):
    _needs_native()
    seqs = [random_seq(rng, 33).upper() for _ in range(9)]
    raw = b"".join(
        b"@r%d\n%s\n+\n%s\n" % (i, s, b"I" * len(s)) for i, s in enumerate(seqs)
    )
    p = tmp_path / "z.fq.gz"
    p.write_bytes(gzip.compress(raw))
    out = list(bnio.iter_fastq_batches(p, batch_size=4, staged=True))
    assert [r for b in out for r in b.to_ascii()] == seqs


def test_staged_invalid_base_raises(tmp_path):
    _needs_native()
    from bitnuc_tpu.errors import InvalidBase

    p = tmp_path / "bad.fq"
    p.write_bytes(b"@a\nACNT\n+\nIIII\n")
    with pytest.raises(InvalidBase):
        list(bnio.iter_fastq_batches(p, batch_size=1, staged=True))


def test_staged_malformed_header_raises(tmp_path):
    _needs_native()
    p = tmp_path / "mal.fq"
    p.write_bytes(b"@a\nACGT\n+\nIIII\nnot-a-header\nACGT\n+\nIIII\n")
    with pytest.raises(ValueError):
        list(bnio.iter_fastq_batches(p, batch_size=2, staged=True))


@pytest.mark.parametrize("staged", [True, False])
def test_prefetch_matches_sync(tmp_path, rng, staged):
    if staged:
        _needs_native()
    seqs = [random_seq(rng, 50).upper() for _ in range(23)]
    p = _write_fq(tmp_path / "pf.fq", seqs)
    sync = list(bnio.iter_fastq_batches(p, 4, max_len=64, staged=staged))
    pref = list(
        bnio.iter_fastq_batches(p, 4, max_len=64, staged=staged, prefetch=2)
    )
    _batches_equal(sync, pref)


def test_prefetch_propagates_errors(tmp_path):
    from bitnuc_tpu.errors import InvalidBase

    p = tmp_path / "bad2.fq"
    p.write_bytes(b"@a\nACGT\n+\nIIII\n@b\nANGT\n+\nIIII\n")
    with pytest.raises(InvalidBase):
        list(bnio.iter_fastq_batches(p, 1, prefetch=2))


def test_prefetch_no_thread_leak_on_early_exit(tmp_path, rng):
    """Abandoning a prefetching iterator must stop the worker and close the
    source (no thread blocked forever on the full queue)."""
    import threading
    import time

    seqs = [random_seq(rng, 50).upper() for _ in range(64)]
    p = _write_fq(tmp_path / "leak.fq", seqs)
    before = threading.active_count()
    for _ in range(5):
        it = bnio.iter_fastq_batches(p, 4, max_len=64, prefetch=1)
        next(it)
        it.close()  # same path as `break` in a for loop
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, (
        f"{threading.active_count() - before} prefetch worker(s) leaked"
    )


@pytest.mark.parametrize("staged", [True, False])
def test_offsets_resume_exact(tmp_path, rng, staged):
    """with_offsets + start_offset resume the framing at the exact record
    boundary: batches after the cut equal the tail of a full pass."""
    if staged:
        _needs_native()
    seqs = [random_seq(rng, int(n)).upper() for n in rng.integers(20, 70, 33)]
    p = _write_fq(tmp_path / "off.fq", seqs)
    full = list(
        bnio.iter_fastq_batches(
            p, 4, max_len=80, staged=staged, with_offsets=True
        )
    )
    reads_full = [it[0] for it in full]
    offs = [it[-1] for it in full]
    got = [r for b in reads_full for r in b.to_ascii()]
    assert got == seqs
    # resume from after batch 3
    resumed = list(
        bnio.iter_fastq_batches(
            p, 4, max_len=80, staged=staged, start_offset=offs[3]
        )
    )
    _batches_equal(resumed, reads_full[4:])


def test_offsets_gz_staged(tmp_path, rng):
    _needs_native()
    import gzip as _gz

    seqs = [random_seq(rng, 40).upper() for _ in range(12)]
    raw = b"".join(
        b"@r%d\n%s\n+\n%s\n" % (i, s, b"I" * 40) for i, s in enumerate(seqs)
    )
    p = tmp_path / "o.fq.gz"
    p.write_bytes(_gz.compress(raw))
    full = list(bnio.iter_fastq_batches(p, 4, max_len=48, with_offsets=True))
    resumed = list(
        bnio.iter_fastq_batches(p, 4, max_len=48, start_offset=full[0][-1])
    )
    _batches_equal(resumed, [it[0] for it in full[1:]])
