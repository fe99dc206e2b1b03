"""Streaming restartable counting (bitnuc_tpu.pipeline): oracle parity,
crash/resume via checkpoints, sparse accumulator growth, mesh mode."""

import numpy as np
import pytest
import jax

from bitnuc_tpu import io as bnio, oracle, pipeline
from conftest import random_seq


@pytest.fixture
def fastq(tmp_path, rng):
    seqs = [random_seq(rng, int(n)).upper() for n in rng.integers(30, 120, 57)]
    p = tmp_path / "stream.fq"
    with open(p, "wb") as f:
        for i, s in enumerate(seqs):
            f.write(b"@r%d\n%s\n+\n%s\n" % (i, s, b"I" * len(s)))
    return p, seqs


def _expect(seqs, k):
    out = {}
    for s in seqs:
        for key, c in oracle.count_kmers(s, k).items():
            out[key] = out.get(key, 0) + c
    return out


def test_count_fastq_dense_vs_oracle(fastq):
    p, seqs = fastq
    hist = pipeline.count_fastq(p, 5, batch_size=8)
    expect = _expect(seqs, 5)
    assert hist.sum() == sum(expect.values())
    for key, c in expect.items():
        assert hist[key] == c


def test_count_fastq_sparse_vs_oracle(fastq):
    p, seqs = fastq
    got = pipeline.count_fastq(p, 21, batch_size=8, sparse_capacity=4096)
    assert got == _expect(seqs, 21)


def test_count_fastq_sparse_capacity_growth(fastq):
    p, seqs = fastq
    # force repeated doubling from a tiny accumulator
    got = pipeline.count_fastq(p, 17, batch_size=8, sparse_capacity=64)
    assert got == _expect(seqs, 17)


class _Boom(RuntimeError):
    pass


def _crashing_iter(real_iter, crash_after):
    def wrapper(*args, **kwargs):
        for i, b in enumerate(real_iter(*args, **kwargs)):
            if i == crash_after:
                raise _Boom()
            yield b

    return wrapper


@pytest.mark.parametrize("k", [5, 21])
def test_count_fastq_crash_resume(fastq, tmp_path, monkeypatch, k):
    p, seqs = fastq
    ckpt = str(tmp_path / f"count{k}.npz")
    kwargs = dict(
        batch_size=8, checkpoint=ckpt, checkpoint_every=1, sparse_capacity=4096
    )

    real = bnio.iter_fastq_batches
    monkeypatch.setattr(bnio, "iter_fastq_batches", _crashing_iter(real, 4))
    with pytest.raises(_Boom):
        pipeline.count_fastq(p, k, **kwargs)
    monkeypatch.setattr(bnio, "iter_fastq_batches", real)

    # resume from the checkpoint; result must equal the one-shot count
    got = pipeline.count_fastq(p, k, **kwargs)
    expect = _expect(seqs, k)
    if k <= 12:
        for key, c in expect.items():
            assert got[key] == c
        assert got.sum() == sum(expect.values())
    else:
        assert got == expect


def test_count_fastq_checkpoint_framing_mismatch(fastq, tmp_path):
    p, _ = fastq
    ckpt = str(tmp_path / "frame.npz")
    pipeline.count_fastq(p, 5, batch_size=8, checkpoint=ckpt)
    with pytest.raises(ValueError, match="batch_size"):
        pipeline.count_fastq(p, 5, batch_size=16, checkpoint=ckpt)
    with pytest.raises(ValueError, match="canonical"):
        pipeline.count_fastq(p, 5, batch_size=8, checkpoint=ckpt, canonical=True)


def test_count_fastq_checkpoint_file_mismatch(fastq, tmp_path, rng):
    """A checkpoint from a DIFFERENT file must refuse, not silently skip."""
    p, _ = fastq
    ckpt = str(tmp_path / "fid.npz")
    pipeline.count_fastq(p, 5, batch_size=8, checkpoint=ckpt)
    other = tmp_path / "other.fq"
    seqs2 = [random_seq(rng, 44).upper() for _ in range(30)]
    with open(other, "wb") as f:
        for i, s in enumerate(seqs2):
            f.write(b"@o%d\n%s\n+\n%s\n" % (i, s, b"I" * len(s)))
    with pytest.raises(ValueError, match="file_"):
        pipeline.count_fastq(other, 5, batch_size=8, checkpoint=ckpt)


def test_count_fastq_checkpoint_legacy_missing_key(fastq, tmp_path):
    """A checkpoint missing a newer param key (e.g. 'engine', added after
    CKPT_VERSION 2 shipped) must refuse with the descriptive ValueError,
    not a raw KeyError from the npz archive."""
    p, _ = fastq
    ckpt = str(tmp_path / "legacy.npz")
    pipeline.count_fastq(p, 5, batch_size=8, checkpoint=ckpt)
    with np.load(ckpt, allow_pickle=False) as z:
        state = {k: z[k] for k in z.files if k != "engine"}
    np.savez(ckpt, **state)
    with pytest.raises(ValueError, match="engine"):
        pipeline.count_fastq(p, 5, batch_size=8, checkpoint=ckpt)


def test_count_fastq_dense_returns_int64(fastq):
    p, _ = fastq
    hist = pipeline.count_fastq(p, 5, batch_size=8)
    assert hist.dtype == np.int64


def test_count_fastq_mesh(fastq):
    p, seqs = fastq
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = jax.make_mesh((8,), ("data",))
    hist = pipeline.count_fastq(p, 6, batch_size=16, mesh=mesh)
    expect = _expect(seqs, 6)
    assert hist.sum() == sum(expect.values())
    for key, c in expect.items():
        assert hist[key] == c


@pytest.mark.parametrize("k", [6, 21])
def test_count_fastq_skip_invalid(tmp_path, rng, k):
    """on_invalid='skip' drops exactly the N-containing windows."""
    seqs = []
    for n in rng.integers(40, 90, 20):
        s = bytearray(random_seq(rng, int(n)).upper())
        for _ in range(3):
            s[rng.integers(len(s))] = ord("N")
        seqs.append(bytes(s))
    p = tmp_path / "ns.fq"
    with open(p, "wb") as f:
        for i, s in enumerate(seqs):
            f.write(b"@n%d\n%s\n+\n%s\n" % (i, s, b"I" * len(s)))

    expect = {}
    for s in seqs:
        for q in range(len(s) - k + 1):
            win = s[q : q + k]
            if any(c not in b"ACGT" for c in win):
                continue
            key = oracle.as_2bit(win)
            expect[key] = expect.get(key, 0) + 1

    got = pipeline.count_fastq(
        p, k, batch_size=8, on_invalid="skip", sparse_capacity=4096
    )
    if k <= 12:
        assert got.sum() == sum(expect.values())
        for key, c in expect.items():
            assert got[key] == c
    else:
        assert got == expect


def test_count_fastq_raises_on_n_by_default(tmp_path):
    from bitnuc_tpu.errors import InvalidBase

    p = tmp_path / "n1.fq"
    p.write_bytes(b"@a\nACNT\n+\nIIII\n")
    with pytest.raises(InvalidBase):
        pipeline.count_fastq(p, 2, batch_size=4)


def test_count_fastq_progress_hook(fastq):
    p, seqs = fastq
    events = []
    pipeline.count_fastq(
        p, 5, batch_size=8, on_progress=events.append, progress_every=2
    )
    assert events, "progress hook never fired"
    assert events[-1]["reads"] <= len(seqs)
    assert all(e["bases_per_sec"] > 0 for e in events)
    assert [e["batches"] for e in events] == sorted(e["batches"] for e in events)


@pytest.mark.parametrize("k", [6, 21])
def test_count_fasta_segmented_vs_oracle(tmp_path, rng, k):
    """FASTA counting with forced tiny segments: segment sums must equal
    whole-contig counts (host-side halo), N windows skipped, contigs never
    bridged."""
    contigs = [random_seq(rng, int(n)).upper() for n in (300, 45, 5, 130)]
    contigs[0] = contigs[0][:50] + b"N" + contigs[0][51:]
    fa = b"".join(b">c%d\n%s\n" % (i, c) for i, c in enumerate(contigs))
    p = tmp_path / "g.fa"
    p.write_bytes(fa)

    got = pipeline.count_fasta(
        p, k, on_invalid="skip", seg_bases=64, sparse_capacity=2048
    )
    expect = {}
    for c in contigs:
        for q in range(len(c) - k + 1):
            win = c[q : q + k]
            if b"N" in win:
                continue
            key = oracle.as_2bit(win)
            expect[key] = expect.get(key, 0) + 1
    if k <= 12:
        assert got.sum() == sum(expect.values())
        for key, cnt in expect.items():
            assert got[key] == cnt
    else:
        assert got == expect


def test_count_fasta_raise_on_n(tmp_path):
    from bitnuc_tpu.errors import InvalidBase

    p = tmp_path / "n.fa"
    p.write_bytes(b">c\nACGNT\n")
    with pytest.raises(InvalidBase):
        pipeline.count_fasta(p, 2)


def test_count_fastq_sparse_k32_sentinel(tmp_path):
    # k=32: the genuine all-T key equals the dead-row sentinel; the deferred
    # merge's negated-totals compaction must keep the live all-T run inside
    # the capacity slice and sum it exactly
    seqs = [b"T" * 40, b"T" * 40, b"ACGT" * 10]
    p = tmp_path / "t32.fq"
    with open(p, "wb") as f:
        for i, s in enumerate(seqs):
            f.write(b"@r%d\n%s\n+\n%s\n" % (i, s, b"I" * len(s)))
    got = pipeline.count_fastq(str(p), 32, batch_size=2, sparse_capacity=64)
    assert got == _expect(seqs, 32)
    assert got[(1 << 64) - 1] == 18  # 9 all-T windows per all-T read


def test_sparse_acc_deferred_merge_equals_eager(rng):
    # raw-key batches buffered across several adds must fold to the same
    # dict as merging each batch alone with a huge capacity
    import jax.numpy as jnp

    from bitnuc_tpu.ops import kmer as kmer_ops
    from bitnuc_tpu.pipeline import _SparseAcc
    from bitnuc_tpu.sequence import PackedReads

    batches = []
    expect = {}
    for _ in range(5):
        seqs = [random_seq(rng, int(n)).upper() for n in rng.integers(25, 60, 6)]
        r = PackedReads.from_ascii(seqs)
        batches.append(kmer_ops.raw_window_keys(r.words, r.lengths, 21))
        for s in seqs:
            for key, c in oracle.count_kmers(s, 21).items():
                expect[key] = expect.get(key, 0) + c

    small = _SparseAcc(128)  # forces interleaved flush + growth
    big = _SparseAcc(1 << 14)  # everything stays pending until to_dict
    for lo, hi, ct in batches:
        small.add(lo, hi, ct)
        big.add(lo, hi, ct)
    assert small.to_dict() == expect
    assert big.to_dict() == expect
    assert big.pending == []


def _mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.make_mesh((8,), ("data",))


def test_count_fastq_mesh_sparse_k21(fastq):
    """Distributed large-k streaming: per-device run lists, one all_gather
    merge at fold — must equal the dict oracle exactly."""
    p, seqs = fastq
    mesh = _mesh8()
    got = pipeline.count_fastq(p, 21, batch_size=16, mesh=mesh,
                               sparse_capacity=4096)
    assert got == _expect(seqs, 21)


def test_count_fastq_mesh_sparse_capacity_growth(fastq):
    p, seqs = fastq
    mesh = _mesh8()
    got = pipeline.count_fastq(p, 17, batch_size=16, mesh=mesh,
                               sparse_capacity=64)
    assert got == _expect(seqs, 17)


def _n_fastq(tmp_path, rng, n_reads=24):
    seqs = []
    for n in rng.integers(40, 90, n_reads):
        s = bytearray(random_seq(rng, int(n)).upper())
        for _ in range(3):
            s[rng.integers(len(s))] = ord("N")
        seqs.append(bytes(s))
    p = tmp_path / "ns_mesh.fq"
    with open(p, "wb") as f:
        for i, s in enumerate(seqs):
            f.write(b"@n%d\n%s\n+\n%s\n" % (i, s, b"I" * len(s)))
    return p, seqs


def _skip_expect(seqs, k):
    expect = {}
    for s in seqs:
        for q in range(len(s) - k + 1):
            win = s[q : q + k]
            if any(c not in b"ACGT" for c in win):
                continue
            key = oracle.as_2bit(win)
            expect[key] = expect.get(key, 0) + 1
    return expect


@pytest.mark.parametrize("k", [6, 21])
def test_count_fastq_mesh_skip_invalid(tmp_path, rng, k):
    """on_invalid='skip' under a mesh (VERDICT r2 missing #3): realistic
    N-containing reads counted distributed must equal the skip oracle."""
    p, seqs = _n_fastq(tmp_path, rng)
    mesh = _mesh8()
    got = pipeline.count_fastq(p, k, batch_size=8, mesh=mesh,
                               on_invalid="skip", sparse_capacity=4096)
    expect = _skip_expect(seqs, k)
    if k <= 12:
        assert got.sum() == sum(expect.values())
        for key, c in expect.items():
            assert got[key] == c
    else:
        assert got == expect


@pytest.mark.parametrize("k", [6, 21])
def test_count_fasta_mesh(tmp_path, rng, k):
    """count_fasta with a mesh: segment groups sharded across devices,
    small seg_bases so one contig spans many segments; N bases skipped."""
    contigs = []
    for n in (700, 260, 31, 120):
        s = bytearray(random_seq(rng, n).upper())
        s[rng.integers(len(s))] = ord("N")
        contigs.append(bytes(s))
    p = tmp_path / "g_mesh.fa"
    with open(p, "wb") as f:
        for i, c in enumerate(contigs):
            f.write(b">c%d\n%s\n" % (i, c))
    mesh = _mesh8()
    got = pipeline.count_fasta(p, k, on_invalid="skip", seg_bases=64,
                               sparse_capacity=2048, mesh=mesh)
    expect = _skip_expect(contigs, k)
    if k <= 12:
        assert got.sum() == sum(expect.values())
        for key, c in expect.items():
            assert got[key] == c
    else:
        assert got == expect


def test_count_fastq_mesh_crash_resume(fastq, tmp_path, monkeypatch):
    """Sparse mesh counting resumes from a checkpoint written mid-stream;
    also crosses accumulator kinds (checkpoint rows redistribute)."""
    p, seqs = fastq
    mesh = _mesh8()
    ckpt = tmp_path / "mesh.ckpt.npz"
    real_iter = bnio.iter_fastq_batches
    monkeypatch.setattr(bnio, "iter_fastq_batches", _crashing_iter(real_iter, 3))
    with pytest.raises(_Boom):
        pipeline.count_fastq(p, 21, batch_size=8, mesh=mesh, checkpoint=str(ckpt),
                             checkpoint_every=1, sparse_capacity=4096)
    monkeypatch.setattr(bnio, "iter_fastq_batches", real_iter)
    got = pipeline.count_fastq(p, 21, batch_size=8, mesh=mesh,
                               checkpoint=str(ckpt), sparse_capacity=4096)
    assert got == _expect(seqs, 21)
