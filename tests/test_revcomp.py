"""Reverse complement and canonical k-mers vs a bytewise Python oracle."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

import bitnuc_tpu as bn  # noqa: E402
from bitnuc_tpu.ops import codec, kmer, revcomp  # noqa: E402

from conftest import random_seq  # noqa: E402

COMP = bytes.maketrans(b"ACGT", b"TGCA")


def py_revcomp(s: bytes) -> bytes:
    return s.upper().translate(COMP)[::-1]


@pytest.mark.parametrize("n", [0, 1, 5, 15, 16, 17, 31, 32, 33, 100, 1000])
def test_reverse_complement_reads(rng, n):
    seqs = [random_seq(rng, n), random_seq(rng, max(n // 2, 0))]
    reads = bn.PackedReads.from_ascii(seqs)
    rc = revcomp.reverse_complement_reads(reads.words, reads.lengths)
    out = bn.PackedReads(words=rc, lengths=reads.lengths)
    assert out.to_ascii() == [py_revcomp(s) for s in seqs]
    # bit-exact contract: rc equals encode(py_revcomp) including padding
    ref = bn.PackedReads.from_ascii([py_revcomp(s) for s in seqs])
    np.testing.assert_array_equal(np.asarray(rc), np.asarray(ref.words))


def test_revcomp_word_roundtrip(rng):
    w = jnp.asarray(rng.integers(0, 2**32, size=64, dtype=np.uint32))
    assert np.array_equal(
        np.asarray(revcomp.revcomp_word(revcomp.revcomp_word(w))), np.asarray(w)
    )


@pytest.mark.parametrize("k", [1, 3, 8, 15, 16, 17, 24, 31, 32])
def test_revcomp_and_canonical_keys(rng, k):
    s = random_seq(rng, 80).upper()
    reads = bn.PackedReads.from_ascii([s])
    codes = jnp.asarray(np.frombuffer(s, np.uint8)[None, :])
    from bitnuc_tpu.utils import bitops

    lo, hi = kmer.kmer_keys(bitops.ascii_to_code(codes), k)
    rlo, rhi = revcomp.revcomp_key(lo, hi, k)
    clo, chi = revcomp.canonical_keys(lo, hi, k)
    for p in range(len(s) - k + 1):
        window = s[p : p + k]
        want_fwd = bn.as_2bit(window)
        want_rc = bn.as_2bit(py_revcomp(window))
        got_fwd = (int(np.asarray(hi)[0, p]) << 32) | int(np.asarray(lo)[0, p])
        got_rc = (int(np.asarray(rhi)[0, p]) << 32) | int(np.asarray(rlo)[0, p])
        got_c = (int(np.asarray(chi)[0, p]) << 32) | int(np.asarray(clo)[0, p])
        assert got_fwd == want_fwd, p
        assert got_rc == want_rc, (k, p, window)
        assert got_c == min(want_fwd, want_rc), (k, p)


@pytest.mark.parametrize("k,mode", [(4, "dense"), (6, "mxu"), (21, "sorted")])
def test_canonical_counting(rng, k, mode):
    from bitnuc_tpu.ops import kmer as K

    seqs = [random_seq(rng, 120).upper() for _ in range(3)]
    reads = bn.PackedReads.from_ascii(seqs)
    # python oracle
    from collections import Counter

    want = Counter()
    for s in seqs:
        for p in range(len(s) - k + 1):
            w = s[p : p + k]
            want[min(bn.as_2bit(w), bn.as_2bit(py_revcomp(w)))] += 1
    out = K.count_kmers_reads(reads.words, reads.lengths, k, mode=mode, canonical=True)
    if mode == "sorted":
        lo, hi, counts, n_u = out
        got = {
            (int(np.asarray(hi)[i]) << 32) | int(np.asarray(lo)[i]): int(
                np.asarray(counts)[i]
            )
            for i in range(int(n_u))
        }
    else:
        h = np.asarray(out)
        got = {i: int(h[i]) for i in np.nonzero(h)[0]}
    assert got == dict(want)
