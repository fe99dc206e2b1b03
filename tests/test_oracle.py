"""Golden-vector and property tests for the numpy oracle.

Golden values come from the reference's own test suite (cited per test); the
oracle is then used as the judge for every JAX/Pallas/native path.
"""

import numpy as np
import pytest

from bitnuc_tpu import oracle
from bitnuc_tpu.errors import (
    IndexOutOfBounds,
    InvalidBase,
    InvalidLength,
    InvalidRange,
    SequenceTooLong,
)
from conftest import random_seq


# --- golden vectors (reference: src/utils/packing/mod.rs:149-177) -----------

def test_acgt_golden():
    assert oracle.as_2bit(b"ACGT") == 0b11100100


def test_acgt_lowercase():
    assert oracle.as_2bit(b"acgt") == 0b11100100
    assert oracle.as_2bit(b"AcGt") == 0b11100100


def test_16mer_golden():
    assert oracle.as_2bit(b"ACTGACTGACTGACTG") == 0b10110100101101001011010010110100


def test_17mer_golden():
    assert (
        oracle.as_2bit(b"ACTGGAAAATTTTAAGG")
        == 0b1010000011111111000000001010110100
    )


def test_unpack_realworld_golden():
    # reference: src/utils/unpacking/mod.rs:205-215
    assert oracle.from_2bit(71620941647064936, 28) == b"AGGCTTGAGGCCCATTCTCTGATCGTTT"


def test_single_bases():
    assert oracle.as_2bit(b"A") == 0
    assert oracle.as_2bit(b"C") == 1
    assert oracle.as_2bit(b"G") == 2
    assert oracle.as_2bit(b"T") == 3


# --- error semantics (reference: src/error.rs, README.md:140-153) ----------

def test_invalid_base():
    with pytest.raises(InvalidBase) as e:
        oracle.as_2bit(b"ACGN")
    assert e.value.base == ord("N")


def test_sequence_too_long():
    with pytest.raises(SequenceTooLong) as e:
        oracle.as_2bit(b"A" * 33)
    assert e.value.length == 33


def test_unpack_too_long():
    with pytest.raises(InvalidLength):
        oracle.from_2bit(0, 33)


def test_hdist_buffer_validation():
    # reference: hamming/multi.rs:168-173
    with pytest.raises(InvalidLength):
        oracle.hdist(np.zeros(1, np.uint64), np.zeros(1, np.uint64), 64)


def test_get_out_of_bounds():
    e = oracle.encode(b"ACGT")
    with pytest.raises(IndexOutOfBounds):
        oracle.get(e, 4, 4)


def test_slice_invalid_range():
    e = oracle.encode(b"ACGT")
    with pytest.raises(InvalidRange):
        oracle.slice_(e, 4, 3, 2)
    with pytest.raises(InvalidRange):
        oracle.slice_(e, 4, 2, 5)


# --- roundtrip (reference: src/utils/mod.rs:114-133) ------------------------

@pytest.mark.parametrize("n", [1, 2, 3, 4, 15, 16, 17, 31, 32, 33, 63, 64, 65,
                               100, 511, 512, 513, 1000])
def test_roundtrip_lengths(rng, n):
    s = random_seq(rng, n).upper()
    e = oracle.encode(s)
    assert len(e) == -(-n // 32)
    assert oracle.decode(e, n) == s


def test_encode_empty():
    assert len(oracle.encode(b"")) == 0


def test_last_word_zero_padded(rng):
    s = b"T" * 33  # second word has 1 base
    e = oracle.encode(s)
    assert int(e[1]) == 0b11  # only low 2 bits set


# --- hamming (reference: hamming/scalar.rs:91-115, multi.rs:183-207) --------

@pytest.mark.parametrize("a,b,d", [
    (b"AAAA", b"AAAA", 0),
    (b"AAAA", b"AAAT", 1),
    (b"AAAA", b"AATT", 2),
    (b"AAAA", b"ATTT", 3),
    (b"AAAA", b"TTTT", 4),
    (b"ACTGACTG", b"TGCATGCA", 8),
])
def test_hdist_golden(a, b, d):
    assert oracle.hdist_scalar(oracle.as_2bit(a), oracle.as_2bit(b), len(a)) == d


@pytest.mark.parametrize("n", list(range(1, 70)) + [127, 128, 129, 255, 256])
def test_hdist_all_mismatch_lengths(n):
    e1 = oracle.encode(b"A" * n)
    e2 = oracle.encode(b"T" * n)
    assert oracle.hdist(e1, e2, n) == n


def test_hdist_vs_bytewise_oracle(rng):
    for n in [1, 5, 31, 32, 33, 64, 65, 200]:
        s1, s2 = random_seq(rng, n).upper(), random_seq(rng, n).upper()
        expected = sum(x != y for x, y in zip(s1, s2))
        assert oracle.hdist(oracle.encode(s1), oracle.encode(s2), n) == expected


# --- split (reference: split.rs:104-226) -------------------------------------

def test_split_basic():
    e = oracle.encode(b"ACTGACTG")
    l, r = oracle.split_packed(e, 8, 4)
    assert len(l) == 1 and len(r) == 1
    assert oracle.decode(l, 4) == b"ACTG"
    assert oracle.decode(r, 4) == b"ACTG"


def test_split_edges():
    e = oracle.encode(b"ACTG")
    l, r = oracle.split_packed(e, 4, 0)
    assert len(l) == 0 and oracle.decode(r, 4) == b"ACTG"
    l, r = oracle.split_packed(e, 4, 4)
    assert len(r) == 0 and oracle.decode(l, 4) == b"ACTG"


def test_split_chunk_boundary():
    s = b"ACTG" * 10  # 40 bases
    e = oracle.encode(s)
    l, r = oracle.split_packed(e, 40, 32)
    assert len(l) == 2 and len(r) == 1  # reference word-count quirk
    assert oracle.decode(l, 32) == s[:32]
    assert oracle.decode(r, 8) == s[32:]


def test_split_out_of_bounds():
    e = oracle.encode(b"ACTG")
    with pytest.raises(IndexOutOfBounds):
        oracle.split_packed(e, 4, 5)


def test_split_roundtrip_sweep(rng):
    for n in [1, 7, 32, 33, 64, 100]:
        s = random_seq(rng, n).upper()
        e = oracle.encode(s)
        for idx in range(n + 1):
            l, r = oracle.split_packed(e, n, idx)
            assert oracle.decode(l, idx) == s[:idx]
            assert oracle.decode(r, n - idx) == s[idx:]


# --- analysis (reference: analysis.rs:46-76) ---------------------------------

@pytest.mark.parametrize("s,gc", [
    (b"ACGT", 50.0), (b"AAAA", 0.0), (b"CCCC", 100.0),
    (b"AACG", 50.0), (b"ACGTA", 40.0),
])
def test_gc_content(s, gc):
    assert oracle.gc_content(oracle.encode(s), len(s)) == gc


@pytest.mark.parametrize("s,counts", [
    (b"ACGT", (1, 1, 1, 1)), (b"AAAA", (4, 0, 0, 0)),
    (b"CCCC", (0, 4, 0, 0)), (b"AACG", (2, 1, 1, 0)),
    (b"ACGTA", (2, 1, 1, 1)),
])
def test_base_counts(s, counts):
    assert oracle.base_counts(oracle.encode(s), len(s)) == counts


def test_empty_analysis():
    assert oracle.gc_content(np.zeros(0, np.uint64), 0) == 0.0
    assert oracle.base_counts(np.zeros(0, np.uint64), 0) == (0, 0, 0, 0)


# --- get / slice (reference: src/sequence.rs:270-316) -------------------------

def test_get_slice():
    e = oracle.encode(b"ACGTACGT")
    assert oracle.get(e, 8, 0) == ord("A")
    assert oracle.get(e, 8, 3) == ord("T")
    assert oracle.slice_(e, 8, 1, 5) == b"CGTA"
    assert oracle.slice_(e, 8, 2, 2) == b""


# --- kmer counting (reference: README.md:164-180) ----------------------------

def test_kmer_readme_example():
    counts = oracle.count_kmers(b"ACGTACGT", 4)
    assert counts[oracle.as_2bit(b"ACGT")] == 2


# --- u32 lane view ------------------------------------------------------------

def test_u64_u32_roundtrip(rng):
    s = random_seq(rng, 100).upper()
    e = oracle.encode(s)
    lanes = oracle.u64_to_u32(e)
    assert lanes.dtype == np.uint32 and len(lanes) == 2 * len(e)
    np.testing.assert_array_equal(oracle.u32_to_u64(lanes), e)
    # base i of the stream lives in u32 word i//16, bits [2*(i%16), ...)
    for i in [0, 15, 16, 31, 32, 50, 99]:
        code = (int(lanes[i // 16]) >> (2 * (i % 16))) & 0b11
        assert b"ACGT"[code] == s[i]
