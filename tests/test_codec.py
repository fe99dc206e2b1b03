"""Batched JAX codec vs the numpy oracle: bit-exact words, error indices,
roundtrips. The analog of the reference's codec tests (src/utils/mod.rs:64-133)
plus the SIMD-vs-naive equivalence its CI matrix enforces."""

import numpy as np
import pytest
import jax.numpy as jnp

from bitnuc_tpu import oracle
from bitnuc_tpu.errors import InvalidBase
from bitnuc_tpu.ops import codec
from bitnuc_tpu.sequence import PackedReads, PackedSequence, stack_sequences
from bitnuc_tpu.utils import bitops
from conftest import random_seq


def encode_batch_oracle(seqs, W):
    """Reference-layout u64 words per read, zero-padded to W//2 u64s."""
    out = np.zeros((len(seqs), W // 2), dtype=np.uint64)
    for i, s in enumerate(seqs):
        e = oracle.encode(s)
        out[i, : len(e)] = e
    return out


@pytest.mark.parametrize("lens", [
    [4], [1, 2, 3, 4], [15, 16, 17], [31, 32, 33], [32, 64, 100],
    [1, 1000], [512, 511, 513],
])
def test_encode_bitexact_vs_oracle(rng, lens):
    seqs = [random_seq(rng, n) for n in lens]
    L = max(lens)
    arr = np.zeros((len(seqs), L), dtype=np.uint8)
    for i, s in enumerate(seqs):
        arr[i, : len(s)] = np.frombuffer(s, np.uint8)
    lengths = np.array(lens, dtype=np.int32)

    words, first_bad = codec.encode_reads_xla(jnp.asarray(arr), jnp.asarray(lengths))
    assert np.all(np.asarray(first_bad) == -1)
    got_u64 = bitops.words_u32_to_u64_np(np.asarray(words))
    expect = encode_batch_oracle(seqs, words.shape[-1])
    np.testing.assert_array_equal(got_u64, expect)


def test_encode_ignores_padding_garbage(rng):
    # bytes past `length` must not affect words or validity
    arr = np.full((2, 32), ord("N"), dtype=np.uint8)
    arr[0, :4] = np.frombuffer(b"ACGT", np.uint8)
    arr[1, :8] = np.frombuffer(b"ACTGACTG", np.uint8)
    words, first_bad = codec.encode_reads_xla(jnp.asarray(arr), jnp.asarray([4, 8]))
    assert np.all(np.asarray(first_bad) == -1)
    u64 = bitops.words_u32_to_u64_np(np.asarray(words))
    assert int(u64[0, 0]) == 0b11100100


def test_encode_reports_first_invalid():
    arr = np.zeros((3, 8), dtype=np.uint8)
    arr[0, :] = np.frombuffer(b"ACGTACGT", np.uint8)
    arr[1, :] = np.frombuffer(b"ACGNACGN", np.uint8)
    arr[2, :] = np.frombuffer(b"XCGTACGT", np.uint8)
    words, first_bad = codec.encode_reads_xla(
        jnp.asarray(arr), jnp.asarray([8, 8, 8])
    )
    np.testing.assert_array_equal(np.asarray(first_bad), [-1, 3, 0])


def test_decode_roundtrip_batch(rng):
    lens = [1, 5, 16, 17, 32, 33, 64, 200, 1000]
    seqs = [random_seq(rng, n).upper() for n in lens]
    L = max(lens)
    arr = np.zeros((len(seqs), L), dtype=np.uint8)
    for i, s in enumerate(seqs):
        arr[i, : len(s)] = np.frombuffer(s, np.uint8)
    lengths = jnp.asarray(np.array(lens, np.int32))
    words, _ = codec.encode_reads_xla(jnp.asarray(arr), lengths)
    out = np.asarray(codec.decode_reads_xla(words, lengths, max_len=L))
    for i, s in enumerate(seqs):
        assert bytes(out[i, : lens[i]]) == s
        assert np.all(out[i, lens[i]:] == 0)


def test_lowercase_encodes_like_uppercase(rng):
    s = random_seq(rng, 100)
    up, lo = s.upper(), s.lower()
    a = np.frombuffer(up, np.uint8)[None, :]
    b = np.frombuffer(lo, np.uint8)[None, :]
    lens = jnp.asarray([100])
    wa, _ = codec.encode_reads_xla(jnp.asarray(a), lens)
    wb, _ = codec.encode_reads_xla(jnp.asarray(b), lens)
    np.testing.assert_array_equal(np.asarray(wa), np.asarray(wb))


def test_pack_kmers_golden():
    arr = np.zeros((2, 4), dtype=np.uint8)
    arr[0] = np.frombuffer(b"ACGT", np.uint8)
    arr[1] = np.frombuffer(b"TGCA", np.uint8)
    words, fb = codec.pack_kmers(jnp.asarray(arr), jnp.asarray([4, 4]))
    u64 = bitops.words_u32_to_u64_np(np.asarray(words))
    assert int(u64[0, 0]) == 0b11100100
    assert int(u64[1, 0]) == oracle.as_2bit(b"TGCA")
    out = np.asarray(codec.unpack_kmers(words, jnp.asarray([4, 4]), max_len=4))
    assert bytes(out[0]) == b"ACGT" and bytes(out[1]) == b"TGCA"


# --- containers ---------------------------------------------------------------

def test_packed_reads_from_ascii_roundtrip(rng):
    seqs = [random_seq(rng, n).upper() for n in [3, 33, 64, 100]]
    reads = PackedReads.from_ascii(seqs)
    assert reads.batch_size == 4
    assert reads.to_ascii() == seqs
    # u64 view matches oracle
    expect = encode_batch_oracle(seqs, reads.n_words)
    np.testing.assert_array_equal(reads.to_u64(), expect)


def test_packed_reads_invalid_raises():
    with pytest.raises(InvalidBase) as e:
        PackedReads.from_ascii([b"ACGT", b"ACGN"])
    assert e.value.base == ord("N")


def test_packed_reads_from_u64(rng):
    s = random_seq(rng, 50).upper()
    e = oracle.encode(s)
    w = np.zeros((1, 2), dtype=np.uint64)
    w[0, : len(e)] = e
    reads = PackedReads.from_u64(w, np.array([50]))
    assert reads.to_ascii() == [s]


def test_packed_reads_is_pytree():
    import jax

    reads = PackedReads.from_ascii([b"ACGT"])
    leaves = jax.tree_util.tree_leaves(reads)
    assert len(leaves) == 2
    mapped = jax.tree_util.tree_map(lambda x: x, reads)
    assert isinstance(mapped, PackedReads)


# --- PackedSequence host API (reference src/sequence.rs tests) ----------------

def test_packed_sequence_basics():
    s = PackedSequence(b"ACGT")
    assert s.len() == 4 and len(s) == 4
    assert s.to_vec() == b"ACGT"
    assert s.get(0) == ord("A") and s.get(3) == ord("T")
    assert not s.is_empty()
    assert PackedSequence(b"").is_empty()


def test_packed_sequence_slice():
    s = PackedSequence(b"ACGTACGT")
    assert s.slice(1, 5) == b"CGTA"
    assert s.slice(0, 3) == b"ACG"
    assert s.slice(5, 8) == b"CGT"
    assert s.slice(2, 2) == b""
    assert s[1:5] == b"CGTA"
    assert s[3] == ord("T")


def test_packed_sequence_slice_long(rng):
    raw = random_seq(rng, 100).upper()
    s = PackedSequence(raw)
    for a, b in [(0, 100), (31, 33), (32, 64), (33, 97), (64, 100), (90, 100)]:
        assert s.slice(a, b) == raw[a:b], (a, b)


def test_packed_sequence_errors():
    from bitnuc_tpu.errors import IndexOutOfBounds, InvalidRange

    s = PackedSequence(b"ACGT")
    with pytest.raises(IndexOutOfBounds):
        s.get(4)
    with pytest.raises(InvalidRange):
        s.slice(3, 2)
    with pytest.raises(InvalidRange):
        s.slice(2, 5)
    with pytest.raises(InvalidBase):
        PackedSequence(b"ACGN")


def test_packed_sequence_equality_hash():
    s1, s2, s3 = PackedSequence(b"ACGT"), PackedSequence(b"ACGT"), PackedSequence(b"TGCA")
    assert s1 == s2 and s1 != s3
    assert {s1} == {s2}
    assert s3 not in {s1}


def test_packed_sequence_analysis():
    s = PackedSequence(b"ACGTA")
    assert s.gc_content() == 40.0
    assert s.base_counts() == (2, 1, 1, 1)


def test_packed_sequence_split():
    l, r = PackedSequence(b"ACTGACTG").split(4)
    assert l.to_vec() == b"ACTG" and r.to_vec() == b"ACTG"


def test_stack_sequences(rng):
    raws = [random_seq(rng, n).upper() for n in [4, 40, 70]]
    batch = stack_sequences(PackedSequence(r) for r in raws)
    assert batch.to_ascii() == raws


def test_to_reads_roundtrip():
    s = PackedSequence(b"ACGTACGTACGT")
    assert s.to_reads().to_ascii() == [b"ACGTACGTACGT"]


def test_roundtrip_every_length_1_to_1000(rng):
    """The reference's main property test (src/utils/mod.rs:114-133) —
    random roundtrip at EVERY length 1..=1000 — as one batched device call."""
    lens = np.arange(1, 1001, dtype=np.int32)
    arr = rng.choice(np.frombuffer(b"ACGTacgt", np.uint8), size=(1000, 1000))
    words, fb = codec.encode_reads_xla(jnp.asarray(arr), jnp.asarray(lens))
    assert np.all(np.asarray(fb) == -1)
    out = np.asarray(codec.decode_reads_xla(words, jnp.asarray(lens), max_len=1000))
    u64 = np.asarray(words).view(np.uint64)
    for i in (0, 1, 30, 31, 32, 33, 62, 63, 64, 99, 499, 998, 999):
        n = int(lens[i])
        seq = bytes(arr[i, :n])
        assert bytes(out[i, :n]) == seq.upper()
        ref = oracle.encode(seq)
        np.testing.assert_array_equal(u64[i, : len(ref)], ref)
        assert np.all(u64[i, len(ref):] == 0)
    # every row roundtrips (vectorized check against upper-cased input)
    expect = np.frombuffer(
        bytes(arr.tobytes()).upper(), np.uint8
    ).reshape(arr.shape)
    mask = np.arange(1000)[None, :] < lens[:, None]
    assert np.array_equal(out * mask, expect * mask)


def test_slice_decodes_only_covering_words(rng):
    s = random_seq(rng, 100_000).upper()
    seq = PackedSequence(s)
    assert seq.slice(10, 40) == s[10:40]
    assert seq.slice(0, 5) == s[:5]
    assert seq.slice(99_990, 100_000) == s[99_990:]


def test_negative_index_and_range_rejected():
    s = PackedSequence(b"ACGT" * 10)
    with pytest.raises(Exception):
        s.get(-1)
    with pytest.raises(Exception):
        s.slice(-4, 2)


def test_split_preserves_equality_and_hash():
    l, r = PackedSequence(b"A" * 64).split(32)
    direct = PackedSequence(b"A" * 32)
    assert l == direct and hash(l) == hash(direct)
    assert r == direct


def test_decode_max_len_beyond_capacity(rng):
    w, _ = codec.encode_reads_xla(
        jnp.asarray(np.full((2, 8), 65, np.uint8)), jnp.asarray([8, 3])
    )
    out = np.asarray(codec.decode_reads_xla(w, jnp.asarray([8, 3]), max_len=100))
    assert out.shape == (2, 100)
    assert bytes(out[0, :8]) == b"AAAAAAAA" and out[0, 8:].sum() == 0


def test_topk_smallest_k_exceeds_n():
    from bitnuc_tpu.ops import hamming

    d, i = hamming.topk_smallest(jnp.asarray(np.array([5, 2], np.int32)), 4)
    assert list(np.asarray(d)[:2]) == [2, 5]
    assert list(np.asarray(i)[:2]) == [1, 0]
    assert np.all(np.asarray(i)[2:] == -1)
