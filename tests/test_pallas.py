"""Pallas-vs-XLA parity tests (interpret mode on CPU).

The analog of the reference's simd/nosimd CI-matrix equivalence
(.github/workflows/ci.yml:29-51) — but stronger: both lowerings are diffed
directly in one process, for the same battery of lengths that the reference
sweeps (per-length SIMD tier boundaries, src/utils/unpacking/avx.rs:172-182).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from bitnuc_tpu.ops import codec  # noqa: E402
from bitnuc_tpu.ops.pallas import pack, unpack  # noqa: E402

from conftest import random_seq  # noqa: E402


CASES = [(1, 1), (3, 50), (7, 2048), (33, 2049), (300, 5000), (17, 33)]


@pytest.mark.parametrize("B,L", CASES)
def test_pack_parity(rng, B, L):
    ascii_np = rng.choice(np.frombuffer(b"ACGTacgt", dtype=np.uint8), size=(B, L))
    lens = rng.integers(0, L + 1, size=B).astype(np.int32)
    w1, fb1 = codec.encode_reads_xla(jnp.asarray(ascii_np), jnp.asarray(lens))
    w2, fb2 = pack.encode_reads_pallas(
        jnp.asarray(ascii_np), jnp.asarray(lens), interpret=True
    )
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    np.testing.assert_array_equal(np.asarray(fb1), np.asarray(fb2))


@pytest.mark.parametrize("B,L", CASES)
def test_pack_parity_invalid_bytes(rng, B, L):
    ascii_np = rng.choice(np.frombuffer(b"ACGTacgt", dtype=np.uint8), size=(B, L))
    lens = rng.integers(0, L + 1, size=B).astype(np.int32)
    bad = ascii_np.copy()
    bad[0, L // 2] = ord("N")
    if B > 1 and L > 1:
        bad[1, 0] = ord("x")
        bad[-1, L - 1] = 0
    w1, fb1 = codec.encode_reads_xla(jnp.asarray(bad), jnp.asarray(lens))
    w2, fb2 = pack.encode_reads_pallas(
        jnp.asarray(bad), jnp.asarray(lens), interpret=True
    )
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    np.testing.assert_array_equal(np.asarray(fb1), np.asarray(fb2))


@pytest.mark.parametrize("B,L", CASES)
def test_unpack_parity(rng, B, L):
    ascii_np = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(B, L))
    lens = rng.integers(0, L + 1, size=B).astype(np.int32)
    words, _ = codec.encode_reads_xla(jnp.asarray(ascii_np), jnp.asarray(lens))
    d1 = codec.decode_reads_xla(words, jnp.asarray(lens))
    d2 = unpack.decode_reads_pallas(words, jnp.asarray(lens), interpret=True)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    d1 = codec.decode_reads_xla(words, jnp.asarray(lens), max_len=L)
    d2 = unpack.decode_reads_pallas(
        words, jnp.asarray(lens), max_len=L, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_pack_golden_acgt():
    """README example through the Pallas path: ACGT -> 0b11100100."""
    a = jnp.asarray(np.frombuffer(b"ACGT", np.uint8)[None, :])
    w, fb = pack.encode_reads_pallas(a, jnp.asarray([4], jnp.int32), interpret=True)
    u64 = np.asarray(w).view(np.uint64)
    assert u64[0, 0] == 0b11100100
    assert int(fb[0]) == -1


def test_roundtrip_through_pallas(rng):
    seqs = [random_seq(rng, n) for n in (1, 31, 32, 33, 100, 1000)]
    L = max(len(s) for s in seqs)
    arr = np.zeros((len(seqs), L), np.uint8)
    lens = np.zeros(len(seqs), np.int32)
    for i, s in enumerate(seqs):
        arr[i, : len(s)] = np.frombuffer(s, np.uint8)
        lens[i] = len(s)
    w, fb = pack.encode_reads_pallas(jnp.asarray(arr), jnp.asarray(lens), interpret=True)
    assert np.all(np.asarray(fb) == -1)
    out = unpack.decode_reads_pallas(w, jnp.asarray(lens), interpret=True)
    out_np = np.asarray(out)
    for i, s in enumerate(seqs):
        assert bytes(out_np[i, : lens[i]]) == s.upper()


@pytest.mark.parametrize("B,L,k", [(4, 100, 4), (8, 64, 8), (3, 40, 6), (2, 33, 1)])
def test_histogram_kernel_parity(rng, B, L, k):
    from bitnuc_tpu.ops import kmer

    a = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(B, L))
    lens = rng.integers(0, L + 1, size=B).astype(np.int32)
    w, _ = codec.encode_reads_xla(jnp.asarray(a), jnp.asarray(lens))
    h1 = kmer.count_kmers_dense(w, jnp.asarray(lens), k)
    h2 = kmer.count_kmers_dense_pallas(w, jnp.asarray(lens), k, interpret=True)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))


def test_histogram_kernel_sentinel():
    from bitnuc_tpu.ops.pallas import histogram

    keys = jnp.asarray(np.array([3, 3, 16, 16, 16], np.int32))  # 16 = sentinel, k=2
    h = np.asarray(histogram.histogram_from_keys(keys, 2, interpret=True))
    assert h.sum() == 2 and h[3] == 2


@pytest.mark.parametrize("D,W,nb", [(100, 32, 512), (5000, 4, 50), (1, 2, 7)])
def test_hdist_scan_kernel_parity(rng, D, W, nb):
    from bitnuc_tpu.ops import hamming
    from bitnuc_tpu.ops.pallas import hamming as ph

    db = jnp.asarray(rng.integers(0, 2**32, size=(D, W), dtype=np.uint32))
    q = jnp.asarray(rng.integers(0, 2**32, size=(W,), dtype=np.uint32))
    want = np.asarray(hamming.hdist_one_to_many(q, db, nb))
    got = np.asarray(
        ph.hdist_scan_pallas(q, ph.to_word_major(db), nb, interpret=True)
    )
    np.testing.assert_array_equal(want, got)
    d1, i1 = hamming.hdist_topk(q, db, nb, 5)
    d2, i2 = ph.hdist_topk_pallas(q, ph.to_word_major(db), nb, 5, interpret=True)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_histogram_kernel_exact_past_f32_slab(rng):
    """Slab accumulation must stay exact when one bin dominates (poly-A)."""
    from bitnuc_tpu.ops.pallas import histogram

    # monkeypatch-free check of the slab loop: > 1 slab of identical keys
    n = (1 << 22) + 12345
    keys = jnp.zeros((n,), jnp.int32)
    h = np.asarray(histogram.histogram_from_keys(keys, 2, interpret=True))
    assert h[0] == n and h.sum() == n


@pytest.mark.parametrize("shape", [(2, 3, 40), (50,)])
def test_pallas_dispatch_any_rank(rng, shape):
    """backend='pallas' must engage for every input rank (no silent XLA
    fallback): leading dims flatten through the [B, L] kernel."""
    from bitnuc_tpu import config

    ascii_np = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=shape)
    lens = np.full(shape[:-1], shape[-1], np.int32)
    w_ref, fb_ref = codec.encode_reads_xla(
        jnp.asarray(ascii_np), jnp.asarray(lens)
    )
    with config.backend("pallas"):
        w, fb = codec.encode_reads(jnp.asarray(ascii_np), jnp.asarray(lens))
        out = codec.decode_reads(w, jnp.asarray(lens))
    assert w.shape == w_ref.shape and fb.shape == fb_ref.shape
    np.testing.assert_array_equal(np.asarray(w), np.asarray(w_ref))
    np.testing.assert_array_equal(np.asarray(fb), np.asarray(fb_ref))
    dec_ref = codec.decode_reads_xla(w_ref, jnp.asarray(lens))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(dec_ref))


@pytest.mark.parametrize(
    "Q,D,n_bases", [(1, 16, 32), (5, 100, 77), (64, 300, 512), (70, 513, 200)]
)
def test_hdist_scan_batch_parity(rng, Q, D, n_bases):
    """Batched Pallas scan == XLA many-to-many, odd shapes included."""
    from bitnuc_tpu.ops import hamming
    from bitnuc_tpu.ops.pallas import hamming as ph
    from bitnuc_tpu.utils import bitops

    W = bitops.n_words_for(n_bases)
    db = rng.integers(0, 2**32, size=(D, W), dtype=np.uint32)
    qs = rng.integers(0, 2**32, size=(Q, W), dtype=np.uint32)
    want = np.asarray(hamming.hdist_many_to_many(jnp.asarray(qs), jnp.asarray(db), n_bases))
    got = np.asarray(
        ph.hdist_scan_batch_pallas(
            jnp.asarray(qs), jnp.asarray(db.T.copy()), n_bases, interpret=True
        )
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("B,L,k", [(3, 40, 4), (9, 700, 8), (1, 16, 1), (20, 33, 6)])
def test_fused_words_histogram_parity(rng, B, L, k):
    """histogram_from_words (in-VMEM key generation) == dense scatter path,
    mixed lengths incl. reads shorter than k."""
    from bitnuc_tpu.ops import kmer
    from bitnuc_tpu.ops.pallas import histogram as ph
    from bitnuc_tpu.sequence import PackedReads

    seqs = [
        bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), size=int(n)))
        for n in rng.integers(1, L + 1, B)
    ]
    r = PackedReads.from_ascii(seqs, max_len=L)
    want = np.asarray(kmer.count_kmers_dense(r.words, r.lengths, k))
    got = np.asarray(
        ph.histogram_from_words(r.words, r.lengths, k, interpret=True)
    )
    np.testing.assert_array_equal(want, got)


def test_fused_words_histogram_column_slabbing(rng, monkeypatch):
    """Very long reads must slab along the word axis too (f32-exactness
    guard); forced small slabs must still match the scatter path including
    windows crossing slab boundaries."""
    from bitnuc_tpu.ops import kmer
    from bitnuc_tpu.ops.pallas import histogram as ph

    monkeypatch.setattr(ph, "FUSED_COLS_PER_SLAB", 16)
    from bitnuc_tpu.sequence import PackedReads

    n = 16 * 40 - 3  # 40 words per read, several slabs, ragged tail
    seqs = [
        bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), size=n))
        for _ in range(3)
    ]
    r = PackedReads.from_ascii(seqs)
    for k in (2, 8):
        want = np.asarray(kmer.count_kmers_dense(r.words, r.lengths, k))
        got = np.asarray(
            ph.histogram_from_words(r.words, r.lengths, k, interpret=True)
        )
        np.testing.assert_array_equal(want, got)


@pytest.mark.parametrize("k", [9])
@pytest.mark.parametrize("canonical", [False, True])
def test_histogram_k9_parity(rng, k, canonical):
    """The extended (k=9) Pallas VMEM histogram == the scatter path,
    including canonical keys and N-skip masks (interpret mode on CPU)."""
    from bitnuc_tpu.ops import kmer

    words = jnp.asarray(rng.integers(0, 2**32, (24, 12), np.uint32))
    lens = jnp.asarray(rng.integers(0, 192, 24).astype(np.int32))
    bv = rng.random((24, 192)) < 0.97
    got = kmer.count_kmers_dense_pallas(
        words, lens, k, canonical, interpret=True, base_valid=bv
    )
    want = kmer.count_kmers_dense(words, lens, k, canonical, base_valid=bv)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_wavefront_fit_parity(rng):
    """Pallas fused banded span fit == the XLA banded scan (at the
    kernel's widened band), bit-exact: costs, starts, ends — planted
    fits with edits, empty reads, and ragged lengths."""
    from bitnuc_tpu.ops import align
    from bitnuc_tpu.ops.pallas import wavefront
    from bitnuc_tpu.sequence import PackedReads

    seqs_a, seqs_b = [], []
    for i in range(24):
        la = int(rng.integers(0, 140))
        a = bytearray(random_seq(rng, la).upper())
        lead = random_seq(rng, int(rng.integers(0, 60))).upper()
        mm = bytearray(bytes(a))
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(0, max(len(mm), 1)))
            op = int(rng.integers(0, 3))
            ch = random_seq(rng, 1).upper()
            if op == 0 and mm:
                mm[p : p + 1] = ch
            elif op == 1 and mm:
                del mm[p]
            else:
                mm.insert(p, ch[0])
        seqs_a.append(bytes(a))
        seqs_b.append(lead + bytes(mm) + random_seq(rng, 30).upper())
    ra = PackedReads.from_ascii(seqs_a)
    rb = PackedReads.from_ascii(seqs_b)
    K8, off_hi_eff = wavefront._band_k8(-16, 96)
    ref = align.fit_distance_span_banded(
        ra.words, ra.lengths, rb.words, rb.lengths, 1, 1,
        off_lo=-16, off_hi=off_hi_eff,
    )
    got = wavefront.fit_distance_span_banded_pallas(
        ra.words, ra.lengths, rb.words, rb.lengths, 1, 1,
        off_lo=-16, off_hi=96, interpret=True,
    )
    for name, (f, g) in zip(("cost", "start", "end"), zip(ref, got)):
        np.testing.assert_array_equal(np.asarray(f), np.asarray(g), err_msg=name)


def test_wavefront_fit_weights_parity(rng):
    """Non-unit (mismatch, gap) costs through the Pallas kernel."""
    from bitnuc_tpu.ops import align
    from bitnuc_tpu.ops.pallas import wavefront
    from bitnuc_tpu.sequence import PackedReads

    seqs_a = [random_seq(rng, int(n)).upper() for n in rng.integers(4, 60, 8)]
    seqs_b = [random_seq(rng, int(n)).upper() for n in rng.integers(20, 120, 8)]
    ra = PackedReads.from_ascii(seqs_a)
    rb = PackedReads.from_ascii(seqs_b)
    _, off_hi_eff = wavefront._band_k8(-8, 40)
    ref = align.fit_distance_span_banded(
        ra.words, ra.lengths, rb.words, rb.lengths, 3, 2,
        off_lo=-8, off_hi=off_hi_eff,
    )
    got = wavefront.fit_distance_span_banded_pallas(
        ra.words, ra.lengths, rb.words, rb.lengths, 3, 2,
        off_lo=-8, off_hi=40, interpret=True,
    )
    for name, (f, g) in zip(("cost", "start", "end"), zip(ref, got)):
        np.testing.assert_array_equal(np.asarray(f), np.asarray(g), err_msg=name)


def test_sw_pallas_parity(rng):
    """Fused Pallas Smith-Waterman == the XLA wavefront: scores and tie-
    ruled end coordinates, ragged lengths, default and custom params."""
    from bitnuc_tpu.ops import align
    from bitnuc_tpu.ops.pallas import wavefront
    from bitnuc_tpu.sequence import PackedReads

    seqs_a, seqs_b = [], []
    for _ in range(20):
        seqs_a.append(random_seq(rng, int(rng.integers(0, 90))).upper())
        seqs_b.append(random_seq(rng, int(rng.integers(0, 120))).upper())
    base = random_seq(rng, 80).upper()
    seqs_a.append(base[10:60])  # planted local hit
    seqs_b.append(random_seq(rng, 20).upper() + base + random_seq(rng, 15).upper())
    ra = PackedReads.from_ascii(seqs_a)
    rb = PackedReads.from_ascii(seqs_b)
    for params in ((2, -3, -5, -2), (1, -1, -2, -1)):
        ref = align.sw_score(ra.words, ra.lengths, rb.words, rb.lengths, *params)
        got = wavefront.sw_score_pallas(
            ra.words, ra.lengths, rb.words, rb.lengths, *params, interpret=True
        )
        for name, (f, g) in zip(("score", "end_i", "end_j"), zip(ref, got)):
            np.testing.assert_array_equal(
                np.asarray(f), np.asarray(g), err_msg=name
            )


def test_mxu_batch_scan_parity(rng):
    """The MXU bitplane batch scan must be bit-exact with the VPU batch
    kernel and the XLA many-to-many on ragged n_bases (round 5)."""
    import jax.numpy as jnp

    from bitnuc_tpu.ops import hamming
    from bitnuc_tpu.ops.pallas.hamming import (
        hdist_scan_batch_mxu,
        hdist_scan_batch_pallas,
    )

    for Q, W, D, nb in ((5, 4, 200, 64), (130, 9, 700, 137), (64, 32, 600, 512)):
        qs = jnp.asarray(rng.integers(0, 2**32, (Q, W)).astype(np.uint32))
        db = jnp.asarray(rng.integers(0, 2**32, (W, D)).astype(np.uint32))
        want = np.asarray(
            hamming.hdist_many_to_many(qs, jnp.transpose(db), nb)
        )
        got = np.asarray(hdist_scan_batch_mxu(qs, db, nb, interpret=True))
        assert np.array_equal(got, want), (Q, W, D, nb)
        got2 = np.asarray(hdist_scan_batch_pallas(qs, db, nb, interpret=True))
        assert np.array_equal(got2, want), (Q, W, D, nb)


def test_topk_smallest_batch_parity(rng):
    """Blocked one-pass batch top-k == the iterative per-row extractor
    (values, indices, tie rule, k > D sentinel tail)."""
    import jax
    import jax.numpy as jnp

    from bitnuc_tpu.ops import hamming

    for trial in range(5):
        Q = int(rng.integers(1, 9))
        D = int(rng.integers(1, 3000))
        k = int(rng.integers(1, 40))
        vals = jnp.asarray(rng.integers(0, 300, (Q, D)).astype(np.int32))
        want = jax.vmap(lambda row: hamming.topk_smallest(row, k))(vals)
        got = hamming.topk_smallest_batch(vals, k)
        for g, w in zip(got, want):
            assert np.array_equal(np.asarray(g), np.asarray(w)), (trial, Q, D, k)
    # all-ties: index tiebreak must hold across chunk boundaries
    vals = jnp.zeros((3, 1500), jnp.int32)
    want = jax.vmap(lambda row: hamming.topk_smallest(row, 20))(vals)
    got = hamming.topk_smallest_batch(vals, 20)
    assert np.array_equal(np.asarray(got[0]), np.asarray(want[0]))
    assert np.array_equal(np.asarray(got[1]), np.asarray(want[1]))
