"""Distributed paths on the 8-device CPU mesh: sharded results must equal the
single-device (and oracle) results exactly."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bitnuc_tpu import oracle, parallel
from bitnuc_tpu.ops import hamming, kmer
from bitnuc_tpu.sequence import PackedReads
from conftest import random_seq


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return parallel.make_mesh((8,), ("data",))


def test_mesh_has_8_devices(mesh):
    assert mesh.shape["data"] == 8


def test_shard_reads_pads_and_shards(mesh):
    reads = PackedReads.from_ascii([b"ACGT"] * 5)  # 5 -> padded to 8
    sharded = parallel.shard_reads(reads, mesh)
    assert sharded.batch_size == 8
    assert int(np.asarray(sharded.lengths)[5]) == 0  # padding is empty read


def test_count_kmers_sharded_matches_local(rng, mesh):
    k = 6
    seqs = [random_seq(rng, int(n)).upper() for n in rng.integers(10, 300, 64)]
    reads = PackedReads.from_ascii(seqs)
    sharded = parallel.shard_reads(reads, mesh)
    hist_sharded = np.asarray(
        parallel.count_kmers_sharded(sharded.words, sharded.lengths, k, mesh)
    )
    hist_local = np.asarray(kmer.count_kmers_dense(reads.words, reads.lengths, k))
    np.testing.assert_array_equal(hist_sharded, hist_local)
    # and vs oracle
    expect = {}
    for s in seqs:
        for key, c in oracle.count_kmers(s, k).items():
            expect[key] = expect.get(key, 0) + c
    assert hist_sharded.sum() == sum(expect.values())


@pytest.mark.parametrize("k", [4, 11])
def test_count_kmers_seqsharded_matches_oracle(rng, k, mesh):
    # one long sequence, words sharded across 8 devices; windows cross shards
    n = 16 * 128 - 5  # not word-aligned end
    s = random_seq(rng, n).upper()
    reads = PackedReads.from_ascii([s])
    Wtot = reads.n_words  # 256 u32 words -> 32 per shard
    words = jnp.asarray(np.asarray(reads.words)[0])
    seq_mesh = parallel.make_mesh((8,), ("seq",))
    hist = np.asarray(
        parallel.count_kmers_seqsharded(words, jnp.int32(n), k, seq_mesh)
    )
    expect = oracle.count_kmers(s, k)
    assert hist.sum() == sum(expect.values()) == n - k + 1
    for key, c in expect.items():
        assert hist[key] == c, key


def test_hdist_search_sharded_matches_local(rng, mesh):
    n = 64
    D = 512
    q = random_seq(rng, n).upper()
    db_seqs = [random_seq(rng, n).upper() for _ in range(D)]
    db_seqs[137] = q  # plant an exact match off the first shard
    db = PackedReads.from_ascii(db_seqs)
    qr = PackedReads.from_ascii([q])
    db_sh = parallel.shard_reads(db, mesh)

    d_sh, i_sh = parallel.hdist_search_sharded(
        qr.words[0], db_sh.words, n, 10, mesh
    )
    d_loc, i_loc = hamming.hdist_topk(qr.words[0], db.words, n, 10)
    np.testing.assert_array_equal(np.asarray(d_sh), np.asarray(d_loc))
    assert int(np.asarray(i_sh)[0]) == 137
    # same candidate set (indices may tie-break differently across shards)
    all_d = np.asarray(hamming.hdist_one_to_many(qr.words[0], db.words, n))
    np.testing.assert_array_equal(np.asarray(d_sh), np.sort(all_d)[:10])


def test_hdist_many_to_many_sharded(rng, mesh):
    n = 32
    qs = [random_seq(rng, n).upper() for _ in range(4)]
    db_seqs = [random_seq(rng, n).upper() for _ in range(64)]
    q = PackedReads.from_ascii(qs)
    db = PackedReads.from_ascii(db_seqs)
    db_sh = parallel.shard_reads(db, mesh)
    mat = np.asarray(
        parallel.hdist_many_to_many_sharded(q.words, db_sh.words, n, mesh)
    )
    for i, qi in enumerate(qs):
        for j, dj in enumerate(db_seqs):
            assert mat[i, j] == oracle.hdist(oracle.encode(qi), oracle.encode(dj), n)


def test_encode_under_pjit_batch_sharding(rng, mesh):
    """encode_reads composes with jit + batch sharding (GSPMD path)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bitnuc_tpu.ops import codec

    seqs = [random_seq(rng, 100).upper() for _ in range(16)]
    arr = np.stack([np.frombuffer(s, np.uint8) for s in seqs])
    lens = np.full(16, 100, np.int32)
    a = jax.device_put(jnp.asarray(arr), NamedSharding(mesh, P("data", None)))
    l = jax.device_put(jnp.asarray(lens), NamedSharding(mesh, P("data")))
    words, first_bad = codec.encode_reads_xla(a, l)
    assert np.all(np.asarray(first_bad) == -1)
    got = np.asarray(words)
    from bitnuc_tpu.utils import bitops

    u64 = bitops.words_u32_to_u64_np(got)
    for i, s in enumerate(seqs):
        e = oracle.encode(s)
        np.testing.assert_array_equal(u64[i, : len(e)], e)


def test_count_kmers_sorted_sharded(rng):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bitnuc_tpu.ops import codec, kmer as kmer_ops
    from bitnuc_tpu.parallel import kmer as pkmer, mesh as pmesh

    m = pmesh.make_mesh((8,), ("data",))
    B, L, k = 16, 200, 21
    a = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(B, L))
    lens = rng.integers(0, L + 1, size=B).astype(np.int32)
    words, _ = codec.encode_reads_xla(jnp.asarray(a), jnp.asarray(lens))

    lo1, hi1, c1, n1 = kmer_ops.count_kmers_sorted(words, jnp.asarray(lens), k)
    want = {
        (int(np.asarray(hi1)[i]), int(np.asarray(lo1)[i])): int(np.asarray(c1)[i])
        for i in range(int(n1))
    }

    ws = jax.device_put(words, NamedSharding(m, P("data", None)))
    ls = jax.device_put(jnp.asarray(lens), NamedSharding(m, P("data")))
    lo2, hi2, c2, n2 = pkmer.count_kmers_sorted_sharded(ws, ls, k, m, "data")
    # run-start layout: distinct keys are the positive-count slots
    glo, ghi, gct = kmer_ops.compact_runs(lo2, hi2, c2)
    got = {
        (int(ghi[i]), int(glo[i])): int(gct[i]) for i in range(len(gct))
    }
    assert int(n2) == len(gct)
    assert got == want


def test_count_kmers_sharded_modes(rng):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bitnuc_tpu.ops import codec, kmer as kmer_ops
    from bitnuc_tpu.parallel import kmer as pkmer, mesh as pmesh

    m = pmesh.make_mesh((8,), ("data",))
    B, L, k = 16, 100, 5
    a = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(B, L))
    lens = np.full(B, L, np.int32)
    words, _ = codec.encode_reads_xla(jnp.asarray(a), jnp.asarray(lens))
    want = np.asarray(kmer_ops.count_kmers_dense(words, jnp.asarray(lens), k))

    ws = jax.device_put(words, NamedSharding(m, P("data", None)))
    ls = jax.device_put(jnp.asarray(lens), NamedSharding(m, P("data")))
    for mode in ("mxu", "dense"):
        got = np.asarray(pkmer.count_kmers_sharded(ws, ls, k, m, "data", mode=mode))
        np.testing.assert_array_equal(got, want)
    can = np.asarray(
        pkmer.count_kmers_sharded(ws, ls, k, m, "data", canonical=True)
    )
    want_can = np.asarray(
        kmer_ops.count_kmers_dense(words, jnp.asarray(lens), k, canonical=True)
    )
    np.testing.assert_array_equal(can, want_can)


def test_hdist_search_db_sharded(rng):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    import bitnuc_tpu as bn
    from bitnuc_tpu.ops import hamming
    from bitnuc_tpu.parallel import mesh as pmesh, search

    m = pmesh.make_mesh((8,), ("data",))
    D, L = 64, 96
    db_ascii = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=(D, L))
    reads = bn.PackedReads.from_ascii(db_ascii, lengths=np.full(D, L, np.int32))
    db = bn.PackedDB.from_reads(reads)
    q = jax.device_put(reads.words[5], NamedSharding(m, P()))
    wm = jax.device_put(db.words_wm, NamedSharding(m, P(None, "data")))

    dn = np.asarray(hamming.hdist_one_to_many(reads.words[5], reads.words, L))
    order = np.argsort(dn, kind="stable")
    d, i = search.hdist_search_db_sharded(q, wm, L, 4, m, "data")
    np.testing.assert_array_equal(np.asarray(d), dn[order[:4]])
    assert int(i[0]) == 5


def test_hdist_search_batch_sharded_matches_local(rng, mesh):
    """Multi-query sharded top-k == per-query local top-k, both layouts."""
    from bitnuc_tpu.parallel import search

    Q, D, L, topk = 7, 64, 96, 5
    db_ascii = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=(D, L))
    reads = PackedReads.from_ascii(db_ascii, lengths=np.full(D, L, np.int32))
    q_ascii = db_ascii[:Q].copy()
    q_ascii[0, 0] ^= 6  # mutate one base of query 0 (A<->G)
    queries = PackedReads.from_ascii(q_ascii, lengths=np.full(Q, L, np.int32))

    want_d, want_i = hamming.hdist_topk_batch(queries.words, reads.words, L, topk)
    want_d, want_i = np.asarray(want_d), np.asarray(want_i)
    assert want_d[1, 0] == 0 and want_i[1, 0] == 1  # exact self-hit

    d, i = search.hdist_search_batch_sharded(
        queries.words, reads.words, L, topk, mesh, "data"
    )
    np.testing.assert_array_equal(np.asarray(d), want_d)
    np.testing.assert_array_equal(np.asarray(i), want_i)

    # word-major twin (PackedDB layout)
    import bitnuc_tpu as bn

    db = bn.PackedDB.from_reads(reads)
    d2, i2 = search.hdist_search_batch_db_sharded(
        queries.words, db.words_wm, L, topk, mesh, "data"
    )
    np.testing.assert_array_equal(np.asarray(d2), want_d)
    np.testing.assert_array_equal(np.asarray(i2), want_i)


@pytest.mark.parametrize("k", [13, 21, 32])
def test_count_kmers_seqsharded_sorted_matches_oracle(rng, k):
    """Large-k seq-sharding: one long sequence, words sharded across 8
    devices, halo-covered windows cross shard edges; sparse sorted counts
    must equal the oracle exactly (the k=21 headline workload at pod
    scale)."""
    n = 16 * 128 - 5  # not word-aligned end
    s = random_seq(rng, n).upper()
    reads = PackedReads.from_ascii([s])
    words = jnp.asarray(np.asarray(reads.words)[0])
    seq_mesh = parallel.make_mesh((8,), ("seq",))
    lo, hi, cnt, nu = parallel.count_kmers_seqsharded_sorted(
        words, jnp.int32(n), k, seq_mesh
    )
    # run-start layout: distinct keys are the positive-count slots
    glo, ghi, gct = kmer.compact_runs(lo, hi, cnt)
    assert int(nu) == len(gct)
    got = {
        (int(ghi[i]) << 32) | int(glo[i]): int(gct[i]) for i in range(len(gct))
    }
    expect = oracle.count_kmers(s, k)
    assert got == expect
    # and equals the unsharded sorted path's content
    lo1, hi1, cnt1, nu1 = kmer.count_kmers_sorted(reads.words, reads.lengths, k)
    nu1 = int(nu1)
    lo1, hi1, cnt1 = np.asarray(lo1), np.asarray(hi1), np.asarray(cnt1)
    np.testing.assert_array_equal(glo, lo1[:nu1])
    np.testing.assert_array_equal(ghi, hi1[:nu1])
    np.testing.assert_array_equal(gct, cnt1[:nu1])


def test_analysis_on_sharded_reads(rng, mesh):
    """Per-read analytics need no collectives: GSPMD partitions the batch
    axis automatically from the input sharding."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bitnuc_tpu.ops import analysis

    seqs = [random_seq(rng, 96).upper() for _ in range(32)]
    reads = PackedReads.from_ascii(seqs)
    ws = jax.device_put(reads.words, NamedSharding(mesh, P("data", None)))
    ls = jax.device_put(reads.lengths, NamedSharding(mesh, P("data")))
    gc_sh = np.asarray(analysis.gc_content_reads(ws, ls))
    bc_sh = np.asarray(analysis.base_counts_reads(ws, ls))
    np.testing.assert_allclose(
        gc_sh, np.asarray(analysis.gc_content_reads(reads.words, reads.lengths)),
        rtol=1e-6,
    )
    np.testing.assert_array_equal(
        bc_sh, np.asarray(analysis.base_counts_reads(reads.words, reads.lengths))
    )


@pytest.mark.parametrize("shape,axes", [((4, 2), ("data", "model")),
                                        ((2, 4), ("q", "d"))])
def test_hdist_search_grid_2d(rng, shape, axes):
    """2-D grid search (queries x database sharded on separate axes) ==
    the single-device per-query top-k, bit-exact."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import numpy as np

    from bitnuc_tpu.ops import hamming
    from bitnuc_tpu.parallel import search as psearch

    mesh = jax.make_mesh(shape, axes, devices=jax.devices()[:8])
    Q, D, read_len = 16, 64, 96
    W = 12
    qs = jnp.asarray(rng.integers(0, 2**32, (Q, W), np.uint32))
    db = jnp.asarray(rng.integers(0, 2**32, (D, W), np.uint32))
    db_wm = jnp.transpose(db)
    dd, ii = psearch.hdist_search_grid(
        qs, db_wm, read_len, 5, mesh, axes[0], axes[1]
    )
    want_d, want_i = hamming.hdist_topk_batch(qs, db, read_len, 5)
    assert np.array_equal(np.asarray(dd), np.asarray(want_d))
    assert np.array_equal(np.asarray(ii), np.asarray(want_i))

    # padded-database masking: D not a multiple of the axis -> d_valid
    D2 = 50
    db2 = jnp.transpose(db)[:, :D2]
    pad = (-D2) % shape[1]
    db2p = jnp.pad(db2, ((0, 0), (0, pad)))
    dd2, ii2 = psearch.hdist_search_grid(
        qs, db2p, read_len, 5, mesh, axes[0], axes[1], d_valid=D2
    )
    want_d2, want_i2 = hamming.hdist_topk_batch(qs, db[:D2], read_len, 5)
    assert np.array_equal(np.asarray(dd2), np.asarray(want_d2))
    assert np.array_equal(np.asarray(ii2), np.asarray(want_i2))
