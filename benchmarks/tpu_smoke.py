"""Real-TPU compiled-kernel correctness smoke (not part of the CPU CI).

CI runs every Pallas kernel in interpret mode on the 8-virtual-device CPU
mesh; this script runs the COMPILED kernels on the actual chip and checks
them against the numpy oracle / XLA paths: fused words->histogram (k=4,8),
keys histogram, single- and multi-query hdist scans, pack/unpack roundtrip.
Run:  python benchmarks/tpu_smoke.py   (requires the TPU platform)

Last verified 2026-08-17: ALL TPU KERNEL SMOKES PASSED.
"""
import sys; sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
from bitnuc_tpu import config, oracle
config.enable_compilation_cache()
assert jax.default_backend() != "cpu", jax.default_backend()
from bitnuc_tpu.sequence import PackedReads
from bitnuc_tpu.ops import kmer, hamming
from bitnuc_tpu.ops.pallas import hamming as ph, histogram as phist, pack as ppack, unpack as punpack

rng = np.random.default_rng(424)
seqs = [bytes(rng.choice(np.frombuffer(b"ACGTacgt", np.uint8), size=int(n))) for n in rng.integers(5, 900, 64)]
r = PackedReads.from_ascii(seqs, max_len=960)

for k in (4, 8):
    got = np.asarray(phist.histogram_from_words(r.words, r.lengths, k))
    expect = {}
    for s in seqs:
        for key, c in oracle.count_kmers(s.upper(), k).items():
            expect[key] = expect.get(key, 0) + c
    assert got.sum() == sum(expect.values()), k
    for key, c in expect.items():
        assert got[key] == c, (k, key)
print("fused histogram TPU OK", flush=True)

h2 = np.asarray(kmer.count_kmers_dense_pallas(r.words, r.lengths, 6))
h2d = np.asarray(kmer.count_kmers_dense(r.words, r.lengths, 6))
assert np.array_equal(h2, h2d)
print("keys histogram TPU OK", flush=True)

D, Q, L = 700, 33, 256
db = rng.integers(0, 2**32, size=(D, 16), dtype=np.uint32)
qs = rng.integers(0, 2**32, size=(Q, 16), dtype=np.uint32)
want = np.asarray(hamming.hdist_many_to_many(jnp.asarray(qs), jnp.asarray(db), L))
got = np.asarray(ph.hdist_scan_batch_pallas(jnp.asarray(qs), jnp.asarray(db.T.copy()), L))
assert np.array_equal(want, got)
got1 = np.asarray(ph.hdist_scan_pallas(jnp.asarray(qs[0]), jnp.asarray(db.T.copy()), L))
assert np.array_equal(got1, want[0])
print("hdist kernels TPU OK", flush=True)

a = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=(33, 200))
lens = np.full(33, 200, np.int32)
w, fb = ppack.encode_reads_pallas(jnp.asarray(a), jnp.asarray(lens))
dec = np.asarray(punpack.decode_reads_pallas(w, jnp.asarray(lens)))
assert np.all(np.asarray(fb) == -1) and np.array_equal(dec[:, :200], a)
print("pack/unpack kernels TPU OK", flush=True)
print("ALL TPU KERNEL SMOKES PASSED", flush=True)
