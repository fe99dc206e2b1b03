"""Real-TPU kernel parity sweep: every Pallas kernel vs its XLA twin ON CHIP.

The CI matrix (BITNUC_BACKEND=pallas on CPU) runs kernels in INTERPRET mode
— it proves semantics, not Mosaic lowering. The on-chip lowering is what
actually ships, and this round's history shows lowering-level hazards are
real (relayout crashes, 32-bit-only rolls, i1-select truncation). This
script runs every kernel pair on randomized shapes on the live chip and
asserts bit-exactness. Run:  python scripts/chip_parity.py  (TPU required;
~2-5 min warm, longer on a cold compile cache).
"""

import sys

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from bitnuc_tpu import config

config.enable_compilation_cache()

assert jax.default_backend() == "tpu", jax.default_backend()
rng = np.random.default_rng(20260820)


def check(name, got, want):
    got, want = np.asarray(got), np.asarray(want)
    assert got.shape == want.shape, (name, got.shape, want.shape)
    assert np.array_equal(got, want), name
    print(f"  ok  {name}", flush=True)


def rand_words(B, W):
    return jnp.asarray(rng.integers(0, 2**32, (B, W), dtype=np.uint32))


print("codec kernels", flush=True)
from bitnuc_tpu.ops import codec
from bitnuc_tpu.ops.pallas import pack as ppack, unpack as punpack
from bitnuc_tpu.utils import bitops

for B, L in ((33, 64), (128, 301)):
    lens = jnp.asarray(rng.integers(0, L + 1, B).astype(np.int32))
    codes = jnp.asarray(rng.integers(0, 4, (B, L)).astype(np.int32))
    ascii_u8 = bitops.code_to_ascii(codes)
    wx, fx = codec.encode_reads_xla(ascii_u8, lens)
    wp, fp = ppack.encode_reads_pallas(ascii_u8, lens)
    check(f"encode[{B},{L}]", wp, wx)
    check(f"encode_firstbad[{B},{L}]", fp, fx)
    dx = codec.decode_reads_xla(wx, lens)
    dp = punpack.decode_reads_pallas(wx, lens)
    check(f"decode[{B},{L}]", dp, dx)

print("hamming kernels", flush=True)
from bitnuc_tpu.ops import hamming
from bitnuc_tpu.ops.pallas import hamming as ph

for W, D, nb in ((4, 1000, 64), (32, 3000, 512)):
    q = rand_words(1, W)[0]
    dbr = rand_words(D, W)
    wm = jnp.transpose(dbr)
    want = hamming.hdist_one_to_many(q, dbr, nb)
    got = ph.hdist_scan_pallas(q, wm, nb)
    check(f"hdist_scan[{W},{D}]", got, want)
    qs = rand_words(17, W)
    wantb = hamming.hdist_many_to_many(qs, dbr, nb)
    check(f"hdist_batch_vpu[{W},{D}]", ph.hdist_scan_batch_pallas(qs, wm, nb), wantb)
    check(f"hdist_batch_mxu[{W},{D}]", ph.hdist_scan_batch_mxu(qs, wm, nb), wantb)

print("blocked top-k", flush=True)
vals = jnp.asarray(rng.integers(0, 300, (9, 2777)).astype(np.int32))
want = jax.vmap(lambda r: hamming.topk_smallest(r, 20))(vals)
got = hamming.topk_smallest_batch(vals, 20)
check("topk_batch_d", got[0], want[0])
check("topk_batch_i", got[1], want[1])

print("histogram kernels", flush=True)
from bitnuc_tpu.ops import kmer as K

for B, L, k in ((64, 200, 6), (32, 500, 9)):
    reads = rand_words(B, bitops.n_words_for(L))
    lens = jnp.asarray(rng.integers(k, L + 1, B).astype(np.int32))
    with config.backend("xla"):
        want = K.count_kmers_dense(reads, lens, k, canonical=True)
    got = K.count_kmers_dense_pallas(reads, lens, k, True)
    check(f"hist[{B},{L},k{k}]", got, want)

print("merge engine", flush=True)
from bitnuc_tpu.ops.pallas.merge import merge_sorted

n = 5000
a = [jnp.sort(jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32)))]
b = [jnp.sort(jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32)))]
pay_a = [jnp.asarray(rng.integers(0, 2**31, n, dtype=np.int32).astype(np.uint32))]
pay_b = [jnp.asarray(rng.integers(0, 2**31, n, dtype=np.int32).astype(np.uint32))]
got = merge_sorted(tuple(a + pay_a), tuple(b + pay_b), n_keys=1, pad_val=(0,))
k_s, p_s = jax.lax.sort(
    (jnp.concatenate([a[0], b[0]]), jnp.concatenate([pay_a[0], pay_b[0]])),
    num_keys=1,
)
check("merge_keys", got[0][: 2 * n], k_s)
# payload order within equal keys may differ (engine not stable): compare
# (key, payload) multisets instead
gp = np.stack([np.asarray(got[0][: 2 * n]), np.asarray(got[1][: 2 * n])])
wp = np.stack([np.asarray(k_s), np.asarray(p_s)])
check("merge_pairs_sorted", np.sort(gp, axis=1), np.sort(wp, axis=1))

print("wavefront fit", flush=True)
from bitnuc_tpu import mapper
from bitnuc_tpu.sequence import PackedReads

ref = rng.choice(np.frombuffer(b"ACGT", np.uint8), 4000).tobytes()
idx = mapper.MinimizerIndex.build(ref, k=15, w=10)
reads = PackedReads.from_ascii(
    [ref[37 * i : 37 * i + 100] for i in range(64)]
)
with config.backend("pallas"):
    got = mapper.map_reads(idx, reads)
with config.backend("xla"):
    mapper._map_core.clear_cache()
    want = mapper.map_reads(idx, reads)
for f in ("mapped", "ref_start", "ref_end", "cost", "strand"):
    check(f"map.{f}", got[f], want[f])

print("orf kernel", flush=True)
from bitnuc_tpu.ops import orf

reads = rand_words(128, 8)
lens = jnp.asarray(rng.integers(1, 129, 128).astype(np.int32))
with config.backend("pallas"):
    orf.longest_orf.clear_cache()
    got = orf.longest_orf(reads, lens)
with config.backend("xla"):
    orf.longest_orf.clear_cache()
    want = orf.longest_orf(reads, lens)
orf.longest_orf.clear_cache()
for g, w, nm in zip(got, want, ("len", "start", "end", "rc", "stop")):
    check(f"orf.{nm}", g, w)

print("ALL CHIP PARITY OK", flush=True)
