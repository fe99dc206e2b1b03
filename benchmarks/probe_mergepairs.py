"""Packed-domain vs code-plane offset scan for merge_pairs (round 5).

The code-plane scan re-reads two [B, L] i32 planes per offset; the packed
scan reads two [B, W] u32 planes (16 bases/word). Same-run A/B with a
bit-exactness assert on the full outputs.

Run: python benchmarks/probe_mergepairs.py   (real TPU)
"""
import json
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from bitnuc_tpu import config

config.enable_compilation_cache()
from bitnuc_tpu.ops import merge_pairs as mp
from bitnuc_tpu.sequence import PackedReads
from bitnuc_tpu.utils.timing import amortized_seconds_per_call


def emit(n, v, u):
    print(json.dumps({"probe": n, "value": round(v, 2), "unit": u}), flush=True)


batch, read_len, frag_len = 16384, 150, 250
rng = np.random.default_rng(13)
frag = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=(batch, frag_len))
comp = frag[:, ::-1]
comp = np.frombuffer(b"ACGT", np.uint8)[
    3 - np.searchsorted(np.frombuffer(b"ACGT", np.uint8), comp)
]
r1 = PackedReads.from_ascii(frag[:, :read_len], lengths=np.full(batch, read_len, np.int32))
r2 = PackedReads.from_ascii(comp[:, :read_len], lengths=np.full(batch, read_len, np.int32))


def make(key):
    perm = jax.random.permutation(key, batch)
    return (r1.words[perm], r1.lengths, r2.words[perm], r2.lengths)


# bit-exactness first (ragged lengths to stress masks)
lens_r = np.full(batch, read_len, np.int32)
lens_r[: batch // 4] = rng.integers(40, read_len, size=batch // 4)
a = mp.merge_pairs(r1.words, jnp.asarray(lens_r), r2.words, r2.lengths, scan="packed")
b = mp.merge_pairs(r1.words, jnp.asarray(lens_r), r2.words, r2.lengths, scan="codes")
for x, y, nm in zip(a, b, ("words", "lens", "merged", "ov", "mm")):
    assert np.array_equal(np.asarray(x), np.asarray(y)), nm
print("bit-exact OK", flush=True)

import bench

emit("xor_copy_64", bench.bench_memcpy(64), "GB/s")
t = amortized_seconds_per_call(
    lambda w1, l1, w2, l2: mp.merge_pairs(w1, l1, w2, l2, scan="codes"), make
)
emit("merge_codes", batch / t / 1e3, "Kpairs/s")
t = amortized_seconds_per_call(
    lambda w1, l1, w2, l2: mp.merge_pairs(w1, l1, w2, l2, scan="packed"), make
)
emit("merge_packed", batch / t / 1e3, "Kpairs/s")
emit("xor_copy_64_end", bench.bench_memcpy(64), "GB/s")
