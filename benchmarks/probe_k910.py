"""k=9/10 dense counting: extended Pallas MXU histogram vs the scatter path
(VERDICT r3 item 6 — round 2 left k=9..12 as the slowest regime at ~137
Mkmers/s scatter; the [4^k] f32 VMEM accumulator is 1 MB at k=9 / 4 MB at
k=10, so the MXU kernel now reaches there with narrowed key tiles).

Parity gate first (vs the scatter histogram on identical reads), then
at-scale same-run rates: pallas keys kernel, XLA scatter, and the XLA MXU
matmul histogram for context.

Run: python benchmarks/probe_k910.py   (real TPU)
"""
import json
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from bitnuc_tpu import config

config.enable_compilation_cache()
from bitnuc_tpu.ops import kmer
from bitnuc_tpu.ops.pallas import histogram
from bitnuc_tpu.utils.bitops import n_words_for
from bitnuc_tpu.utils.timing import amortized_seconds_per_call


def emit(n, v, u):
    print(json.dumps({"probe": n, "value": round(v, 2), "unit": u}), flush=True)


# -- parity (small shapes, compiled mode on the real chip) -------------------
rng = np.random.default_rng(9)
for k in (9, 10):
    words = jnp.asarray(rng.integers(0, 2**32, (64, 40), np.uint32))
    lens = jnp.asarray(rng.integers(0, 640, 64).astype(np.int32))
    lo, _, valid = kmer._window_keys(words, lens, k, False)
    keys = jnp.where(valid, lo, jnp.uint32(4**k)).astype(jnp.int32).reshape(-1)
    got = np.asarray(histogram.histogram_from_keys(keys, k))
    want = np.asarray(kmer.count_kmers_dense(words, lens, k))
    assert got.shape == want.shape and (got == want).all(), k
print(json.dumps({"probe": "parity_k9_k10", "value": 1, "unit": "ok"}), flush=True)

# -- at-scale rates -----------------------------------------------------------
batch, read_len = 1024, 16384
W = n_words_for(read_len)


def make(key):
    w = jax.random.bits(key, (batch, W), jnp.uint32)
    return (w, jnp.full((batch,), read_len, jnp.int32))


def pallas_keys(w, l, k):
    lo, _, valid = kmer._window_keys(w, l, k, False)
    keys = jnp.where(valid, lo, jnp.uint32(4**k)).astype(jnp.int32).reshape(-1)
    return histogram.histogram_from_keys(keys, k)


import bench

emit("xor_copy_128", bench.bench_memcpy(128), "GB/s")
nwin = batch * (read_len - 9 + 1)
for k in (9, 10):
    for name, fn in (
        (f"pallas_keys_k{k}", lambda w, l, k=k: pallas_keys(w, l, k)),
        (f"scatter_k{k}", lambda w, l, k=k: kmer.count_kmers_dense(w, l, k)),
        (f"xla_mxu_k{k}", lambda w, l, k=k: kmer.count_kmers_dense_mxu(w, l, k)
         if k <= kmer.MAX_MXU_K else kmer.count_kmers_dense(w, l, k)),
    ):
        if name.startswith("xla_mxu") and k > kmer.MAX_MXU_K:
            continue
        try:
            t = amortized_seconds_per_call(fn, make, k=2, reps=5)
            emit(name, batch * (read_len - k + 1) / t / 1e6, "Mkmers/s")
        except Exception as e:
            print(json.dumps({"probe": name, "error": repr(e)[:300]}), flush=True)
emit("xor_copy_128_end", bench.bench_memcpy(128), "GB/s")
