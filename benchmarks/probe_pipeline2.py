"""Short-read histogram dispatch probe: at FASTQ pipeline shapes
([16384, 20] words — 300bp reads) the fused Pallas kernel pads the word
axis 20 -> cw (512 at k=8), wasting ~25x kernel work; probe_pipeline
measured the count stage at ~22 Mkmers/s inside the pipeline vs 500 at
long-read shapes. Compare: fused (current), fused with cw clamped to the
real word count, the keys-path Pallas kernel, XLA MXU, scatter.

Run: python benchmarks/probe_pipeline2.py   (real TPU)
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
from bitnuc_tpu.utils.timing import amortized_seconds_per_call


def emit(n, v, u):
    print(json.dumps({"probe": n, "value": round(v, 2), "unit": u}), flush=True)


B, W, k = 16384, 20, 8
read_len = 300


def make(key):
    w = jax.random.bits(key, (B, W), jnp.uint32)
    return (w, jnp.full((B,), read_len, jnp.int32))


def keys_pallas(w, l):
    lo, _, valid = kmer._window_keys(w, l, k, False)
    keys = jnp.where(valid, lo, jnp.uint32(4**k)).astype(jnp.int32).reshape(-1)
    return histogram.histogram_from_keys(keys, k)


import bench

emit("xor_copy_64", bench.bench_memcpy(64), "GB/s")
nwin = B * (read_len - k + 1)
for name, fn in (
    ("fused_current", lambda w, l: histogram.histogram_from_words(w, l, k)),
    ("keys_pallas", keys_pallas),
    ("xla_mxu", lambda w, l: kmer.count_kmers_dense_mxu(w, l, k)),
    ("scatter", lambda w, l: kmer.count_kmers_dense(w, l, k)),
):
    try:
        t = amortized_seconds_per_call(fn, make, k=4, reps=5)
        emit(name, nwin / t / 1e6, "Mkmers/s")
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:300]}), flush=True)
emit("xor_copy_64_end", bench.bench_memcpy(64), "GB/s")
