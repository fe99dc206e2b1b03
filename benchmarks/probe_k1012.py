"""k=10-12 engine race (VERDICT r4 item 4): the dense scatter holds this
regime (~130 Mkmers/s, DESIGN §4b) but the runs/sorted engine — 263 M at
k=21 and key-width-independent — was never raced here. Same-run, at the
bench_kmer shapes (1024 x 16384), all three engines per k.

Run: python benchmarks/probe_k1012.py   (real TPU)
"""
import json
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bitnuc_tpu import config

config.enable_compilation_cache()
from bitnuc_tpu.ops import kmer
from bitnuc_tpu.utils.bitops import n_words_for
from bitnuc_tpu.utils.timing import amortized_seconds_per_call


def emit(n, v, u):
    print(json.dumps({"probe": n, "value": round(v, 2), "unit": u}), flush=True)


batch, read_len = 1024, 16384
W = n_words_for(read_len)


def make(key):
    w = jax.random.bits(key, (batch, W), jnp.uint32)
    return (w, jnp.full((batch,), read_len, jnp.int32))


import bench

emit("xor_copy_64", bench.bench_memcpy(64), "GB/s")
for k in (10, 11, 12):
    nk = batch * (read_len - k + 1)
    for mode in ("dense", "runs"):
        t = amortized_seconds_per_call(
            lambda w, l, k=k, mode=mode: kmer.count_kmers_reads(
                w, l, k, mode=mode
            ),
            make,
        )
        emit(f"k{k}_{mode}", nk / t / 1e6, "Mkmers/s")
emit("xor_copy_64_end", bench.bench_memcpy(64), "GB/s")
