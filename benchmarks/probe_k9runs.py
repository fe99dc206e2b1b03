"""k=9: runs engine vs the extended Pallas VMEM histogram (round 5).

The VMEM histogram extended the MXU path to k=9 in round 3 (257 vs 131
scatter); the runs engine's sort is key-width-independent, so round 5
raced it at k=9 across read-length regimes (probe_pipeline2 showed one
k<=9 kernel losing 15x specifically on short reads — the regime must be
checked, not assumed).

Run: python benchmarks/probe_k9runs.py   (real TPU)
Measured 2026-08-20 (cal 18.7-19.4 GB/s): runs 377 vs hist 286 Mkmers/s
at [1024, 16384]; 268 vs 216 at [16384, 300]; 288 vs 242 at [65536, 150]
— runs wins 1.2-1.3x everywhere, so mode='auto_layout' hands k=9 to runs
on TPU. The managed pipeline deliberately keeps the dense engine at k=9
(auto_dense_max_k docstring: int32 sparse window cap vs unbounded dense
fold at genome scale).
"""
import json
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from bitnuc_tpu import config

config.enable_compilation_cache()
from bitnuc_tpu.ops import kmer as K
from bitnuc_tpu.utils import bitops
from bitnuc_tpu.utils.timing import amortized_seconds_per_call

import bench


def emit(n, v, u):
    print(json.dumps({"probe": n, "value": round(v, 2), "unit": u}), flush=True)


emit("xor_copy_64", bench.bench_memcpy(64), "GB/s")
k = 9
for batch, read_len in ((1024, 16384), (16384, 300), (65536, 150)):
    W = bitops.n_words_for(read_len)

    def make(key):
        return (
            jax.random.bits(key, (batch, W), jnp.uint32),
            jnp.full((batch,), read_len, jnp.int32),
        )

    nk = batch * (read_len - k + 1)

    @jax.jit
    def hist_path(w, l):
        return jnp.sum(K.count_kmers_dense_pallas(w, l, k, False))

    t = amortized_seconds_per_call(hist_path, make)
    emit(f"k9_hist_[{batch},{read_len}]", nk / t / 1e6, "Mkmers/s")

    @jax.jit
    def runs_path(w, l):
        lo, hi, ct, n = K.count_kmers_runs(w, l, k, canonical=False)
        return jnp.sum(ct) + jnp.sum(lo[:8])

    t = amortized_seconds_per_call(runs_path, make)
    emit(f"k9_runs_[{batch},{read_len}]", nk / t / 1e6, "Mkmers/s")
emit("xor_copy_64_end", bench.bench_memcpy(64), "GB/s")
