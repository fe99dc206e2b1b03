"""Probe: dense histograms for k=9..12 — direct scatter vs runs-hybrid.

auto mode uses the scatter-add dense histogram for MAX_MXU_K < k <=
MAX_DENSE_K on TPU (scatter: ~60-100 Mkeys/s measured). Hybrid candidate:
sort-based runs (scatter-free), compact live runs to the front with one
more stable sort, then scatter only min(4^k+1, N) entries — for k where
4^k << N the scatter shrinks by N/4^k.
"""

import json
import sys
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bitnuc_tpu import config

config.enable_compilation_cache()

from bitnuc_tpu.ops import kmer as kmer_ops  # noqa: E402
from bitnuc_tpu.utils.bitops import n_words_for  # noqa: E402
from bitnuc_tpu.utils.timing import amortized_seconds_per_call  # noqa: E402

BATCH, READ_LEN = 1024, 16384
W = n_words_for(READ_LEN)


def emit(name, value, unit):
    print(json.dumps({"probe": name, "value": round(value, 2), "unit": unit}), flush=True)


@partial(jax.jit, static_argnames=("k",))
def dense_via_runs(words, lengths, k):
    lo_s, hi_s, counts, _ = kmer_ops.count_kmers_runs(words, lengths, k)
    dead = (counts == 0).astype(jnp.int32)
    _, lo_c, ct_c = jax.lax.sort((dead, lo_s, counts), num_keys=1, is_stable=True)
    cap = min(4**k + 1, lo_c.shape[0])
    keys = jnp.where(ct_c[:cap] > 0, lo_c[:cap].astype(jnp.int32), 0)
    wts = jnp.maximum(ct_c[:cap], 0)
    return jnp.zeros(4**k, jnp.int32).at[keys].add(wts)


def probe(name, fn, k):
    def make(key):
        return (
            jax.random.bits(key, (BATCH, W), jnp.uint32),
            jnp.full((BATCH,), READ_LEN, jnp.int32),
        )

    try:
        t = amortized_seconds_per_call(fn, make)
        emit(name, BATCH * (READ_LEN - k + 1) / t / 1e6, "Mkmers/s")
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:300]}), flush=True)


def main():
    import bench

    emit("xor_copy_bw", bench.bench_memcpy(), "GB/s")
    for k in (9, 10, 12):
        probe(
            f"dense_scatter_k{k}",
            lambda w, l, k=k: kmer_ops.count_kmers_dense(w, l, k),
            k,
        )
        probe(f"dense_via_runs_k{k}", lambda w, l, k=k: dense_via_runs(w, l, k), k)
    emit("xor_copy_bw_end", bench.bench_memcpy(), "GB/s")


if __name__ == "__main__":
    main()
