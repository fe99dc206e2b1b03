"""On-chip probes for the large-k counting engine redesign (round 2).

Measures, same-run on the real TPU:
  * current count_kmers_sorted @ k=21 (the 39 Mkmers/s round-1 baseline)
  * jax.lax.sort cost vs number of carried arrays (1/2/3) at N=4M
  * segment aggregation: scatter-based (round 1) vs scan-free run-length
    (cummin of boundary indices) vs cumsum+gather weighted totals
  * xor-copy calibration for the run

Prints one JSON line per probe. Run:  python benchmarks/probe_sort.py
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bitnuc_tpu import config

config.enable_compilation_cache()

from bitnuc_tpu.utils.timing import amortized_seconds_per_call  # noqa: E402

N = 1 << 22  # 4M keys


def emit(name, value, unit):
    print(json.dumps({"probe": name, "value": round(value, 2), "unit": unit}), flush=True)


def probe(name, fn, make, scale, unit):
    try:
        t = amortized_seconds_per_call(fn, make)
        emit(name, scale / t, unit)
        return scale / t
    except Exception as e:  # keep the run alive; record the failure
        print(json.dumps({"probe": name, "error": repr(e)[:300]}), flush=True)
        return float("nan")


def make_keys_pair(key):
    k1, k2 = jax.random.split(key)
    hi = jax.random.randint(k1, (N,), 0, 1 << 10, jnp.int32).astype(jnp.uint32)
    lo = jax.random.bits(k2, (N,), jnp.uint32)
    return hi, lo


def make_sorted_pair(key):
    hi, lo = make_keys_pair(key)
    hi_s, lo_s = jax.lax.sort((hi, lo), num_keys=2)
    w = jnp.ones((N,), jnp.int32)
    return hi_s, lo_s, w


def main():
    # --- calibration ---
    import bench

    emit("xor_copy_bw", bench.bench_memcpy(), "GB/s")

    # --- k=21 sorted counting: round-1 compacted vs the runs engine ---
    emit("k21_current", bench.bench_kmer(k=21, mode="sorted") / 1e6, "Mkmers/s")
    emit("k21_runs", bench.bench_kmer(k=21, mode="runs") / 1e6, "Mkmers/s")
    emit("k15_runs", bench.bench_kmer(k=15, mode="runs") / 1e6, "Mkmers/s")
    emit("k8_mxu", bench.bench_kmer(k=8, mode="mxu") / 1e6, "Mkmers/s")

    # --- sort cost vs payload count ---
    probe(
        "sort1_u32",
        lambda hi, lo: jax.lax.sort(lo),
        make_keys_pair,
        N / 1e6,
        "Mkeys/s",
    )
    probe(
        "sort2_u32pair",
        lambda hi, lo: jax.lax.sort((hi, lo), num_keys=2),
        make_keys_pair,
        N / 1e6,
        "Mkeys/s",
    )
    probe(
        "sort3_u32pair_payload",
        lambda hi, lo: jax.lax.sort((hi, lo, jnp.ones_like(hi, jnp.int32)), num_keys=2),
        make_keys_pair,
        N / 1e6,
        "Mkeys/s",
    )
    # single fused 64-bit-ish key: (hi<<22|idx-trick not needed) — hi has 10
    # bits at k=21, so hi<<22 | (lo>>10) is a 32-bit first key approximation;
    # measure a stable single-key sort carrying one payload instead
    probe(
        "sort1_key_1payload",
        lambda hi, lo: jax.lax.sort((lo, hi), num_keys=1),
        make_keys_pair,
        N / 1e6,
        "Mkeys/s",
    )

    # --- segment aggregation on sorted pairs ---
    def seg_scatter(hi_s, lo_s, w):
        from bitnuc_tpu.ops.kmer import segment_count

        return segment_count(hi_s, lo_s, w)

    probe("seg_scatter", seg_scatter, make_sorted_pair, N / 1e6, "Mkeys/s")

    def seg_scanfree(hi_s, lo_s, w):
        first = jnp.concatenate(
            [jnp.ones((1,), bool), (lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1])]
        )
        idx = jnp.arange(N, dtype=jnp.int32)
        bpos = jnp.where(first, idx, jnp.int32(N))
        nb = jnp.flip(jax.lax.cummin(jnp.flip(bpos)))  # min_{j>=i} boundary
        nb_excl = jnp.concatenate([nb[1:], jnp.full((1,), N, jnp.int32)])
        counts = jnp.where(first, nb_excl - idx, 0)
        return counts, first

    probe("seg_scanfree_runlength", seg_scanfree, make_sorted_pair, N / 1e6, "Mkeys/s")

    def seg_gather(hi_s, lo_s, w):
        first = jnp.concatenate(
            [jnp.ones((1,), bool), (lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1])]
        )
        idx = jnp.arange(N, dtype=jnp.int32)
        bpos = jnp.where(first, idx, jnp.int32(N))
        nb = jnp.flip(jax.lax.cummin(jnp.flip(bpos)))
        nb_excl = jnp.concatenate([nb[1:], jnp.full((1,), N, jnp.int32)])
        cs = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(w)])
        counts = jnp.where(first, cs[nb_excl] - cs[idx], 0)
        return counts, first

    probe("seg_cumsum_gather", seg_gather, make_sorted_pair, N / 1e6, "Mkeys/s")

    # --- primitives ---
    probe("cummin_4m", lambda hi, lo: jax.lax.cummin(hi), make_keys_pair, N / 1e6, "Mel/s")
    probe("cumsum_4m", lambda hi, lo: jnp.cumsum(hi.astype(jnp.int32)), make_keys_pair, N / 1e6, "Mel/s")

    # --- new batch hdist kernel on real TPU ---
    emit("hdist_batch_q64", bench.bench_hdist_batch() / 1e9, "Gbase-cmp/s")


if __name__ == "__main__":
    main()
