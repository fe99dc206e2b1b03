"""Is the large-k pair sort at roofline, or can a different layout beat it?

count_kmers_runs is now bound by jax.lax.sort (~284 Mkeys/s pair at N=4M,
chip at ~31 GB/s calibration — benchmarks/probe_sort.py). Before chasing a
Pallas sort, measure what XLA's sort actually delivers:

  * pair-sort throughput vs N (4M / 16M / 64M): does depth (log^2 N) or
    HBM traffic dominate?
  * effective HBM passes = t * calibration / (bytes of one full read+write
    sweep) — a hierarchical VMEM-tiled sort needs ~(1 + log2(chunks))
    passes; if XLA is already close to that, a hand-rolled kernel has no
    headroom.
  * row-batched sort [R, C] along the last axis (R independent sorts in one
    dispatch): the partitioned layout a two-level counting scheme would use.
  * num_keys=1 (payload permuted) vs num_keys=2 comparator cost.
  * end-to-end count_kmers_runs @ k=21 vs windows/call (does bigger N help
    or hurt once sort depth grows?).

Prints one JSON line per probe. Run: python benchmarks/probe_sortscale.py
"""

import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bitnuc_tpu import config

config.enable_compilation_cache()

from bitnuc_tpu.utils.timing import amortized_seconds_per_call  # noqa: E402


def emit(**kw):
    print(json.dumps(kw), flush=True)


def probe(name, fn, make, scale, unit, cal=None, traffic_bytes=None):
    try:
        t = amortized_seconds_per_call(fn, make)
    except Exception as e:
        emit(probe=name, error=repr(e)[:300])
        return float("nan")
    row = {"probe": name, "value": round(scale / t, 2), "unit": unit}
    if cal is not None and traffic_bytes is not None:
        # effective full read+write sweeps of the operand set
        row["eff_passes"] = round(t * cal * 1e9 / traffic_bytes, 1)
    emit(**row)
    return scale / t


def make_pair(shape):
    def make(key):
        k1, k2 = jax.random.split(key)
        hi = jax.random.randint(k1, shape, 0, 1 << 10, jnp.int32).astype(jnp.uint32)
        lo = jax.random.bits(k2, shape, jnp.uint32)
        return hi, lo

    return make


def main():
    import bench

    cal = bench.bench_memcpy(256)
    emit(probe="xor_copy_bw_256MB", value=round(cal, 2), unit="GB/s")

    # --- flat pair sort vs N ---
    for logn in (22, 24, 26):
        N = 1 << logn
        probe(
            f"sort_pair_flat_{N >> 20}M",
            lambda hi, lo: jax.lax.sort((hi, lo), num_keys=2),
            make_pair((N,)),
            N / 1e6,
            "Mkeys/s",
            cal=cal,
            traffic_bytes=2 * 2 * 4 * N,  # 2 arrays, r+w, 4B
        )

    # --- row-batched pair sort, same totals ---
    for R, C in ((16, 1 << 20), (64, 1 << 18), (256, 1 << 16), (1024, 1 << 14)):
        N = R * C
        probe(
            f"sort_pair_rows_{R}x{C >> 10}K",
            lambda hi, lo: jax.lax.sort((hi, lo), num_keys=2, dimension=-1),
            make_pair((R, C)),
            N / 1e6,
            "Mkeys/s",
            cal=cal,
            traffic_bytes=2 * 2 * 4 * N,
        )

    # --- comparator cost: num_keys=1 + payload vs num_keys=2, N=16M ---
    N = 1 << 24
    probe(
        "sort_1key_1payload_16M",
        lambda hi, lo: jax.lax.sort((lo, hi), num_keys=1),
        make_pair((N,)),
        N / 1e6,
        "Mkeys/s",
        cal=cal,
        traffic_bytes=2 * 2 * 4 * N,
    )
    probe(
        "sort_single_u32_16M",
        lambda hi, lo: jax.lax.sort(lo),
        make_pair((N,)),
        N / 1e6,
        "Mkeys/s",
        cal=cal,
        traffic_bytes=2 * 4 * N,
    )

    # --- end-to-end k=21 runs engine vs windows/call ---
    for batch in (256, 1024, 4096):
        n_win = batch * (16384 - 20)
        emit(
            probe=f"k21_runs_end2end_batch{batch}",
            value=round(bench.bench_kmer(batch=batch, k=21, mode="runs") / 1e6, 1),
            unit="Mkmers/s",
            windows_per_call=n_win,
        )


if __name__ == "__main__":
    main()
