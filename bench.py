"""Headline benchmark: bases encoded/sec on one chip vs the CPU baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md) and its Rust toolchain is not
in this image, so the baseline is measured live: the single-core native C++
host codec in bitnuc_tpu/native (same SIMD-class algorithm as the reference's
AVX2 path, src/utils/packing/avx.rs). vs_baseline = device bases/sec divided
by that single-core CPU bases/sec; the BASELINE.json target is >= 10x.

Run `python bench.py --all` for the full suite (encode, decode, hdist scan,
k-mer histogram) as one JSON line per workload.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _cpu_baseline_bases_per_sec() -> float:
    """Single-core native C++ encode throughput (the reference-class number)."""
    from bitnuc_tpu import native

    if not native.available():
        native.build()
    if not native.available():
        return float("nan")
    rng = np.random.default_rng(0)
    seq = bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=1 << 20))
    native.encode(seq)  # warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(8):
            native.encode(seq)
        best = min(best, (time.perf_counter() - t0) / 8)
    return len(seq) / best


def _time_device(fn, args, iters=20, warmup=3) -> float:
    """Median wall time per call with device-resident inputs."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def bench_encode(batch=1024, read_len=32768):
    import jax
    import jax.numpy as jnp

    from bitnuc_tpu.ops import codec

    rng = np.random.default_rng(1)
    ascii_np = rng.choice(
        np.frombuffer(b"ACGT", dtype=np.uint8), size=(batch, read_len)
    )
    lengths_np = np.full((batch,), read_len, dtype=np.int32)
    ascii_u8 = jax.device_put(jnp.asarray(ascii_np))
    lengths = jax.device_put(jnp.asarray(lengths_np))

    dt = _time_device(lambda a, l: codec.encode_reads(a, l), (ascii_u8, lengths))
    return batch * read_len / dt


def bench_decode(batch=1024, read_len=32768):
    import jax
    import jax.numpy as jnp

    from bitnuc_tpu.ops import codec

    rng = np.random.default_rng(2)
    W = 2 * (-(-read_len // 32))
    words = jax.device_put(
        jnp.asarray(rng.integers(0, 2**32, size=(batch, W), dtype=np.uint32))
    )
    lengths = jax.device_put(
        jnp.asarray(np.full((batch,), read_len, dtype=np.int32))
    )
    dt = _time_device(lambda w, l: codec.decode_reads(w, l), (words, lengths))
    return batch * read_len / dt


def bench_hdist(db=1 << 20, read_len=512):
    """Database scan: one query vs db packed rows; reports base-comparisons/sec."""
    import jax
    import jax.numpy as jnp

    from bitnuc_tpu.ops import hamming

    rng = np.random.default_rng(3)
    W = 2 * (-(-read_len // 32))
    db_words = jax.device_put(
        jnp.asarray(rng.integers(0, 2**32, size=(db, W), dtype=np.uint32))
    )
    query = jax.device_put(
        jnp.asarray(rng.integers(0, 2**32, size=(W,), dtype=np.uint32))
    )
    dt = _time_device(
        lambda q, d: hamming.hdist_topk(q, d, read_len, 16), (query, db_words)
    )
    return db * read_len / dt


def bench_kmer(batch=256, read_len=16384, k=11):
    import jax
    import jax.numpy as jnp

    from bitnuc_tpu.ops import kmer

    rng = np.random.default_rng(4)
    W = 2 * (-(-read_len // 32))
    words = jax.device_put(
        jnp.asarray(rng.integers(0, 2**32, size=(batch, W), dtype=np.uint32))
    )
    lengths = jax.device_put(
        jnp.asarray(np.full((batch,), read_len, dtype=np.int32))
    )
    dt = _time_device(
        lambda w, l: kmer.count_kmers_dense(w, l, k), (words, lengths)
    )
    return batch * (read_len - k + 1) / dt


def main():
    cpu = _cpu_baseline_bases_per_sec()
    tpu = bench_encode()
    vs = tpu / cpu if cpu == cpu else float("nan")
    print(
        json.dumps(
            {
                "metric": "bases_encoded_per_sec_chip",
                "value": round(tpu, 1),
                "unit": "bases/s",
                "vs_baseline": round(vs, 2),
            }
        )
    )
    if "--all" in sys.argv:
        for name, val, unit in [
            ("bases_decoded_per_sec_chip", bench_decode(), "bases/s"),
            ("hdist_base_comparisons_per_sec_chip", bench_hdist(), "base-cmp/s"),
            ("kmers_counted_per_sec_chip", bench_kmer(), "kmers/s"),
            ("cpu_baseline_bases_encoded_per_sec", cpu, "bases/s"),
        ]:
            print(
                json.dumps(
                    {"metric": name, "value": round(val, 1), "unit": unit,
                     "vs_baseline": None}
                )
            )


if __name__ == "__main__":
    main()
