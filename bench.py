"""Headline benchmark: bases encoded/sec on one chip vs the CPU baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md) and its Rust toolchain is not
in this image, so the baseline is measured live: the single-core native C++
host codec in bitnuc_tpu/native (same SIMD-class algorithm as the reference's
AVX2 path, src/utils/packing/avx.rs). vs_baseline = device bases/sec divided
by that single-core CPU bases/sec; the BASELINE.json target is >= 10x.

Device timing uses the serialized harness (bitnuc_tpu/utils/timing.py): the
op runs N times inside one jit with a data dependency threaded through the
iterations, because per-call wall timing under-measures through the async
dispatch tunnel. The dependency is a zero derived from the previous result,
folded into a tiny input (lengths / query) so it adds no meaningful traffic.

Run `python bench.py --all` for the full suite (encode, decode, hdist scan,
k-mer histograms, memcpy calibration) as one JSON line per workload.
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


def _zero_of(result):
    """int32 zero that data-depends on `result` (defeats loop elision)."""
    import jax

    leaf = jax.tree_util.tree_leaves(result)[0]
    return (leaf.reshape(-1)[0] & 0).astype("int32")


def bench_encode(batch=1024, read_len=32768):
    import jax
    import jax.numpy as jnp

    from bitnuc_tpu.ops import codec
    from bitnuc_tpu.utils.timing import serialized_seconds_per_call

    rng = np.random.default_rng(1)
    ascii_u8 = jax.device_put(
        jnp.asarray(
            rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(batch, read_len))
        )
    )
    lengths = jax.device_put(jnp.asarray(np.full((batch,), read_len, np.int32)))

    t = serialized_seconds_per_call(
        lambda z: codec.encode_reads(ascii_u8, lengths + z)[0],
        lambda z, words: _zero_of(words),
        jnp.int32(0),
        iters=30,
    )
    return batch * read_len / t


def bench_decode(batch=1024, read_len=32768):
    import jax
    import jax.numpy as jnp

    from bitnuc_tpu.ops import codec
    from bitnuc_tpu.utils.timing import serialized_seconds_per_call

    rng = np.random.default_rng(2)
    W = 2 * (-(-read_len // 32))
    words = jax.device_put(
        jnp.asarray(rng.integers(0, 2**32, size=(batch, W), dtype=np.uint32))
    )
    lengths = jax.device_put(jnp.asarray(np.full((batch,), read_len, np.int32)))
    t = serialized_seconds_per_call(
        lambda z: codec.decode_reads(words, lengths + z),
        lambda z, out: _zero_of(out),
        jnp.int32(0),
        iters=30,
    )
    return batch * read_len / t


def bench_hdist(db=1 << 20, read_len=512):
    """Database scan + exact top-16: reports base-comparisons/sec."""
    import jax
    import jax.numpy as jnp

    from bitnuc_tpu.ops import hamming
    from bitnuc_tpu.utils.timing import serialized_seconds_per_call

    rng = np.random.default_rng(3)
    W = 2 * (-(-read_len // 32))
    db_words = jax.device_put(
        jnp.asarray(rng.integers(0, 2**32, size=(db, W), dtype=np.uint32))
    )
    q0 = jax.device_put(
        jnp.asarray(rng.integers(0, 2**32, size=(W,), dtype=np.uint32))
    )
    t = serialized_seconds_per_call(
        lambda q: hamming.hdist_topk(q, db_words, read_len, 16),
        lambda q, res: q ^ (res[0][0].astype(jnp.uint32) & 0),
        q0,
        iters=20,
    )
    return db * read_len / t


def bench_kmer(batch=256, read_len=16384, k=8, mode="mxu"):
    import jax
    import jax.numpy as jnp

    from bitnuc_tpu.ops import kmer
    from bitnuc_tpu.utils.timing import serialized_seconds_per_call

    rng = np.random.default_rng(4)
    W = 2 * (-(-read_len // 32))
    words = jax.device_put(
        jnp.asarray(rng.integers(0, 2**32, size=(batch, W), dtype=np.uint32))
    )
    lengths = jax.device_put(jnp.asarray(np.full((batch,), read_len, np.int32)))
    t = serialized_seconds_per_call(
        lambda z: kmer.count_kmers_reads(words, lengths + z, k, mode=mode),
        lambda z, res: _zero_of(res),
        jnp.int32(0),
        iters=10,
    )
    return batch * (read_len - k + 1) / t


def bench_memcpy(mbytes=128):
    """Device xor-copy calibration: effective GB/s (read+write)."""
    import jax
    import jax.numpy as jnp

    from bitnuc_tpu.utils.timing import serialized_seconds_per_call

    rng = np.random.default_rng(5)
    n = mbytes * (1 << 20) // 4
    big = jax.device_put(
        jnp.asarray(rng.integers(0, 2**32, size=(n,), dtype=np.uint32))
    )
    t = serialized_seconds_per_call(
        lambda c: big ^ c,
        lambda c, r: r.reshape(-1)[0],
        jnp.uint32(1),
        iters=20,
    )
    return 2 * mbytes / 1024 / t


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
        rows = [
            ("bases_decoded_per_sec_chip", bench_decode(), "bases/s"),
            ("hdist_base_comparisons_per_sec_chip", bench_hdist(), "base-cmp/s"),
            ("kmers_counted_per_sec_chip_k8_mxu", bench_kmer(k=8, mode="mxu"), "kmers/s"),
            (
                "kmers_counted_per_sec_chip_k21_sorted",
                bench_kmer(k=21, mode="sorted"),
                "kmers/s",
            ),
            ("device_xor_copy_bandwidth", bench_memcpy(), "GB/s"),
            ("cpu_baseline_bases_encoded_per_sec", cpu, "bases/s"),
        ]
        for name, val, unit in rows:
            print(
                json.dumps(
                    {"metric": name, "value": round(val, 1), "unit": unit,
                     "vs_baseline": None}
                )
            )


if __name__ == "__main__":
    main()
