"""Full benchmark suite mirroring the reference's criterion coverage.

The reference ships six criterion harnesses (reference Cargo.toml:25-47):
sequence, packing, simd_comparison, coding, functions, hdist. This suite
reproduces their workload coverage (sizes, content patterns, access patterns —
see SURVEY.md §6) against this framework's host tier (native C++ / numpy
backend, the per-call analog of the reference API) and adds the device batch
tier the reference doesn't have.

Usage:
    python benchmarks/suite.py [--host-only|--device-only] [--json out.json]

Each workload prints one JSON line: {"bench": ..., "value": ..., "unit": ...}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")  # repo root

import bitnuc_tpu as bn  # noqa: E402

# content patterns from benches/packing_benchmark.rs:10-95
PATTERNS = {
    "homopolymer": b"A" * 32,
    "alternating": b"AC" * 16,
    "acgt_repeat": b"ACGT" * 8,
    "gc_rich": b"GCGGCCGCGGGCCGGCGCCGGGCGGCGCCGGC",
    "at_rich": b"ATAATTATAAATTAATATTAATTAAATATTAA",
}


def _time_host(fn, *args, iters=2000, reps=3) -> float:
    fn(*args)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            fn(*args)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _emit(results, bench, value, unit):
    row = {"bench": bench, "value": round(value, 2), "unit": unit}
    results.append(row)
    print(json.dumps(row), flush=True)


def host_suite(results):
    rng = np.random.default_rng(0xB17)

    def rand_seq(n):
        return bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n))

    # pack/unpack/roundtrip at k-mer sizes (packing_benchmark.rs:10-95)
    for n in (4, 8, 16, 24, 32):
        s = rand_seq(n)
        assert bn.from_2bit(bn.as_2bit(s), n) == s, "roundtrip oracle"
        t = _time_host(bn.as_2bit, s)
        _emit(results, f"host/as_2bit/{n}", n / t / 1e6, "Mbases/s")
        p = bn.as_2bit(s)
        t = _time_host(bn.from_2bit, p, n)
        _emit(results, f"host/from_2bit/{n}", n / t / 1e6, "Mbases/s")

    for name, s in PATTERNS.items():
        t = _time_host(bn.as_2bit, s)
        _emit(results, f"host/as_2bit/pattern_{name}", 32 / t / 1e6, "Mbases/s")

    # encode/decode sweeps + long sequences (simd_comparison.rs:42-53,
    # coding_benchmark.rs:19-30, packing_benchmark.rs:130-153)
    for n in (1, 32, 256, 1024, 16384, 512_000):
        s = rand_seq(n)
        iters = max(4, min(2000, 2_000_000 // max(n, 1)))
        t = _time_host(bn.encode, s, iters=iters)
        _emit(results, f"host/encode/{n}", n / t / 1e6, "Mbases/s")
        e = bn.encode(s)
        t = _time_host(bn.decode, e, n, iters=iters)
        _emit(results, f"host/decode/{n}", n / t / 1e6, "Mbases/s")

    # get / slice access patterns (packing_benchmark.rs:97-128)
    seq = bn.PackedSequence(rand_seq(1000))
    t = _time_host(lambda: [seq.get(i) for i in range(0, 1000, 37)])
    _emit(results, "host/get/sequential_27", 27 / t / 1e6, "Mgets/s")
    t = _time_host(seq.slice, 100, 124)
    _emit(results, "host/slice/24", 24 / t / 1e6, "Mbases/s")

    # hdist 32-base scalar and 512-base multi (hdist_benchmark.rs:14-76);
    # like the reference, the bench doubles as a checked oracle: the packed
    # result must equal the bytewise compare before timing begins
    for n in (32, 512):
        s1, s2 = rand_seq(n), rand_seq(n)
        e1, e2 = bn.encode(s1), bn.encode(s2)
        byte_d = sum(a != b for a, b in zip(s1, s2))
        assert bn.hdist(e1, e2, n) == byte_d, "hdist != bytewise oracle"
        t = _time_host(bn.hdist, e1, e2, n)
        _emit(results, f"host/hdist/{n}", n / t / 1e6, "Mbase-cmp/s")

    # split (functions_benchmark.rs:23-74)
    for n in (30, 280):
        e = bn.encode(rand_seq(n))
        t = _time_host(bn.split_packed, e, n, n // 2)
        _emit(results, f"host/split_packed/{n}", n / t / 1e6, "Mbases/s")

    # analytics (sequence_benchmark.rs)
    s1000 = bn.PackedSequence(rand_seq(1000))
    t = _time_host(s1000.gc_content)
    _emit(results, "host/gc_content/1000", 1000 / t / 1e6, "Mbases/s")
    t = _time_host(s1000.base_counts)
    _emit(results, "host/base_counts/1000", 1000 / t / 1e6, "Mbases/s")


def device_suite(results):
    import bench as headline

    _emit(results, "device/encode_batch", headline.bench_encode() / 1e9, "Gbases/s")
    _emit(results, "device/decode_batch", headline.bench_decode() / 1e9, "Gbases/s")
    _emit(
        results, "device/hdist_scan_top16", headline.bench_hdist() / 1e9, "Gbase-cmp/s"
    )
    _emit(
        results,
        "device/hdist_batch_q64_top16",
        headline.bench_hdist_batch() / 1e9,
        "Gbase-cmp/s",
    )
    _emit(
        results,
        "device/kmer_k8_mxu",
        headline.bench_kmer(k=8, mode="mxu") / 1e6,
        "Mkmers/s",
    )
    _emit(
        results,
        "device/kmer_k21_sorted",
        headline.bench_kmer(k=21, mode="runs") / 1e6,
        "Mkmers/s",
    )
    _emit(
        results,
        "device/dedupe_1M_150bp",
        headline.bench_dedupe() / 1e6,
        "Mreads/s",
    )
    _emit(
        results,
        "device/setop_intersect_8M",
        headline.bench_setop() / 1e6,
        "Mkeys/s",
    )
    _emit(
        results,
        "pipeline/fastq_staged",
        headline.bench_pipeline(staged=True) / 1e9,
        "Gbases/s",
    )
    _emit(results, "device/xor_copy_bw", headline.bench_memcpy(), "GB/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host-only", action="store_true")
    ap.add_argument("--device-only", action="store_true")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    results = []
    if not args.device_only:
        host_suite(results)
    if not args.host_only:
        device_suite(results)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
