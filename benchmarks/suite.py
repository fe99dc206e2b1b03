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
    from bitnuc_tpu import oracle as _orc

    for n in (4, 8, 16, 24, 32):
        s = rand_seq(n)
        assert bn.as_2bit(s) == _orc.as_2bit(s), f"as_2bit != oracle/{n}"
        assert bn.from_2bit(bn.as_2bit(s), n) == s, "roundtrip oracle"
        t = _time_host(bn.as_2bit, s)
        _emit(results, f"host/as_2bit/{n}", n / t / 1e6, "Mbases/s")
        p = bn.as_2bit(s)
        t = _time_host(bn.from_2bit, p, n)
        _emit(results, f"host/from_2bit/{n}", n / t / 1e6, "Mbases/s")

    for name, s in PATTERNS.items():
        assert bn.as_2bit(s) == _orc.as_2bit(s), f"as_2bit != oracle: {name}"
        assert bn.from_2bit(bn.as_2bit(s), 32) == s, f"roundtrip: {name}"
        t = _time_host(bn.as_2bit, s)
        _emit(results, f"host/as_2bit/pattern_{name}", 32 / t / 1e6, "Mbases/s")

    # encode/decode sweeps + long sequences (simd_comparison.rs:42-53,
    # coding_benchmark.rs:19-30, packing_benchmark.rs:130-153)
    for n in (1, 32, 256, 1024, 16384, 512_000):
        s = rand_seq(n)
        assert np.array_equal(bn.encode(s), _orc.encode(s)), f"encode/{n}"
        assert bn.decode(bn.encode(s), n) == s, f"decode roundtrip/{n}"
        iters = max(4, min(2000, 2_000_000 // max(n, 1)))
        t = _time_host(bn.encode, s, iters=iters)
        _emit(results, f"host/encode/{n}", n / t / 1e6, "Mbases/s")
        e = bn.encode(s)
        t = _time_host(bn.decode, e, n, iters=iters)
        _emit(results, f"host/decode/{n}", n / t / 1e6, "Mbases/s")

    # get / slice access patterns (packing_benchmark.rs:97-128)
    s1000b = rand_seq(1000)
    seq = bn.PackedSequence(s1000b)
    assert bytes([seq.get(i) for i in range(0, 1000, 37)]) == s1000b[::37]
    assert seq.slice(100, 124) == s1000b[100:124]
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
        sn = rand_seq(n)
        e = bn.encode(sn)
        l, r = bn.split_packed(e, n, n // 2)
        assert bn.decode(l, n // 2) == sn[: n // 2], f"split left/{n}"
        assert bn.decode(r, n - n // 2) == sn[n // 2 :], f"split right/{n}"
        t = _time_host(bn.split_packed, e, n, n // 2)
        _emit(results, f"host/split_packed/{n}", n / t / 1e6, "Mbases/s")

    # analytics (sequence_benchmark.rs)
    sb = rand_seq(1000)
    s1000 = bn.PackedSequence(sb)
    assert s1000.base_counts() == tuple(sb.count(c) for c in b"ACGT")
    assert s1000.gc_content() == 100.0 * (sb.count(ord("G")) + sb.count(ord("C"))) / 1000
    t = _time_host(s1000.gc_content)
    _emit(results, "host/gc_content/1000", 1000 / t / 1e6, "Mbases/s")
    t = _time_host(s1000.base_counts)
    _emit(results, "host/base_counts/1000", 1000 / t / 1e6, "Mbases/s")


def _device_oracle_gate():
    """Small-shape parity of every device workload against the host oracle,
    run BEFORE any timing — the reference's benches-as-oracles discipline
    (its hdist bench asserts SIMD == naive byte-compare inside the loop,
    reference benches/hdist_benchmark.rs:26-40,61-73). A deliberately
    broken op fails the suite here, not only pytest."""
    import jax.numpy as jnp

    from bitnuc_tpu import config, oracle, pipeline
    from bitnuc_tpu.database import PackedDB
    from bitnuc_tpu.ops import codec, kmer
    from bitnuc_tpu.ops.dedupe import mark_duplicates
    from bitnuc_tpu.ops.setops import combine_counts, combine_dicts

    config.enable_compilation_cache()
    rng = np.random.default_rng(0xD1CE)

    def rand_rows(b, n):
        return rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(b, n))

    # encode/decode (the bench_encode / bench_decode ops)
    arr = rand_rows(8, 96)
    lens = np.array([96, 95, 64, 1, 33, 32, 16, 96], np.int32)
    words, _ = codec.encode_reads(jnp.asarray(arr), jnp.asarray(lens))
    wn = np.asarray(words)
    for i, ln in enumerate(lens):
        want = oracle.u64_to_u32(oracle.encode(bytes(arr[i, :ln])))
        assert np.array_equal(wn[i, : len(want)], want), f"encode row {i}"
    dec = np.asarray(codec.decode_reads(words, jnp.asarray(lens)))
    for i, ln in enumerate(lens):
        assert bytes(dec[i, :ln]) == bytes(arr[i, :ln]), f"decode row {i}"

    # hdist scan + batched scan (bench_hdist / bench_hdist_batch ops)
    D, n = 64, 96
    db_rows = rand_rows(D, n)
    q_row = bytes(rand_rows(1, n)[0])
    wm = np.stack(
        [oracle.u64_to_u32(oracle.encode(bytes(r))) for r in db_rows]
    ).T.copy()  # word-major [W, D]
    db = PackedDB(words_wm=jnp.asarray(wm), n_bases=n)
    qw = jnp.asarray(oracle.u64_to_u32(oracle.encode(q_row)))
    dists, idxs = db.search(qw, 8)
    want_d = sorted(
        oracle.hdist(oracle.encode(q_row), oracle.encode(bytes(r)), n)
        for r in db_rows
    )[:8]
    got_d = sorted(int(x) for x in np.asarray(dists))
    assert got_d == want_d, f"hdist top-8 {got_d} != {want_d}"
    for d_i, ix in zip(np.asarray(dists), np.asarray(idxs)):
        true = oracle.hdist(
            oracle.encode(q_row), oracle.encode(bytes(db_rows[int(ix)])), n
        )
        assert int(d_i) == true, "hdist index/distance mismatch"
    bd, _ = db.search_batch(jnp.stack([qw, qw]), 4)
    assert np.array_equal(np.asarray(bd)[0], np.asarray(dists)[:4]), "batch scan"

    # k-mer counting, dense fast path and large-k runs engine
    karr = rand_rows(6, 80)
    klens = np.full(6, 80, np.int32)
    kw, _ = codec.encode_reads(jnp.asarray(karr), jnp.asarray(klens))
    want: dict = {}
    for r in karr:
        for key, c in oracle.count_kmers(bytes(r), 8).items():
            want[key] = want.get(key, 0) + c
    hist = np.asarray(
        kmer.count_kmers_reads(kw, jnp.asarray(klens), 8, mode="auto_layout")
    )
    assert hist.sum() == sum(want.values()) and all(
        hist[key] == c for key, c in want.items()
    ), "kmer k=8"
    want21: dict = {}
    for r in karr:
        for key, c in oracle.count_kmers(bytes(r), 21).items():
            want21[key] = want21.get(key, 0) + c
    lo, hi, ct = kmer.compact_runs(
        *kmer.count_kmers_runs(kw, jnp.asarray(klens), 21)[:3]
    )
    got21 = {
        (int(h) << 32) | int(l): int(c) for l, h, c in zip(lo, hi, ct)
    }
    assert got21 == want21, "kmer k=21 runs"

    # duplicate marking (bench_dedupe op) with planted duplicates
    base = rand_rows(8, 64)
    dup = np.concatenate([base, base[:3], base[:1]])  # multiplicities
    dw, _ = codec.encode_reads(
        jnp.asarray(dup), jnp.asarray(np.full(len(dup), 64, np.int32))
    )
    keep, counts = mark_duplicates(dw, jnp.full(len(dup), 64, jnp.int32))
    keep, counts = np.asarray(keep), np.asarray(counts)
    seen: dict = {}
    for i, r in enumerate(dup):
        key = bytes(r)
        assert keep[i] == (key not in seen), f"dedupe keep row {i}"
        seen.setdefault(key, 0)
        seen[key] += 1
    for i, r in enumerate(dup):
        if keep[i]:
            assert counts[i] == seen[bytes(r)], f"dedupe count row {i}"
    assert counts.sum() == len(dup)

    # counted-set algebra (bench_setop op) vs the host-dict twin
    a = {int(k): int(c) for k, c in zip(rng.integers(0, 50, 20), rng.integers(1, 5, 20))}
    b = {int(k): int(c) for k, c in zip(rng.integers(0, 50, 20), rng.integers(1, 5, 20))}

    def as_arrays(d, pad):
        ks = sorted(d)
        lo = np.array([k & 0xFFFFFFFF for k in ks] + [0] * pad, np.uint32)
        hi = np.array([k >> 32 for k in ks] + [0] * pad, np.uint32)
        ct = np.array([d[k] for k in ks] + [0] * pad, np.int32)
        return jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(ct)

    for mode in ("intersect_min", "union_sum", "subtract"):
        lo_, hi_, ct_, nu = combine_counts(
            *as_arrays(a, 3), *as_arrays(b, 0), mode=mode
        )
        got = {
            (int(h) << 32) | int(l): int(c)
            for l, h, c in zip(
                np.asarray(lo_)[: int(nu)],
                np.asarray(hi_)[: int(nu)],
                np.asarray(ct_)[: int(nu)],
            )
        }
        assert got == combine_dicts(a, b, mode=mode), f"setop {mode}"

    # streaming pipeline (bench_pipeline path) vs dict oracle
    import tempfile

    seqs = [bytes(r) for r in rand_rows(40, 70)]
    with tempfile.NamedTemporaryFile("wb", suffix=".fastq", delete=False) as f:
        for i, s in enumerate(seqs):
            f.write(b"@r%d\n%s\n+\n%s\n" % (i, s, b"I" * len(s)))
        fq = f.name
    try:
        hist8 = pipeline.count_fastq(fq, 8, batch_size=16)
    finally:
        import os as _os

        _os.unlink(fq)
    wantp: dict = {}
    for s in seqs:
        for key, c in oracle.count_kmers(s, 8).items():
            wantp[key] = wantp.get(key, 0) + c
    assert int(hist8.sum()) == sum(wantp.values()) and all(
        int(hist8[key]) == c for key, c in wantp.items()
    ), "pipeline count_fastq"
    print(json.dumps({"bench": "device/oracle_gate", "value": 1, "unit": "ok"}))


def device_suite(results):
    import bench as headline

    _device_oracle_gate()
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
