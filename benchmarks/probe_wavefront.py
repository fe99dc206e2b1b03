"""Pallas fused wavefront vs the XLA lax.scan wavefront (DESIGN.md §12c:
the XLA scan is per-step-overhead-bound at ~48 us/diagonal regardless of
lane count; the Pallas kernel runs the whole diagonal loop inside one
program with VMEM-resident state). bench_map shapes: 4096 x 150 bp reads
fitted into 241-base windows.

Run: python benchmarks/probe_wavefront.py   (real TPU)
"""
import json
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from bitnuc_tpu import config

config.enable_compilation_cache()
from bitnuc_tpu.ops import align
from bitnuc_tpu.ops.pallas.wavefront import fit_distance_span_banded_pallas
from bitnuc_tpu.sequence import PackedReads
from bitnuc_tpu.utils.timing import amortized_seconds_per_call


def emit(n, v, u):
    print(json.dumps({"probe": n, "value": round(v, 2), "unit": u}), flush=True)


batch, read_len, win_len = 4096, 150, 241
rng = np.random.default_rng(11)
ref = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), size=1 << 22))
starts = rng.integers(32, (1 << 22) - win_len - 32, size=batch)
reads = PackedReads.from_ascii(
    np.stack([np.frombuffer(ref[s : s + read_len], np.uint8) for s in starts]),
    lengths=np.full(batch, read_len, np.int32),
)
wins = PackedReads.from_ascii(
    np.stack(
        [np.frombuffer(ref[s - 32 : s - 32 + win_len], np.uint8) for s in starts]
    ),
    lengths=np.full(batch, win_len, np.int32),
)


def mk(key):
    perm = jax.random.permutation(key, batch)
    return (reads.words[perm], reads.lengths[perm], wins.words[perm], wins.lengths[perm])


# correctness on-device first: banded XLA vs Pallas must agree bit-exactly
w, l, ww, wl = mk(jax.random.PRNGKey(0))
r_xla = [np.asarray(x) for x in align.fit_distance_span_banded(
    w, l, ww, wl, 1, 1, off_lo=-32, off_hi=112)]
r_pl = [np.asarray(x) for x in fit_distance_span_banded_pallas(
    w, l, ww, wl, 1, 1, off_lo=-32, off_hi=112)]
ok = all(np.array_equal(a, b) for a, b in zip(r_xla, r_pl))
emit("pallas_bitexact", 1.0 if ok else 0.0, "bool")
assert ok, "Pallas wavefront diverged from XLA banded on device"

import bench

emit("xor_copy_64", bench.bench_memcpy(64), "GB/s")
t = amortized_seconds_per_call(
    lambda w, l, ww, wl: align.fit_distance_span(w, l, ww, wl, 1, 1), mk
)
emit("span_xla_full", t * 1e3, "ms/call")
t = amortized_seconds_per_call(
    lambda w, l, ww, wl: align.fit_distance_span_banded(
        w, l, ww, wl, 1, 1, off_lo=-32, off_hi=112
    ),
    mk,
)
emit("span_xla_banded", t * 1e3, "ms/call")
t = amortized_seconds_per_call(
    lambda w, l, ww, wl: fit_distance_span_banded_pallas(
        w, l, ww, wl, 1, 1, off_lo=-32, off_hi=112
    ),
    mk,
)
emit("span_pallas_banded", t * 1e3, "ms/call")
emit("xor_copy_64_end", bench.bench_memcpy(64), "GB/s")
