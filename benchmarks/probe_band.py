"""Banded wavefront probe (VERDICT r4 item 1): BASELINE.md names the
banded fit as the mapper's remaining recorded lever (~1.6x fewer lanes at
150 bp). Times, same-run: the full map call with the unbanded vs banded
fit, and the isolated fit-extend stage both ways (4096 x 150bp vs a 4MB
genome — the bench_map shapes).

Band geometry at these shapes: window 241 lanes -> off in [-32, 112] is
K = 74 band lanes, a 3.3x lane cut at the same M+N = 400 scan depth (the
wavefront was measured scan-depth-bound, so the realized gain is the
honest answer this probe exists to record).

Run: python benchmarks/probe_band.py   (real TPU)
"""
import json
import sys
from functools import partial

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from bitnuc_tpu import config

config.enable_compilation_cache()
from bitnuc_tpu import mapper
from bitnuc_tpu.ops import revcomp as revcomp_ops
from bitnuc_tpu.sequence import PackedReads
from bitnuc_tpu.utils import bitops
from bitnuc_tpu.utils.timing import amortized_seconds_per_call


def emit(n, v, u):
    print(json.dumps({"probe": n, "value": round(v, 2), "unit": u}), flush=True)


batch, read_len, genome_mb = 4096, 150, 4
rng = np.random.default_rng(11)
n = genome_mb << 20
ref = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), size=n))
idx = mapper.MinimizerIndex.build(ref, k=15, w=10)
starts = rng.integers(0, n - read_len, size=batch)
arr = np.stack([np.frombuffer(ref[s : s + read_len], np.uint8) for s in starts])
reads = PackedReads.from_ascii(arr, lengths=np.full(batch, read_len, np.int32))
t_lo = jnp.asarray(idx.keys)
t_hi = jnp.asarray(idx.keys_hi)
t_pos = jnp.asarray(idx.pos)
ref_words = jnp.asarray(idx.ref_words)
ref_len = jnp.full((), idx.ref_len, jnp.int32)
W = reads.words.shape[1]


def make_reads(key):
    perm = jax.random.permutation(key, batch)
    return (reads.words[perm], reads.lengths[perm])


def make_fit(key):
    perm = jax.random.permutation(key, batch)
    w = reads.words[perm]
    l = reads.lengths[perm]
    ws = jnp.zeros((batch,), jnp.int32)
    return (w, l, ws)


Lb = W * bitops.BASES_PER_WORD
Wwin = (Lb + 2 * 32) // bitops.BASES_PER_WORD + 1


@jax.jit
def fit_unbanded(q_words, lengths, ws):
    return mapper._fit_extend(
        q_words, lengths, ws, ref_words, ref_len, Wwin, 1, 1
    )


@jax.jit
def fit_banded(q_words, lengths, ws):
    return mapper._fit_extend(
        q_words, lengths, ws, ref_words, ref_len, Wwin, 1, 1,
        start_slack=32 + 16 + 32, band_gap=mapper._BAND_GAP,
    )


core_full = partial(mapper._map_core, k=idx.k, w=idx.w, bin_bits=5, pad=32,
                    mismatch=1, gap=1, band=False)
core_band = partial(mapper._map_core, k=idx.k, w=idx.w, bin_bits=5, pad=32,
                    mismatch=1, gap=1, band=True)

import bench

emit("xor_copy_64", bench.bench_memcpy(64), "GB/s")
t = amortized_seconds_per_call(
    lambda w, l: core_full(w, l, t_lo, t_hi, t_pos, ref_words, ref_len),
    make_reads,
)
emit("map_full_unbanded", batch / t / 1e3, "Kreads/s")
t = amortized_seconds_per_call(
    lambda w, l: core_band(w, l, t_lo, t_hi, t_pos, ref_words, ref_len),
    make_reads,
)
emit("map_full_banded", batch / t / 1e3, "Kreads/s")
t = amortized_seconds_per_call(fit_unbanded, make_fit)
emit("stage_fit_unbanded", t * 1e3, "ms/call")
t = amortized_seconds_per_call(fit_banded, make_fit)
emit("stage_fit_banded", t * 1e3, "ms/call")
emit("xor_copy_64_end", bench.bench_memcpy(64), "GB/s")
