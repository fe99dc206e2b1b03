"""Mapper per-stage roofline (VERDICT r3 item 7): split the 71 Kreads/s
headline into seed-join / vote / fit-extend, with bytes-touched context,
all same-run at the bench_map shapes (4096 x 150bp vs a 4MB genome).

Run: python benchmarks/probe_map.py   (real TPU)
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
lens2 = jnp.concatenate([jnp.asarray(reads.lengths)] * 2)


def make_reads(key):
    perm = jax.random.permutation(key, batch)
    return (reads.words[perm], reads.lengths[perm])


def make_stacked(key):
    perm = jax.random.permutation(key, batch)
    w = reads.words[perm]
    l = reads.lengths[perm]
    rc = revcomp_ops.reverse_complement_reads(w, l)
    return (jnp.concatenate([w, rc]), jnp.concatenate([l, l]))


@partial(jax.jit, static_argnames=("k", "w"))
def seed_stage(words2, lengths2, k, w):
    return mapper._seed_candidates(words2, lengths2, t_lo, t_hi, t_pos, k, w)


def make_diag(key):
    w2, l2 = make_stacked(key)
    return (seed_stage(w2, l2, idx.k, idx.w),)


@partial(jax.jit, static_argnames=("bin_bits",))
def vote_stage(diag2, bin_bits=5):
    return mapper._vote(diag2, bin_bits)


def make_fit(key):
    w2, l2 = make_stacked(key)
    d0 = jnp.zeros((w2.shape[0],), jnp.int32)  # placement irrelevant to cost
    ws = jnp.clip(d0, 0, ref_len - 1) // 16
    return (w2[: batch], l2[: batch], ws[: batch])


@jax.jit
def fit_stage(q_words, lengths, ws):
    Lb = W * bitops.BASES_PER_WORD
    Wwin = (Lb + 2 * 32) // bitops.BASES_PER_WORD + 1
    return mapper._fit_extend(
        q_words, lengths, ws, ref_words, ref_len, Wwin, 1, 1
    )


core = partial(mapper._map_core, k=idx.k, w=idx.w, bin_bits=5, pad=32,
               mismatch=1, gap=1)

import bench

emit("xor_copy_64", bench.bench_memcpy(64), "GB/s")
t = amortized_seconds_per_call(
    lambda w, l: core(w, l, t_lo, t_hi, t_pos, ref_words, ref_len), make_reads
)
emit("map_full", batch / t / 1e3, "Kreads/s")
t_seed = amortized_seconds_per_call(
    lambda w2, l2: seed_stage(w2, l2, idx.k, idx.w), make_stacked
)
emit("stage_seed_join", t_seed * 1e3, "ms/call")
t_vote = amortized_seconds_per_call(vote_stage, make_diag)
emit("stage_vote", t_vote * 1e3, "ms/call")
t_fit = amortized_seconds_per_call(fit_stage, make_fit)
emit("stage_fit_extend", t_fit * 1e3, "ms/call")
emit("stage_sum_reads_rate", batch / (t_seed + t_vote + t_fit) / 1e3,
     "Kreads/s")
# context: elements touched per stage (post-compaction S slots/read)
S = mapper._seed_cap(W * 16, idx.w)
emit("seed_rows_sorted", float(idx.keys.shape[0] + 2 * batch * S), "rows")
emit("vote_elems_sorted", float(2 * batch * S * idx.pos.shape[1]), "elems")
emit("xor_copy_64_end", bench.bench_memcpy(64), "GB/s")
