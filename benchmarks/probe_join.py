"""Round-5 seed-join probe: the join sort sheds its ptr payload.

Table ids in sorted order are exactly 0..Nk-1 (distinct ascending table
keys), so ptr_s == cumsum(is_table) - 1 and the ptr array never needs to
ride the sort: 3 arrays -> 2 (k <= 15). This probe measures, same-run on
chip at the MAPPER-REAL shapes (seed compaction S = _seed_cap(150, 10) =
64, both strands stacked):

  join_sort_3arr   the round-4 sort (key, ptr, orig)
  join_sort_2arr   the round-5 sort (key, orig)
  fills_unsort     cumsum/cummax fills + the unsort sort (round-5 form)
  unsort_only      the second sort alone (orig, tptr)
  seed_anchors     the full _seed_anchors stage (sort + fills + gather)
  map_full         end-to-end map_reads reads/s

Run: python benchmarks/probe_join.py   (real TPU)
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
from bitnuc_tpu.utils.timing import amortized_seconds_per_call


def emit(n, v, u):
    print(json.dumps({"probe": n, "value": round(v, 3), "unit": u}), flush=True)


batch, read_len, genome_mb = 4096, 150, 4
rng = np.random.default_rng(11)
n = genome_mb << 20
ref = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), size=n))
idx = mapper.MinimizerIndex.build(ref, k=15, w=10)
starts = rng.integers(0, n - read_len, size=batch)
arr = np.stack([np.frombuffer(ref[s : s + read_len], np.uint8) for s in starts])
reads = PackedReads.from_ascii(arr, lengths=np.full(batch, read_len, np.int32))
t_lo = jnp.asarray(idx.keys)
t_pos = jnp.asarray(idx.pos)
_SENT = mapper._SENT
Nk = int(idx.keys.shape[0])


def make_stacked(key):
    perm = jax.random.permutation(key, batch)
    w = reads.words[perm]
    l = reads.lengths[perm]
    rc = revcomp_ops.reverse_complement_reads(w, l)
    return (jnp.concatenate([w, rc]), jnp.concatenate([l, l]))


@partial(jax.jit, static_argnames=("k", "w"))
def keys_compacted(words2, lengths2, k, w):
    """Mapper-real compacted query keys: [2B, S] qlo + qp (k <= 15)."""
    from bitnuc_tpu.ops import kmer as kmer_ops

    vlo, vhi, pos, valid = mapper._seed_keys(words2, lengths2, k, w)
    sel = kmer_ops.minimizer_sketch_mask(pos, valid)
    qlo = jnp.where(sel, vlo, _SENT)
    qp = jnp.where(sel, pos, 0).astype(jnp.int32)
    L = qlo.shape[-1]
    S = mapper._seed_cap(L, w)
    if S < L:
        okey = jnp.where(sel, jnp.arange(L, dtype=jnp.int32), jnp.int32(L))
        _, qlo, qp = jax.lax.sort((okey, qlo, qp), num_keys=1)
        qlo, qp = qlo[:, :S], qp[:, :S]
    return qlo, qp


def make_joinin(key):
    w2, l2 = make_stacked(key)
    qlo, _ = keys_compacted(w2, l2, idx.k, idx.w)
    Q = qlo.size
    tag = jnp.concatenate([jnp.zeros(Nk, jnp.uint32), jnp.ones(Q, jnp.uint32)])
    lo_all = jnp.concatenate([t_lo, qlo.reshape(-1)])
    key_all = jnp.where(lo_all == _SENT, _SENT, (lo_all << jnp.uint32(1)) | tag)
    ptr = jnp.concatenate([jnp.arange(Nk, dtype=jnp.int32), jnp.full(Q, -1, jnp.int32)])
    orig = jnp.concatenate([jnp.full(Nk, Q, jnp.int32), jnp.arange(Q, dtype=jnp.int32)])
    return (key_all, ptr, orig)


@jax.jit
def join_sort_3arr(key_all, ptr, orig):
    return jax.lax.sort((key_all, ptr, orig), num_keys=1)


@jax.jit
def join_sort_2arr(key_all, ptr, orig):
    return jax.lax.sort((key_all, orig), num_keys=1)


def make_sorted2(key):
    k2, o2 = join_sort_2arr(*make_joinin(key))
    return ((k2, o2),)


@jax.jit
def fills_stage(sorted2):
    """Round-5 fills: derive tptr by cumsum over the tag parity."""
    key_s, orig_s = sorted2
    N = key_s.shape[0]
    is_table = (key_s & jnp.uint32(1)) == 0
    lo_s = jnp.where(key_s == _SENT, _SENT, key_s >> jnp.uint32(1))
    idx_i = jnp.arange(N, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool), lo_s[1:] != lo_s[:-1]])
    run_start = jax.lax.cummax(jnp.where(first, idx_i, 0))
    tpos = jax.lax.cummax(jnp.where(is_table, idx_i, -1))
    tptr = jnp.cumsum(is_table.astype(jnp.int32)) - 1
    tptr = jnp.where(tpos >= run_start, tptr, Nk)
    _, tptr_u = jax.lax.sort((orig_s, tptr), num_keys=1)
    return tptr_u


@jax.jit
def unsort_only(sorted2):
    key_s, orig_s = sorted2
    return jax.lax.sort((orig_s, jnp.asarray(key_s, jnp.int32)), num_keys=1)[1]


def make_anchor_in(key):
    w2, l2 = make_stacked(key)
    return (w2, l2)


@partial(jax.jit, static_argnames=("k", "w"))
def anchors_full(words2, lengths2, k, w):
    t_hi = jnp.zeros_like(t_lo)
    return mapper._seed_anchors(words2, lengths2, t_lo, t_hi, t_pos, k, w)


import bench

emit("xor_copy_64", bench.bench_memcpy(64), "GB/s")
t = amortized_seconds_per_call(join_sort_3arr, make_joinin)
emit("join_sort_3arr", t * 1e3, "ms/call")
t = amortized_seconds_per_call(join_sort_2arr, make_joinin)
emit("join_sort_2arr", t * 1e3, "ms/call")
t = amortized_seconds_per_call(fills_stage, make_sorted2)
emit("fills_unsort", t * 1e3, "ms/call")
t = amortized_seconds_per_call(unsort_only, make_sorted2)
emit("unsort_only", t * 1e3, "ms/call")
t = amortized_seconds_per_call(
    lambda w2, l2: anchors_full(w2, l2, idx.k, idx.w), make_anchor_in
)
emit("seed_anchors", t * 1e3, "ms/call")
def make_map(key):
    perm = jax.random.permutation(key, batch)
    return (
        reads.words[perm], reads.lengths[perm], t_lo,
        jnp.asarray(idx.keys_hi), t_pos, jnp.asarray(idx.ref_words),
        jnp.full((), idx.ref_len, jnp.int32),
    )


map_fn = partial(
    mapper._map_core, k=idx.k, w=idx.w, bin_bits=5, pad=32, mismatch=1, gap=1
)
t = amortized_seconds_per_call(map_fn, make_map)
emit("map_full", batch / t / 1e3, "Kreads/s")
emit("xor_copy_64_end", bench.bench_memcpy(64), "GB/s")
