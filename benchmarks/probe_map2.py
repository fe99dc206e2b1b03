"""Seed-stage internals split (follow-up to probe_map: seed 25 ms is now
the dominant stage). Times: minimizer key extraction, the packed join
sort, the cummax fills + unsort, and the occurrence-column gather.

Run: python benchmarks/probe_map2.py   (real TPU)
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
from bitnuc_tpu.ops import kmer as kmer_ops, revcomp as revcomp_ops
from bitnuc_tpu.sequence import PackedReads
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
_SENT = mapper._SENT
Nk = int(idx.keys.shape[0])


def make_stacked(key):
    perm = jax.random.permutation(key, batch)
    w = reads.words[perm]
    l = reads.lengths[perm]
    rc = revcomp_ops.reverse_complement_reads(w, l)
    return (jnp.concatenate([w, rc]), jnp.concatenate([l, l]))


@partial(jax.jit, static_argnames=("k", "w"))
def keys_stage(words2, lengths2, k, w):
    vlo, vhi, pos, valid = mapper._seed_keys(words2, lengths2, k, w)
    sel = kmer_ops.minimizer_sketch_mask(pos, valid)
    return (
        jnp.where(sel, vlo, _SENT),
        jnp.where(sel, pos, 0).astype(jnp.int32),
    )


def make_joinin(key):
    w2, l2 = make_stacked(key)
    qlo, qp = keys_stage(w2, l2, idx.k, idx.w)
    Q = qlo.size
    tag = jnp.concatenate([jnp.zeros(Nk, jnp.uint32), jnp.ones(Q, jnp.uint32)])
    lo_all = jnp.concatenate([t_lo, qlo.reshape(-1)])
    key_all = jnp.where(lo_all == _SENT, _SENT, (lo_all << jnp.uint32(1)) | tag)
    ptr = jnp.concatenate([jnp.arange(Nk, dtype=jnp.int32), jnp.full(Q, -1, jnp.int32)])
    orig = jnp.concatenate([jnp.full(Nk, Q, jnp.int32), jnp.arange(Q, dtype=jnp.int32)])
    return (key_all, ptr, orig)


@jax.jit
def join_sort(key_all, ptr, orig):
    return jax.lax.sort((key_all, ptr, orig), num_keys=1)


def make_sorted(key):
    return (join_sort(*make_joinin(key)),)


@jax.jit
def fills_stage(sorted3):
    key_s, ptr_s, orig_s = sorted3
    N = key_s.shape[0]
    lo_s = jnp.where(key_s == _SENT, _SENT, key_s >> jnp.uint32(1))
    idx_i = jnp.arange(N, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool), lo_s[1:] != lo_s[:-1]])
    run_start = jax.lax.cummax(jnp.where(first, idx_i, 0))
    tpos = jax.lax.cummax(jnp.where(ptr_s >= 0, idx_i, -1))
    tptr = jax.lax.cummax(ptr_s)
    tptr = jnp.where(tpos >= run_start, tptr, Nk)
    _, tptr_u = jax.lax.sort((orig_s, tptr), num_keys=1)
    return tptr_u


def make_tq(key):
    tq = fills_stage(join_sort(*make_joinin(key)))
    return (tq[: 2 * batch * reads.words.shape[1] * 16].reshape(2 * batch, -1),)


@jax.jit
def gather_stage(tq):
    pos_pad = jnp.concatenate([t_pos, jnp.full((1, t_pos.shape[1]), -1, jnp.int32)])
    return jnp.take(pos_pad, tq, axis=0)


import bench

emit("xor_copy_64", bench.bench_memcpy(64), "GB/s")
t = amortized_seconds_per_call(lambda w2, l2: keys_stage(w2, l2, idx.k, idx.w), make_stacked)
emit("seed_keys_minimizers", t * 1e3, "ms/call")
t = amortized_seconds_per_call(join_sort, make_joinin)
emit("seed_join_sort", t * 1e3, "ms/call")
t = amortized_seconds_per_call(fills_stage, make_sorted)
emit("seed_fills_unsort", t * 1e3, "ms/call")
t = amortized_seconds_per_call(gather_stage, make_tq)
emit("seed_occ_gather", t * 1e3, "ms/call")
emit("xor_copy_64_end", bench.bench_memcpy(64), "GB/s")
