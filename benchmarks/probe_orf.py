"""ORF stage split (round 5, VERDICT item 8): where do the 419 Mbases/s go?

Hypothesis: the reverse strided cummin (lax.associative_scan = log2(L/3)
materialized passes over [B, L] i32) dominates; the roofline_frac 0.007 in
the artifact divides by PACKED input bytes (0.25/base) while the op's real
traffic is the scan's ~2*log2(171) unpacked i32 passes.

Run: python benchmarks/probe_orf.py   (real TPU)
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
from bitnuc_tpu.ops import orf
from bitnuc_tpu.utils import bitops
from bitnuc_tpu.utils.timing import amortized_seconds_per_call


def emit(n, v, u):
    print(json.dumps({"probe": n, "value": round(v, 2), "unit": u}), flush=True)


batch, read_len = 16384, 512
W = bitops.n_words_for(read_len)
_BIG = np.int32(2**30)


def make(key):
    return (
        jax.random.bits(key, (batch, W), jnp.uint32),
        jnp.full((batch,), read_len, jnp.int32),
    )


def make_stops(key):
    w, l = make(key)
    codes = bitops.unpack_words(w).astype(jnp.int32)
    B, L = codes.shape
    pos = jnp.arange(L, dtype=jnp.int32)
    c1 = jnp.concatenate([codes[:, 1:], jnp.zeros((B, 1), jnp.int32)], -1)
    c2 = jnp.concatenate([codes[:, 2:], jnp.zeros((B, 2), jnp.int32)], -1)
    codon = codes * 16 + c1 * 4 + c2
    is_stop = (codon == 48) | (codon == 50) | (codon == 56)
    return (jnp.where(is_stop, pos, _BIG),)


@jax.jit
def cummin_stage(stop_pos):
    B, L = stop_pos.shape
    L3 = -(-L // 3) * 3
    sp = jnp.pad(stop_pos, ((0, 0), (0, L3 - L)), constant_values=_BIG)
    v3 = sp.reshape(B, L3 // 3, 3)
    nxt3 = jnp.flip(jax.lax.cummin(jnp.flip(v3, 1), axis=1), 1)
    return jnp.sum(nxt3.reshape(B, L3)[:, :L])


@jax.jit
def doubling_stage(stop_pos):
    # same result via explicit binary doubling on the flat [B, L] layout
    B, L = stop_pos.shape
    a = stop_pos
    s = 3
    while s < L:
        shifted = jnp.concatenate(
            [a[:, s:], jnp.full((B, s), _BIG, jnp.int32)], axis=-1
        )
        a = jnp.minimum(a, shifted)
        s *= 2
    return jnp.sum(a)


@jax.jit
def onestrand_stage(w, l):
    return tuple(jnp.sum(x) for x in orf._best_orf_one_strand(w, l))


# parity of the doubling alternative
sp = make_stops(jax.random.PRNGKey(0))[0][:64]
assert int(cummin_stage(sp)) == int(doubling_stage(sp)), "doubling mismatch"
print("doubling bit-exact OK", flush=True)

import bench

emit("xor_copy_64", bench.bench_memcpy(64), "GB/s")
t = amortized_seconds_per_call(orf.longest_orf, make)
emit("orf_full", batch * read_len / t / 1e6, "Mbases/s")
t = amortized_seconds_per_call(onestrand_stage, make)
emit("orf_one_strand", batch * read_len / t / 1e6, "Mbases/s")
t = amortized_seconds_per_call(cummin_stage, make_stops)
emit("orf_cummin_only", t * 1e3, "ms/call")
t = amortized_seconds_per_call(doubling_stage, make_stops)
emit("orf_doubling_only", t * 1e3, "ms/call")
emit("xor_copy_64_end", bench.bench_memcpy(64), "GB/s")
