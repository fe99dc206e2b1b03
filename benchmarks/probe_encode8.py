"""Validation-cost variants for encode_reads (follow-up to probe_encode7,
which measured: current argmax+any 21.5 Gb/s, no-validate 25.2, min-based
first_bad WITH optimization_barrier 18.3 — the barrier hurt). Here:

- current:        any() + argmax() on the fused invalid chain
- barrier:        same reduces on a barriered invalid array
- maxtrick:       ONE single-value max reduce: enc = max(invalid ? L-pos : 0)
                  -> first_bad = enc>0 ? L-enc : -1 (no variadic reduce)
- maxtrick_bar:   maxtrick on a barriered operand
- novalidate:     floor (pack only)

Run: python benchmarks/probe_encode8.py  (real TPU, ~268M bases/call)
"""
import json
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bitnuc_tpu import config

config.enable_compilation_cache()
from bitnuc_tpu.ops import codec
from bitnuc_tpu.utils import bitops
from bitnuc_tpu.utils.timing import amortized_seconds_per_call

B, L = 8192, 32768


def emit(n, v, u):
    print(json.dumps({"probe": n, "value": round(v, 2), "unit": u}), flush=True)


def make(key):
    codes = jax.random.randint(key, (B, L), 0, 4, jnp.int32)
    return (bitops.code_to_ascii(codes), jnp.full((B,), L, jnp.int32))


def _base(a, l):
    pos = jnp.arange(L, dtype=jnp.int32)
    in_range = pos < l[..., None]
    invalid = jnp.logical_and(~bitops.ascii_is_valid(a), in_range)
    codes = jnp.where(in_range, bitops.ascii_to_code(a), 0)
    return pos, invalid, bitops.pack_codes(codes)


def enc_barrier(a, l):
    pos, invalid, words = _base(a, l)
    invalid = jax.lax.optimization_barrier(invalid)
    any_bad = jnp.any(invalid, axis=-1)
    fb = jnp.where(any_bad, jnp.argmax(invalid, axis=-1).astype(jnp.int32), -1)
    return words, fb


def enc_maxtrick(a, l):
    pos, invalid, words = _base(a, l)
    enc = jnp.max(jnp.where(invalid, L - pos, 0), axis=-1)
    return words, jnp.where(enc > 0, L - enc, -1)


def enc_maxtrick_bar(a, l):
    pos, invalid, words = _base(a, l)
    enc = jnp.max(jax.lax.optimization_barrier(jnp.where(invalid, L - pos, 0)), axis=-1)
    return words, jnp.where(enc > 0, L - enc, -1)


def enc_novalidate(a, l):
    pos, invalid, words = _base(a, l)
    return words


import bench

emit("xor_copy_168", bench.bench_memcpy(168), "GB/s")
for name, fn in [
    ("enc_current", codec.encode_reads_xla),
    ("enc_barrier", enc_barrier),
    ("enc_maxtrick", enc_maxtrick),
    ("enc_maxtrick_bar", enc_maxtrick_bar),
    ("enc_novalidate", enc_novalidate),
]:
    try:
        t = amortized_seconds_per_call(fn, make)
        emit(name, B * L / t / 1e9, "Gbases/s")
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:200]}), flush=True)
emit("xor_copy_168_end", bench.bench_memcpy(168), "GB/s")
