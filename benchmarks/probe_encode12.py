"""Single-reduce pack formulations (follow-up to probe_encode11, where the
reshape + single-max-reduce floor ran 31.6 Gbases/s vs 27.5 for the
slice-tree structure — XLA's native reduce beats 15 elementwise tree ops).

Candidates (words must stay bit-exact):
  - reduce_or_noval:  reshape [B,W,16], pre-shift codes elementwise,
                      ONE lax.reduce(bitwise_or) over the lane axis,
                      word_valid_mask at the end
  - reduce_sum_noval: same with a sum reduce (add == or for disjoint bits)
  - enc_reduce_or:    reduce_or + the [B, L] max-trick validation
  - enc_wordmask:     current shipping formulation, same-run reference

Run: python benchmarks/probe_encode12.py   (real TPU)
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

B, L = 16384, 32768


def emit(n, v, u):
    print(json.dumps({"probe": n, "value": round(v, 2), "unit": u}), flush=True)


def make(key):
    codes = jax.random.randint(key, (B, L), 0, 4, jnp.int32)
    return (bitops.code_to_ascii(codes), jnp.full((B,), L, jnp.int32))


def _pack_reduce_or(a, l):
    Bx, Lx = a.shape
    W = Lx // 16
    shifts = (2 * jnp.arange(16, dtype=jnp.uint32)).reshape(1, 1, 16)
    v = bitops.ascii_to_code(a).reshape(Bx, W, 16) << shifts
    w = jax.lax.reduce(v, jnp.uint32(0), jax.lax.bitwise_or, (2,))
    return w & bitops.word_valid_mask(W, l)


def reduce_or_noval(a, l):
    return _pack_reduce_or(a, l)


def reduce_sum_noval(a, l):
    Bx, Lx = a.shape
    W = Lx // 16
    shifts = (2 * jnp.arange(16, dtype=jnp.uint32)).reshape(1, 1, 16)
    v = bitops.ascii_to_code(a).reshape(Bx, W, 16) << shifts
    w = jnp.sum(v, axis=-1).astype(jnp.uint32)
    return w & bitops.word_valid_mask(W, l)


def enc_reduce_or(a, l):
    Lx = a.shape[-1]
    pos = jnp.arange(Lx, dtype=jnp.int32)
    in_range = pos < l[..., None]
    invalid = ~bitops.ascii_is_valid(a) & in_range
    enc = jnp.max(jnp.where(invalid, Lx - pos, 0), axis=-1)
    first_bad = jnp.where(enc > 0, Lx - enc, -1).astype(jnp.int32)
    return _pack_reduce_or(a, l), first_bad


import numpy as np

rng = np.random.default_rng(5)
a_s = np.asarray(
    bitops.code_to_ascii(jnp.asarray(rng.integers(0, 4, (6, 256), np.int32)))
).copy()
a_s[2, 100] = ord("N")
a_s[4, 3] = ord("x")
l_s = jnp.asarray([256, 128, 256, 37, 256, 0], jnp.int32)
ref, fbr = codec.encode_reads_xla(jnp.asarray(a_s), l_s)
w, fb = enc_reduce_or(jnp.asarray(a_s), l_s)
assert (np.asarray(w) == np.asarray(ref)).all()
assert (np.asarray(fb) == np.asarray(fbr)).all(), (fb, fbr)
for fn in (reduce_or_noval, reduce_sum_noval):
    assert (np.asarray(fn(jnp.asarray(a_s), l_s)) == np.asarray(ref)).all()
print(json.dumps({"probe": "parity", "value": 1, "unit": "ok"}), flush=True)

import bench

emit("xor_copy_336", bench.bench_memcpy(336), "GB/s")
for name, fn in [
    ("enc_wordmask_shipping", codec.encode_reads_xla),
    ("enc_reduce_or", enc_reduce_or),
    ("reduce_or_noval", reduce_or_noval),
    ("reduce_sum_noval", reduce_sum_noval),
]:
    try:
        t = amortized_seconds_per_call(fn, make, k=2, reps=5)
        emit(name, B * L / t / 1e9, "Gbases/s")
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:300]}), flush=True)
emit("xor_copy_336_end", bench.bench_memcpy(336), "GB/s")
