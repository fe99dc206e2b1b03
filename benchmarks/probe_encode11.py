"""Close the encode -> floor gap (follow-up to probe_encode10; bench run
recorded floor_frac 0.807 at 82 GB/s calibration).

Hypotheses for the remaining ~20%:
  (a) the 16 per-lane in_range `where`s — replaceable by ONE final
      word_valid_mask AND on the output words (enc_wordmask);
  (b) validation (~6% measured);
  (c) the shift+OR fold itself vs the floor's max fold (slices_max_floor
      pins the slice-structured floor same-run).

Run: python benchmarks/probe_encode11.py   (real TPU)
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


def _tree(parts, op):
    while len(parts) > 1:
        parts = [
            op(parts[i], parts[i + 1]) if i + 1 < len(parts) else parts[i]
            for i in range(0, len(parts), 2)
        ]
    return parts[0]


def enc_wordmask(a, l):
    """Slices formulation, but in-range masking via ONE word mask at the
    end instead of 16 per-lane wheres; validation unchanged."""
    Lx = a.shape[-1]
    W = Lx // 16
    lens = l[..., None]
    shifted, bad_enc = [], []
    for j in range(16):
        s = a[..., j::16]
        pos = jnp.arange(W, dtype=jnp.int32) * 16 + j
        in_range = pos < lens
        shifted.append(bitops.ascii_to_code(s) << jnp.uint32(2 * j))
        invalid = ~bitops.ascii_is_valid(s) & in_range
        bad_enc.append(jnp.where(invalid, Lx - pos, 0))
    words = _tree(shifted, jnp.bitwise_or) & bitops.word_valid_mask(W, l)
    enc = jnp.max(_tree(bad_enc, jnp.maximum), axis=-1)
    first_bad = jnp.where(enc > 0, Lx - enc, -1).astype(jnp.int32)
    return words, first_bad


def enc_wordmask_noval(a, l):
    Lx = a.shape[-1]
    W = Lx // 16
    shifted = []
    for j in range(16):
        s = a[..., j::16]
        shifted.append(bitops.ascii_to_code(s) << jnp.uint32(2 * j))
    return _tree(shifted, jnp.bitwise_or) & bitops.word_valid_mask(W, l)


def slices_max_floor(a, l):
    """Floor with the slice structure: SWAR codes, tree-MAX fold."""
    parts = [bitops.ascii_to_code(a[..., j::16]) for j in range(16)]
    return _tree(parts, jnp.maximum)


import numpy as np

# parity gate (words AND first_bad) incl. ragged lengths + invalid bytes
rng = np.random.default_rng(5)
a_s = np.asarray(
    bitops.code_to_ascii(jnp.asarray(rng.integers(0, 4, (6, 256), np.int32)))
).copy()
a_s[2, 100] = ord("N")
a_s[4, 3] = ord("x")
l_s = jnp.asarray([256, 128, 256, 37, 256, 0], jnp.int32)
ref, fbr = codec.encode_reads_xla(jnp.asarray(a_s), l_s)
for name, fn in (("enc_wordmask", enc_wordmask),):
    w, fb = fn(jnp.asarray(a_s), l_s)
    assert (np.asarray(w) == np.asarray(ref)).all(), name
    assert (np.asarray(fb) == np.asarray(fbr)).all(), (name, fb, fbr)
w = enc_wordmask_noval(jnp.asarray(a_s), l_s)
assert (np.asarray(w) == np.asarray(ref)).all(), "enc_wordmask_noval"
print(json.dumps({"probe": "parity", "value": 1, "unit": "ok"}), flush=True)

import bench

emit("xor_copy_336", bench.bench_memcpy(336), "GB/s")
for name, fn in [
    ("enc_current", codec.encode_reads_xla),
    ("enc_wordmask", enc_wordmask),
    ("enc_wordmask_noval", enc_wordmask_noval),
    ("slices_max_floor", slices_max_floor),
    ("reshape_max_floor", lambda a, l: jnp.max(
        (((a >> 1) ^ (a >> 2)) & 3).reshape(B, L // 16, 16), axis=-1
    ).astype(jnp.uint32)),
]:
    try:
        t = amortized_seconds_per_call(fn, make, k=2, reps=5)
        emit(name, B * L / t / 1e9, "Gbases/s")
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:300]}), flush=True)
emit("xor_copy_336_end", bench.bench_memcpy(336), "GB/s")
