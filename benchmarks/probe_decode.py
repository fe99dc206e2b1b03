"""Decode formulation shootout at scale (encode got +10% from a
formulation change in round 3; decode still uses the round-1 shape:
unpack via [B, W, 16] shifts -> minor-dim-combining reshape -> 3-select
LUT -> length mask).

Variants (bit-exact vs shipping decode where applicable):
  - dec_current:   shipping codec.decode_reads_xla
  - dec_noval:     same without the length mask (floor-ish)
  - dec_u32swar:   SWAR: 4 output ASCII bytes built inside one u32 lane
                   (code extraction + arithmetic byte LUT), output
                   [B, L/4] u32 bitcast to u8 at the boundary
  - floor_bcast:   write-side floor: [B, L] u8 from a broadcast repeat of
                   the words (same bytes in/out, no per-base extraction)

Run: python benchmarks/probe_decode.py   (real TPU)
"""
import json
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from bitnuc_tpu import config

config.enable_compilation_cache()
from bitnuc_tpu.ops import codec
from bitnuc_tpu.utils import bitops
from bitnuc_tpu.utils.timing import amortized_seconds_per_call

B, L = 8192, 32768
W = L // 16


def emit(n, v, u):
    print(json.dumps({"probe": n, "value": round(v, 2), "unit": u}), flush=True)


def make(key):
    w = jax.random.bits(key, (B, W), jnp.uint32)
    return (w, jnp.full((B,), L, jnp.int32))


def dec_noval(w, l):
    codes = bitops.unpack_words(w)
    return bitops.code_to_ascii(codes)


def dec_u32swar(w, l):
    """4 ASCII bytes per u32 lane: extract codes 4j..4j+3 of each word
    into byte positions, then the arithmetic code->ASCII map applied SWAR
    (A=65, C=67, G=71, T=84: ascii = 65 + c*2 + (c>=2)*2 + (c==3)*11 ...
    no clean affine map exists, so use a 4-way select per byte via masks).
    """
    # codes c in {0,1,2,3} at bits [2m, 2m+2) of each word; build byte
    # planes then OR into u32 lanes -- j-th output u32 lane of word w
    # holds bases 4j..4j+3.
    outs = []
    for j in range(4):
        b0 = (w >> jnp.uint32(8 * j)) & jnp.uint32(0x3)
        b1 = (w >> jnp.uint32(8 * j + 2)) & jnp.uint32(0x3)
        b2 = (w >> jnp.uint32(8 * j + 4)) & jnp.uint32(0x3)
        b3 = (w >> jnp.uint32(8 * j + 6)) & jnp.uint32(0x3)
        def a(c):
            # branch-free 4-way: 65,67,71,84
            return (
                jnp.uint32(65)
                + c * jnp.uint32(2)
                + (c >> 1) * jnp.uint32(2)
                + ((c & (c >> 1)) * jnp.uint32(11))
            )
        lane = (
            a(b0)
            | (a(b1) << jnp.uint32(8))
            | (a(b2) << jnp.uint32(16))
            | (a(b3) << jnp.uint32(24))
        )
        outs.append(lane)
    u32 = jnp.stack(outs, axis=-1).reshape(B, W * 4)
    return jax.lax.bitcast_convert_type(u32, jnp.uint8).reshape(B, L)


def floor_bcast(w, l):
    rep = jnp.broadcast_to(w[:, :, None], (B, W, 16)).reshape(B, L)
    return (rep & jnp.uint32(0xFF)).astype(jnp.uint8)


import numpy as np2

rng = np2.random.default_rng(4)
ws = jnp.asarray(rng.integers(0, 2**32, (3, 8), np2.uint32))
ls = jnp.full((3,), 128, jnp.int32)
ref = np2.asarray(codec.decode_reads_xla(ws, ls))
# parity at small shape for the swar variant (shape-agnostic re-impl)
def dec_u32swar_any(w, l):
    Bx, Wx = w.shape
    outs = []
    for j in range(4):
        def a(c):
            return (jnp.uint32(65) + c * jnp.uint32(2) + (c >> 1) * jnp.uint32(2)
                    + ((c & (c >> 1)) * jnp.uint32(11)))
        lane = jnp.uint32(0)
        for i in range(4):
            c = (w >> jnp.uint32(8 * j + 2 * i)) & jnp.uint32(0x3)
            lane = lane | (a(c) << jnp.uint32(8 * i))
        outs.append(lane)
    u32 = jnp.stack(outs, axis=-1).reshape(Bx, Wx * 4)
    return jax.lax.bitcast_convert_type(u32, jnp.uint8).reshape(Bx, Wx * 16)

got = np2.asarray(dec_u32swar_any(ws, ls))
assert (got == ref).all(), "swar parity"
print(json.dumps({"probe": "parity", "value": 1, "unit": "ok"}), flush=True)

import bench

emit("xor_copy_160", bench.bench_memcpy(160), "GB/s")
for name, fn in (
    ("dec_current", codec.decode_reads_xla),
    ("dec_noval", dec_noval),
    ("dec_u32swar", lambda w, l: dec_u32swar_any(w, l)),
    ("floor_bcast", floor_bcast),
):
    try:
        t = amortized_seconds_per_call(fn, make, k=3, reps=5)
        emit(name, B * L / t / 1e9, "Gbases/s")
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:300]}), flush=True)
emit("xor_copy_160_end", bench.bench_memcpy(160), "GB/s")
