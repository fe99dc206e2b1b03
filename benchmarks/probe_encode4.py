"""Round-2 encode probes, part 4: planar ASCII layout.

part-3 result: even all-u32 SWAR encode sits at ~4.5 Gbases/s because the
4:1 minor-axis combine (reshape/slice) lowers as a relayout — the same
~4-5 GB/s wall as bitcasts and sub-word converts. Every layout-changing op
is the wall; pure same-shape elementwise runs at the 34 GB/s copy roofline.

Fix under test: ASCII PLANES — plane j is the u32 view of bytes
[16w+4j, 16w+4j+4) for output word w, shape [4, B, W]. Then
    word = pack4(p0) | pack4(p1)<<8 | pack4(p2)<<16 | pack4(p3)<<24
is elementwise across four same-shape arrays: no reshapes, no bitcasts, no
sub-word types on device. The host builds planes with one numpy transpose
(or the native parser writes them directly); that is a LAYOUT declaration,
exactly like the word-major PackedDB.
"""

import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bitnuc_tpu import config

config.enable_compilation_cache()

from bitnuc_tpu.utils import bitops  # noqa: E402
from bitnuc_tpu.utils.timing import amortized_seconds_per_call  # noqa: E402

B, L = 1024, 32768
W = L // 16


def emit(name, value, unit):
    print(json.dumps({"probe": name, "value": round(value, 2), "unit": unit}), flush=True)


def probe(name, fn, make, scale, unit):
    try:
        t = amortized_seconds_per_call(fn, make)
        emit(name, scale / t, unit)
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:300]}), flush=True)


def make_planes(key):
    """[4, B, W] uint32 planes of valid ASCII + lengths."""
    ks = jax.random.split(key, 4)
    planes = jnp.stack(
        [
            jax.random.randint(k, (B, W), 0, 4, jnp.uint32)
            * jnp.uint32(0x01010101)  # 4 equal codes per word; map to ascii
            for k in ks
        ]
    )
    # codes 0..3 per byte -> ascii via the decode identity (cheap, untimed)
    t0 = planes & jnp.uint32(0x01010101)
    t1 = (planes >> jnp.uint32(1)) & jnp.uint32(0x01010101)
    both = t0 & t1
    asc = (
        jnp.uint32(0x41414141)
        + (t0 << jnp.uint32(1))
        + (t1 << jnp.uint32(2))
        + (t1 << jnp.uint32(1))
        + (both << jnp.uint32(3))
        + (both << jnp.uint32(1))
        + both
    )
    return asc, jnp.full((B,), L, jnp.int32)


def make_words(key):
    return (
        jax.random.bits(key, (B, W), jnp.uint32),
        jnp.full((B,), L, jnp.int32),
    )


def _zero_bytes(v):
    v7 = v & jnp.uint32(0x7F7F7F7F)
    t = (v7 + jnp.uint32(0x7F7F7F7F)) | v
    return ~t & jnp.uint32(0x80808080)


def _pack4(p):
    c = ((p >> 1) ^ (p >> 2)) & jnp.uint32(0x03030303)
    return (c * jnp.uint32(0x01041040)) >> jnp.uint32(24)


def encode_planes(planes, lengths):
    """[4, B, W] ascii planes -> ([B, W] words, [B] first_bad)."""
    widx = jnp.arange(W, dtype=jnp.int32)
    big = jnp.int32(1 << 30)
    word = jnp.zeros(planes.shape[1:], jnp.uint32)
    fb = jnp.full(planes.shape[1], big, jnp.int32)
    for j in range(4):
        p = planes[j]
        lw = p | jnp.uint32(0x20202020)
        valid = (
            _zero_bytes(lw ^ jnp.uint32(0x61616161))
            | _zero_bytes(lw ^ jnp.uint32(0x63636363))
            | _zero_bytes(lw ^ jnp.uint32(0x67676767))
            | _zero_bytes(lw ^ jnp.uint32(0x74747474))
        )
        rem = jnp.clip(lengths[:, None] - 16 * widx - 4 * j, 0, 4)
        rmask = jnp.where(
            rem == 0,
            jnp.uint32(0),
            jnp.uint32(0x80808080)
            >> (8 * (4 - jnp.maximum(rem, 1))).astype(jnp.uint32),
        )
        bad = ~valid & rmask
        bw = jnp.min(
            jax.lax.optimization_barrier(jnp.where(bad != 0, widx, big)), axis=-1
        )
        sel = jnp.take_along_axis(
            bad, jnp.minimum(bw, W - 1)[:, None].astype(jnp.int32), axis=-1
        )[:, 0]
        lsb = sel & (~sel + jnp.uint32(1))
        byte_i = (bitops.popcount32(lsb - jnp.uint32(1)) >> 3).astype(jnp.int32)
        fb = jnp.minimum(fb, jnp.where(bw == big, big, 16 * bw + 4 * j + byte_i))
        c = _pack4(p) & ((rmask >> jnp.uint32(7)) * jnp.uint32(0xFF))
        word = word | (c << jnp.uint32(8 * j))
    return word, jnp.where(fb == big, -1, fb)


def decode_planes(words, lengths):
    """[B, W] words -> [4, B, W] ascii planes (zero past length)."""
    widx = jnp.arange(W, dtype=jnp.int32)
    outs = []
    for j in range(4):
        x = (words >> jnp.uint32(8 * j)) & jnp.uint32(0xFF)
        s = (
            x
            | (x << jnp.uint32(6))
            | (x << jnp.uint32(12))
            | (x << jnp.uint32(18))
        ) & jnp.uint32(0x03030303)
        t0 = s & jnp.uint32(0x01010101)
        t1 = (s >> jnp.uint32(1)) & jnp.uint32(0x01010101)
        both = t0 & t1
        asc = (
            jnp.uint32(0x41414141)
            + (t0 << jnp.uint32(1))
            + (t1 << jnp.uint32(2))
            + (t1 << jnp.uint32(1))
            + (both << jnp.uint32(3))
            + (both << jnp.uint32(1))
            + both
        )
        rem = jnp.clip(lengths[:, None] - 16 * widx - 4 * j, 0, 4)
        bmask = jnp.where(
            rem == 0,
            jnp.uint32(0),
            jnp.uint32(0xFFFFFFFF)
            >> (8 * (4 - jnp.maximum(rem, 1))).astype(jnp.uint32),
        )
        outs.append(asc & bmask)
    return jnp.stack(outs)


def main():
    import bench

    emit("xor_copy_bw", bench.bench_memcpy(), "GB/s")
    probe("encode_planes", encode_planes, make_planes, B * L / 1e9, "Gbases/s")
    probe("decode_planes", decode_planes, make_words, B * L / 1e9, "Gbases/s")

    def encode_planes_novalidate(planes, lengths):
        word = jnp.zeros(planes.shape[1:], jnp.uint32)
        for j in range(4):
            word = word | (_pack4(planes[j]) << jnp.uint32(8 * j))
        return word

    probe(
        "encode_planes_novalidate",
        encode_planes_novalidate,
        make_planes,
        B * L / 1e9,
        "Gbases/s",
    )
    emit("xor_copy_bw_end", bench.bench_memcpy(), "GB/s")


if __name__ == "__main__":
    main()
