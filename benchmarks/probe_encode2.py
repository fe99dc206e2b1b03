"""Round-2 encode probes, part 2: is uint8 the bottleneck?

probe_encode.py showed every encode variant stuck at ~4.5 Gbases/s (~16% of
the same-run copy roofline) even with validation removed — so the u8
elementwise core itself is suspect (TPU vector lanes are 32-bit; u8 arrays
live in (32,128) tiles and sub-word ops relayout). These probes compare raw
u8 vs u32 elementwise throughput and a full-SWAR encode that bitcasts the
ASCII to u32 words and does all per-byte math in 32-bit lanes
(codes: ((w>>1)^(w>>2)) & 0x03030303; pack: multiply-gather by 0x01041040).
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


def emit(name, value, unit):
    print(json.dumps({"probe": name, "value": round(value, 2), "unit": unit}), flush=True)


def probe(name, fn, make, scale, unit):
    try:
        t = amortized_seconds_per_call(fn, make)
        emit(name, scale / t, unit)
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:300]}), flush=True)


def make_u8(key):
    codes = jax.random.randint(key, (B, L), 0, 4, jnp.int32)
    return (bitops.code_to_ascii(codes),)


def make_u8_lens(key):
    codes = jax.random.randint(key, (B, L), 0, 4, jnp.int32)
    return (bitops.code_to_ascii(codes), jnp.full((B,), L, jnp.int32))


def make_u32(key):
    return (jax.random.bits(key, (B, L // 4), jnp.uint32),)


def swar_encode_core(ascii_u8):
    Bc, Lc = ascii_u8.shape
    w = jax.lax.bitcast_convert_type(
        ascii_u8.reshape(Bc, Lc // 4, 4), jnp.uint32
    )
    c = ((w >> 1) ^ (w >> 2)) & jnp.uint32(0x03030303)
    pb = (c * jnp.uint32(0x01041040)) >> jnp.uint32(24)
    x = pb.reshape(Bc, Lc // 8, 2)
    x = x[..., 0] | (x[..., 1] << jnp.uint32(8))
    x = x.reshape(Bc, Lc // 16, 2)
    return x[..., 0] | (x[..., 1] << jnp.uint32(16))


def _zero_bytes(v):
    """0x80 at bytes == 0, exact (no cross-byte carries)."""
    v7 = v & jnp.uint32(0x7F7F7F7F)
    t = (v7 + jnp.uint32(0x7F7F7F7F)) | v
    return ~t & jnp.uint32(0x80808080)


def swar_encode_validated(ascii_u8, lengths):
    Bc, Lc = ascii_u8.shape
    w = jax.lax.bitcast_convert_type(
        ascii_u8.reshape(Bc, Lc // 4, 4), jnp.uint32
    )
    lw = w | jnp.uint32(0x20202020)
    valid = (
        _zero_bytes(lw ^ jnp.uint32(0x61616161))
        | _zero_bytes(lw ^ jnp.uint32(0x63636363))
        | _zero_bytes(lw ^ jnp.uint32(0x67676767))
        | _zero_bytes(lw ^ jnp.uint32(0x74747474))
    )
    # in-range byte mask (0x80 at in-range bytes of each 4-byte word)
    W4 = Lc // 4
    widx = jnp.arange(W4, dtype=jnp.int32)
    rem = jnp.clip(lengths[:, None] - 4 * widx, 0, 4)
    # shift-by-32 is UB at rem == 0: build from rem >= 1
    rmask = jnp.where(
        rem == 0,
        jnp.uint32(0),
        jnp.uint32(0x80808080) >> (8 * (4 - jnp.maximum(rem, 1))).astype(jnp.uint32),
    )
    bad = ~valid & rmask
    # first bad: min word with bad != 0, then lowest set byte in it
    big = jnp.int32(1 << 30)
    bw = jnp.min(
        jax.lax.optimization_barrier(jnp.where(bad != 0, widx, big)), axis=-1
    )
    safe = jnp.minimum(bw, W4 - 1)
    sel = jnp.take_along_axis(bad, safe[:, None].astype(jnp.int32), axis=-1)[:, 0]
    lsb = sel & (~sel + 1)
    byte_i = (bitops.popcount32(lsb - 1) >> 3).astype(jnp.int32)
    first_bad = jnp.where(bw == big, -1, 4 * bw + byte_i)

    c = ((w >> 1) ^ (w >> 2)) & jnp.uint32(0x03030303)
    # zero out-of-range bytes so padding packs as A (reference zero-pad)
    c = c & ((rmask >> 7) * jnp.uint32(0xFF))
    pb = (c * jnp.uint32(0x01041040)) >> jnp.uint32(24)
    x = pb.reshape(Bc, Lc // 8, 2)
    x = x[..., 0] | (x[..., 1] << jnp.uint32(8))
    x = x.reshape(Bc, Lc // 16, 2)
    words = x[..., 0] | (x[..., 1] << jnp.uint32(16))
    return words, first_bad


def main():
    import bench

    emit("xor_copy_bw_u32", bench.bench_memcpy(), "GB/s")
    # raw u8 elementwise: same op as the calibration but on a u8 array
    probe("u8_xor_copy", lambda x: x ^ jnp.uint8(0x55), make_u8, 2 * B * L / 2**30, "GB/s")
    probe("u8_to_u32_convert", lambda x: x.astype(jnp.uint32) & jnp.uint32(3), make_u8, B * L / 1e9, "Gel/s")
    probe("u8_bitcast_u32", lambda x: jax.lax.bitcast_convert_type(x.reshape(B, L // 4, 4), jnp.uint32) ^ jnp.uint32(1), make_u8, B * L / 1e9, "Gbases/s")
    probe("swar_encode_core", swar_encode_core, make_u8, B * L / 1e9, "Gbases/s")
    probe("swar_encode_validated", swar_encode_validated, make_u8_lens, B * L / 1e9, "Gbases/s")
    emit("xor_copy_bw_end", bench.bench_memcpy(), "GB/s")


if __name__ == "__main__":
    main()
