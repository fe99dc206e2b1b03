"""Round-2 encode probes, part 3: u32-viewed ASCII end-state.

probe_encode2.py measured u8 elementwise at 8.7 GB/s vs 35 for u32 on the
same chip — sub-word arrays are the wall, and the u8->u32 bitcast lowers as
a relayout costing the same. So the end-state keeps ASCII in HBM as
u32-viewed words (host reinterpret is free) and runs the SWAR encode in
32-bit lanes end to end. These probes measure that path, the current Pallas
pack kernel for comparison, the SWAR decode twin (u32-viewed ASCII out),
and the weighted segmented-sum scan for the sharded merge.
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


def make_ascii32(key):
    codes = jax.random.randint(key, (B, L), 0, 4, jnp.int32)
    a8 = bitops.code_to_ascii(codes)
    a32 = jax.lax.bitcast_convert_type(a8.reshape(B, L // 4, 4), jnp.uint32)
    return (a32, jnp.full((B,), L, jnp.int32))


def make_ascii8(key):
    codes = jax.random.randint(key, (B, L), 0, 4, jnp.int32)
    return (bitops.code_to_ascii(codes), jnp.full((B,), L, jnp.int32))


def make_words(key):
    return (
        jax.random.bits(key, (B, L // 16), jnp.uint32),
        jnp.full((B,), L, jnp.int32),
    )


def _zero_bytes(v):
    v7 = v & jnp.uint32(0x7F7F7F7F)
    t = (v7 + jnp.uint32(0x7F7F7F7F)) | v
    return ~t & jnp.uint32(0x80808080)


def swar_encode_from_u32(w, lengths):
    Bc, W4 = w.shape
    lw = w | jnp.uint32(0x20202020)
    valid = (
        _zero_bytes(lw ^ jnp.uint32(0x61616161))
        | _zero_bytes(lw ^ jnp.uint32(0x63636363))
        | _zero_bytes(lw ^ jnp.uint32(0x67676767))
        | _zero_bytes(lw ^ jnp.uint32(0x74747474))
    )
    widx = jnp.arange(W4, dtype=jnp.int32)
    rem = jnp.clip(lengths[:, None] - 4 * widx, 0, 4)
    rmask = jnp.where(
        rem == 0,
        jnp.uint32(0),
        jnp.uint32(0x80808080)
        >> (8 * (4 - jnp.maximum(rem, 1))).astype(jnp.uint32),
    )
    bad = ~valid & rmask
    big = jnp.int32(1 << 30)
    bw = jnp.min(
        jax.lax.optimization_barrier(jnp.where(bad != 0, widx, big)), axis=-1
    )
    safe = jnp.minimum(bw, W4 - 1)
    sel = jnp.take_along_axis(bad, safe[:, None].astype(jnp.int32), axis=-1)[:, 0]
    lsb = sel & (~sel + jnp.uint32(1))
    byte_i = (bitops.popcount32(lsb - jnp.uint32(1)) >> 3).astype(jnp.int32)
    first_bad = jnp.where(bw == big, -1, 4 * bw + byte_i)

    c = ((w >> 1) ^ (w >> 2)) & jnp.uint32(0x03030303)
    c = c & ((rmask >> jnp.uint32(7)) * jnp.uint32(0xFF))
    pb = (c * jnp.uint32(0x01041040)) >> jnp.uint32(24)
    x = pb.reshape(Bc, W4 // 2, 2)
    x = x[..., 0] | (x[..., 1] << jnp.uint32(8))
    x = x.reshape(Bc, W4 // 4, 2)
    return x[..., 0] | (x[..., 1] << jnp.uint32(16)), first_bad


def swar_decode_to_u32(words, lengths):
    Bc, W = words.shape
    x = jnp.stack(
        [words & jnp.uint32(0xFFFF), words >> jnp.uint32(16)], axis=-1
    ).reshape(Bc, W * 2)
    x = jnp.stack([x & jnp.uint32(0xFF), x >> jnp.uint32(8)], axis=-1).reshape(
        Bc, W * 4
    )
    s = (
        x | (x << jnp.uint32(6)) | (x << jnp.uint32(12)) | (x << jnp.uint32(18))
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
    W4 = W * 4
    widx = jnp.arange(W4, dtype=jnp.int32)
    rem = jnp.clip(lengths[:, None] - 4 * widx, 0, 4)
    bmask = jnp.where(
        rem == 0,
        jnp.uint32(0),
        jnp.uint32(0xFFFFFFFF)
        >> (8 * (4 - jnp.maximum(rem, 1))).astype(jnp.uint32),
    )
    return asc & bmask


def seg_weighted_scan(hi_s, lo_s, w_s):
    """Weighted per-segment totals at run starts via one reverse segmented
    associative scan — the scatter-free sharded-merge candidate."""
    N = w_s.shape[0]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), (lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1])]
    )
    last = jnp.concatenate([first[1:], jnp.ones((1,), bool)])
    wf = jnp.flip(w_s)
    ff = jnp.flip(last)  # True at the start of each flipped run

    def comb(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, av + bv), af | bf

    sv, _ = jax.lax.associative_scan(comb, (wf, ff))
    totals = jnp.flip(sv)
    return jnp.where(first, totals, 0), first


def main():
    import bench

    emit("xor_copy_bw", bench.bench_memcpy(), "GB/s")
    probe("swar_encode_u32in", swar_encode_from_u32, make_ascii32, B * L / 1e9, "Gbases/s")
    probe("swar_decode_u32out", swar_decode_to_u32, make_words, B * L / 1e9, "Gbases/s")

    def pallas_pack(a8, lens):
        from bitnuc_tpu.ops.pallas import pack

        return pack.encode_reads_pallas(a8, lens)

    probe("pallas_pack_current", pallas_pack, make_ascii8, B * L / 1e9, "Gbases/s")

    def decode_current(words, lens):
        from bitnuc_tpu.ops import codec

        return codec.decode_reads_xla(words, lens)

    probe("decode_current", decode_current, make_words, B * L / 1e9, "Gbases/s")

    # weighted segmented sum for the sharded merge
    N = 1 << 22

    def make_sorted(key):
        k1, k2, k3 = jax.random.split(key, 3)
        hi = jax.random.randint(k1, (N,), 0, 1 << 10, jnp.int32).astype(jnp.uint32)
        lo = jax.random.bits(k2, (N,), jnp.uint32)
        hi_s, lo_s = jax.lax.sort((hi, lo), num_keys=2)
        w = jax.random.randint(k3, (N,), 1, 5, jnp.int32)
        return hi_s, lo_s, w

    probe("seg_weighted_scan", seg_weighted_scan, make_sorted, N / 1e6, "Mkeys/s")
    emit("xor_copy_bw_end", bench.bench_memcpy(), "GB/s")


if __name__ == "__main__":
    main()
