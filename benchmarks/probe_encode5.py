"""Round-2 encode probes, part 5: op-level bisection on planar inputs.

encode_planes (pure same-shape elementwise) still measured ~5 Gbases/s at a
37 GB/s copy roofline. Bisect: start from a 4-plane XOR (pure traffic,
should match the roofline) and add the SWAR ops one class at a time. Also
try the multiply-free pack (the VPU has no native 32-bit integer multiply;
the multiply-gather may lower as a slow emulation): since code bytes are
2-bit, pb = (c | c>>6 | c>>12 | c>>18) & 0xFF gathers the same bits with
pure shifts/ors.
"""

import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bitnuc_tpu import config

config.enable_compilation_cache()

from bitnuc_tpu.utils.timing import amortized_seconds_per_call  # noqa: E402

B, L = 1024, 32768
W = L // 16


def emit(name, value, unit):
    print(json.dumps({"probe": name, "value": round(value, 2), "unit": unit}), flush=True)


def probe(name, fn):
    def make(key):
        return (jax.random.bits(key, (4, B, W), jnp.uint32),)

    try:
        t = amortized_seconds_per_call(fn, make)
        emit(name, B * L / t / 1e9, "Gbases/s")
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:300]}), flush=True)


def xor4(planes):
    return planes[0] ^ planes[1] ^ planes[2] ^ planes[3]


def codes_only(planes):
    w = jnp.zeros(planes.shape[1:], jnp.uint32)
    for j in range(4):
        p = planes[j]
        c = ((p >> 1) ^ (p >> 2)) & jnp.uint32(0x03030303)
        w = w ^ c
    return w


def pack_shift_or(planes):
    w = jnp.zeros(planes.shape[1:], jnp.uint32)
    for j in range(4):
        p = planes[j]
        c = ((p >> 1) ^ (p >> 2)) & jnp.uint32(0x03030303)
        pb = (c | (c >> 6) | (c >> 12) | (c >> 18)) & jnp.uint32(0xFF)
        w = w | (pb << jnp.uint32(8 * j))
    return w


def pack_multiply(planes):
    w = jnp.zeros(planes.shape[1:], jnp.uint32)
    for j in range(4):
        p = planes[j]
        c = ((p >> 1) ^ (p >> 2)) & jnp.uint32(0x03030303)
        pb = (c * jnp.uint32(0x01041040)) >> jnp.uint32(24)
        w = w | (pb << jnp.uint32(8 * j))
    return w


def main():
    import bench

    emit("xor_copy_bw", bench.bench_memcpy(), "GB/s")
    probe("planes_xor4", xor4)
    probe("planes_codes_only", codes_only)
    probe("planes_pack_shift_or", pack_shift_or)
    probe("planes_pack_multiply", pack_multiply)
    emit("xor_copy_bw_end", bench.bench_memcpy(), "GB/s")


if __name__ == "__main__":
    main()
