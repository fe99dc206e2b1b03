"""On-chip probes for the encode roofline gap (round 2).

Round 1 shipped encode at ~15% of the same-run xor-copy roofline. Suspects
(both documented XLA:TPU pathologies, docs/DESIGN.md):
  * first_bad via argmax — variadic reduces serialize;
  * pack_codes' shift-sum over the 16-lane minor axis — elementwise chains
    fused into reductions serialize.

Each probe swaps one piece and reports Gbases/s; xor-copy calibration frames
the roofline. Run: python benchmarks/probe_encode.py
"""

import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bitnuc_tpu import config

config.enable_compilation_cache()

from bitnuc_tpu.ops import codec  # noqa: E402
from bitnuc_tpu.utils import bitops  # noqa: E402
from bitnuc_tpu.utils.timing import amortized_seconds_per_call  # noqa: E402

B, L = 1024, 32768
W = bitops.n_words_for(L)


def emit(name, value, unit):
    print(json.dumps({"probe": name, "value": round(value, 2), "unit": unit}), flush=True)


def probe(name, fn):
    def make(key):
        codes = jax.random.randint(key, (B, L), 0, 4, jnp.int32)
        return (bitops.code_to_ascii(codes), jnp.full((B,), L, jnp.int32))

    try:
        t = amortized_seconds_per_call(fn, make)
        emit(name, B * L / t / 1e9, "Gbases/s")
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:300]}), flush=True)


def first_bad_argmax(ascii_u8, lengths):
    pos = jnp.arange(L, dtype=jnp.int32)
    in_range = pos < lengths[..., None]
    invalid = jnp.logical_and(~bitops.ascii_is_valid(ascii_u8), in_range)
    any_bad = jnp.any(invalid, axis=-1)
    return jnp.where(any_bad, jnp.argmax(invalid, -1).astype(jnp.int32), -1)


def first_bad_min(ascii_u8, lengths):
    pos = jnp.arange(L, dtype=jnp.int32)
    in_range = pos < lengths[..., None]
    invalid = jnp.logical_and(~bitops.ascii_is_valid(ascii_u8), in_range)
    big = jnp.int32(1 << 30)
    m = jnp.min(jax.lax.optimization_barrier(jnp.where(invalid, pos, big)), axis=-1)
    return jnp.where(m == big, -1, m)


def pack_sum(codes):  # round-1 pack_codes
    return bitops.pack_codes(codes)


def pack_doubling(codes):
    c = codes.astype(jnp.uint32)
    shift = 2
    while shift < 32:
        c = c.reshape(*c.shape[:-1], c.shape[-1] // 2, 2)
        c = c[..., 0] | (c[..., 1] << jnp.uint32(shift))
        shift *= 2
    return c


def make_encode(first_bad_fn, pack_fn, barrier_before_pack=False):
    @jax.jit
    def enc(ascii_u8, lengths):
        pos = jnp.arange(L, dtype=jnp.int32)
        in_range = pos < lengths[..., None]
        fb = first_bad_fn(ascii_u8, lengths)
        codes = jnp.where(in_range, bitops.ascii_to_code(ascii_u8), 0)
        if barrier_before_pack:
            codes = jax.lax.optimization_barrier(codes)
        return pack_fn(codes), fb

    return enc


def main():
    import bench

    emit("xor_copy_bw", bench.bench_memcpy(), "GB/s")
    probe("encode_current", codec.encode_reads_xla)
    probe("enc_minfb_sum", make_encode(first_bad_min, pack_sum))
    probe("enc_minfb_sum_barrier", make_encode(first_bad_min, pack_sum, True))
    probe("enc_minfb_doubling", make_encode(first_bad_min, pack_doubling))
    probe("enc_argmax_doubling", make_encode(first_bad_argmax, pack_doubling))
    probe("enc_novalidate_doubling", make_encode(lambda a, l: jnp.full(a.shape[:-1], -1, jnp.int32), pack_doubling))
    probe("enc_novalidate_sum", make_encode(lambda a, l: jnp.full(a.shape[:-1], -1, jnp.int32), pack_sum))
    emit("xor_copy_bw_end", bench.bench_memcpy(), "GB/s")


if __name__ == "__main__":
    main()
