"""Round-2 encode probes, part 6: fixed-dispatch-overhead hypothesis.

planes_xor4 (pure 4-stream XOR) measured the same ~5 Gbases/s as every
encode variant — op content never mattered. Remaining hypothesis: a fixed
per-dispatch cost (tunnel RTT / time-share slicing, ~20 ms/run) dominates
42 MB workloads while the 256 MB-per-copy memcpy absorbs it. Discriminator:
scale the same ops up 4-8x — if throughput scales with size, the ops were
at roofline all along and the benches must amortize dispatch.
"""

import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bitnuc_tpu import config

config.enable_compilation_cache()

from bitnuc_tpu.utils.timing import amortized_seconds_per_call  # noqa: E402


def emit(name, value, unit):
    print(json.dumps({"probe": name, "value": round(value, 2), "unit": unit}), flush=True)


def probe_xor4(name, B, W):
    def make(key):
        return (jax.random.bits(key, (4, B, W), jnp.uint32),)

    def xor4(p):
        return p[0] ^ p[1] ^ p[2] ^ p[3]

    try:
        t = amortized_seconds_per_call(xor4, make)
        emit(name, B * W * 16 / t / 1e9, "Gbases/s")
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:300]}), flush=True)


def probe_encode(name, B, L):
    from bitnuc_tpu.ops import codec
    from bitnuc_tpu.utils import bitops

    def make(key):
        codes = jax.random.randint(key, (B, L), 0, 4, jnp.int32)
        return (bitops.code_to_ascii(codes), jnp.full((B,), L, jnp.int32))

    try:
        t = amortized_seconds_per_call(codec.encode_reads_xla, make)
        emit(name, B * L / t / 1e9, "Gbases/s")
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:300]}), flush=True)


def main():
    import bench

    emit("memcpy_128mb", bench.bench_memcpy(128), "GB/s")
    emit("memcpy_32mb", bench.bench_memcpy(32), "GB/s")
    emit("memcpy_512mb", bench.bench_memcpy(512), "GB/s")
    probe_xor4("xor4_33m", 1024, 2048)  # round-1 bench size
    probe_xor4("xor4_134m", 4096, 2048)
    probe_xor4("xor4_536m", 16384, 2048)
    probe_encode("encode_33m", 1024, 32768)
    probe_encode("encode_134m", 4096, 32768)
    probe_encode("encode_268m", 8192, 32768)
    emit("memcpy_end", bench.bench_memcpy(128), "GB/s")


if __name__ == "__main__":
    main()
