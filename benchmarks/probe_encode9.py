"""At-scale encode headline probe (round 3, VERDICT item 1).

Grows the call to 512 MiB of ASCII input (16384 x 32768 = 537 Mbases;
640 MiB total traffic at 1.25 B/base) — probe_encode6 measured delivered
bandwidth rising to ~106 GB/s at 512MB bursts — and adds CODE-INDEPENDENT
floor candidates: programs with the encode's exact byte traffic
([B, L] u8 in -> [B, L/16] u32 out) but the pack fold removed/replaced.
The fastest floor variant pins the achievable ceiling for this traffic
pattern on this machine; if the shipping encode is >= 0.9 of it, the
remaining gap to the xor-copy roofline is the tunnel/layout, not the op.

Variants:
  - enc_current:    shipping codec.encode_reads_xla (max-trick validation)
  - floor_max:      SWAR codes, reshape [B,W,16], single-value max reduce
                    (the known-cheap reduce from probe_encode8) -> u32
  - floor_sum:      same but sum-fold WITHOUT shifts (pack minus the shifts)
  - floor_strideslice: x[..., ::16] cast to u32 (strided gather — expected
                    slow, recorded for completeness)
  - floor_u32xor:   bitcast u8 -> u32 lanes, reshape [B,W,4], xor-fold
                    (expected to hit the bitcast relayout, recorded)

Run: python benchmarks/probe_encode9.py   (real TPU)
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
W = L // 16


def emit(n, v, u):
    print(json.dumps({"probe": n, "value": round(v, 2), "unit": u}), flush=True)


def make(key):
    codes = jax.random.randint(key, (B, L), 0, 4, jnp.int32)
    return (bitops.code_to_ascii(codes), jnp.full((B,), L, jnp.int32))


def floor_max(a, l):
    c = (((a >> 1) ^ (a >> 2)) & 3).reshape(B, W, 16)
    return jnp.max(c, axis=-1).astype(jnp.uint32)


def floor_sum(a, l):
    c = (((a >> 1) ^ (a >> 2)) & 3).astype(jnp.uint32).reshape(B, W, 16)
    return jnp.sum(c, axis=-1).astype(jnp.uint32)


def floor_strideslice(a, l):
    return a[..., ::16].astype(jnp.uint32)


def floor_u32xor(a, l):
    x = jax.lax.bitcast_convert_type(a.reshape(B, L // 4, 4), jnp.uint32)
    x = ((x >> 1) ^ (x >> 2)) & jnp.uint32(0x03030303)
    return jax.lax.reduce(
        x.reshape(B, W, 4), jnp.uint32(0), jax.lax.bitwise_xor, (2,)
    )


import bench

VARIANTS = [
    ("enc_current", codec.encode_reads_xla),
    ("floor_max", floor_max),
    ("floor_sum", floor_sum),
    ("floor_u32xor", floor_u32xor),
    ("floor_strideslice", floor_strideslice),
]

emit("xor_copy_320", bench.bench_memcpy(320), "GB/s")
for name, fn in VARIANTS:
    try:
        t = amortized_seconds_per_call(fn, make, k=2, reps=5)
        emit(name, B * L / t / 1e9, "Gbases/s")
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:300]}), flush=True)
emit("xor_copy_320_end", bench.bench_memcpy(320), "GB/s")
