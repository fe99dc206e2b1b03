import json, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from bitnuc_tpu import config
config.enable_compilation_cache()
from bitnuc_tpu.ops import codec
from bitnuc_tpu.utils import bitops
from bitnuc_tpu.utils.timing import amortized_seconds_per_call

B, L = 8192, 32768
def emit(n, v, u): print(json.dumps({"probe": n, "value": round(v, 2), "unit": u}), flush=True)
def make(key):
    codes = jax.random.randint(key, (B, L), 0, 4, jnp.int32)
    return (bitops.code_to_ascii(codes), jnp.full((B,), L, jnp.int32))

def enc_novalidate(a, l):
    pos = jnp.arange(L, dtype=jnp.int32)
    in_range = pos < l[..., None]
    codes = jnp.where(in_range, bitops.ascii_to_code(a), 0)
    return bitops.pack_codes(codes)

def enc_minfb(a, l):
    pos = jnp.arange(L, dtype=jnp.int32)
    in_range = pos < l[..., None]
    invalid = jnp.logical_and(~bitops.ascii_is_valid(a), in_range)
    big = jnp.int32(1 << 30)
    m = jnp.min(jax.lax.optimization_barrier(jnp.where(invalid, pos, big)), axis=-1)
    fb = jnp.where(m == big, -1, m)
    codes = jnp.where(in_range, bitops.ascii_to_code(a), 0)
    return bitops.pack_codes(codes), fb

import bench
emit("xor_copy_168", bench.bench_memcpy(168), "GB/s")
for name, fn in [("enc_current", codec.encode_reads_xla), ("enc_novalidate", enc_novalidate), ("enc_minfb", enc_minfb)]:
    try:
        t = amortized_seconds_per_call(fn, make)
        emit(name, B * L / t / 1e9, "Gbases/s")
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:200]}), flush=True)
emit("xor_copy_168_end", bench.bench_memcpy(168), "GB/s")
