"""Round-5 merge-engine probe: bitonic merge-of-sorted vs full lax.sort.

Shapes probed (the engine's three consumers):
  setops   8M + 8M rows, 2 key words + 2 payloads (combine_counts shape)
  acc      8M + 8M rows, 2 key words + 1 payload (streaming accumulator)
  join     760K + 524K rows, 1 key word + 1 payload (mapper seed join)

Each pair: lax.sort of the concatenation (the shipping formulation) vs
merge_sorted (XLA outer stages + the Pallas tail kernel). Inputs are
pre-sorted on device OUTSIDE the timed call.

Run: python benchmarks/probe_merge2.py   (real TPU)
"""

import json
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from bitnuc_tpu import config

config.enable_compilation_cache()
from bitnuc_tpu.ops.pallas.merge import merge_sorted
from bitnuc_tpu.utils.timing import amortized_seconds_per_call


def emit(n, v, u):
    print(json.dumps({"probe": n, "value": round(v, 3), "unit": u}), flush=True)


def make_pair(na, nb, n_keys, n_pay):
    def make(key):
        ks = jax.random.split(key, 2 * (n_keys + n_pay))
        a = [jax.random.bits(ks[i], (na,), jnp.uint32) for i in range(n_keys)]
        b = [
            jax.random.bits(ks[n_keys + i], (nb,), jnp.uint32)
            for i in range(n_keys)
        ]
        a = list(jax.lax.sort(tuple(a), num_keys=n_keys))
        b = list(jax.lax.sort(tuple(b), num_keys=n_keys))
        for i in range(n_pay):
            a.append(
                jax.random.bits(ks[2 * n_keys + i], (na,), jnp.uint32).astype(
                    jnp.int32
                )
            )
            b.append(
                jax.random.bits(
                    ks[2 * n_keys + n_pay + i], (nb,), jnp.uint32
                ).astype(jnp.int32)
            )
        return (tuple(a), tuple(b))

    return make


def run_shape(name, na, nb, n_keys, n_pay):
    make = make_pair(na, nb, n_keys, n_pay)

    def full_sort(a, b):
        cat = tuple(jnp.concatenate([x, y]) for x, y in zip(a, b))
        return jax.lax.sort(cat, num_keys=n_keys)

    def engine(a, b):
        return merge_sorted(a, b, n_keys)

    t_sort = amortized_seconds_per_call(full_sort, make, k=2, reps=3)
    emit(f"{name}_lax_sort", t_sort * 1e3, "ms/call")
    t_merge = amortized_seconds_per_call(engine, make, k=2, reps=3)
    emit(f"{name}_merge_engine", t_merge * 1e3, "ms/call")
    emit(f"{name}_speedup", t_sort / t_merge, "x")

    # on-device parity spot check (keys only; ties make payload order free)
    a, b = jax.jit(make)(jax.random.key(123))
    got = engine(a, b)
    want = full_sort(a, b)
    n = na + nb
    for i in range(n_keys):
        g = np.asarray(got[i])[:n]
        w = np.asarray(want[i])
        assert np.array_equal(g, w), f"{name} key word {i} mismatch"
    # payload multiset parity on a slice
    gs = set(
        zip(*(np.asarray(g)[: min(n, 100000)] for g in got))
    )
    ws = set(zip(*(np.asarray(w)[: min(n, 100000)] for w in want)))
    # rows can differ only at the slice boundary among equal keys
    assert len(gs ^ ws) < 4096, f"{name} payload rows diverge"
    print(f"# {name} parity ok", flush=True)


import bench

emit("xor_copy_64", bench.bench_memcpy(64), "GB/s")
run_shape("join", 760_000, 524_288, 1, 1)
run_shape("acc", 1 << 23, 1 << 23, 2, 1)
run_shape("setops", 1 << 23, 1 << 23, 2, 2)
emit("xor_copy_64_end", bench.bench_memcpy(64), "GB/s")
