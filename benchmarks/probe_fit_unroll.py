"""Wavefront scan unroll probe: the fit's 400 diagonal steps each touch
only [B, N+1] ~ 1M int32 lanes — if per-step loop overhead dominates,
lax.scan(unroll=k) should cut the fit time nearly k-fold until the
fused-body size catches up.

Run: python benchmarks/probe_fit_unroll.py   (real TPU)
"""
import json
import sys
from functools import partial

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from bitnuc_tpu import config

config.enable_compilation_cache()
from bitnuc_tpu.ops import align
from bitnuc_tpu.utils.bitops import n_words_for
from bitnuc_tpu.utils.timing import amortized_seconds_per_call


def emit(n, v, u):
    print(json.dumps({"probe": n, "value": round(v, 2), "unit": u}), flush=True)


B = 4096
read_len = 150
Wq = n_words_for(read_len)
Wwin = (Wq * 16 + 2 * 32) // 16 + 1  # the mapper's fit window


def make(key):
    k1, k2 = jax.random.split(key)
    return (
        jax.random.bits(k1, (B, Wq), jnp.uint32),
        jnp.full((B,), read_len, jnp.int32),
        jax.random.bits(k2, (B, Wwin), jnp.uint32),
        jnp.full((B,), Wwin * 16, jnp.int32),
    )


def span_unroll(unroll):
    """fit_distance_span with a configurable scan unroll (monkey-build)."""

    @jax.jit
    def fn(wa, la, wb, lb):
        # inline copy of fit_distance_span with unroll param
        from bitnuc_tpu.ops.align import (
            _BIG, _PAD_A, _PAD_B, _b_shifted, _codes, _rev_padded, _shift1,
        )

        lens_a = jnp.asarray(la, jnp.int32)
        lens_b = jnp.asarray(lb, jnp.int32)
        mismatch = jnp.int32(1)
        gap = jnp.int32(1)
        a = _codes(wa, lens_a, _PAD_A)
        b = _codes(wb, lens_b, _PAD_B)
        Bx, M = a.shape
        N = b.shape[-1]
        pos = jnp.arange(N + 1, dtype=jnp.int32)
        arp = _rev_padded(a, N + 1)
        bsh = _b_shifted(b)
        m, n = lens_a[:, None], lens_b[:, None]
        prev = jnp.where(pos == 0, 0, _BIG) * jnp.ones((Bx, 1), jnp.int32)
        prev2 = jnp.full((Bx, N + 1), _BIG, jnp.int32)
        s_prev = jnp.broadcast_to(pos, (Bx, N + 1))
        s_prev2 = jnp.zeros((Bx, N + 1), jnp.int32)
        fit0 = jnp.where(lens_a == 0, 0, _BIG)
        endj0 = jnp.zeros((Bx,), jnp.int32)
        startj0 = jnp.zeros((Bx,), jnp.int32)

        def step(carry, d):
            prev, prev2, s_prev, s_prev2, fit, endj, startj = carry
            a_diag = jax.lax.dynamic_slice_in_dim(arp, N + 1 + M - d, N + 1, -1)
            sub = jnp.where(a_diag == bsh, 0, mismatch)
            c_diag = _shift1(prev2, _BIG) + sub
            c_up = prev + gap
            c_left = _shift1(prev, _BIG) + gap
            diag = jnp.minimum(jnp.minimum(c_diag, c_up), c_left)
            s_diag = _shift1(s_prev2, _BIG)
            S = jnp.minimum(
                jnp.minimum(
                    jnp.where(c_diag == diag, s_diag, _BIG),
                    jnp.where(c_up == diag, s_prev, _BIG),
                ),
                jnp.where(c_left == diag, _shift1(s_prev, _BIG), _BIG),
            )
            diag = jnp.where(pos == 0, d * gap, diag)
            S = jnp.where(pos == 0, 0, S)
            diag = jnp.where(pos == d, 0, diag)
            S = jnp.where(pos == d, pos, S)
            jm = d - m
            at = (pos == jm) & (jm >= 0) & (pos <= n)
            v = jnp.min(jnp.where(at, diag, _BIG), axis=-1)
            st = jnp.min(jnp.where(at, S, _BIG), axis=-1)
            better = v < fit
            fit = jnp.minimum(fit, v)
            endj = jnp.where(better, jnp.squeeze(jm, -1), endj)
            startj = jnp.where(better, st, startj)
            return (diag, prev, S, s_prev, fit, endj, startj), None

        (prev, prev2, s_prev, s_prev2, fit, endj, startj), _ = jax.lax.scan(
            step,
            (prev, prev2, s_prev, s_prev2, fit0, endj0, startj0),
            jnp.arange(1, M + N + 1, dtype=jnp.int32),
            unroll=unroll,
        )
        startj = jnp.where(fit < _BIG, jnp.minimum(startj, endj), 0)
        return fit, startj, endj

    return fn


# parity gate on CPU-scale shapes handled by existing tests; here check the
# unrolled variant equals the shipping fit on one small batch on-device
rng = np.random.default_rng(2)
wa = jnp.asarray(rng.integers(0, 2**32, (16, Wq), np.uint32))
la = jnp.full((16,), read_len, jnp.int32)
wb = jnp.asarray(rng.integers(0, 2**32, (16, Wwin), np.uint32))
lb = jnp.full((16,), Wwin * 16, jnp.int32)
want = [np.asarray(x) for x in align.fit_distance_span(wa, la, wb, lb, 1, 1)]
for u in (4, 16):
    got = [np.asarray(x) for x in span_unroll(u)(wa, la, wb, lb)]
    for g, w in zip(got, want):
        assert np.array_equal(g, w), u
print(json.dumps({"probe": "parity", "value": 1, "unit": "ok"}), flush=True)

import bench

emit("xor_copy_64", bench.bench_memcpy(64), "GB/s")
t = amortized_seconds_per_call(
    lambda *a: align.fit_distance_span(*a, 1, 1), make
)
emit("fit_span_unroll1_shipping", t * 1e3, "ms/call")
for u in (2, 4, 8, 16, 32):
    t = amortized_seconds_per_call(span_unroll(u), make)
    emit(f"fit_span_unroll{u}", t * 1e3, "ms/call")
emit("xor_copy_64_end", bench.bench_memcpy(64), "GB/s")
