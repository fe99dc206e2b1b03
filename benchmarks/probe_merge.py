"""Streaming sparse-accumulator merge: round-2 per-batch scheme vs the
deferred raw-key scheme (round-3 redesign).

Round-2 _SparseAcc paid, per batch of N windows against a cap-sized
accumulator: count_kmers_runs' pair sort of N + a 3-array merge sort of
cap+N + a 4-array stable compaction sort of cap+N. The redesign feeds RAW
window keys (no batch sort), compacts with a 3-array negated-totals sort,
and defers the merge until pending rows reach cap — one 2-sort merge per
superbatch. probe_sortscale.py showed the flat pair sort already sits at
~14 effective HBM passes (~2x the theoretical hierarchical minimum), so
the only remaining lever is sorting LESS; this probe measures how much
less end-to-end.

Scenario: cap = 8M accumulator (half full, k=21-style keys), batches of
N = 4M windows, 5% invalid. Old: 1 batch per merge. New: raw keys buffer,
merge every 2 batches (pending >= cap). Reports device-amortized
windows/sec per scheme, same-run.

Run: python benchmarks/probe_merge.py
"""

import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bitnuc_tpu import config

config.enable_compilation_cache()

from bitnuc_tpu.ops import kmer as kmer_ops  # noqa: E402
from bitnuc_tpu.utils.timing import amortized_seconds_per_call  # noqa: E402

CAP = 1 << 23
N = 1 << 22
SENT = jnp.uint32(0xFFFFFFFF)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def make_state(key):
    """Half-full sorted accumulator with k=21-style keys (hi 10 bits)."""
    k1, k2, k3 = jax.random.split(key, 3)
    n_live = CAP // 2
    hi = jax.random.randint(k1, (n_live,), 0, 1 << 10, jnp.int32).astype(jnp.uint32)
    lo = jax.random.bits(k2, (n_live,), jnp.uint32)
    hi, lo = jax.lax.sort((hi, lo), num_keys=2)
    pad = jnp.full((CAP - n_live,), SENT, jnp.uint32)
    ct = jnp.concatenate(
        [jax.random.randint(k3, (n_live,), 1, 5, jnp.int32), jnp.zeros(CAP - n_live, jnp.int32)]
    )
    return jnp.concatenate([lo, pad]), jnp.concatenate([hi, pad]), ct


def make_batch(key):
    k1, k2, k3 = jax.random.split(key, 3)
    hi = jax.random.randint(k1, (N,), 0, 1 << 10, jnp.int32).astype(jnp.uint32)
    lo = jax.random.bits(k2, (N,), jnp.uint32)
    wt = (jax.random.uniform(k3, (N,)) > 0.05).astype(jnp.int32)
    return hi, lo, wt


def old_merge(state, batch_runs):
    """Round-2 scheme: 3-array merge sort + 4-array stable compaction."""
    lo = jnp.concatenate([state[0], batch_runs[0]])
    hi = jnp.concatenate([state[1], batch_runs[1]])
    ct = jnp.concatenate([state[2], batch_runs[2]]).astype(jnp.int32)
    lo_u, hi_u, tot, n_u = kmer_ops.merge_sorted_runs(lo, hi, ct)
    order_key = (tot == 0).astype(jnp.int32)
    _, lo_c, hi_c, tot_c = jax.lax.sort(
        (order_key, lo_u, hi_u, tot), num_keys=1, is_stable=True
    )
    return lo_c[:CAP], hi_c[:CAP], tot_c[:CAP]


def new_merge(state, pending):
    from bitnuc_tpu.pipeline import _merge_runs_device

    merged, _ = _merge_runs_device(state, pending, CAP)
    return merged


def main():
    import bench

    emit(probe="xor_copy_bw", value=round(bench.bench_memcpy(256), 2), unit="GB/s")

    def make_old(key):
        k1, k2 = jax.random.split(key)
        return make_state(k1), make_batch(k2)

    def run_old(state, batch):
        hi, lo, wt = batch
        # per-batch runs sort (what count_kmers_runs does after key gen)
        lo_f = jnp.where(wt > 0, lo, SENT)
        hi_f = jnp.where(wt > 0, hi, SENT)
        hi_s, lo_s = jax.lax.sort((hi_f, lo_f), num_keys=2)
        first = jnp.concatenate(
            [jnp.ones((1,), bool), (lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1])]
        )
        ct = kmer_ops._run_start_counts(first)
        return old_merge(state, (lo_s, hi_s, ct))

    t_old = amortized_seconds_per_call(run_old, make_old, k=3)
    emit(probe="old_per_batch", value=round(N / t_old / 1e6, 1), unit="Mwindows/s")

    def make_new(key):
        k1, k2, k3 = jax.random.split(key, 3)
        return make_state(k1), make_batch(k2), make_batch(k3)

    def run_new(state, b1, b2):
        # two batches of raw keys fold in one deferred merge (pending >= cap)
        pend = [(b[1], b[0], b[2]) for b in (b1, b2)]  # (lo, hi, ct)
        return new_merge(state, pend)

    t_new = amortized_seconds_per_call(run_new, make_new, k=3)
    emit(probe="new_per_2batches", value=round(2 * N / t_new / 1e6, 1), unit="Mwindows/s")
    emit(probe="speedup", value=round(t_old / (t_new / 2), 2), unit="x per batch")


if __name__ == "__main__":
    main()
