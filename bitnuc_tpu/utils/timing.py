"""Throughput measurement that XLA cannot cheat.

Per-call wall timing of jitted functions under-measures through async
dispatch layers (observed on the axon TPU tunnel: apparent bandwidths far
above the HBM roofline). Timing loops inside one jit invite compiler cheats
instead — all observed on v5e while building this harness:

  * consume one element of the result -> the rest is dead-code-eliminated
    ("44 TB/s");
  * consume a provably-zero reduction (sum & 0) -> the whole op constant-
    folds out of the loop ("8.9 Tbase/s");
  * loop-invariant inputs -> the op hoists out of the loop, XOR-fold
    accumulators self-cancel pairwise under unrolling ("6.3 Tbase/s").

So: no loop. `amortized_seconds_per_call` builds ONE jit that applies the op
to K inputs with DISTINCT data (generated on device from split PRNG keys —
no host uploads) and adds a barriered full sum of every result leaf into one
scalar. Distinct data defeats CSE and hoisting; the sums defeat DCE; the
barrier keeps the sums off the fused-reduce serial path AND forces result
stores; there is no loop for the compiler to transform. Completion is
synced by transferring the scalar to host (block_until_ready alone was
observed returning early through the tunnel).

The tunneled chip is also TIME-SHARED: its deliverable bandwidth was
measured swinging between ~10 and ~180 GB/s effective across hours. Reported
figures are best-of-N (capability under the contention observed during the
run); compare like with like.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _consume(result) -> jnp.ndarray:
    """Full-sum every leaf, behind an optimization_barrier.

    The barrier forces the op's outputs to actually materialize (honest
    store accounting) and keeps the sum an unfused plain reduce — fusing an
    elementwise chain into a large reduction triggers XLA:TPU's serial
    lowering (see ops/hamming.py), which would poison the measurement the
    other way."""
    s = jnp.float32(0)
    for leaf in jax.tree_util.tree_leaves(jax.lax.optimization_barrier(result)):
        s = s + jnp.sum(leaf.astype(jnp.float32))
    return s


def amortized_seconds_per_call(
    op: Callable,
    make_args: Callable,
    k: int = 4,
    reps: int = 5,
) -> float:
    """Median seconds per `op(*args)` call.

    make_args(key) -> an argument tuple for op, built ON DEVICE from the
    jax.random key (e.g. jax.random.randint words); called under jit with K
    split keys once, outside the timed section. op runs once per copy inside
    one jitted call whose output is the sum of all results.
    """
    keys = jax.random.split(jax.random.key(0), k)
    copies = [
        jax.tree_util.tree_map(jax.device_put, jax.jit(make_args)(key))
        for key in keys
    ]
    for c in copies:
        jax.block_until_ready(c)

    @jax.jit
    def run(all_args):
        return sum(_consume(op(*args)) for args in all_args)

    float(run(copies))  # compile + warm; float() forces a real host sync
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(copies))
        times.append((time.perf_counter() - t0) / k)
    # best-of: the tunneled chip is time-shared and its available bandwidth
    # swings >10x between runs; the minimum is the capability estimate
    return float(np.min(times))

