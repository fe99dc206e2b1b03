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
no host uploads) and adds a full sum of every result leaf into one scalar.
Distinct data defeats CSE and hoisting; the sums defeat DCE; there is no
loop for the compiler to transform. The final per-result stores may fuse
into the sums, so figures can be up to one output-write optimistic; reported
numbers are otherwise honest sustained throughput.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _consume(result) -> jnp.ndarray:
    s = jnp.float32(0)
    for leaf in jax.tree_util.tree_leaves(result):
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

    jax.block_until_ready(run(copies))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(copies))
        times.append((time.perf_counter() - t0) / k)
    return float(np.median(times))


# legacy name used by earlier callers
serialized_seconds_per_call = None  # removed: see amortized_seconds_per_call
