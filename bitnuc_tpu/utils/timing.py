"""Serialized-throughput measurement.

Per-call wall timing of jitted functions can under-measure through async
dispatch layers (observed: apparent bandwidths above the HBM roofline on the
axon TPU tunnel). `serialized_seconds_per_call` defeats that by running the
op N times inside ONE jit with a data dependency threaded between iterations
(each call consumes a value derived from the previous result), then timing
the single dispatch. The measured figure is a true lower bound on sustained
per-call throughput with the dispatch overhead amortized away.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def serialized_seconds_per_call(
    op: Callable,
    feedback: Callable,
    init_carry,
    *static_args,
    iters: int = 50,
    reps: int = 3,
) -> float:
    """Median seconds per op call, serialized.

    op(carry, *static_args) -> result; feedback(carry, result) -> next carry
    (must be cheap and depend on `result` so XLA cannot reorder or elide
    iterations). Timed as one fori_loop jit of `iters` iterations.
    """

    @jax.jit
    def loop(carry):
        def body(_, c):
            return feedback(c, op(c, *static_args))

        return jax.lax.fori_loop(0, iters, body, carry)

    out = jax.block_until_ready(loop(init_carry))  # compile + warm
    del out
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(init_carry))
        times.append((time.perf_counter() - t0) / iters)
    return float(np.median(times))


def mix_scalar(result) -> jnp.ndarray:
    """A cheap scalar that depends on `result` (for feedback closures)."""
    leaf = jax.tree_util.tree_leaves(result)[0]
    flat = leaf.reshape(-1)
    return flat[0].astype(jnp.uint32)
