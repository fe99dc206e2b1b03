"""Collinear anchor chaining (the minimap2 chaining DP) on TPU.

The short-read mapper's diagonal vote (mapper.py step 4) assumes one
near-constant diagonal per read — right for <=300bp reads, wrong for
long reads whose indels drift the diagonal. The standard fix is chaining:
given seed anchors (rpos, qpos), find the highest-scoring strictly
increasing chain under a gap penalty. This module is that DP as a
TPU-native op — the long-read building block on top of the existing
seed machinery (`mapper._seed_candidates` supplies anchors).

TPU formulation: minimap2's heuristic bounds the predecessor search to
the last `lookback` anchors (by reference order), which turns the
quadratic DP into a `lax.scan` over anchors carrying a [B, lookback]
ring buffer of (score, rpos, qpos, chain-start) — every step is one
vectorized compare against the whole ring, no data-dependent control
flow. Chain STARTS are carried through the DP (each anchor inherits its
best predecessor's start), so the op reports the full chain span without
a traceback pass.

Scoring (integer, documented exactly so the oracle can mirror it):
  f(i) = 1 + max(0, max_j f(j) - |dr - dq| // gap_unit)
over predecessors j in the ring with rpos_j < rpos_i, qpos_j < qpos_i,
dr = rpos_i - rpos_j <= max_gap and dq = qpos_i - qpos_j <= max_gap;
anchors with no qualifying predecessor start a new chain with f = 1.
|dr - dq| is the diagonal drift (indel bases); gap_unit scales its
penalty. Ties prefer the LATEST predecessor in reference order (the
ring's natural overwrite order resolves this deterministically).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BIG = np.int32(2**30)
_NEG = np.int32(-(2**30))


@partial(jax.jit, static_argnames=("lookback",))
def chain_anchors(
    rpos: jax.Array,
    qpos: jax.Array,
    valid: jax.Array,
    max_gap=512,
    gap_unit=8,
    lookback: int = 64,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Best anchor chain per read.

    rpos/qpos: [B, A] int32 anchor coordinates (reference / query);
    valid: [B, A] bool. Anchor order within a row is arbitrary — the op
    sorts by (rpos, qpos) internally. max_gap / gap_unit are traced.

    Returns (score [B], start_r [B], end_r [B], start_q [B], end_q [B]):
    the chain's anchor count net of gap penalties and its first/last
    anchor coordinates (inclusive); score 0 = no valid anchors (the
    coordinate outputs are then -1).
    """
    rpos = jnp.asarray(rpos, jnp.int32)
    qpos = jnp.asarray(qpos, jnp.int32)
    valid = jnp.asarray(valid, bool)
    B, A = rpos.shape
    max_gap = jnp.asarray(max_gap, jnp.int32)
    gap_unit = jnp.asarray(gap_unit, jnp.int32)

    # row-wise (rpos, qpos) sort; invalid anchors to the end
    r = jnp.where(valid, rpos, _BIG)
    q = jnp.where(valid, qpos, _BIG)
    r, q = jax.lax.sort((r, q), dimension=1, num_keys=2)

    LB = min(lookback, A)
    ring_f = jnp.zeros((B, LB), jnp.int32)  # 0 = empty slot (scores >= 1)
    ring_r = jnp.full((B, LB), _BIG, jnp.int32)
    ring_q = jnp.full((B, LB), _BIG, jnp.int32)
    ring_sr = jnp.full((B, LB), -1, jnp.int32)
    ring_sq = jnp.full((B, LB), -1, jnp.int32)
    best = (
        jnp.zeros((B,), jnp.int32),  # score
        jnp.full((B,), -1, jnp.int32),  # start_r
        jnp.full((B,), -1, jnp.int32),  # end_r
        jnp.full((B,), -1, jnp.int32),  # start_q
        jnp.full((B,), -1, jnp.int32),  # end_q
    )

    def step(carry, i):
        ring_f, ring_r, ring_q, ring_sr, ring_sq, best = carry
        ri = jax.lax.dynamic_slice_in_dim(r, i, 1, 1)  # [B, 1]
        qi = jax.lax.dynamic_slice_in_dim(q, i, 1, 1)
        live = ri[:, 0] < _BIG

        dr = ri - ring_r
        dq = qi - ring_q
        ok = (
            (ring_f > 0)
            & (dr > 0)
            & (dq > 0)
            & (dr <= max_gap)
            & (dq <= max_gap)
        )
        cand = jnp.where(ok, ring_f - jnp.abs(dr - dq) // gap_unit, _NEG)
        pbest = jnp.max(cand, axis=1)
        has_pred = pbest > _NEG
        # deterministic predecessor: max score, then largest rpos_j, then
        # largest qpos_j (all masked single-value reduces — no argmax)
        sel = ok & (cand == pbest[:, None])
        pr = jnp.max(jnp.where(sel, ring_r, -1), axis=1)
        sel = sel & (ring_r == pr[:, None])
        pq = jnp.max(jnp.where(sel, ring_q, -1), axis=1)
        take = sel & (ring_q == pq[:, None])
        psr = jnp.max(jnp.where(take, ring_sr, -1), axis=1)
        psq = jnp.max(jnp.where(take, ring_sq, -1), axis=1)

        f_i = jnp.where(
            has_pred, 1 + jnp.maximum(pbest, 0), 1
        ).astype(jnp.int32)
        sr_i = jnp.where(has_pred & (pbest > 0), psr, ri[:, 0])
        sq_i = jnp.where(has_pred & (pbest > 0), psq, qi[:, 0])
        f_i = jnp.where(live, f_i, 0)

        slot = jax.lax.rem(i, jnp.int32(LB))
        upd = lambda ring, v: jax.lax.dynamic_update_slice_in_dim(
            ring, v[:, None], slot, 1
        )
        ring_f = upd(ring_f, f_i)
        ring_r = upd(ring_r, jnp.where(live, ri[:, 0], _BIG))
        ring_q = upd(ring_q, jnp.where(live, qi[:, 0], _BIG))
        ring_sr = upd(ring_sr, sr_i)
        ring_sq = upd(ring_sq, sq_i)

        score, b_sr, b_er, b_sq, b_eq = best
        better = live & (f_i > score)
        best = (
            jnp.where(better, f_i, score),
            jnp.where(better, sr_i, b_sr),
            jnp.where(better, ri[:, 0], b_er),
            jnp.where(better, sq_i, b_sq),
            jnp.where(better, qi[:, 0], b_eq),
        )
        return (ring_f, ring_r, ring_q, ring_sr, ring_sq, best), None

    # unroll: each anchor step touches [B, lookback] — loop-overhead-
    # bound like the alignment wavefront (probe_fit_unroll)
    (_, _, _, _, _, best), _ = jax.lax.scan(
        step,
        (ring_f, ring_r, ring_q, ring_sr, ring_sq, best),
        jnp.arange(A, dtype=jnp.int32),
        unroll=8,
    )
    return best
