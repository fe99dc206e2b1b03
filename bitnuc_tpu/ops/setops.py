"""K-mer count-set algebra: intersect / subtract / union over two counted
k-mer lists (the `kmc_tools simple` operation family, built on the
reference's packed k-mer value semantics, /root/reference/README.md:164-180).

Inputs are "counted lists": (lo [N] uint32, hi [N] uint32, ct [N] int32)
where every row with ct > 0 carries a DISTINCT packed k-mer key — exactly
what count_kmers_sorted, count_kmers_runs, and merge_sorted_runs produce
(run-start zeros and sentinel padding rows are ct == 0 and are ignored).

TPU formulation (no scatter, no gather — both serialize, docs/DESIGN.md):
tag each row with its source (A=0, B=1, dead=2), push dead rows' keys to
the all-ones sentinel, and sort once on (hi, lo, src, -ct). Every key then
occupies 1-2 adjacent rows with A first, so the combine is a pure
neighbor-compare; a second sort on (sentineled key, -ct) compacts live
results ascending. The genuine k=32 all-T key (equal to the sentinel) stays
correct because dead rows sort AFTER any live row of the same key (src=2)
and the compaction orders by negated count, the same guarantee the
streaming accumulator relies on (pipeline._merge_runs_device).

Count semantics (KMC parity):
  intersect_min: keys in both, count = min(a, b)
  subtract:      A counts minus B counts, clamped at 0 (key dropped at 0)
  union_sum:     all keys, counts added (== merge_sorted_runs content)
  union_max:     all keys, count = max(a, b)
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

MODES = ("intersect_min", "subtract", "union_sum", "union_max")


@partial(jax.jit, static_argnames=("mode",))
def combine_counts(
    a_lo: jax.Array,
    a_hi: jax.Array,
    a_ct: jax.Array,
    b_lo: jax.Array,
    b_hi: jax.Array,
    b_ct: jax.Array,
    mode: str = "intersect_min",
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Combine two counted k-mer lists -> (lo, hi, ct, n_unique).

    The output has static length len(A) + len(B); entries [0, n_unique)
    are the distinct result keys ascending by (hi, lo) with positive
    counts, the tail is all-ones-key / zero-count padding.
    """
    assert mode in MODES, f"mode must be one of {MODES}"
    sent = jnp.uint32(0xFFFFFFFF)

    a_ct = jnp.asarray(a_ct, jnp.int32)
    b_ct = jnp.asarray(b_ct, jnp.int32)
    ct = jnp.concatenate([a_ct, b_ct])
    dead = ct <= 0
    lo = jnp.where(dead, sent, jnp.concatenate([a_lo, b_lo]))
    hi = jnp.where(dead, sent, jnp.concatenate([a_hi, b_hi]))
    src = jnp.concatenate(
        [
            jnp.zeros(a_ct.shape[0], jnp.int32),
            jnp.ones(b_ct.shape[0], jnp.int32),
        ]
    )
    src = jnp.where(dead, jnp.int32(2), src)

    hi_s, lo_s, src_s, negct_s = jax.lax.sort(
        (hi, lo, src, -jnp.where(dead, 0, ct)), num_keys=4
    )
    ct_s = -negct_s

    # neighbor pairing: a live A row whose successor is a live B row with
    # the same key holds that key's (a, b) count pair
    nxt = lambda x: jnp.concatenate([x[1:], x[:1]])  # last row pads itself;
    # it can never pair (same_key forces src transition 0 -> 1)
    same_key = (hi_s == nxt(hi_s)) & (lo_s == nxt(lo_s))
    pair = same_key & (src_s == 0) & (nxt(src_s) == 1)
    consumed = jnp.concatenate([jnp.zeros((1,), bool), pair[:-1]])
    b_ct_here = jnp.where(pair, nxt(ct_s), 0)

    if mode == "intersect_min":
        out = jnp.where(pair, jnp.minimum(ct_s, b_ct_here), 0)
        out = jnp.where(src_s == 0, out, 0)
    elif mode == "subtract":
        out = jnp.where(src_s == 0, jnp.maximum(ct_s - b_ct_here, 0), 0)
    elif mode == "union_sum":
        out = jnp.where(src_s == 0, ct_s + b_ct_here, ct_s)
        out = jnp.where((src_s == 1) & consumed, 0, out)
        out = jnp.where(src_s == 2, 0, out)
    else:  # union_max
        out = jnp.where(src_s == 0, jnp.maximum(ct_s, b_ct_here), ct_s)
        out = jnp.where((src_s == 1) & consumed, 0, out)
        out = jnp.where(src_s == 2, 0, out)

    # compact live rows ascending (dead -> sentinel key, negated counts as
    # the tiebreak so a live all-T row beats dead rows at the cap boundary)
    out_dead = out <= 0
    hi_c, lo_c, neg_c = jax.lax.sort(
        (
            jnp.where(out_dead, sent, hi_s),
            jnp.where(out_dead, sent, lo_s),
            -out,
        ),
        num_keys=3,
    )
    return lo_c, hi_c, -neg_c, jnp.sum((~out_dead).astype(jnp.int32))


def combine_dicts(a: dict, b: dict, mode: str = "intersect_min") -> dict:
    """Host-dict reference/convenience twin of combine_counts (the layout
    pipeline.count_fastq returns for large k)."""
    assert mode in MODES, f"mode must be one of {MODES}"
    if mode == "intersect_min":
        return {
            k: min(a[k], b[k]) for k in a.keys() & b.keys()
        }
    if mode == "subtract":
        out = {k: v - b.get(k, 0) for k, v in a.items()}
        return {k: v for k, v in out.items() if v > 0}
    if mode == "union_sum":
        out = dict(a)
        for k, v in b.items():
            out[k] = out.get(k, 0) + v
        return out
    out = dict(a)
    for k, v in b.items():
        out[k] = max(out.get(k, 0), v)
    return out
