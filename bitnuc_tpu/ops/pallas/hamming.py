"""Pallas Hamming-distance database-scan kernel.

The XLA lowering (ops/hamming.py) needs an optimization_barrier between the
popcount chain and the word-axis reduction, which materializes the [D, W]
per-word popcount array in HBM — 3x the ideal traffic. This kernel fuses the
whole scan: XOR + 2-bit collapse + popcount + word-sum happen on one VMEM
tile, and only the [D] distances leave the chip's core.

Layout: the database is stored WORD-MAJOR [W, D] (structure-of-arrays) so the
huge D axis is the 128-lane dimension and the word axis W sits on sublanes,
where the reduction is free. The reference's row-major layout fights the VPU
tile shape (W ~ 32 lanes of 128 used). `to_word_major` converts.

The [8, TD] output block carries the same distance row broadcast 8x (a
1-sublane block shape is not a legal TPU tile); the wrapper reads row 0.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_D = 2048  # database entries per grid step


def to_word_major(db_words: jax.Array) -> jax.Array:
    """[D, W] uint32 (row-major packed reads) -> [W, D] scan layout."""
    return jnp.transpose(db_words)


def _scan_kernel(q_ref, mask_ref, db_ref, out_ref):
    q = q_ref[:, :1]  # [W, 1]
    m = mask_ref[:, :1]  # [W, 1]
    d = (db_ref[:] ^ q) & m  # [W, TD]
    bd = (d | (d >> 1)) & jnp.uint32(0x55555555)
    p = jax.lax.population_count(bd).astype(jnp.int32)
    dist = jnp.sum(p, axis=0, keepdims=True)  # [1, TD]
    out_ref[:] = jnp.broadcast_to(dist, out_ref.shape)


@partial(jax.jit, static_argnames=("interpret",))
def hdist_scan_pallas(
    query: jax.Array,
    db_word_major: jax.Array,
    n_bases,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Distances from one packed query [W] to a word-major database [W, D].

    Bit-exact with ops.hamming.hdist_one_to_many on the same data.
    """
    from ...utils import bitops

    W, D = db_word_major.shape
    n_bases = jnp.asarray(n_bases, jnp.int32)
    Wp = -(-W // 8) * 8
    Dp = -(-D // TILE_D) * TILE_D

    mask = bitops.word_valid_mask(W, n_bases)  # [W]
    q2d = jnp.pad(
        jnp.broadcast_to(query[:, None], (W, 128)), ((0, Wp - W), (0, 0))
    )
    m2d = jnp.pad(jnp.broadcast_to(mask[:, None], (W, 128)), ((0, Wp - W), (0, 0)))
    db = jnp.pad(db_word_major, ((0, Wp - W), (0, Dp - D)))

    grid = (Dp // TILE_D,)
    out = pl.pallas_call(
        _scan_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Wp, 128), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Wp, 128), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Wp, TILE_D), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, TILE_D), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, Dp), jnp.int32),
        interpret=interpret,
    )(q2d, m2d, db)
    return out[0, :D]


@partial(jax.jit, static_argnames=("k", "interpret"))
def hdist_topk_pallas(
    query: jax.Array,
    db_word_major: jax.Array,
    n_bases,
    k: int,
    *,
    interpret: bool = False,
):
    """Fused scan + exact top-k (iterative extraction, ops/hamming.py)."""
    from .. import hamming

    d = hdist_scan_pallas(query, db_word_major, n_bases, interpret=interpret)
    return hamming.topk_smallest(d, k)
