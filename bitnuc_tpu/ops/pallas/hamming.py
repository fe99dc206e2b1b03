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


TILE_DQ = 512  # database entries per grid step in the batched kernel
TILE_Q = 64  # queries per grid step (sublane-major in the output tile)


def _make_batch_kernel(W: int, masks: tuple):
    """Batched scan kernel: [TILE_Q, W] queries x [W, TILE_DQ] db tile ->
    [TILE_Q, TILE_DQ] distances. The word loop is unrolled (W static) and the
    per-word valid-base masks are baked as literals (Mosaic cannot lower
    captured jnp constants; Python ints lower fine). One db pass serves all
    TILE_Q queries — the whole point vs. Q single-query scans."""

    def kernel(q_ref, db_ref, out_ref):
        acc = jnp.zeros(out_ref.shape, jnp.int32)
        for w in range(W):
            m = masks[w]
            if m == 0:
                continue  # word entirely past n_bases
            d = db_ref[w : w + 1, :] ^ q_ref[:, w : w + 1]  # [TQ, TD]
            if m != 0xFFFFFFFF:
                d = d & jnp.uint32(m)
            bd = (d | (d >> 1)) & jnp.uint32(0x55555555)
            acc = acc + jax.lax.population_count(bd).astype(jnp.int32)
        out_ref[:] = acc

    return kernel


@partial(jax.jit, static_argnames=("n_bases", "interpret"))
def hdist_scan_batch_pallas(
    queries: jax.Array,
    db_word_major: jax.Array,
    n_bases: int,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Distances from Q packed queries [Q, W] to a word-major database
    [W, D]: returns [Q, D] int32. Bit-exact with
    ops.hamming.hdist_many_to_many on the same data (tests/test_pallas.py).

    The reference applies hdist per pair with the caller looping
    (src/utils/functions/hamming/multi.rs:122-160); here the database tile
    is read once from HBM per TILE_Q queries — Q-fold traffic reduction
    over repeated single-query scans. n_bases is static so per-word masks
    bake into the kernel as literals.
    """
    Q, W = queries.shape
    W2, D = db_word_major.shape
    assert W == W2, (W, W2)
    # per-word masks as Python ints (zero-padded last-word contract)
    masks = []
    for w in range(W):
        v = min(max(int(n_bases) - 16 * w, 0), 16)
        masks.append(0xFFFFFFFF if v == 16 else (1 << (2 * v)) - 1)

    TQ = min(TILE_Q, -(-Q // 8) * 8)
    Qp = -(-Q // TQ) * TQ
    Dp = -(-D // TILE_DQ) * TILE_DQ
    Wp = -(-W // 8) * 8  # db sublane pad
    Wl = -(-W // 128) * 128  # query lane pad

    q = jnp.pad(queries, ((0, Qp - Q), (0, Wl - W)))
    db = jnp.pad(db_word_major, ((0, Wp - W), (0, Dp - D)))

    grid = (Qp // TQ, Dp // TILE_DQ)
    out = pl.pallas_call(
        _make_batch_kernel(W, tuple(masks)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TQ, Wl), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Wp, TILE_DQ), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TQ, TILE_DQ), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Qp, Dp), jnp.int32),
        interpret=interpret,
    )(q, db)
    return out[:Q, :D]


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
