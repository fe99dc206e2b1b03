"""Pallas unpack kernel: 2-bit packed uint32 words -> ASCII reads.

TPU-kernel equivalent of the reference's SIMD unpacking back-ends
(src/utils/unpacking/{avx,aarch64}.rs — pshufb/vtbl LUT loops). Like the pack
kernel, it is built FULLY LANE-LOCAL to fit the VPU layout: the wrapper
bitcasts words [B, W] u32 -> [B, 4W] u8 (free in XLA) so each input byte
carries 4 bases; the kernel zero-extends the byte into a u32 lane, expands
its four 2-bit codes to four ASCII bytes inside the lane (branch-free select
chain per code — unpacking/naive.rs:14-19), masks past-length bytes, and
writes one u32 lane = 4 ASCII chars, which the wrapper bitcasts back to
[B, L] u8. Reads 0.25 B/base, writes 1 B/base — memory-bound.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import bitops

TILE_B = 256
TILE_N = 512  # byte-lanes per row-tile = 2048 bases


def _unpack_kernel(b_ref, len_ref, out_ref):
    """(TB, TN) u8 (4 bases each) -> (TB, TN) u32 (4 ASCII chars each)."""
    v = b_ref[:].astype(jnp.uint32)  # [TB, TN]
    tb, tn = v.shape
    j = pl.program_id(1)

    out = jnp.zeros_like(v)
    for byte in range(4):
        code = (v >> (2 * byte)) & jnp.uint32(3)
        ascii_b = jnp.where(
            code == 0,
            jnp.uint32(bitops.ASCII_A),
            jnp.where(
                code == 1,
                jnp.uint32(bitops.ASCII_C),
                jnp.where(
                    code == 2, jnp.uint32(bitops.ASCII_G), jnp.uint32(bitops.ASCII_T)
                ),
            ),
        )
        out = out | (ascii_b << (8 * byte))

    # zero ASCII bytes at/past each read's length: lane m covers [4m, 4m+4)
    m = j * tn + jax.lax.broadcasted_iota(jnp.int32, (tb, tn), 1)
    nvalid = jnp.clip(len_ref[:] - 4 * m, 0, 4).astype(jnp.uint32)
    full = nvalid == 4
    mask = (jnp.uint32(1) << (8 * jnp.where(full, 0, nvalid))) - jnp.uint32(1)
    out_ref[:] = out & jnp.where(full, jnp.uint32(0xFFFFFFFF), mask)


@partial(jax.jit, static_argnames=("max_len", "interpret"))
def decode_reads_pallas(
    words: jax.Array,
    lengths: jax.Array,
    max_len: Optional[int] = None,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Pallas twin of codec.decode_reads_xla: [B, W] uint32 -> [B, max_len]
    uint8 ASCII, zero past each read's length (from_2bit_multi semantics,
    src/utils/unpacking/mod.rs:10-48, batched)."""
    B, W = words.shape
    L = W * bitops.BASES_PER_WORD if max_len is None else int(max_len)
    lengths = lengths.astype(jnp.int32)

    N = 4 * W  # byte-lanes
    Bp = -(-B // TILE_B) * TILE_B
    Np = -(-N // TILE_N) * TILE_N
    b8 = jax.lax.bitcast_convert_type(words, jnp.uint8).reshape(B, N)
    b8 = jnp.pad(b8, ((0, Bp - B), (0, Np - N)))
    lens2d = jnp.pad(lengths[:, None], ((0, Bp - B), (0, 0)))

    grid = (Bp // TILE_B, Np // TILE_N)
    out32 = pl.pallas_call(
        _unpack_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_B, TILE_N), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_B, TILE_N), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, Np), jnp.uint32),
        interpret=interpret,
    )(b8, lens2d)

    ascii_full = jax.lax.bitcast_convert_type(out32, jnp.uint8).reshape(Bp, 4 * Np)[:B]
    full = 4 * Np
    if L <= full:
        return ascii_full[:, :L]
    return jnp.pad(ascii_full, ((0, 0), (0, L - full)))
