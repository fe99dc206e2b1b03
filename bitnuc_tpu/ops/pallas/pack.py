"""Pallas pack kernel: ASCII reads -> 2-bit packed uint32 words.

The TPU-kernel equivalent of the reference's SIMD packing back-ends
(src/utils/packing/{avx,sse,aarch64}.rs). Bit-packing 16 consecutive bytes
into one lane fights the VPU's 8x128 lane layout (cross-lane shuffles and
strided extracts do not lower), so this kernel is built to be FULLY
LANE-LOCAL:

  * the host-side wrapper bitcasts the ASCII array [B, L] u8 to [B, L/4] u32
    (free metadata change in XLA) so each 32-bit lane carries 4 bases;
  * in-lane SWAR: codes = ((v>>1) ^ (v>>2)) & 0x03030303 — the reference's
    arithmetic ASCII->2bit trick (aarch64.rs:136-138) applied to all four
    bytes of the lane at once (the used bits never cross byte boundaries);
  * the four 2-bit codes fold into the low byte with three shift-ors, the
    lane truncates to u8, and the final u8[B, L/4] -> u32[B, L/16] word view
    is again a free XLA bitcast.

Reads 1 B/base, writes 0.25 B/base; ~5 VPU ops/base — memory-bound.
Validity and per-read length masking are fused in (also lane-local), with the
earliest invalid byte offset min-accumulated across length tiles.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import bitops

TILE_B = 256
TILE_L = 2048  # ASCII bytes per row-tile = TILE_L/4 u32 lanes

_NO_BAD = 0x7FFFFFFF


def _pack_kernel(v_ref, len_ref, out_ref, bad_ref):
    """(TB, TL/4) u32 lanes of 4 ASCII bytes -> (TB, TL/4) u8 of 4 packed
    bases, masked to per-read length; min-accumulates first-bad offsets."""
    v = v_ref[:]  # [TB, NL] uint32, NL = TILE_L//4
    tb, nl = v.shape
    j = pl.program_id(1)

    # SWAR codes: byte i's code lands in bits [8i, 8i+1]
    c = ((v >> 1) ^ (v >> 2)) & jnp.uint32(0x03030303)
    # fold to low byte: c0 | c1<<2 | c2<<4 | c3<<6
    p = (c | (c >> 6) | (c >> 12) | (c >> 18)) & jnp.uint32(0xFF)

    # per-byte mask to read length: lane m covers bases [4m, 4m+4)
    m = j * nl + jax.lax.broadcasted_iota(jnp.int32, (tb, nl), 1)
    nvalid = jnp.clip(len_ref[:] - 4 * m, 0, 4).astype(jnp.uint32)
    p = p & ((jnp.uint32(1) << (2 * nvalid)) - jnp.uint32(1))
    out_ref[:] = p.astype(jnp.uint8)

    # validity: lowercase then per-byte membership in {a,c,g,t}
    low = v | jnp.uint32(0x20202020)
    big = _NO_BAD
    badpos = jnp.full((tb, nl), big, jnp.int32)
    for byte in range(4):
        b = (low >> (8 * byte)) & jnp.uint32(0xFF)
        ok = (b == ord("a")) | (b == ord("c")) | (b == ord("g")) | (b == ord("t"))
        badpos = jnp.minimum(badpos, jnp.where(ok, big, 4 * m + byte))
    tmin = jnp.min(badpos, axis=-1, keepdims=True)  # global offsets already

    @pl.when(j == 0)
    def _():
        bad_ref[:] = jnp.full_like(bad_ref, big)

    bad_ref[:] = jnp.minimum(bad_ref[:], jnp.broadcast_to(tmin, bad_ref.shape))


@partial(jax.jit, static_argnames=("n_words", "interpret"))
def encode_reads_pallas(
    ascii_u8: jax.Array,
    lengths: jax.Array,
    n_words: Optional[int] = None,
    *,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Pallas twin of codec.encode_reads_xla: [B, L] uint8 -> ([B, W] uint32,
    [B] int32 first_bad). Bit-exact with the XLA path and the reference
    (zero-padded last word, src/utils/packing/naive.rs:39-42; bytes at/past
    a read's length are never inspected, matching encode stopping at
    seq.len())."""
    B, L = ascii_u8.shape
    W = bitops.n_words_for(L) if n_words is None else int(n_words)
    assert W % 2 == 0
    lengths = lengths.astype(jnp.int32)

    Bp = -(-B // TILE_B) * TILE_B
    Lp = -(-L // TILE_L) * TILE_L
    # pad with 'A' (valid, code 0) so padding never flags as invalid
    a = jnp.pad(ascii_u8, ((0, Bp - B), (0, Lp - L)), constant_values=ord("A"))
    v32 = jax.lax.bitcast_convert_type(a.reshape(Bp, Lp // 4, 4), jnp.uint32)
    lens2d = jnp.pad(lengths[:, None], ((0, Bp - B), (0, 0)))

    grid = (Bp // TILE_B, Lp // TILE_L)
    NL = TILE_L // 4
    packed_u8, bad = pl.pallas_call(
        _pack_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_B, NL), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_B, NL), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            # 128-lane min-accumulator, constant in j so it stays VMEM-resident
            pl.BlockSpec((TILE_B, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Lp // 4), jnp.uint8),
            jax.ShapeDtypeStruct((Bp, 128), jnp.int32),
        ],
        interpret=interpret,
    )(v32, lens2d)

    words_raw = jax.lax.bitcast_convert_type(
        packed_u8.reshape(Bp, Lp // 16, 4), jnp.uint32
    )[:B]
    Wfull = Lp // 16
    words = words_raw[:, :W] if W <= Wfull else jnp.pad(
        words_raw, ((0, 0), (0, W - Wfull))
    )

    gbad = bad[:B, 0]
    first_bad = jnp.where(gbad < lengths, gbad, jnp.int32(-1))
    return words, first_bad
