"""Pallas MXU histogram kernel: k-mer keys -> dense [4^k] counts, k <= 8.

The pure-XLA matmul histogram (ops/kmer.py count_kmers_dense_mxu) computes
hist2d = onehot(hi)^T @ onehot(lo) but XLA materializes both one-hot
operands in HBM (~512 bytes/window). Here the one-hots are generated inside
the kernel and consumed by the MXU directly from VMEM, so HBM traffic is the
4-byte key per window and nothing else; the kernel is MXU-bound.

Invalid/padding windows carry the sentinel key 4^k: its hi digit equals n_hi,
outside the one-hot iota range [0, n_hi), so its one-hot row is all-zero and
it contributes nothing — no weight array needed.

The [n_hi, n_lo] f32 accumulator block has a grid-constant index map, so it
stays resident in VMEM across all key chunks and is written back once.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8
COLS = 512  # keys per sub-row; ROWS*COLS keys per grid step


def _cols_for(k: int) -> int:
    """Keys per sub-row per grid step. Past k=8 the [n_hi, n_lo] f32
    accumulator grows (1 MB at k=9, 4 MB at k=10) and the per-iteration
    one-hot tiles [COLS, n_hi/n_lo] must narrow to stay inside the 16 MB
    scoped-vmem budget alongside it."""
    return 512 if k <= 8 else (256 if k == 9 else 128)


def _hist_kernel(keys_ref, out_ref, *, k: int, n_hi: int, n_lo: int,
                 cols: int):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    keys = keys_ref[:]  # [ROWS, cols] int32
    # digit split uses the LOGICAL k-bit low digit; n_hi/n_lo are only the
    # (possibly lane-padded) one-hot widths
    hi = keys >> k
    lo = keys & ((1 << k) - 1)

    acc = jnp.zeros((n_hi, n_lo), jnp.float32)
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (cols, n_hi), 1)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (cols, n_lo), 1)
    for r in range(ROWS):
        h = hi[r, :][:, None]  # [cols, 1]
        l = lo[r, :][:, None]
        a = (h == iota_hi).astype(jnp.bfloat16)  # [cols, n_hi]
        b = (l == iota_lo).astype(jnp.bfloat16)  # [cols, n_lo]
        acc = acc + jax.lax.dot_general(
            a,
            b,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = out_ref[:] + acc


def _fused_cw(k: int) -> int:
    """Word columns per fused-kernel grid step. The 16x8 unrolled dot loop
    keeps one-hot temporaries live on the Mosaic stack; at padded one-hot
    width 128 (k <= 7) a 512-wide tile blows the 16MB scoped-vmem limit
    (measured), so narrow the tile there."""
    return 512 if k == 8 else 128


def _fused_kernel(words_ref, nxt_ref, lens_ref, out_ref, *, k, n_hi, n_lo, cw):
    """Words -> histogram with the window keys GENERATED in VMEM.

    The XLA key-generation path materializes ~8 B/base of intermediates in
    HBM (codes + position-doubled keys); here each u32 word and its right
    neighbor yield their 16 funnel-shifted window keys on the VPU, one-hots
    feed the MXU directly, and HBM traffic is just the packed words
    (0.25 B/base) plus the shifted copy. Validity (p <= len - k, the
    window_valid_mask contract) is computed in-kernel from the per-read
    lengths; invalid windows take the sentinel 4^k whose hi digit falls
    outside the one-hot iota range.
    """
    i, j_col = pl.program_id(0), pl.program_id(1)

    @pl.when((i == 0) & (j_col == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    w = words_ref[:]  # [8, CW] uint32
    nx = nxt_ref[:]
    lens = lens_ref[:, 0:1].astype(jnp.int32)  # [8, 1]
    col0 = j_col * cw
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (8, cw), 1) + col0
    mask_k = jnp.uint32((1 << (2 * k)) - 1)
    sent = jnp.int32(4**k)

    acc = jnp.zeros((n_hi, n_lo), jnp.float32)
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (cw, n_hi), 1)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (cw, n_lo), 1)
    for j in range(16):
        if j == 0:
            kj = w & mask_k
        else:
            kj = ((w >> jnp.uint32(2 * j)) | (nx << jnp.uint32(32 - 2 * j))) & mask_k
        p = 16 * iota_c + j  # global base index of the window start
        keys = jnp.where(p <= lens - k, kj.astype(jnp.int32), sent)
        hi = keys >> k
        lo = keys & ((1 << k) - 1)
        for r in range(8):
            a = (hi[r, :][:, None] == iota_hi).astype(jnp.bfloat16)
            b = (lo[r, :][:, None] == iota_lo).astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                a,
                b,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    out_ref[:] = out_ref[:] + acc


FUSED_COLS_PER_SLAB = (1 << 23) // (16 * 8)


def histogram_from_words(
    words: jax.Array, lengths: jax.Array, k: int, *, interpret: bool = False
) -> jax.Array:
    """Fused dense k-mer histogram straight from packed words, k <= 8.

    words: [B, W] uint32; lengths: [B] int32. Returns [4^k] int32, equal to
    ops.kmer.count_kmers_dense (tests/test_pallas.py parity battery).
    Row-slabbed so f32 in-kernel accumulation stays exact (< 2^24/bin per
    slab), int32-accumulated across slabs.
    """
    assert 1 <= k <= 8
    B, W = words.shape
    lengths = jnp.asarray(lengths, jnp.int32)
    # windows per slab <= 2^23 keeps any single bin below the f32 bound
    rows_per_slab = max(8, (1 << 23) // max(16 * W, 1) // 8 * 8)
    if B > rows_per_slab:
        total = None
        for s in range(0, B, rows_per_slab):
            part = histogram_from_words(
                words[s : s + rows_per_slab],
                lengths[s : s + rows_per_slab],
                k,
                interpret=interpret,
            )
            total = part if total is None else total + part
        return total
    # a single row-slab can still exceed the bound when reads are very long
    # (8 rows x 16W windows > 2^23 for W > 65536): slab the WORD axis too.
    # Column slab c covers global bases [16c, 16(c+CS)); shifting lengths by
    # 16c reproduces the global p <= len - k validity in slab-local terms,
    # and the cross-slab windows come from the full shifted-words array.
    if W > FUSED_COLS_PER_SLAB:
        nxt_full = jnp.pad(words[:, 1:], ((0, 0), (0, 1)))
        total = None
        for c in range(0, W, FUSED_COLS_PER_SLAB):
            w_real = min(FUSED_COLS_PER_SLAB, W - c)
            # clamp to the slab's REAL word span: windows must start inside
            # it (p <= 16*w_real - 1, i.e. len_eff - k) or the in-kernel
            # lane padding would count phantom all-A windows; the k-1 slack
            # lets last-word windows spill into nxt as usual.
            lens_slab = jnp.minimum(
                jnp.maximum(lengths - 16 * c, 0), 16 * w_real + k - 1
            )
            part = _histogram_from_words_slab(
                words[:, c : c + FUSED_COLS_PER_SLAB],
                nxt_full[:, c : c + FUSED_COLS_PER_SLAB],
                lens_slab,
                k,
                interpret=interpret,
            )
            total = part if total is None else total + part
        return total
    return _histogram_from_words_slab(
        words,
        jnp.pad(words[:, 1:], ((0, 0), (0, 1))),
        lengths,
        k,
        interpret=interpret,
    )


@partial(jax.jit, static_argnames=("k", "interpret"))
def _histogram_from_words_slab(
    words: jax.Array,
    nxt: jax.Array,
    lengths: jax.Array,
    k: int,
    *,
    interpret: bool = False,
) -> jax.Array:
    """One exact-f32 slab of the fused histogram (<= 2^23 windows)."""
    B, W = words.shape

    n_lo = 1 << k
    n_hi = (4**k) >> k
    n_hi_p = max(n_hi, 128)
    n_lo_p = max(n_lo, 128)

    cw = _fused_cw(k)
    Bp = -(-B // 8) * 8
    Wp = -(-W // cw) * cw
    w = jnp.pad(words, ((0, Bp - B), (0, Wp - W)))
    nxt = jnp.pad(nxt, ((0, Bp - B), (0, Wp - W)))
    lens = jnp.pad(jnp.asarray(lengths, jnp.int32), (0, Bp - B))
    lens2d = jnp.broadcast_to(lens[:, None], (Bp, 128))

    grid = (Bp // 8, Wp // cw)
    hist2d = pl.pallas_call(
        partial(_fused_kernel, k=k, n_hi=n_hi_p, n_lo=n_lo_p, cw=cw),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, cw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (n_hi_p, n_lo_p), lambda i, j: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_hi_p, n_lo_p), jnp.float32),
        interpret=interpret,
    )(w, nxt, lens2d)

    return hist2d[:n_hi, :n_lo].astype(jnp.int32).reshape(-1)


@partial(jax.jit, static_argnames=("k", "interpret"))
def histogram_from_keys(
    keys: jax.Array, k: int, *, interpret: bool = False
) -> jax.Array:
    """[N] int32 keys in [0, 4^k] (4^k = sentinel, not counted) -> [4^k] int32.

    f32 accumulation is exact only below 2^24 per bin, so keys are processed
    in <=2^22-key slabs (a bin can gain at most the slab size per kernel
    call) with int32 accumulation across slabs — a poly-A batch cannot
    silently undercount. k <= 10: the f32 accumulator is 4 MB of VMEM at
    k=10 (with narrowed key tiles, _cols_for); k=11 would need 16 MB.
    """
    assert 1 <= k <= 10
    SLAB = 1 << 22
    if keys.shape[0] > SLAB:
        total = None
        for s in range(0, keys.shape[0], SLAB):
            part = histogram_from_keys(keys[s : s + SLAB], k, interpret=interpret)
            total = part if total is None else total + part
        return total
    n_lo = 1 << k  # lo digit: k bits of the 2k-bit key
    n_hi = (4**k) >> k
    # lane-dim floors: one-hot widths below 128 waste lanes but must still
    # be at least the minimum tile; pad bin counts up to 128.
    n_hi_p = max(n_hi, 128)
    n_lo_p = max(n_lo, 128)

    N = keys.shape[0]
    if N == 0:  # a 0-step grid would return an uninitialized buffer
        return jnp.zeros(4**k, jnp.int32)
    cols = _cols_for(k)
    per = ROWS * cols
    Np = -(-N // per) * per
    keys = jnp.pad(keys, (0, Np - N), constant_values=4**k)
    keys2d = keys.reshape(Np // cols, cols)

    grid = (Np // per,)
    hist2d = pl.pallas_call(
        partial(_hist_kernel, k=k, n_hi=n_hi_p, n_lo=n_lo_p, cols=cols),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROWS, cols), lambda j: (j, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (n_hi_p, n_lo_p), lambda j: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_hi_p, n_lo_p), jnp.float32),
        interpret=interpret,
    )(keys2d)

    return hist2d[:n_hi, :n_lo].astype(jnp.int32).reshape(-1)
