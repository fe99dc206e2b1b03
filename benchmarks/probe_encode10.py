"""Pack-fold formulation shootout at 512 MiB scale (follow-up to
probe_encode9, which found x[..., ::16] strided slices run 35 Gbases/s
while the shipping reshape+shift+sum pack runs 21.3 and the honest floor
(reshape + max fold) 26.8 — the reshape+reduce pack formulation, not the
traffic, is the bottleneck).

Variants (all bit-exact vs the shipping encode where applicable):
  - enc_current:      shipping codec.encode_reads_xla
  - enc_slices:       16 strided slices x[..., j::16] -> u32 -> SWAR code
                      -> << 2j, OR-folded as a binary tree; max-trick
                      validation on the strided slices
  - enc_slices_noval: same without validation (the new floor candidate)
  - enc_tree:         reshape pack but binary-tree OR fold (no 16-ary sum)
  - enc_dot:          reshape + two bf16 dots on the MXU (8 lanes each,
                      exact below 2^16), combined lo | hi << 16

Run: python benchmarks/probe_encode10.py   (real TPU)
"""
import json
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bitnuc_tpu import config

config.enable_compilation_cache()
from bitnuc_tpu.ops import codec
from bitnuc_tpu.utils import bitops
from bitnuc_tpu.utils.timing import amortized_seconds_per_call

B, L = 16384, 32768
W = L // 16


def emit(n, v, u):
    print(json.dumps({"probe": n, "value": round(v, 2), "unit": u}), flush=True)


def make(key):
    codes = jax.random.randint(key, (B, L), 0, 4, jnp.int32)
    return (bitops.code_to_ascii(codes), jnp.full((B,), L, jnp.int32))


def _slice_codes(a, l, j):
    """Strided slice j::16 -> (u32 code, in_range) for word-lane j."""
    b = a[..., j::16].astype(jnp.uint32)
    pos = jnp.arange(b.shape[-1], dtype=jnp.int32) * 16 + j
    in_range = pos < l[..., None]
    code = jnp.where(in_range, ((b >> 1) ^ (b >> 2)) & 3, 0)
    return code, b, in_range, pos


def _tree_or(parts):
    while len(parts) > 1:
        parts = [
            parts[i] | parts[i + 1] if i + 1 < len(parts) else parts[i]
            for i in range(0, len(parts), 2)
        ]
    return parts[0]


def enc_slices(a, l):
    shifted = []
    bad_enc = []
    for j in range(16):
        code, b, in_range, pos = _slice_codes(a, l, j)
        shifted.append(code << jnp.uint32(2 * j))
        lower = b | jnp.uint32(0x20)
        ok = (
            (lower == ord("a")) | (lower == ord("c"))
            | (lower == ord("g")) | (lower == ord("t"))
        )
        bad_enc.append(jnp.where(~ok & in_range, a.shape[-1] - pos, 0))
    words = _tree_or(shifted)
    # binary-tree max over the 16 lane streams, then one reduce over words
    while len(bad_enc) > 1:
        bad_enc = [
            jnp.maximum(bad_enc[i], bad_enc[i + 1])
            if i + 1 < len(bad_enc) else bad_enc[i]
            for i in range(0, len(bad_enc), 2)
        ]
    enc = jnp.max(bad_enc[0], axis=-1)
    Lx = a.shape[-1]
    first_bad = jnp.where(enc > 0, Lx - enc, -1).astype(jnp.int32)
    return words, first_bad


def enc_slices_noval(a, l):
    shifted = []
    for j in range(16):
        code, _, _, _ = _slice_codes(a, l, j)
        shifted.append(code << jnp.uint32(2 * j))
    return _tree_or(shifted)


def enc_tree(a, l):
    Bx, Lx = a.shape
    pos = jnp.arange(Lx, dtype=jnp.int32)
    in_range = pos < l[..., None]
    c = jnp.where(in_range, bitops.ascii_to_code(a), 0).astype(jnp.uint32)
    c = c.reshape(Bx, Lx // 16, 16)
    parts = [c[..., j] << jnp.uint32(2 * j) for j in range(16)]
    return _tree_or(parts)


def enc_dot(a, l):
    Bx, Lx = a.shape
    pos = jnp.arange(Lx, dtype=jnp.int32)
    in_range = pos < l[..., None]
    c = jnp.where(in_range, bitops.ascii_to_code(a), 0)
    c = c.reshape(Bx * (Lx // 16), 16).astype(jnp.bfloat16)
    pow4 = (4.0 ** jnp.arange(8, dtype=jnp.float32)).astype(jnp.bfloat16)
    wmat = jnp.zeros((16, 2), jnp.bfloat16)
    wmat = wmat.at[:8, 0].set(pow4).at[8:, 1].set(pow4)
    halves = jax.lax.dot_general(
        c, wmat, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(jnp.uint32)
    return (halves[:, 0] | (halves[:, 1] << 16)).reshape(Bx, Lx // 16)


import bench

VARIANTS = [
    ("enc_current", codec.encode_reads_xla),
    ("enc_slices", enc_slices),
    ("enc_slices_noval", enc_slices_noval),
    ("enc_tree", enc_tree),
    ("enc_dot", enc_dot),
]

# correctness gate first (tiny shapes on the same device)
import numpy as np

rng = np.random.default_rng(3)
a_s = bitops.code_to_ascii(jnp.asarray(rng.integers(0, 4, (4, L), np.int32)))
l_s = jnp.full((4,), L, jnp.int32)
ref, fb_ref = codec.encode_reads_xla(a_s, l_s)
ref = np.asarray(ref)
for name, fn in VARIANTS[1:]:
    out = fn(a_s, l_s)
    w = np.asarray(out[0] if isinstance(out, tuple) else out)
    assert w.shape == ref.shape and (w == ref).all(), name
    if isinstance(out, tuple):
        assert (np.asarray(out[1]) == np.asarray(fb_ref)).all(), name
print(json.dumps({"probe": "parity", "value": 1, "unit": "ok"}), flush=True)

emit("xor_copy_320", bench.bench_memcpy(320), "GB/s")
for name, fn in VARIANTS:
    try:
        t = amortized_seconds_per_call(fn, make, k=2, reps=5)
        emit(name, B * L / t / 1e9, "Gbases/s")
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:300]}), flush=True)
emit("xor_copy_320_end", bench.bench_memcpy(320), "GB/s")
