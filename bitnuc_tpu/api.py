"""Host-level functional API mirroring the reference crate root
(src/lib.rs:214-220 re-exports: as_2bit, from_2bit, from_2bit_alloc, encode,
encode_alloc, decode, hdist, hdist_scalar, split_packed).

These are single-sequence host operations: they dispatch to the native C++
library when built (bitnuc_tpu/native), else the numpy oracle — per-call
device dispatch would dominate at this granularity (the same reasoning as the
reference's README "Performance Considerations", README.md:155-180). Batched
device equivalents live in bitnuc_tpu.ops and operate on PackedReads.
"""

from __future__ import annotations

from typing import Tuple, Union

import numpy as np

from . import oracle
from .errors import InvalidLength

Seq = Union[bytes, bytearray, str, np.ndarray]


def _host():
    """Select the host backend: native C++ if built, else the numpy oracle."""
    from . import native

    return native if native.available() else oracle


def as_2bit(seq: Seq) -> int:
    """Pack up to 32 bases into one u64 (src/utils/packing/mod.rs:81).

    >>> bin(as_2bit(b"ACGT"))
    '0b11100100'
    """
    return _host().as_2bit(seq)


def from_2bit(packed: int, n_bases: int) -> bytes:
    """Unpack n_bases (<=32) from one u64 (src/utils/unpacking/mod.rs:119).

    Returns fresh bytes; the reference appends into a caller buffer instead
    (divergence recorded in docs/PARITY.md).

    >>> from_2bit(0b11100100, 4)
    b'ACGT'
    >>> from_2bit(71620941647064936, 28)  # reference golden word
    b'AGGCTTGAGGCCCATTCTCTGATCGTTT'
    """
    return _host().from_2bit(packed, n_bases)


def from_2bit_alloc(packed: int, n_bases: int) -> bytes:
    """Allocating alias of from_2bit (src/utils/unpacking/mod.rs:178)."""
    return from_2bit(packed, n_bases)


def encode(seq: Seq) -> np.ndarray:
    """Encode an arbitrary-length sequence to u64 words (src/utils/mod.rs:22).

    >>> int(encode(b"ACGT")[0])
    228
    >>> decode(encode(b"ACGTACGTAC"), 10)
    b'ACGTACGTAC'
    """
    return _host().encode(seq)


def encode_alloc(seq: Seq) -> np.ndarray:
    """Alias of encode — Python always allocates (src/utils/mod.rs:38)."""
    return encode(seq)


def decode(ebuf, n_bases: int) -> bytes:
    """Decode n_bases from u64 words (src/utils/mod.rs:60)."""
    return _host().decode(ebuf, n_bases)


def hdist(ebuf1, ebuf2, n_bases: int) -> int:
    """Per-base Hamming distance over packed word arrays
    (src/utils/functions/hamming/multi.rs:122).

    >>> hdist(encode(b"ACTGACTG"), encode(b"TGCATGCA"), 8)  # golden table row
    8
    >>> hdist(encode(b"ACGT"), encode(b"ACGA"), 4)
    1
    """
    return _host().hdist(ebuf1, ebuf2, n_bases)


def hdist_scalar(u: int, v: int, length: int) -> int:
    """Single-word per-base Hamming distance (hamming/scalar.rs:11)."""
    return _host().hdist_scalar(u, v, length)


def split_packed(ebuf, slen: int, idx: int) -> Tuple[np.ndarray, np.ndarray]:
    """Split a packed stream at base idx (src/utils/functions/split.rs:14).

    >>> l, r = split_packed(encode(b"ACGTAC"), 6, 4)
    >>> (decode(l, 4), decode(r, 2))
    (b'ACGT', b'AC')
    """
    return _host().split_packed(ebuf, slen, idx)


def count_kmers(seq: Seq, k: int) -> dict:
    """K-mer counting per the reference README workflow (README.md:164-180):
    returns {packed_kmer_value: count}. For batched/device-scale counting use
    bitnuc_tpu.ops.kmer.count_kmers_reads.

    >>> count_kmers(b"AAAA", 2)
    {0: 3}
    """
    if not 1 <= k <= 32:
        raise InvalidLength(k)
    return _host().count_kmers(seq, k)
