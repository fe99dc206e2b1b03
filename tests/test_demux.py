"""Barcode demultiplexing vs per-read python assignment."""

import numpy as np

from conftest import random_seq

from bitnuc_tpu.ops import demux
from bitnuc_tpu.sequence import PackedReads


def test_assign_barcodes_rules(rng):
    bcs = [b"ACGTACGT", b"TTTTCCCC", b"GGGGAAAA"]
    reads = [
        bcs[0] + random_seq(rng, 40).upper(),           # exact -> 0
        b"ACGAACGT" + random_seq(rng, 40).upper(),      # 1 mm -> 0
        b"ACGAACGA" + random_seq(rng, 40).upper(),      # 2 mm -> unassigned
        bcs[2] + random_seq(rng, 40).upper(),           # exact -> 2
        random_seq(rng, 6).upper(),                     # too short
    ]
    pr = PackedReads.from_ascii(reads)
    pb = PackedReads.from_ascii(bcs)
    idx, dist = map(
        np.asarray, demux.assign_barcodes(pr.words, pr.lengths, pb.words, 8, 1)
    )
    assert idx.tolist() == [0, 0, -1, 2, -1]
    assert dist.tolist()[:4] == [0, 1, 2, 0]


def test_assign_barcodes_tie_unassigned(rng):
    # read head equidistant (1 mm) from two barcodes -> unassigned
    bcs = [b"AAAAAAAA", b"AAAAAACC"]
    read = b"AAAAAAAC" + random_seq(rng, 30).upper()
    pr = PackedReads.from_ascii([read])
    pb = PackedReads.from_ascii(bcs)
    idx, dist = map(
        np.asarray, demux.assign_barcodes(pr.words, pr.lengths, pb.words, 8, 1)
    )
    assert idx[0] == -1 and dist[0] == 1


def test_assign_barcodes_vs_naive_fuzz(rng):
    bcs = [bytes(random_seq(rng, 10)).upper() for _ in range(12)]
    reads = []
    for _ in range(60):
        b = bcs[int(rng.integers(len(bcs)))]
        head = bytearray(b)
        for _ in range(int(rng.integers(0, 3))):
            head[int(rng.integers(10))] = int(
                rng.choice(np.frombuffer(b"ACGT", np.uint8))
            )
        reads.append(bytes(head) + random_seq(rng, 30).upper())
    pr = PackedReads.from_ascii(reads)
    pb = PackedReads.from_ascii(bcs)
    idx, dist = map(
        np.asarray, demux.assign_barcodes(pr.words, pr.lengths, pb.words, 10, 2)
    )
    for i, r in enumerate(reads):
        ds = [sum(a != b for a, b in zip(r[:10], bc)) for bc in bcs]
        m = min(ds)
        want = ds.index(m) if (m <= 2 and ds.count(m) == 1) else -1
        assert idx[i] == want and dist[i] == m, (i, r[:10])
