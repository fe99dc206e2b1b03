"""Minimizer-index read mapper vs python oracles.

Index build is checked for EXACT parity against a brute-force python
(w,k)-minimizer dictionary (leftmost-min tie-break, max_occ repeat
filter). Mapping is checked on planted reads where the right answer is
known exactly: coordinates, strand, and cost of exact / mutated /
reverse-complemented / boundary-overlapping / junk reads.
"""

import numpy as np
import pytest

from conftest import random_seq

from bitnuc_tpu import mapper, oracle
from bitnuc_tpu.sequence import PackedReads

_RC = bytes.maketrans(b"ACGT", b"TGCA")


def rc(s: bytes) -> bytes:
    return s[::-1].translate(_RC)


def naive_seed_table(seq: bytes, k: int, w: int, max_occ: int):
    """{key: sorted positions} of the (w,k)-minimizer sketch, leftmost
    tie-break, keys with more than max_occ occurrences dropped."""
    n = len(seq)
    kv = [oracle.as_2bit(seq[p : p + k]) for p in range(n - k + 1)]
    seeds = set()
    for s in range(len(kv) - w + 1):
        win = kv[s : s + w]
        m = min(win)
        seeds.add((m, s + win.index(m)))
    table = {}
    for key, p in sorted(seeds):
        table.setdefault(key, []).append(p)
    return {key: ps for key, ps in table.items() if len(ps) <= max_occ}


@pytest.mark.parametrize("k,w,max_occ", [(5, 4, 4), (13, 8, 8), (15, 10, 2)])
def test_index_build_vs_naive(rng, k, w, max_occ):
    ref = random_seq(rng, 700).upper()
    idx = mapper.MinimizerIndex.build(ref, k=k, w=w, max_occ=max_occ)
    want = naive_seed_table(ref, k, w, max_occ)
    assert idx.keys.tolist() == sorted(want)
    for row, key in enumerate(idx.keys):
        ps = want[int(key)]
        assert idx.nocc[row] == len(ps)
        assert idx.pos[row, : len(ps)].tolist() == ps
        assert (idx.pos[row, len(ps) :] == -1).all()
    assert (np.diff(idx.keys.astype(np.int64)) > 0).all()  # distinct sorted


def test_index_save_load_roundtrip(tmp_path, rng):
    ref = random_seq(rng, 400).upper()
    idx = mapper.MinimizerIndex.build(ref, k=11, w=6)
    p = tmp_path / "idx.npz"
    idx.save(p)
    idx2 = mapper.MinimizerIndex.load(p)
    assert (idx2.keys == idx.keys).all() and (idx2.pos == idx.pos).all()
    assert (idx2.ref_words == idx.ref_words).all()
    assert (idx2.ref_len, idx2.k, idx2.w, idx2.max_occ) == (
        idx.ref_len,
        idx.k,
        idx.w,
        idx.max_occ,
    )


def test_map_planted_reads_exact(rng):
    ref = random_seq(rng, 5000).upper()
    idx = mapper.MinimizerIndex.build(ref, k=13, w=8)
    reads = [
        ref[1000:1150],  # exact +
        rc(ref[2000:2150]),  # exact -
        ref[3000:3100] + ref[3101:3151],  # one deletion
        random_seq(rng, 150).upper(),  # junk
        ref[:120],  # flush with ref start
        ref[4880:],  # flush with ref end
    ]
    out = mapper.map_reads(idx, PackedReads.from_ascii(reads))
    assert out["mapped"].tolist() == [True, True, True, False, True, True]
    assert out["strand"][:3].tolist() == [b"+", b"-", b"+"]
    assert out["ref_start"][[0, 1, 2, 4, 5]].tolist() == [1000, 2000, 3000, 0, 4880]
    assert out["ref_end"][[0, 1, 2, 4, 5]].tolist() == [1150, 2150, 3151, 120, 5000]
    assert out["cost"][[0, 1, 4, 5]].tolist() == [0, 0, 0, 0]
    assert out["cost"][2] == 1
    assert out["support"][3] < 2 and (out["support"][[0, 1, 2, 4, 5]] >= 2).all()


def test_map_substitutions_cost(rng):
    ref = random_seq(rng, 3000).upper()
    idx = mapper.MinimizerIndex.build(ref, k=13, w=8)
    q = bytearray(ref[700:850])
    for p in (30, 75, 120):  # spaced: minimizer seeds survive between them
        q[p] = b"ACGT"[(b"ACGT".index(q[p : p + 1]) + 1) % 4]
    out = mapper.map_reads(idx, PackedReads.from_ascii([bytes(q)]))
    assert out["mapped"][0] and out["strand"][0] == b"+"
    assert out["cost"][0] == 3
    assert (out["ref_start"][0], out["ref_end"][0]) == (700, 850)


def test_map_repeat_key_dropped_still_maps(rng):
    unit = random_seq(rng, 60).upper()
    ref = unit * 30 + random_seq(rng, 2000).upper()  # repeat + unique arm
    idx = mapper.MinimizerIndex.build(ref, k=13, w=8, max_occ=4)
    # a read from the unique arm maps exactly even though the repeat
    # region's keys were frequency-dropped
    q = ref[60 * 30 + 500 : 60 * 30 + 650]
    out = mapper.map_reads(idx, PackedReads.from_ascii([q]))
    assert out["mapped"][0] and out["cost"][0] == 0
    assert out["ref_start"][0] == 60 * 30 + 500


def test_map_short_and_seedless_reads(rng):
    ref = random_seq(rng, 1000).upper()
    idx = mapper.MinimizerIndex.build(ref, k=13, w=8)
    # shorter than k + w - 1: zero minimizer windows -> unmapped, support 0
    out = mapper.map_reads(
        idx, PackedReads.from_ascii([ref[100:115], ref[200:350]])
    )
    assert not out["mapped"][0] and out["support"][0] == 0
    assert out["mapped"][1] and out["ref_start"][1] == 200


def test_map_reads_sharded_matches_local(rng):
    import jax

    from bitnuc_tpu import parallel

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = parallel.make_mesh((8,), ("data",))
    ref = random_seq(rng, 4000).upper()
    idx = mapper.MinimizerIndex.build(ref, k=13, w=8)
    reads = []
    for i in range(16):
        s = int(rng.integers(0, 3800))
        q = ref[s : s + 120]
        reads.append(rc(q) if i % 3 == 0 else q)
    pr = PackedReads.from_ascii(reads)
    local = mapper.map_reads(idx, pr)
    sharded = mapper.map_reads_sharded(idx, pr, mesh)
    for f in ("mapped", "strand", "ref_start", "ref_end", "cost", "support"):
        np.testing.assert_array_equal(sharded[f], local[f], err_msg=f)


def test_index_n_masking(rng):
    ref = bytearray(random_seq(rng, 800).upper())
    ref[300:330] = b"N" * 30
    ref = bytes(ref)
    idx = mapper.MinimizerIndex.build(ref, k=13, w=8)
    # no seed's k-mer may overlap the N run
    for row in range(len(idx)):
        for p in idx.pos[row]:
            if p >= 0:
                assert p + 13 <= 300 or p >= 330, p
    # reads from clean regions still map exactly
    out = mapper.map_reads(
        idx, PackedReads.from_ascii([ref[100:220], ref[500:620]])
    )
    assert out["mapped"].all() and out["cost"].tolist() == [0, 0]
    assert out["ref_start"].tolist() == [100, 500]


def test_build_multi_no_junction_seeds(rng):
    c1 = random_seq(rng, 500).upper()
    c2 = random_seq(rng, 400).upper()
    idx = mapper.MinimizerIndex.build_multi([c1, c2], k=13, w=8)
    assert idx.contig_starts.tolist() == [0, 501]
    # no seed k-mer spans the separator at concat position 500
    for row in range(len(idx)):
        for p in idx.pos[row]:
            if p >= 0:
                assert p + 13 <= 500 or p >= 501, p
    # reads from both contigs map to exact concat coordinates
    out = mapper.map_reads(
        idx, PackedReads.from_ascii([c1[200:320], c2[100:220]])
    )
    assert out["mapped"].all() and out["cost"].tolist() == [0, 0]
    assert out["ref_start"].tolist() == [200, 601]
    # save/load preserves contig_starts
    import tempfile, os
    fd, pth = tempfile.mkstemp(suffix=".npz"); os.close(fd)
    try:
        idx.save(pth)
        idx2 = mapper.MinimizerIndex.load(pth)
        assert idx2.contig_starts.tolist() == [0, 501]
    finally:
        os.unlink(pth)


def test_map_tandem_repeat_coherent_interval(rng):
    # a read equal to a tandem-repeated segment has several equal-cost
    # placements; the forward (end) and reversed (start) fit passes must
    # pick the SAME one (regression: mirror tie-breaks produced empty
    # intervals like ref_start == ref_end)
    seg = random_seq(rng, 45).upper()
    ref = random_seq(rng, 1000).upper() + seg + seg + random_seq(rng, 1000).upper()
    idx = mapper.MinimizerIndex.build(ref, k=13, w=4, max_occ=8)
    out = mapper.map_reads(idx, PackedReads.from_ascii([seg]), min_seeds=1)
    assert out["mapped"][0] and out["cost"][0] == 0
    s, e = int(out["ref_start"][0]), int(out["ref_end"][0])
    assert e - s == 45
    assert s in (1000, 1045)  # a real copy, same copy both ends


@pytest.mark.parametrize("k,w", [(21, 10), (31, 6)])
def test_index_build_vs_naive_wide_k(rng, k, w):
    # 64-bit key regime: parity against the same brute-force dict oracle
    ref = random_seq(rng, 900).upper()
    idx = mapper.MinimizerIndex.build(ref, k=k, w=w, max_occ=8)
    want = naive_seed_table(ref, k, w, 8)
    got_keys = [
        (int(h) << 32) | int(l) for l, h in zip(idx.keys, idx.keys_hi)
    ]
    assert got_keys == sorted(want)
    for row, key in enumerate(got_keys):
        ps = want[key]
        assert idx.pos[row, : len(ps)].tolist() == ps


def test_map_planted_reads_wide_k(rng):
    ref = random_seq(rng, 5000).upper()
    idx = mapper.MinimizerIndex.build(ref, k=21, w=10)
    reads = [
        ref[1500:1650],
        rc(ref[3200:3350]),
        random_seq(rng, 150).upper(),
    ]
    out = mapper.map_reads(idx, PackedReads.from_ascii(reads))
    assert out["mapped"].tolist() == [True, True, False]
    assert out["strand"][:2].tolist() == [b"+", b"-"]
    assert out["ref_start"][:2].tolist() == [1500, 3200]
    assert out["ref_end"][:2].tolist() == [1650, 3350]
    assert out["cost"][:2].tolist() == [0, 0]
    # save/load keeps the wide keys
    import tempfile, os
    fd, pth = tempfile.mkstemp(suffix=".npz"); os.close(fd)
    try:
        idx.save(pth)
        idx2 = mapper.MinimizerIndex.load(pth)
        assert (idx2.keys_hi == idx.keys_hi).all() and idx2.keys_hi.any()
        out2 = mapper.map_reads(idx2, PackedReads.from_ascii(reads))
        np.testing.assert_array_equal(out2["ref_start"], out["ref_start"])
    finally:
        os.unlink(pth)


def test_minimizers64_rejects_k32():
    # the all-T 32-mer equals the sentinel pair: k=32 must be refused
    # rather than silently dropping poly-T minimizers
    from bitnuc_tpu.ops import kmer

    r = PackedReads.from_ascii([b"T" * 50])
    with pytest.raises(AssertionError):
        kmer.minimizers64(r.words, r.lengths, 32, 4)
    with pytest.raises(AssertionError):
        kmer.minimizer_positions64(r.words, r.lengths, 32, 4)


def test_cli_orf_suppresses_orfless_records():
    pass  # covered in tests/test_cli.py::test_cli_orf (record without ATG)


def test_map_reads_long_indel_read(rng):
    """A 2kb read with scattered indels breaks the fixed-bin vote but
    chains cleanly; both strands agree on the reference span."""
    ref = random_seq(rng, 12000).upper()
    idx = mapper.MinimizerIndex.build(ref, k=15, w=10)
    src = ref[3000:5000]
    read = bytearray()
    p = 0
    while p < len(src):
        chunk = int(rng.integers(120, 300))
        read += src[p : p + chunk]
        p += chunk
        if p < len(src):
            if rng.random() < 0.5:
                read += random_seq(rng, int(rng.integers(1, 15))).upper()
            else:
                p += int(rng.integers(1, 15))
    long_read = bytes(read)
    junk = random_seq(rng, 2000).upper()
    pr = PackedReads.from_ascii([long_read, rc(long_read), junk])
    out = mapper.map_reads_long(idx, pr, min_chain=10)
    assert out["mapped"].tolist() == [True, True, False]
    assert out["strand"][:2].tolist() == [b"+", b"-"]
    for i in (0, 1):
        assert 2990 <= out["ref_start"][i] <= 3100
        assert 4900 <= out["ref_end"][i] <= 5000
        assert out["chain_score"][i] > 100
    # strands see the same anchors: identical reference spans
    assert out["ref_start"][0] == out["ref_start"][1]
    assert out["ref_end"][0] == out["ref_end"][1]
    # forward-converted query spans cover most of the read on both strands
    for i in (0, 1):
        assert out["q_start"][i] < 60
        assert out["q_end"][i] > len(long_read) - 80


def test_map_reads_long_matches_short_on_clean_reads(rng):
    ref = random_seq(rng, 6000).upper()
    idx = mapper.MinimizerIndex.build(ref, k=13, w=8)
    pr = PackedReads.from_ascii([ref[1200:1500]])
    short = mapper.map_reads(idx, pr)
    longm = mapper.map_reads_long(idx, pr, min_chain=3)
    assert longm["mapped"][0] and short["mapped"][0]
    # chain span sits inside the exact fit interval (anchor granularity)
    assert short["ref_start"][0] <= longm["ref_start"][0]
    assert longm["ref_end"][0] <= short["ref_end"][0]


def test_map_reads_long_extend_base_exact(rng):
    ref = random_seq(rng, 10000).upper()
    idx = mapper.MinimizerIndex.build(ref, k=15, w=10)
    src = ref[4000:5500]
    read = src[:500] + src[503:1000] + src[1002:]  # deletions of 3 and 2
    pr = PackedReads.from_ascii([read, rc(read)])
    out = mapper.map_reads_long(idx, pr, min_chain=10, extend=True)
    assert out["mapped"].all() and out["strand"].tolist() == [b"+", b"-"]
    # base-exact: the fit spans the whole source region with cost == the
    # total deleted bases (gap cost 1/base)
    for i in (0, 1):
        assert out["ref_start"][i] == 4000
        assert out["ref_end"][i] == 5500
        assert out["cost"][i] == 5


def test_map_pairs_proper_and_discordant(rng):
    ref = random_seq(rng, 8000).upper()
    idx = mapper.MinimizerIndex.build(ref, k=13, w=8)
    # proper pair: fragment 400, R2 as-sequenced = rc of the fragment tail
    frag = ref[2000:2400]
    p_r1, p_r2 = frag[:120], rc(frag[-120:])
    # discordant: mates from distant loci (insert >> max)
    d_r1, d_r2 = ref[500:620], rc(ref[6000:6120])
    # same-strand pair: both forward
    s_r1, s_r2 = ref[3000:3120], ref[3200:3320]
    # half-mapped pair
    h_r1, h_r2 = ref[4000:4120], random_seq(rng, 120).upper()
    out = mapper.map_pairs(
        idx,
        PackedReads.from_ascii([p_r1, d_r1, s_r1, h_r1]),
        PackedReads.from_ascii([p_r2, d_r2, s_r2, h_r2]),
        min_insert=100,
        max_insert=800,
    )
    assert out["proper"].tolist() == [True, False, False, False]
    assert out["insert"].tolist() == [400, -1, -1, -1]
    assert out["r1"]["ref_start"][0] == 2000
    assert out["r2"]["ref_end"][0] == 2400


def test_map_pairs_rf_orientation_rejected(rng):
    # both map, opposite strands, but the '+' mate is RIGHTMOST (RF) ->
    # not proper even though the span fits the window
    ref = random_seq(rng, 6000).upper()
    idx = mapper.MinimizerIndex.build(ref, k=13, w=8)
    r1 = rc(ref[2000:2120])  # '-' at left
    r2 = ref[2300:2420]  # '+' at right
    out = mapper.map_pairs(
        idx,
        PackedReads.from_ascii([r1]),
        PackedReads.from_ascii([r2]),
        max_insert=1000,
    )
    assert not out["proper"][0]


def test_map_pairs_rejects_mismatched_batches(rng):
    ref = random_seq(rng, 2000).upper()
    idx = mapper.MinimizerIndex.build(ref, k=13, w=8)
    with pytest.raises(ValueError):
        mapper.map_pairs(
            idx,
            PackedReads.from_ascii([ref[100:220]]),
            PackedReads.from_ascii([ref[300:420], ref[500:620]]),
        )


def test_map_pairs_vs_naive_rule_fuzz(rng):
    """Oracle parity for the FR/insert rule over randomized placements,
    strands, and window boundaries (given per-mate mapping results)."""
    ref = random_seq(rng, 12000).upper()
    idx = mapper.MinimizerIndex.build(ref, k=13, w=8)
    min_ins, max_ins = 150, 450
    r1s, r2s = [], []
    for _ in range(40):
        s1 = int(rng.integers(0, 11800))
        ins = int(rng.integers(80, 700))
        s2 = min(s1 + ins - 120, 11880)
        a = ref[s1 : s1 + 120]
        b = ref[max(s2, 0) : max(s2, 0) + 120]
        # random strand layout: FR, RF, FF, or junk mates
        layout = int(rng.integers(0, 5))
        if layout == 0:
            r1s.append(a); r2s.append(rc(b))
        elif layout == 1:
            r1s.append(rc(a)); r2s.append(b)
        elif layout == 2:
            r1s.append(a); r2s.append(b)
        elif layout == 3:
            r1s.append(rc(a)); r2s.append(rc(b))
        else:
            r1s.append(a); r2s.append(random_seq(rng, 120).upper())
    p1, p2 = PackedReads.from_ascii(r1s), PackedReads.from_ascii(r2s)
    out = mapper.map_pairs(idx, p1, p2, min_insert=min_ins, max_insert=max_ins)
    r1, r2 = out["r1"], out["r2"]
    for i in range(len(r1s)):
        if not (r1["mapped"][i] and r2["mapped"][i]):
            want = False
        elif r1["strand"][i] == r2["strand"][i]:
            want = False
        else:
            if r1["strand"][i] == b"+":
                fs, fe = int(r1["ref_start"][i]), int(r1["ref_end"][i])
                rs, re_ = int(r2["ref_start"][i]), int(r2["ref_end"][i])
            else:
                fs, fe = int(r2["ref_start"][i]), int(r2["ref_end"][i])
                rs, re_ = int(r1["ref_start"][i]), int(r1["ref_end"][i])
            ins = re_ - fs
            want = (fs <= rs) and (min_ins <= ins <= max_ins)
        assert bool(out["proper"][i]) == want, i
        if want:
            assert out["insert"][i] == re_ - fs
        else:
            assert out["insert"][i] == -1


# ---------------------------------------------------------------------------
# traceback_cigars: per-read CIGARs reproduce the mapper's costs exactly
# ---------------------------------------------------------------------------


def test_traceback_cigars_planted(rng):
    from bitnuc_tpu.ops import align
    from bitnuc_tpu import assemble

    ref = random_seq(rng, 4000).upper()
    idx = mapper.MinimizerIndex.build(ref, k=13, w=8)
    reads, kinds = [], []
    for i in range(24):
        s = 57 * i + 20
        r = ref[s : s + 100]
        kind = i % 4
        if kind == 1:  # 3bp deletion vs reference
            r = ref[s : s + 40] + ref[s + 43 : s + 103]
        elif kind == 2:  # 2bp insertion
            r = ref[s : s + 50] + b"CA" + ref[s + 50 : s + 98]
        elif kind == 3:  # reverse strand exact
            r = assemble.rc_ascii(r)
        reads.append(r)
        kinds.append(kind)
    pr = PackedReads.from_ascii(reads)
    res = mapper.map_reads(idx, pr)
    assert res["mapped"].all()
    tb = mapper.traceback_cigars(idx, pr, res, chunk=16)
    for i, kind in enumerate(kinds):
        # the traceback's global alignment over the exact mapped window
        # must reproduce the mapper's fit cost
        assert tb["tb_cost"][i] == res["cost"][i], (i, kind)
        cig = tb["cigar"][i]
        row = tb["ops"][i]
        n_del = sum(1 for o in row if o == align.OP_DEL)
        n_ins = sum(1 for o in row if o == align.OP_INS)
        n_x = sum(1 for o in row if o == align.OP_X)
        if kind == 0 or kind == 3:
            assert cig == "100=", (i, cig)
        elif kind == 1:  # equal-cost placements may split the event run,
            # but the op totals of the optimum are fixed
            assert (n_del, n_ins, n_x) == (3, 0, 0) and res["cost"][i] == 3, (
                i, cig)
        else:
            assert (n_del, n_ins, n_x) == (0, 2, 0) and res["cost"][i] == 2, (
                i, cig)
        # ops replay: query-consuming ops count == read length
        q = sum(1 for o in row if o in (align.OP_EQ, align.OP_X, align.OP_INS))
        b = sum(1 for o in row if o in (align.OP_EQ, align.OP_X, align.OP_DEL))
        assert q == len(reads[i])
        assert b == res["ref_end"][i] - res["ref_start"][i]


def test_traceback_cigars_unmapped_row(rng):
    ref = random_seq(rng, 2000).upper()
    idx = mapper.MinimizerIndex.build(ref, k=13, w=8)
    junk = random_seq(rng, 80).upper()
    pr = PackedReads.from_ascii([ref[100:200], junk])
    res = mapper.map_reads(idx, pr, min_seeds=3)
    tb = mapper.traceback_cigars(idx, pr, res)
    assert tb["cigar"][0] == "100="
    if not res["mapped"][1]:
        assert tb["cigar"][1] is None


def test_traceback_cigars_banded_matches_unbanded(rng):
    """band > 0 (the O(L*band)-plane path) must reproduce the unbanded
    traceback exactly when the indel drift fits the band."""
    from bitnuc_tpu import assemble

    ref = random_seq(rng, 4000).upper()
    idx = mapper.MinimizerIndex.build(ref, k=13, w=8)
    reads = []
    for i in range(12):
        s = 117 * i + 20
        r = ref[s : s + 100]
        if i % 3 == 1:
            r = ref[s : s + 40] + ref[s + 44 : s + 104]  # 4bp deletion
        elif i % 3 == 2:
            r = assemble.rc_ascii(
                ref[s : s + 50] + b"CAG" + ref[s + 50 : s + 97]
            )  # 3bp insertion, reverse strand
        reads.append(r)
    pr = PackedReads.from_ascii(reads)
    res = mapper.map_reads(idx, pr)
    assert res["mapped"].all()
    full = mapper.traceback_cigars(idx, pr, res, chunk=8)
    band = mapper.traceback_cigars(idx, pr, res, chunk=8, band=16)
    assert full["cigar"] == band["cigar"]
    np.testing.assert_array_equal(full["tb_cost"], band["tb_cost"])
    np.testing.assert_array_equal(full["ops"], band["ops"])


def test_map_reads_long_sharded_matches_single(rng):
    """Long-read mapping over an 8-device mesh == single-device, both chain
    mode and --extend mode (VERDICT r4 item 6)."""
    import jax

    from bitnuc_tpu import parallel

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = parallel.make_mesh((8,), ("data",))
    ref = random_seq(rng, 12000).upper()
    idx = mapper.MinimizerIndex.build(ref, k=15, w=10)
    reads = []
    for i in range(11):  # NOT a multiple of 8: exercises pad/slice-back
        s = 900 * i + 100
        src = ref[s : s + 900]
        reads.append(src[:300] + src[303:600] + src[602:])  # two deletions
    reads.append(random_seq(rng, 900).upper())  # junk: unmapped
    pr = PackedReads.from_ascii(reads)
    for extend in (False, True):
        one = mapper.map_reads_long(idx, pr, min_chain=10, extend=extend)
        eight = mapper.map_reads_long(
            idx, pr, min_chain=10, extend=extend, mesh=mesh
        )
        assert set(one) == set(eight)
        for f in one:
            np.testing.assert_array_equal(one[f], eight[f], err_msg=f)
    assert one["mapped"][:11].all() and not one["mapped"][11]
