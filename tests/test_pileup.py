"""Pileup / consensus / SNP calling vs a per-read python oracle and
planted-mutation end-to-end expectations."""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import random_seq

from bitnuc_tpu import mapper
from bitnuc_tpu.ops import pileup
from bitnuc_tpu.sequence import PackedReads

_RC = bytes.maketrans(b"ACGT", b"TGCA")


def rc(s: bytes) -> bytes:
    return s[::-1].translate(_RC)


def naive_pileup(reads, starts, use_rc, keep, ref_len):
    grid = np.zeros((ref_len, 4), np.int32)
    code = {65: 0, 67: 1, 71: 2, 84: 3}
    for r, s, f, k in zip(reads, starts, use_rc, keep):
        if not k:
            continue
        seq = rc(r) if f else r
        for i, b in enumerate(seq):
            p = s + i
            if 0 <= p < ref_len:
                grid[p, code[b]] += 1
    return grid


def test_pileup_counts_vs_naive(rng):
    ref_len = 300
    reads, starts, flags, keeps = [], [], [], []
    for i in range(40):
        n = int(rng.integers(20, 80))
        reads.append(random_seq(rng, n).upper())
        starts.append(int(rng.integers(-30, ref_len + 10)))  # some hang off
        flags.append(bool(i % 3 == 0))
        keeps.append(bool(i % 7 != 0))
    pr = PackedReads.from_ascii(reads)
    got = np.asarray(
        pileup.pileup_counts(
            pr.words,
            pr.lengths,
            jnp.asarray(np.array(starts, np.int32)),
            jnp.asarray(np.array(flags)),
            jnp.asarray(np.array(keeps)),
            ref_len,
        )
    )
    np.testing.assert_array_equal(
        got, naive_pileup(reads, starts, flags, keeps, ref_len)
    )


def test_consensus_calls_rules(rng):
    ref = random_seq(rng, 64).upper()
    pr = PackedReads.from_ascii([ref])
    counts = np.zeros((64, 4), np.int32)
    refc = [b"ACGT".index(ref[i : i + 1]) for i in range(64)]
    counts[np.arange(64), refc] = 5  # uniform ref-agreeing depth 5
    alt0 = (refc[10] + 1) % 4
    counts[10, alt0] = 9  # clear variant
    alt1 = (refc[20] + 1) % 4
    counts[20, refc[20]] = 5
    counts[20, alt1] = 4  # below min_frac (4/9) -> ref kept
    counts[30] = 0
    counts[30, (refc[30] + 2) % 4] = 1  # depth 1 < min_depth -> ref kept
    cons, depth, is_var, support = map(
        np.asarray,
        pileup.consensus_calls(
            jnp.asarray(counts), pr.words.reshape(-1), 2, 0.5
        ),
    )
    assert is_var.sum() == 1 and is_var[10]
    assert cons[10] == alt0 and support[10] == 9 and depth[10] == 14
    assert cons[20] == refc[20] and cons[30] == refc[30]
    assert (cons[np.arange(64) != 10] == np.array(refc)[np.arange(64) != 10]).all()


def test_call_variants_end_to_end(rng):
    ref = random_seq(rng, 3000).upper()
    snp_pos, depth_each = 1500, 6
    alt = b"ACGT"[(b"ACGT".index(ref[snp_pos : snp_pos + 1]) + 1) % 4 :][:1]
    mutated = ref[:snp_pos] + alt + ref[snp_pos + 1 :]
    reads = []
    for i in range(depth_each):  # variant-carrying reads tile the SNP
        s = snp_pos - 100 + i * 15
        q = mutated[s : s + 140]
        reads.append(rc(q) if i % 2 else q)
    for i in range(4):  # ref-agreeing reads elsewhere
        s = 300 + i * 50
        reads.append(ref[s : s + 140])
    pr = PackedReads.from_ascii(reads)
    idx = mapper.MinimizerIndex.build(ref, k=13, w=8)
    res = mapper.map_reads(idx, pr)
    assert res["mapped"].all()
    calls = pileup.call_variants(idx, pr, res, min_depth=3, min_frac=0.8)
    assert calls["variant_pos"].tolist() == [snp_pos]
    assert calls["variant_depth"][0] == depth_each
    assert calls["variant_support"][0] == depth_each
    assert bytes([b"ACGT"[calls["variant_alt"][0]]]) == alt
    # consensus equals the mutated genome at the SNP, the reference
    # everywhere reads disagree nowhere else
    cons = calls["consensus"]
    assert b"ACGT"[cons[snp_pos]] == alt[0]
    refc = np.array([b"ACGT".index(ref[i : i + 1]) for i in range(3000)])
    assert (cons[np.arange(3000) != snp_pos] == refc[np.arange(3000) != snp_pos]).all()


def test_call_variants_cost_filter_excludes_indel_reads(rng):
    ref = random_seq(rng, 2000).upper()
    clean = ref[600:740]
    indel = ref[1000:1060] + ref[1061:1141]  # deletion: would mis-pile
    pr = PackedReads.from_ascii([clean, indel])
    idx = mapper.MinimizerIndex.build(ref, k=13, w=8)
    res = mapper.map_reads(idx, pr)
    assert res["mapped"].all() and res["cost"][1] >= 1
    calls = pileup.call_variants(idx, pr, res, max_cost=0, min_depth=1)
    # only the clean read piles: depth 1 across [600, 740), zero elsewhere
    assert calls["depth"][600:740].tolist() == [1] * 140
    assert calls["depth"].sum() == 140
    assert calls["variant_pos"].size == 0


def test_pileup_counts_sharded_matches_local(rng):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from bitnuc_tpu import parallel

    mesh = parallel.make_mesh((8,), ("data",))
    ref_len = 400
    reads, starts, flags, keeps = [], [], [], []
    for i in range(24):
        reads.append(random_seq(rng, int(rng.integers(30, 90))).upper())
        starts.append(int(rng.integers(-20, ref_len)))
        flags.append(bool(i % 2))
        keeps.append(bool(i % 5 != 0))
    pr = PackedReads.from_ascii(reads)
    args = (
        pr.words,
        pr.lengths,
        jnp.asarray(np.array(starts, np.int32)),
        jnp.asarray(np.array(flags)),
        jnp.asarray(np.array(keeps)),
    )
    local = np.asarray(pileup.pileup_counts(*args, ref_len))
    sharded = np.asarray(
        pileup.pileup_counts_sharded(*args, ref_len, mesh)
    )
    np.testing.assert_array_equal(sharded, local)


# ---------------------------------------------------------------------------
# indel-aware pileup + caller (cigar=True)
# ---------------------------------------------------------------------------


def test_pileup_ops_matches_gapless_for_clean_reads(rng):
    ref = random_seq(rng, 2000).upper()
    idx = mapper.MinimizerIndex.build(ref, k=13, w=8)
    reads = PackedReads.from_ascii(
        [ref[40 * i + 7 : 40 * i + 107] for i in range(30)]
    )
    res = mapper.map_reads(idx, reads)
    assert res["mapped"].all()
    tb = mapper.traceback_cigars(idx, reads, res)
    keep = jnp.asarray(res["mapped"])
    use_rc = jnp.asarray(res["strand"] == b"-")
    rs = jnp.asarray(res["ref_start"], jnp.int32)
    gapless = pileup.pileup_counts(
        reads.words, reads.lengths, rs, use_rc, keep, idx.ref_len
    )
    counts, dels, ins = pileup.pileup_counts_ops(
        reads.words, reads.lengths, rs, use_rc, keep,
        jnp.asarray(tb["ops"]), idx.ref_len,
    )
    assert np.array_equal(np.asarray(counts), np.asarray(gapless))
    assert int(np.asarray(dels).sum()) == 0
    assert int(np.asarray(ins).sum()) == 0


def test_caller_recovers_planted_indels(rng):
    """The VERDICT r3 contract: a 3bp deletion (and a 2bp insertion)
    planted in every read over its region must come out of the caller as
    indel events at the exact reference coordinates."""
    ref = random_seq(rng, 3000).upper()
    DEL_AT, DEL_LEN = 1003, 3  # reads lack ref[1003:1006]
    INS_AT = 2001              # reads carry an insertion before ref[2001]
    # an inserted homopolymer of a base absent from the local context has
    # a UNIQUE optimal placement (no equal-cost split/shift is possible)
    free = set(b"ACGT") - set(ref[INS_AT - 1 : INS_AT + 2])
    INS_SEQ = bytes([sorted(free)[0]]) * 2
    reads = []
    for i in range(120):
        s = 23 * i + 10
        r = ref[s : s + 120]
        if s < DEL_AT - 10 and s + 120 > DEL_AT + DEL_LEN + 10:
            r = ref[s : DEL_AT] + ref[DEL_AT + DEL_LEN : s + 120 + DEL_LEN]
        elif s < INS_AT - 10 and s + 120 > INS_AT + 10:
            r = ref[s : INS_AT] + INS_SEQ + ref[INS_AT : s + 120 - len(INS_SEQ)]
        elif (s + 120 > DEL_AT - 10 and s < DEL_AT + DEL_LEN + 10) or (
            s + 120 > INS_AT - 10 and s < INS_AT + 10
        ):
            continue  # homozygous events: drop reads overlapping but not
            # spanning, so every covering read carries the variant
        reads.append(r[:120])
    pr = PackedReads.from_ascii(reads)
    idx = mapper.MinimizerIndex.build(ref, k=13, w=8)
    res = mapper.map_reads(idx, pr)
    assert res["mapped"].all()
    calls = pileup.call_variants(idx, pr, res, max_cost=8, min_depth=2,
                                 min_frac=0.5, cigar=True)
    # no substitution artifacts from indel misprojection
    assert calls["variant_pos"].size == 0, calls["variant_pos"]
    assert DEL_AT in calls["del_pos"].tolist()
    j = calls["del_pos"].tolist().index(DEL_AT)
    assert calls["del_len"][j] == DEL_LEN
    assert calls["del_support"][j] >= 2
    assert INS_AT in calls["ins_pos"].tolist()
    jj = calls["ins_pos"].tolist().index(INS_AT)
    assert calls["ins_seq"][jj] == INS_SEQ
    assert calls["ins_support"][jj] >= 2
