"""Anchor chaining vs an exact python DP oracle mirroring the op's
documented scoring and tie-break rules, plus planted long-read-style
anchor patterns with known best chains."""

import numpy as np
import pytest

from bitnuc_tpu.ops import chain


def naive_chain(anchors, max_gap, gap_unit, lookback):
    """(score, start_r, end_r, start_q, end_q) with the op's exact rules:
    anchors sorted by (rpos, qpos); predecessor window = the previous
    `lookback` anchors in sorted order; f = 1 + max(0, f_j - |dr-dq| //
    gap_unit); extend only when strictly beneficial; predecessor ties ->
    (max cand, max rpos_j, max qpos_j)."""
    a = sorted(anchors)
    n = len(a)
    f = [0] * n
    start = [None] * n
    best = (0, -1, -1, -1, -1)
    for i in range(n):
        ri, qi = a[i]
        pbest, pj = None, None
        for j in range(max(0, i - lookback), i):
            rj, qj = a[j]
            dr, dq = ri - rj, qi - qj
            if not (0 < dr <= max_gap and 0 < dq <= max_gap):
                continue
            cand = f[j] - abs(dr - dq) // gap_unit
            key = (cand, rj, qj)
            if pbest is None or key > pbest:
                pbest, pj = key, j
        if pbest is not None and pbest[0] > 0:
            f[i] = 1 + pbest[0]
            start[i] = start[pj]
        else:
            f[i] = 1
            start[i] = (ri, qi)
        if f[i] > best[0]:
            best = (f[i], start[i][0], ri, start[i][1], qi)
    return best


def run_op(anchor_rows, A, max_gap=512, gap_unit=8, lookback=64):
    B = len(anchor_rows)
    r = np.zeros((B, A), np.int32)
    q = np.zeros((B, A), np.int32)
    v = np.zeros((B, A), bool)
    for b, row in enumerate(anchor_rows):
        for i, (rp, qp) in enumerate(row):
            r[b, i], q[b, i], v[b, i] = rp, qp, True
    out = chain.chain_anchors(r, q, v, max_gap, gap_unit, lookback)
    return [tuple(int(x[b]) for x in out) for b in range(B)]


def test_chain_simple_colinear():
    # 5 perfectly colinear anchors chain completely
    row = [(100 + 20 * i, 10 + 20 * i) for i in range(5)]
    (got,) = run_op([row], 8)
    assert got == (5, 100, 180, 10, 90)


def test_chain_indel_drift_and_outlier():
    # colinear run with a 4-base drift mid-chain (penalty 0 at gap_unit=8)
    # plus one far-off-diagonal outlier that must not join
    row = [(100, 10), (150, 60), (204, 110), (260, 166), (5000, 20)]
    (got,) = run_op([row], 8)
    assert got[0] == 4 and (got[1], got[2]) == (100, 260)


def test_chain_empty_and_single():
    got = run_op([[], [(70, 7)]], 4)
    assert got[0] == (0, -1, -1, -1, -1)
    assert got[1] == (1, 70, 70, 7, 7)


def test_chain_vs_naive_fuzz(rng):
    rows = []
    for _ in range(20):
        n = int(rng.integers(0, 40))
        # mix: a noisy diagonal + uniform noise anchors
        base_r = int(rng.integers(0, 5000))
        diag = []
        rp, qp = base_r, 0
        for _ in range(n // 2):
            step = int(rng.integers(5, 80))
            drift = int(rng.integers(-6, 7))
            rp += step
            qp += max(step + drift, 1)
            diag.append((rp, qp))
        noise = [
            (int(rng.integers(0, 8000)), int(rng.integers(0, 1000)))
            for _ in range(n - len(diag))
        ]
        rows.append(sorted(set(diag + noise)))
    A = max((len(r) for r in rows), default=1) or 1
    got = run_op(rows, A, max_gap=300, gap_unit=8, lookback=16)
    for b, row in enumerate(rows):
        want = naive_chain(row, 300, 8, 16)
        assert got[b] == want, (b, row, got[b], want)


def test_chain_lookback_window_limits():
    # a chain longer than the lookback window still links (each step only
    # needs its immediate predecessor in the window)
    row = [(i * 10, i * 10) for i in range(30)]
    (got,) = run_op([row], 30, lookback=4)
    assert got[0] == 30
    # but a predecessor OUTSIDE the window is invisible: two anchors with
    # 5 noise anchors between them (in rpos order) and lookback 4
    row = [(0, 0)] + [(10 + i, 900 + i) for i in range(5)] + [(40, 4)]
    (got,) = run_op([row], 7, max_gap=100, gap_unit=8, lookback=4)
    want = naive_chain(row, 100, 8, 4)
    assert got == want
