"""FastQC-style QC profile (bitnuc_tpu.qc) — oracle parity + CLI.

North-star surface; the reference codec has no QC concept. Ground truth
here is a per-read python fold (dicts and sorted lists), the same style as
tests/test_filters.py.
"""

import gzip
import json
import math
import random

import numpy as np
import pytest

from bitnuc_tpu.qc import qc_profile


def _write_fastq(path, recs, gz=False):
    raw = b"".join(
        b"@r%d\n%s\n+\n%s\n" % (i, s, q) for i, (s, q) in enumerate(recs)
    )
    if gz:
        path.write_bytes(gzip.compress(raw))
    else:
        path.write_bytes(raw)


def _percentile(vals, frac):
    """Lower-interpolation percentile over a sorted value list."""
    rank = max(math.ceil(frac * len(vals)), 1)
    return vals[rank - 1]


def _oracle(recs):
    per_cycle_q = {}
    per_cycle_b = {}
    mean_q_hist = {}
    gc_hist = {}
    for s, q in recs:
        phreds = [min(max(c - 33, 0), 63) for c in q]
        for i, (b, p) in enumerate(zip(s.upper(), phreds)):
            per_cycle_q.setdefault(i, []).append(p)
            sym = {65: 0, 67: 1, 71: 2, 84: 3}.get(b, 4)
            per_cycle_b.setdefault(i, [0] * 5)[sym] += 1
        mq = round(sum(phreds) / max(len(phreds), 1))
        mean_q_hist[mq] = mean_q_hist.get(mq, 0) + 1
        gc = sum(1 for b in s.upper() if b in b"CG")
        pct = round(100.0 * gc / max(len(s), 1))
        gc_hist[pct] = gc_hist.get(pct, 0) + 1
    return per_cycle_q, per_cycle_b, mean_q_hist, gc_hist


@pytest.mark.parametrize("gz", [False, True])
def test_qc_oracle_random(tmp_path, gz):
    rng = random.Random(7)
    recs = []
    for _ in range(300):
        n = rng.randint(1, 90)
        s = bytes(rng.choice(b"ACGTNacgt") for _ in range(n))
        q = bytes(rng.randint(33, 33 + 45) for _ in range(n))
        recs.append((s, q))
    fq = tmp_path / ("r.fq.gz" if gz else "r.fq")
    _write_fastq(fq, recs, gz=gz)

    # small batch size exercises the cross-batch accumulator fold
    rep = qc_profile(fq, batch_reads=64)
    per_cycle_q, per_cycle_b, mean_q_hist, gc_hist = _oracle(recs)

    assert rep["reads"] == 300
    assert rep["bases"] == sum(len(s) for s, _ in recs)
    lens = [len(s) for s, _ in recs]
    assert rep["min_len"] == min(lens) and rep["max_len"] == max(lens)
    assert rep["mean_len"] == round(sum(lens) / 300, 2)

    assert len(rep["per_cycle"]) == max(lens)
    for row in rep["per_cycle"]:
        c = row["cycle"]
        vals = sorted(per_cycle_q[c])
        assert row["q_mean"] == round(sum(vals) / len(vals), 3)
        assert row["q_p10"] == _percentile(vals, 0.10)
        assert row["q_p25"] == _percentile(vals, 0.25)
        assert row["q_median"] == _percentile(vals, 0.50)
        assert row["q_p75"] == _percentile(vals, 0.75)
        assert row["q_p90"] == _percentile(vals, 0.90)
        assert [row[k] for k in "acgtn"] == per_cycle_b[c]

    assert rep["mean_quality_hist"] == mean_q_hist
    assert rep["gc_hist"] == gc_hist


def test_qc_status_thresholds(tmp_path):
    # all-high-quality balanced file: pass/pass
    good = tmp_path / "good.fq"
    # rotate the motif so every cycle sees all four bases equally
    _write_fastq(
        good,
        [
            ((b"ACGT" * 6)[r : r + 20], bytes([33 + 38]) * 20)
            for r in range(4)
        ],
    )
    st = qc_profile(good)["status"]
    assert st == {"per_base_quality": "pass", "per_base_content": "pass"}

    # median 22 (>=20, <25) -> warn; heavy A skew -> content fail
    warn = tmp_path / "warn.fq"
    _write_fastq(warn, [(b"AAAAAAAAGC", bytes([33 + 22]) * 10)] * 4)
    st = qc_profile(warn)["status"]
    assert st["per_base_quality"] == "warn"
    assert st["per_base_content"] == "fail"

    # median below 20 -> fail
    bad = tmp_path / "bad.fq"
    _write_fastq(bad, [(b"ACGTACGT", bytes([33 + 3]) * 8)] * 4)
    assert qc_profile(bad)["status"]["per_base_quality"] == "fail"


def test_qc_variable_lengths_tail_cycles(tmp_path):
    # only the longest read reaches the last cycle; stats there come from it
    fq = tmp_path / "v.fq"
    _write_fastq(fq, [(b"ACGTACGT", b"IIIIIIII"), (b"GG", b"##")])
    rep = qc_profile(fq)
    last = rep["per_cycle"][-1]
    assert last["cycle"] == 7
    assert last["q_median"] == ord("I") - 33
    assert last["a"] + last["c"] + last["g"] + last["t"] + last["n"] == 1
    first = rep["per_cycle"][0]
    assert first["g"] == 1 and first["a"] == 1


def test_qc_empty_file(tmp_path):
    fq = tmp_path / "e.fq"
    fq.write_bytes(b"")
    rep = qc_profile(fq)
    assert rep["reads"] == 0 and rep["bases"] == 0
    assert rep["per_cycle"] == [] and rep["mean_len"] == 0.0


def test_qc_cli(tmp_path, capsys):
    from bitnuc_tpu.cli import main

    fq = tmp_path / "c.fq"
    _write_fastq(fq, [(b"ACGTACGT", b"IIIIIIII")] * 3)
    assert main(["qc", str(fq), "--compact"]) == 0
    got = json.loads(capsys.readouterr().out)
    assert got["reads"] == 3 and got["status"]["per_base_quality"] == "pass"

    # --strict turns a quality fail into exit 1
    bad = tmp_path / "b.fq"
    _write_fastq(bad, [(b"ACGTACGT", b"$$$$$$$$")] * 3)
    assert main(["qc", str(bad), "--strict"]) == 1
    out = tmp_path / "rep.json"
    assert main(["qc", str(bad), "--out", str(out)]) == 0
    assert json.loads(out.read_text())["status"]["per_base_quality"] == "fail"


def test_native_fold_matches_numpy(rng):
    """bn_qc_fold (the one-pass native accumulator) must be bit-exact with
    the numpy bincount fold on ragged, lowercase, N-containing, and
    quality-extreme batches."""
    from bitnuc_tpu import native
    from bitnuc_tpu import qc as qcmod

    if not (native.available() or native.build()):
        pytest.skip("native lib not built")

    R, L = 64, 120
    ascii_arr = rng.choice(
        np.frombuffer(b"ACGTacgtNnX", np.uint8), size=(R, L)
    ).astype(np.uint8)
    quals = rng.integers(30, 120, size=(R, L)).astype(np.uint8)
    quals[0, :5] = 33  # phred 0 edge
    quals[1, :5] = 119  # above the _QMAX clip
    lens = rng.integers(0, L + 1, size=R).astype(np.int64)
    lens[2] = 0
    lens[3] = L

    a1, a2 = qcmod._Acc(), qcmod._Acc()
    a1.fold(ascii_arr, quals, lens, use_native=False)
    a2.fold(ascii_arr, quals, lens, use_native=True)
    np.testing.assert_array_equal(a1.base_by_cycle, a2.base_by_cycle)
    np.testing.assert_array_equal(a1.qual_by_cycle, a2.qual_by_cycle)
    np.testing.assert_array_equal(a1.mean_q_hist, a2.mean_q_hist)
    np.testing.assert_array_equal(a1.gc_hist, a2.gc_hist)
    assert (a1.reads, a1.bases, a1.min_len, a1.max_len) == (
        a2.reads, a2.bases, a2.min_len, a2.max_len
    )
