"""Native C++ host library vs the numpy oracle (the analog of the reference's
simd/nosimd CI equivalence matrix, .github/workflows/ci.yml:29-51)."""

import numpy as np
import pytest

from bitnuc_tpu import native, oracle
from bitnuc_tpu.errors import InvalidBase, InvalidLength, SequenceTooLong
from conftest import random_seq

pytestmark = pytest.mark.skipif(
    not (native.available() or native.build()), reason="native lib not built"
)


@pytest.mark.parametrize("n", [1, 7, 8, 9, 31, 32, 33, 63, 64, 65, 100, 1000])
def test_encode_decode_matches_oracle(rng, n):
    s = random_seq(rng, n)
    e = native.encode(s)
    np.testing.assert_array_equal(e, oracle.encode(s))
    assert native.decode(e, n) == s.upper()


def test_as_2bit_golden():
    assert native.as_2bit(b"ACGT") == 0b11100100
    assert native.as_2bit(b"ACTGACTGACTGACTG") == 0b10110100101101001011010010110100
    assert native.from_2bit(71620941647064936, 28) == b"AGGCTTGAGGCCCATTCTCTGATCGTTT"


def test_errors():
    with pytest.raises(InvalidBase) as e:
        native.encode(b"ACGN")
    assert e.value.base == ord("N")
    with pytest.raises(InvalidBase):
        native.encode(b"A" * 40 + b"X")  # bad byte inside SWAR fast path
    with pytest.raises(SequenceTooLong):
        native.as_2bit(b"A" * 33)
    with pytest.raises(InvalidLength):
        native.from_2bit(0, 33)
    with pytest.raises(InvalidLength):
        native.hdist(np.zeros(1, np.uint64), np.zeros(1, np.uint64), 64)


@pytest.mark.parametrize("n", [1, 31, 32, 33, 100, 256])
def test_hdist_matches_oracle(rng, n):
    s1, s2 = random_seq(rng, n).upper(), random_seq(rng, n).upper()
    e1, e2 = oracle.encode(s1), oracle.encode(s2)
    assert native.hdist(e1, e2, n) == oracle.hdist(e1, e2, n)
    assert native.hdist_scalar(int(e1[0]), int(e2[0]), min(n, 32)) == \
        oracle.hdist_scalar(int(e1[0]), int(e2[0]), min(n, 32))


def test_split_matches_oracle(rng):
    for n in [1, 33, 64, 100]:
        s = random_seq(rng, n).upper()
        e = oracle.encode(s)
        for idx in range(0, n + 1, 3):
            ln, rn = native.split_packed(e, n, idx)
            lo, ro = oracle.split_packed(e, n, idx)
            np.testing.assert_array_equal(ln, lo)
            np.testing.assert_array_equal(rn, ro)


def test_isa_guard_falls_back_on_foreign_host(tmp_path, monkeypatch):
    """A .so built on a host with different CPU features must NOT load
    (-march=native binaries SIGILL on lesser hosts when the container
    migrates); available() flips to False with one warning and callers
    take the oracle path. Mirrors the reference's per-call feature
    re-check (src/utils/packing/mod.rs:81-110)."""
    import os

    assert native.available()  # precondition: real lib loads on this host

    # simulate a migration: the recorded build tag no longer matches
    monkeypatch.setattr(native, "_TAG_PATH", str(tmp_path / "fake.cputag"))
    (tmp_path / "fake.cputag").write_text("deadbeef0000")
    monkeypatch.setattr(native, "_tried", False)
    monkeypatch.setattr(native, "_lib", None)
    with pytest.warns(RuntimeWarning, match="different CPU features"):
        assert not native.available()
    # count_kmers degrades to the oracle instead of calling into the .so
    assert native.count_kmers(b"ACGTACGT", 2) == oracle.count_kmers(b"ACGTACGT", 2)

    # matching tag (the normal case) loads fine
    from bitnuc_tpu.config import host_cpu_tag

    (tmp_path / "fake.cputag").write_text(host_cpu_tag())
    monkeypatch.setattr(native, "_tried", False)
    assert native.available()

    # missing / empty tag file (foreign build system): accepted
    os.remove(tmp_path / "fake.cputag")
    monkeypatch.setattr(native, "_tried", False)
    monkeypatch.setattr(native, "_lib", None)
    assert native.available()


def test_build_stamps_cpu_tag():
    """make (or native.build) records the build host's tag next to the .so."""
    import os

    from bitnuc_tpu.config import host_cpu_tag

    if not os.path.exists(native._TAG_PATH):
        assert native.build()
    with open(native._TAG_PATH) as f:
        assert f.read().strip() == host_cpu_tag()


def test_encode_batch_staging(rng):
    B, L = 8, 100
    seqs = [random_seq(rng, L).upper() for _ in range(B)]
    arr = np.stack([np.frombuffer(s, np.uint8) for s in seqs])
    w = native.encode_batch(arr, 4)
    for i, s in enumerate(seqs):
        np.testing.assert_array_equal(w[i], oracle.encode(s))
