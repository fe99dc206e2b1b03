"""The driver's entry points must always compile and run (CPU mesh)."""

import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

sys.path.insert(0, ".")


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out["kmer_hist"].shape == (4**8,)
    assert int(np.asarray(out["first_bad"]).max()) == -1
    d = np.asarray(out["top_dists"])
    assert (d[:-1] <= d[1:]).all()


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    g.dryrun_multichip(8)


def test_dryrun_multichip_2():
    import __graft_entry__ as g

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    g.dryrun_multichip(2)
