"""Run every docstring example in the package as a test.

The reference's ///-doc examples compile and execute under `cargo test`
(/root/reference/src/lib.rs:15-35, src/utils/packing/mod.rs:40-79) — they are
the API contract spec. This is the Python analog: every module in bitnuc_tpu
is imported (so import-time breakage fails loudly) and its `>>>` examples are
executed with doctest. Fails if any module carries a broken example.
"""

import doctest
import importlib
import pkgutil

import pytest

import bitnuc_tpu


def _iter_modules():
    yield "bitnuc_tpu"
    for m in pkgutil.walk_packages(bitnuc_tpu.__path__, prefix="bitnuc_tpu."):
        if "libbitnuc" in m.name:
            continue  # the C shared library is not a Python module
        yield m.name


MODULES = sorted(set(_iter_modules()))


def test_module_inventory_nonempty():
    # guard against the walker silently finding nothing
    assert "bitnuc_tpu.api" in MODULES and "bitnuc_tpu.ops.kmer" in MODULES
    assert len(MODULES) > 15


@pytest.mark.parametrize("name", MODULES)
def test_doctests(name):
    mod = importlib.import_module(name)
    res = doctest.testmod(mod, verbose=False)
    assert res.failed == 0, f"{res.failed} doctest failure(s) in {name}"
