"""Parity tests for the bitonic merge engine (ops/pallas/merge.py).

The engine must equal lax.sort(concat(a, b), num_keys) up to ties between
identical FULL key tuples — so tests compare (key..., payload...) row
multisets, and exact arrays where keys are unique. Pallas runs in
interpret mode on CPU (the simd/nosimd analog, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitnuc_tpu.ops.pallas.merge import merge_sorted

SENT = np.uint32(0xFFFFFFFF)


def _rows(arrs, n):
    return sorted(tuple(int(a[i]) for a in arrs) for i in range(n))


def _check(a_arrs, b_arrs, n_keys):
    got = merge_sorted(
        tuple(jnp.asarray(x) for x in a_arrs),
        tuple(jnp.asarray(x) for x in b_arrs),
        n_keys,
        interpret=True,
    )
    got = [np.asarray(g) for g in got]
    na, nb = len(a_arrs[0]), len(b_arrs[0])
    want = jax.lax.sort(
        tuple(
            jnp.concatenate([jnp.asarray(x), jnp.asarray(y)])
            for x, y in zip(a_arrs, b_arrs)
        ),
        num_keys=n_keys,
    )
    want = [np.asarray(w) for w in want]
    # sorted by key words
    keys = list(zip(*[g[: na + nb] for g in got[:n_keys]]))
    # pad rows carry all-ones keys: the first na+nb rows of the merge must
    # be the sorted concat UNLESS real all-ones keys tie with pad rows
    n_real_sent = int(
        np.sum(np.all([w == SENT for w in want[:n_keys]], axis=0))
    )
    if n_real_sent == 0:
        cut = na + nb
        assert _rows([g[:cut] for g in got], cut) == _rows(want, cut)
        for g, w in zip(got[:n_keys], want):
            assert np.array_equal(g[:cut], w[:cut])
    else:
        # compare ignoring rows whose full key is the sentinel
        mask_w = ~np.all([w == SENT for w in want[:n_keys]], axis=0)
        mask_g = ~np.all(
            [g[: na + nb] == SENT for g in got[:n_keys]], axis=0
        )
        gg = [g[: na + nb][mask_g] for g in got]
        ww = [w[mask_w] for w in want]
        assert _rows(gg, int(mask_g.sum())) == _rows(ww, int(mask_w.sum()))
    assert keys == sorted(keys)


def _sorted_list(rng, n, n_keys, hi=1 << 32, payloads=1):
    ks = [rng.integers(0, hi, size=n).astype(np.uint32) for _ in range(n_keys)]
    order = np.lexsort(tuple(reversed(ks)))
    out = [k[order] for k in ks]
    for _ in range(payloads):
        out.append(rng.integers(-100, 100, size=n).astype(np.int32))
    return out


@pytest.mark.parametrize("na,nb", [(5, 3), (100, 28), (700, 300)])
def test_merge_small_fallback(na, nb):
    rng = np.random.default_rng(na * 1000 + nb)
    _check(_sorted_list(rng, na, 1), _sorted_list(rng, nb, 1), 1)


@pytest.mark.parametrize(
    "na,nb", [(600, 424), (1024, 1024), (5000, 3000), (40000, 30000)]
)
def test_merge_single_key(na, nb):
    rng = np.random.default_rng(na + nb)
    _check(_sorted_list(rng, na, 1), _sorted_list(rng, nb, 1), 1)


def test_merge_beyond_one_block():
    # > TILE elements so the XLA outer stages run too
    rng = np.random.default_rng(7)
    _check(_sorted_list(rng, 70000, 1), _sorted_list(rng, 70000, 1), 1)


def test_merge_two_key_words():
    rng = np.random.default_rng(11)
    _check(
        _sorted_list(rng, 3000, 2, hi=4),  # many hi-word ties
        _sorted_list(rng, 2000, 2, hi=4),
        2,
    )


def test_merge_three_key_words():
    rng = np.random.default_rng(13)
    _check(
        _sorted_list(rng, 1500, 3, hi=3, payloads=2),
        _sorted_list(rng, 1700, 3, hi=3, payloads=2),
        3,
    )


def test_merge_heavy_duplicates():
    # massive cross-list key overlap: the regime setops/accumulator see
    rng = np.random.default_rng(17)
    _check(
        _sorted_list(rng, 4000, 1, hi=50),
        _sorted_list(rng, 4000, 1, hi=50),
        1,
    )


def test_merge_with_real_sentinels():
    # dead-sentinel convention: trailing all-ones keys in both inputs
    rng = np.random.default_rng(19)
    a = _sorted_list(rng, 2000, 1, hi=1 << 20)
    b = _sorted_list(rng, 1000, 1, hi=1 << 20)
    a[0][-50:] = SENT
    b[0][-30:] = SENT
    _check(a, b, 1)


def test_merge_empty_and_lopsided():
    rng = np.random.default_rng(23)
    _check(_sorted_list(rng, 0, 1), _sorted_list(rng, 3000, 1), 1)
    _check(_sorted_list(rng, 3000, 1), _sorted_list(rng, 1, 1), 1)


def test_merge_pad_values():
    rng = np.random.default_rng(29)
    a = _sorted_list(rng, 1000, 1)
    b = _sorted_list(rng, 500, 1)
    out = merge_sorted(
        tuple(jnp.asarray(x) for x in a),
        tuple(jnp.asarray(x) for x in b),
        1,
        pad_val=(1234,),  # outside the random payload range
        interpret=True,
    )
    k, p = np.asarray(out[0]), np.asarray(out[1])
    assert k.shape[0] == 2048
    pad_rows = p == 1234
    assert pad_rows.sum() == 2048 - 1500
    assert np.all(k[pad_rows] == SENT)
