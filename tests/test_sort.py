"""Bitonic network correctness vs numpy (apr_tpu/ops/sort.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from apr_tpu.ops.hashing import INVALID_KEY
from apr_tpu.ops.sort import bitonic_argsort, bitonic_sort


def test_bitonic_sort_matches_numpy():
    rng = np.random.default_rng(0)
    for n in (8, 256, 4096):
        x = rng.integers(0, 1 << 30, size=n).astype(np.int32)
        s, _ = jax.jit(bitonic_sort)(jnp.asarray(x))
        np.testing.assert_array_equal(np.asarray(s), np.sort(x))


def test_bitonic_sort_with_invalid_padding():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 1 << 30, size=1024).astype(np.int32)
    x[700:] = int(INVALID_KEY)  # padding sorts to the tail
    s, _ = jax.jit(bitonic_sort)(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(s), np.sort(x))
    assert np.all(np.asarray(s)[-324:] == int(INVALID_KEY))


def test_bitonic_argsort_permutation():
    rng = np.random.default_rng(2)
    x = rng.integers(0, 1 << 30, size=2048).astype(np.int32)
    s, o = jax.jit(bitonic_argsort)(jnp.asarray(x))
    o = np.asarray(o)
    assert sorted(o.tolist()) == list(range(2048))  # a true permutation
    np.testing.assert_array_equal(x[o], np.sort(x))
    np.testing.assert_array_equal(np.asarray(s), np.sort(x))


def test_bitonic_sort_batched_matches_per_row():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 1 << 30, size=(8, 512)).astype(np.int32)
    s, _ = jax.jit(bitonic_sort)(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(s), np.sort(x, axis=-1))


def test_bitonic_sort_duplicate_keys():
    rng = np.random.default_rng(4)
    x = rng.integers(0, 50, size=4096).astype(np.int32)  # heavy ties
    s, o = bitonic_argsort(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(s), np.sort(x))
    assert sorted(np.asarray(o).tolist()) == list(range(4096))
