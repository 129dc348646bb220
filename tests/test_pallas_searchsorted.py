"""Exactness tests for the Pallas merge-path searchsorted kernel
(interpret mode — the TPU compile path is exercised by the kernel-map
builds and bench; Mosaic + vmap verified on-chip)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from apr_tpu.ops.hashing import INVALID_KEY  # noqa: E402
from apr_tpu.ops.pallas.searchsorted import searchsorted_left  # noqa: E402


def _check(sup, q, **kw):
    want = np.searchsorted(sup, q, side="left").astype(np.int32)
    got = np.asarray(searchsorted_left(
        jnp.asarray(sup), jnp.asarray(q), interpret=True, **kw))
    np.testing.assert_array_equal(got, want)


def test_matches_numpy_with_padding_and_holes(rng):
    s_valid, s_cap, g, c = 700, 1024, 5, 512
    sup = np.sort(rng.choice(100000, s_valid, replace=False)).astype(np.int32)
    sup = np.concatenate(
        [sup, np.full(s_cap - s_valid, INVALID_KEY, np.int32)])
    rows = []
    for _ in range(g):
        q = np.sort(rng.choice(110000, c, replace=False)).astype(np.int32)
        q[rng.random(c) < 0.1] = INVALID_KEY  # mid-row invalid holes
        q[-40:] = INVALID_KEY                 # padded tail
        rows.append(q)
    _check(sup, np.stack(rows))


def test_multi_slab_spans(rng):
    """A 128-query tile spanning far more than one window must loop slabs."""
    sup = np.arange(0, 131072, 2, dtype=np.int32)[:8192]
    # queries stride 512 apart -> each tile spans ~32k support positions
    q = np.arange(0, 128 * 512 * 2, 512, dtype=np.int32)[None, :128]
    q = np.broadcast_to(q, (2, 128)).copy()
    _check(sup, q, window=128)


def test_extremes_and_duplicates(rng):
    sup = np.sort(rng.integers(100, 200, 512).astype(np.int32))  # many dups
    q = np.sort(rng.integers(0, 300, 256).astype(np.int32))[None, :]
    _check(sup, q.copy())
    # all queries below / above every support
    _check(sup, np.zeros((1, 128), np.int32))
    _check(sup, np.full((1, 128), 250, np.int32))


def test_empty_support():
    sup = np.full(128, INVALID_KEY, np.int32)
    q = np.arange(128, dtype=np.int32)[None, :]
    _check(sup, q.copy())
