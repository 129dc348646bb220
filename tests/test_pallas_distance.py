"""Pallas NN-min kernel vs the XLA reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from apr_tpu.ops.chamfer import nn_distances
from apr_tpu.ops.pallas.distance import nn_min_pallas


def test_nn_min_pallas_matches_xla(rng):
    q = rng.uniform(-50, 50, (700, 3)).astype(np.float32)
    s = rng.uniform(-50, 50, (1500, 3)).astype(np.float32)
    d2p, idxp = nn_min_pallas(jnp.asarray(q), jnp.asarray(s),
                              tq=256, ts=512, interpret=True)
    d2x, idxx = nn_distances(jnp.asarray(q), jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(d2p), np.asarray(d2x), rtol=1e-5,
                               atol=1e-5)
    # argmin may differ on exact ties; distances at chosen indices must match
    chosen = ((q - s[np.asarray(idxp)]) ** 2).sum(-1)
    np.testing.assert_allclose(chosen, np.asarray(d2x), rtol=1e-5, atol=1e-5)


def test_nn_min_pallas_masked(rng):
    q = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    s = rng.uniform(-1, 1, (300, 3)).astype(np.float32)
    mask = np.zeros(300, bool)
    mask[:50] = True
    d2p, idxp = nn_min_pallas(jnp.asarray(q), jnp.asarray(s),
                              jnp.asarray(mask), tq=128, ts=128,
                              interpret=True)
    assert (np.asarray(idxp) < 50).all()
    ref = ((q[:, None, :] - s[None, :50, :]) ** 2).sum(-1).min(1)
    np.testing.assert_allclose(np.asarray(d2p), ref, rtol=1e-5, atol=1e-6)


def test_nn_min_pallas_all_masked(rng):
    q = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
    s = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
    d2p, idxp = nn_min_pallas(jnp.asarray(q), jnp.asarray(s),
                              jnp.zeros(64, bool), tq=64, ts=64,
                              interpret=True)
    assert np.isinf(np.asarray(d2p)).all()
    assert (np.asarray(idxp) == 64).all()
