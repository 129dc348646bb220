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


def test_chamfer_pallas_value_and_grad_parity(rng):
    """Pallas chamfer == exact chamfer in value AND gradient (interpret)."""
    import jax

    from apr_tpu.ops.chamfer import chamfer_distance
    from apr_tpu.ops.pallas.distance import chamfer_distance_pallas

    a = rng.uniform(-20, 20, (300, 3)).astype(np.float32)
    b = rng.uniform(-20, 20, (500, 3)).astype(np.float32)
    am = np.ones(300, bool); am[250:] = False
    bm = np.ones(500, bool); bm[420:] = False
    args = (jnp.asarray(a), jnp.asarray(b), jnp.asarray(am), jnp.asarray(bm))

    v_ref, (ga_ref, gb_ref) = jax.value_and_grad(
        chamfer_distance, argnums=(0, 1))(*args)
    v_pal, (ga_pal, gb_pal) = jax.value_and_grad(
        chamfer_distance_pallas, argnums=(0, 1))(*args)

    np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ga_pal), np.asarray(ga_ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb_pal), np.asarray(gb_ref),
                               rtol=1e-4, atol=1e-6)


def test_chamfer_pallas_vmap(rng):
    """vmapped pallas chamfer (the train-step shape) matches per-item calls."""
    import jax

    from apr_tpu.ops.pallas.distance import chamfer_distance_pallas

    a = rng.uniform(-5, 5, (2, 200, 3)).astype(np.float32)
    b = rng.uniform(-5, 5, (2, 260, 3)).astype(np.float32)
    am = np.ones((2, 200), bool)
    bm = np.ones((2, 260), bool)
    batched = jax.vmap(chamfer_distance_pallas)(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(am), jnp.asarray(bm))
    single = [chamfer_distance_pallas(jnp.asarray(a[i]), jnp.asarray(b[i]))
              for i in range(2)]
    np.testing.assert_allclose(np.asarray(batched),
                               np.asarray(jnp.stack(single)), rtol=1e-5)
