"""Windowed Chamfer (ops.chamfer_window) vs exact (ops.chamfer)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apr_tpu.ops.chamfer import chamfer_distance, nn_distances
from apr_tpu.ops.chamfer_window import (
    chamfer_distance_window,
    windowed_nn_distances,
)


def _lidarish(rng, n, extent=40.0):
    """Clustered LiDAR-ish points: dense ground ring + sparse structure."""
    ground = rng.uniform(-extent, extent, (n // 2, 3)).astype(np.float32)
    ground[:, 2] = rng.normal(0, 0.2, n // 2)
    walls = rng.uniform(-extent, extent, (n - n // 2, 3)).astype(np.float32)
    walls[:, 2] = np.abs(rng.normal(2.0, 1.5, n - n // 2))
    return np.concatenate([ground, walls]).astype(np.float32)


def test_windowed_nn_matches_exact(rng):
    q = _lidarish(rng, 3000)
    s = _lidarish(rng, 5000) + rng.normal(0, 0.3, (5000, 3)).astype(np.float32)
    d2w, idxw = windowed_nn_distances(
        jnp.asarray(q), jnp.asarray(s), cell_size=2.0, tile=256, window=2048)
    d2x, _ = nn_distances(jnp.asarray(q), jnp.asarray(s))
    d2w, d2x = np.asarray(d2w), np.asarray(d2x)
    # exact wherever the true NN is within the window's guarantee
    covered = d2x < 2.0 ** 2
    assert covered.mean() > 0.95
    np.testing.assert_allclose(d2w[covered], d2x[covered], rtol=1e-5,
                               atol=1e-6)
    # chosen indices are real neighbors at the reported distance
    chosen = ((q - s[np.clip(np.asarray(idxw), 0, 4999)]) ** 2).sum(-1)
    resolved = np.asarray(idxw) < 5000
    np.testing.assert_allclose(chosen[resolved], d2w[resolved], rtol=1e-5,
                               atol=1e-6)


def test_windowed_nn_masks(rng):
    q = rng.uniform(-5, 5, (500, 3)).astype(np.float32)
    s = rng.uniform(-5, 5, (800, 3)).astype(np.float32)
    qm = np.zeros(500, bool); qm[:300] = True
    sm = np.zeros(800, bool); sm[:600] = True
    d2, idx = windowed_nn_distances(
        jnp.asarray(q), jnp.asarray(s), jnp.asarray(qm), jnp.asarray(sm),
        cell_size=2.0, tile=128, window=1024)
    idx = np.asarray(idx)
    assert (idx[np.asarray(qm) & (idx < 800)] < 600).all()
    assert (idx[~np.asarray(qm)] == 800).all()
    d2x, _ = nn_distances(jnp.asarray(q[:300]), jnp.asarray(s[:600]))
    covered = np.asarray(d2x) < 2.0 ** 2
    np.testing.assert_allclose(np.asarray(d2)[:300][covered],
                               np.asarray(d2x)[covered], rtol=1e-5, atol=1e-6)


def test_chamfer_window_value_and_grad_parity(rng):
    a = _lidarish(rng, 2000, extent=20.0)
    b = a + rng.normal(0, 0.1, a.shape).astype(np.float32)
    args = (jnp.asarray(a), jnp.asarray(b))

    v_ref, (ga_r, gb_r) = jax.value_and_grad(
        chamfer_distance, argnums=(0, 1))(*args)
    f = lambda x, y: chamfer_distance_window(x, y, cell_size=1.2, tile=256,
                                             window=2048)
    v_win, (ga_w, gb_w) = jax.value_and_grad(f, argnums=(0, 1))(*args)

    np.testing.assert_allclose(float(v_win), float(v_ref), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ga_w), np.asarray(ga_r),
                               rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb_w), np.asarray(gb_r),
                               rtol=1e-3, atol=1e-6)


@pytest.mark.slow
def test_chamfer_window_stray_queries_clamped(rng):
    """Strays beyond any support slab get the clamp, zero gradient."""
    a = rng.uniform(-5, 5, (256, 3)).astype(np.float32)
    a[:8] += 500.0  # strays
    b = rng.uniform(-5, 5, (512, 3)).astype(np.float32)
    f = lambda x: chamfer_distance_window(x, jnp.asarray(b), cell_size=1.0,
                                          tile=64, window=512)
    g = jax.grad(f)(jnp.asarray(a))
    assert np.abs(np.asarray(g)[:8]).max() == 0.0
    assert np.abs(np.asarray(g)[8:]).max() > 0.0


@pytest.mark.slow
def test_chamfer_window_under_vmap_and_grad(rng):
    """The train-step embedding: vmap over batch + grad, finite & close."""
    a = np.stack([_lidarish(rng, 1000, 15.0) for _ in range(3)])
    b = a + rng.normal(0, 0.05, a.shape).astype(np.float32)
    am = np.ones((3, 1000), bool)
    bm = np.ones((3, 1000), bool)

    def loss(a):
        f = lambda x, y, xm, ym: chamfer_distance_window(
            x, y, xm, ym, cell_size=1.2, tile=256, window=1024)
        return jnp.sum(jax.vmap(f)(a, jnp.asarray(b), jnp.asarray(am),
                                   jnp.asarray(bm)))

    def loss_ref(a):
        return jnp.sum(jax.vmap(chamfer_distance)(
            a, jnp.asarray(b), jnp.asarray(am), jnp.asarray(bm)))

    v, g = jax.value_and_grad(loss)(jnp.asarray(a))
    v_r, g_r = jax.value_and_grad(loss_ref)(jnp.asarray(a))
    np.testing.assert_allclose(float(v), float(v_r), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_r), rtol=1e-3,
                               atol=1e-6)


def test_clamp_fraction_telemetry_matches_numpy(rng):
    """chamfer_distance_window_stats' clamp_frac == the exact-NN count of
    queries whose true nearest neighbor lies beyond the 2*cell clamp."""
    from apr_tpu.ops.chamfer_window import chamfer_distance_window_stats

    cell = 2.0
    a = _lidarish(rng, 1500)
    b = _lidarish(rng, 2000) + rng.normal(0, 0.3, (2000, 3)).astype(np.float32)
    # plant unambiguous strays far outside the other cloud
    a[:40] += 500.0
    b[:25] -= 500.0

    val, frac = chamfer_distance_window_stats(
        jnp.asarray(a), jnp.asarray(b), cell_size=cell, tile=256, window=2048)
    assert np.isfinite(float(val))

    d2_ab, _ = nn_distances(jnp.asarray(a), jnp.asarray(b))
    d2_ba, _ = nn_distances(jnp.asarray(b), jnp.asarray(a))
    want = (np.sum(np.asarray(d2_ab) >= (2 * cell) ** 2)
            + np.sum(np.asarray(d2_ba) >= (2 * cell) ** 2)) / (1500 + 2000)
    # window truncation can clamp a handful of extra borderline queries
    # (lower bound allows f32 rounding of the fraction itself)
    got = float(frac)
    assert want - 1e-6 <= got <= want + 0.01, (got, want)
    assert got >= 40 / 3500  # at least the planted strays


def test_clamp_fraction_low_at_realistic_density(rng):
    """Distant-ring LiDAR density (sparse at range): the default 4-voxel
    cell keeps the clamp a rare-outlier event (< 5%), bounding the loss
    bias the clamp introduces (round-2 verdict weak-item 6)."""
    from apr_tpu.ops.chamfer_window import chamfer_distance_window_stats

    def rings(seed, n):
        r = np.random.default_rng(seed)
        # ranges follow LiDAR geometry: area element grows with range, so
        # sample radius ~ sqrt for near-uniform ground density, then thin
        # the far field to emulate beam divergence sparsity
        radius = 60.0 * np.sqrt(r.uniform(0.05, 1.0, n))
        theta = r.uniform(0, 2 * np.pi, n)
        keep = r.uniform(size=n) < np.clip(30.0 / radius, 0.15, 1.0)
        radius, theta = radius[keep], theta[keep]
        pts = np.stack([
            radius * np.cos(theta), radius * np.sin(theta),
            r.normal(0, 0.3, radius.shape[0]),
        ], 1).astype(np.float32)
        return pts

    # NPR-style recon vs APC: same scene geometry, different sampling +
    # generator noise (0.5 m), voxel 0.3 -> default cell 1.2, clamp 2.4 m
    apc = rings(0, 40000)
    recon = rings(1, 20000)
    recon += rng.normal(0, 0.5, recon.shape).astype(np.float32)

    _, frac = chamfer_distance_window_stats(
        jnp.asarray(recon), jnp.asarray(apc),
        cell_size=1.2, tile=512, window=4096)
    assert float(frac) < 0.05, float(frac)
