import jax
import jax.numpy as jnp
import numpy as np

from apr_tpu.data.synthetic import synthetic_lidar_frame
from apr_tpu.ops.chamfer import chamfer_distance, nn_distances
from apr_tpu.ops.chamfer_grid import chamfer_distance_grid, grid_nn_distances


def test_grid_nn_matches_exact_on_lidar(rng):
    """Voxel-dedup'd supports + cell = 4 * voxel: a cell holds at most 4^3
    members, so cap 64 never truncates and every NN within one cell is exact
    (the production configuration of the fast Chamfer path)."""
    from apr_tpu.ops.voxelize import voxelize

    voxel = 0.3
    a = synthetic_lidar_frame(0, n_points=4000, extent=40.0)
    b_raw = synthetic_lidar_frame(1, n_points=6000, extent=40.0)
    grid = voxelize(jnp.asarray(b_raw), voxel, capacity=8192)
    b = np.asarray(grid.barycenter)[np.asarray(grid.mask)]

    cell = 4 * voxel
    d2g, idxg = grid_nn_distances(
        jnp.asarray(a), jnp.asarray(b), cell_size=cell, bucket_cap=64
    )
    d2x, _ = nn_distances(jnp.asarray(a), jnp.asarray(b))
    d2g, d2x = np.asarray(d2g), np.asarray(d2x)
    resolved = d2x < cell ** 2  # true NN within one cell -> exact guarantee
    assert resolved.mean() > 0.4  # two distinct scenes partially overlap
    np.testing.assert_allclose(d2g[resolved], d2x[resolved], rtol=1e-5,
                               atol=1e-6)
    # wherever the grid found a candidate, it never reports below the truth;
    # unresolved rows report exactly the documented clamp (2 * cell)^2
    fallback = (2 * cell) ** 2
    found = d2g < fallback - 1e-6
    assert (d2g[found] >= d2x[found] - 1e-6).all()
    assert np.allclose(d2g[~found], fallback)


def test_grid_nn_bucket_truncation_safe(rng):
    """Small cap can truncate dense cells but never produce a distance
    SMALLER than the true minimum."""
    a = rng.uniform(-2, 2, (500, 3)).astype(np.float32)
    b = rng.uniform(-2, 2, (3000, 3)).astype(np.float32)
    d2g, _ = grid_nn_distances(jnp.asarray(a), jnp.asarray(b),
                               cell_size=1.0, bucket_cap=4)
    d2x, _ = nn_distances(jnp.asarray(a), jnp.asarray(b))
    assert (np.asarray(d2g) >= np.asarray(d2x) - 1e-6).all()


def test_grid_chamfer_close_to_exact(rng):
    a = synthetic_lidar_frame(2, n_points=3000, extent=30.0)
    b = a + rng.normal(0, 0.05, a.shape).astype(np.float32)
    cd_g = float(chamfer_distance_grid(jnp.asarray(a), jnp.asarray(b),
                                       cell_size=1.0, bucket_cap=64))
    cd_x = float(chamfer_distance(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(cd_g, cd_x, rtol=1e-3)


def test_grid_chamfer_masked(rng):
    a = synthetic_lidar_frame(3, n_points=1000, extent=20.0)
    pad = np.zeros((1500, 3), np.float32)
    pad[: len(a)] = a
    mask = np.zeros(1500, bool)
    mask[: len(a)] = True
    b = a + 0.01
    padb = np.zeros((1200, 3), np.float32)
    padb[: len(b)] = b
    maskb = np.zeros(1200, bool)
    maskb[: len(b)] = True
    cd = float(chamfer_distance_grid(
        jnp.asarray(pad), jnp.asarray(padb),
        jnp.asarray(mask), jnp.asarray(maskb), cell_size=1.0, bucket_cap=64,
    ))
    cd_ref = float(chamfer_distance(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(cd, cd_ref, rtol=1e-3)


def test_grid_chamfer_gradients_match_exact(rng):
    a = jnp.asarray(synthetic_lidar_frame(4, n_points=800, extent=15.0))
    b = a + jnp.asarray(rng.normal(0, 0.05, a.shape).astype(np.float32))
    ga_g, gb_g = jax.grad(
        lambda x, y: chamfer_distance_grid(x, y, cell_size=1.0,
                                           bucket_cap=64),
        argnums=(0, 1),
    )(a, b)
    ga_x, gb_x = jax.grad(chamfer_distance, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(ga_g), np.asarray(ga_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb_g), np.asarray(gb_x), atol=1e-5)
