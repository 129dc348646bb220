import jax.numpy as jnp
import numpy as np

from apr_tpu.ops import voxelize, voxel_down_sample, grid_subsample
from apr_tpu.ops.hashing import pack_coords, unpack_coords


def _np_voxel_map(points, voxel):
    coords = np.floor(points / voxel).astype(np.int64)
    keys = {}
    for i, c in enumerate(coords):
        keys.setdefault(tuple(c), []).append(i)
    return keys


def test_pack_unpack_roundtrip(rng):
    coords = rng.integers(-512, 512, size=(1000, 3)).astype(np.int32)
    keys = pack_coords(jnp.asarray(coords))
    back = unpack_coords(keys)
    np.testing.assert_array_equal(np.asarray(back), coords)
    # collision-free
    assert len(np.unique(np.asarray(keys))) == len(
        {tuple(c) for c in coords}
    )


def test_pack_preserves_lex_order(rng):
    coords = rng.integers(-512, 512, size=(500, 3)).astype(np.int32)
    keys = np.asarray(pack_coords(jnp.asarray(coords)))
    order_k = np.argsort(keys, kind="stable")
    order_c = np.lexsort((coords[:, 2], coords[:, 1], coords[:, 0]))
    np.testing.assert_array_equal(keys[order_k], keys[order_c])


def test_voxelize_matches_numpy(rng):
    pts = rng.uniform(-10, 10, size=(2000, 3)).astype(np.float32)
    voxel = 0.5
    ref = _np_voxel_map(pts, voxel)
    grid = voxelize(jnp.asarray(pts), voxel, capacity=4096)

    n_vox = int(grid.num_voxels)
    assert n_vox == len(ref)

    gmask = np.asarray(grid.mask)
    gcoords = np.asarray(grid.coords)[gmask]
    assert {tuple(c) for c in gcoords} == set(ref.keys())

    # counts + barycenters per voxel
    counts = np.asarray(grid.counts)[gmask]
    bary = np.asarray(grid.barycenter)[gmask]
    rep = np.asarray(grid.rep)[gmask]
    for c, cnt, b, r in zip(gcoords, counts, bary, rep):
        members = ref[tuple(c)]
        assert cnt == len(members)
        np.testing.assert_allclose(b, pts[members].mean(axis=0), atol=1e-5)
        assert r == min(members)

    # point -> voxel inverse is consistent
    pv = np.asarray(grid.point_voxel)
    assert (pv < grid.capacity).all()
    np.testing.assert_array_equal(
        np.floor(pts / voxel).astype(np.int32), np.asarray(grid.coords)[pv]
    )


def test_voxelize_respects_mask(rng):
    pts = rng.uniform(-5, 5, size=(300, 3)).astype(np.float32)
    mask = np.zeros(300, dtype=bool)
    mask[:100] = True
    grid = voxelize(jnp.asarray(pts), 0.4, capacity=512, mask=jnp.asarray(mask))
    ref = _np_voxel_map(pts[:100], 0.4)
    assert int(grid.num_voxels) == len(ref)
    # masked points map to sentinel
    assert (np.asarray(grid.point_voxel)[100:] == 512).all()


def test_voxelize_overflow_graceful(rng):
    pts = rng.uniform(-50, 50, size=(1000, 3)).astype(np.float32)
    grid = voxelize(jnp.asarray(pts), 0.1, capacity=64)  # far too small
    assert int(grid.num_voxels) == 64
    pv = np.asarray(grid.point_voxel)
    kept = pv < 64
    # kept points are mapped to correct coords; dropped map to sentinel
    np.testing.assert_array_equal(
        np.floor(pts[kept] / 0.1).astype(np.int32),
        np.asarray(grid.coords)[pv[kept]],
    )


def test_voxel_down_sample_barycenter(rng):
    pts = rng.uniform(-3, 3, size=(500, 3)).astype(np.float32)
    out, mask = voxel_down_sample(jnp.asarray(pts), 0.75, capacity=1024)
    ref = _np_voxel_map(pts, 0.75)
    got = {tuple(np.round(p, 4)) for p in np.asarray(out)[np.asarray(mask)]}
    want = {
        tuple(np.round(pts[m].mean(axis=0), 4)) for m in ref.values()
    }
    assert got == want


def test_grid_subsample_features(rng):
    pts = rng.uniform(-3, 3, size=(400, 3)).astype(np.float32)
    feats = rng.normal(size=(400, 8)).astype(np.float32)
    _, fmean, mask = grid_subsample(
        jnp.asarray(pts), 1.0, capacity=256, features=jnp.asarray(feats)
    )
    grid = voxelize(jnp.asarray(pts), 1.0, capacity=256)
    ref = _np_voxel_map(pts, 1.0)
    gmask = np.asarray(mask)
    for c, f in zip(np.asarray(grid.coords)[gmask], np.asarray(fmean)[gmask]):
        np.testing.assert_allclose(
            f, feats[ref[tuple(c)]].mean(axis=0), atol=1e-5
        )
