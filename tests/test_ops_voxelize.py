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


def test_voxelize_pyramid_matches_per_level_voxelize(rng):
    """voxelize_pyramid (one Morton argsort + boundary scans) must match the
    per-level voxelize outputs up to voxel ORDERING (morton vs x-major)."""
    from apr_tpu.ops.hashing import pack_coords
    from apr_tpu.ops.voxelize import voxelize, voxelize_pyramid

    # capacities exceed the voxel counts: overflow drop-order legitimately
    # differs between the two implementations (morton- vs pack-largest)
    n, caps = 700, (1024, 512, 256, 128)
    pts = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    mask = rng.uniform(size=n) < 0.9
    base = 0.8

    grids = voxelize_pyramid(jnp.asarray(pts), base, caps, jnp.asarray(mask))
    for l, cap in enumerate(caps):
        ref = voxelize(jnp.asarray(pts), base * 2 ** l, cap, jnp.asarray(mask))
        got = grids[l]
        nv = int(np.asarray(ref.mask).sum())
        assert int(np.asarray(got.mask).sum()) == nv
        # align the two orderings via the x-major packed key of each voxel
        gk = np.asarray(pack_coords(got.coords))[:nv]
        rk = np.asarray(ref.keys)[:nv]
        gperm, rperm = np.argsort(gk), np.argsort(rk)
        np.testing.assert_array_equal(gk[gperm], rk[rperm])
        np.testing.assert_array_equal(
            np.asarray(got.coords)[:nv][gperm], np.asarray(ref.coords)[:nv][rperm])
        np.testing.assert_array_equal(
            np.asarray(got.counts)[:nv][gperm], np.asarray(ref.counts)[:nv][rperm])
        np.testing.assert_array_equal(
            np.asarray(got.rep)[:nv][gperm], np.asarray(ref.rep)[:nv][rperm])
        np.testing.assert_allclose(
            np.asarray(got.barycenter)[:nv][gperm],
            np.asarray(ref.barycenter)[:nv][rperm], rtol=1e-6, atol=1e-6)
        # point_voxel agrees through the alignment (sentinel stays sentinel)
        gmap = np.full(cap + 1, cap)
        gmap[gperm] = np.arange(nv)
        rmap = np.full(cap + 1, cap)
        rmap[rperm] = np.arange(nv)
        np.testing.assert_array_equal(
            gmap[np.asarray(got.point_voxel)], rmap[np.asarray(ref.point_voxel)])


def test_unique_of_sorted_matches_jnp_unique(rng):
    from apr_tpu.ops.hashing import INVALID_KEY
    from apr_tpu.ops.voxelize import unique_of_sorted

    for cap, n_val in [(16, 40), (64, 40), (8, 0)]:
        keys = np.sort(rng.integers(0, 30, n_val).astype(np.int32))
        keys = np.concatenate([keys, np.full(13, INVALID_KEY, np.int32)])
        uniq, seg = unique_of_sorted(jnp.asarray(keys), cap)
        want = np.asarray(jnp.unique(jnp.asarray(keys), size=cap,
                                     fill_value=INVALID_KEY))
        np.testing.assert_array_equal(np.asarray(uniq), want)
        # seg maps each valid row to its key's slot (or the overflow sentinel)
        seg = np.asarray(seg)
        for i, k in enumerate(keys):
            if k == INVALID_KEY:
                assert seg[i] == cap
            elif seg[i] < cap:
                assert want[seg[i]] == k


def test_morton_pack_roundtrip_and_shift_identity(rng):
    from apr_tpu.ops.hashing import morton_pack, morton_unpack

    c = rng.integers(-512, 512, (2000, 3)).astype(np.int32)
    k = morton_pack(jnp.asarray(c))
    k_np = np.asarray(k)
    assert (k_np >= 0).all() and (k_np < 2 ** 30).all()
    np.testing.assert_array_equal(np.asarray(morton_unpack(k)), c)
    # collision-free: distinct coords -> distinct keys
    assert len(np.unique(k_np)) == len(np.unique(c, axis=0))
    # the pyramid identity: morton(c) >> 3 == morton(c >> 1), decoded at l=1
    np.testing.assert_array_equal(
        np.asarray(morton_unpack(k >> 3, level=1)), c >> 1)


def test_voxelize_lean_matches_full(rng):
    from apr_tpu.ops.voxelize import voxelize_lean

    pts = rng.uniform(-8, 8, (500, 3)).astype(np.float32)
    mask = rng.random(500) < 0.8
    for cap in (256, 64):  # roomy and overflowing
        full = voxelize(jnp.asarray(pts), 1.0, cap, jnp.asarray(mask))
        coords, keys, vmask, rep = voxelize_lean(
            jnp.asarray(pts), 1.0, cap, jnp.asarray(mask))
        np.testing.assert_array_equal(np.asarray(keys), np.asarray(full.keys))
        np.testing.assert_array_equal(np.asarray(vmask), np.asarray(full.mask))
        np.testing.assert_array_equal(np.asarray(coords),
                                      np.asarray(full.coords))
        np.testing.assert_array_equal(np.asarray(rep), np.asarray(full.rep))


def test_dedup_points_matches_voxelize_rep_set(rng):
    from apr_tpu.ops.voxelize import dedup_points

    pts = rng.uniform(-8, 8, (400, 3)).astype(np.float32)
    mask = rng.random(400) < 0.9
    out, keep = dedup_points(jnp.asarray(pts), 1.0, jnp.asarray(mask))
    out, keep = np.asarray(out), np.asarray(keep)
    # reference: full voxelize representative gather (capacity == N)
    g = voxelize(jnp.asarray(pts), 1.0, 400, jnp.asarray(mask))
    rep = np.asarray(g.rep)
    want = pts[rep[np.asarray(g.mask)]]
    got = out[keep]
    assert got.shape == want.shape
    # same SET of representative points (both pick the lowest-index member
    # per voxel; output ordering differs: holes-in-place vs compacted)
    got_sorted = got[np.lexsort(got.T)]
    want_sorted = want[np.lexsort(want.T)]
    np.testing.assert_array_equal(got_sorted, want_sorted)
    # masked-out rows are zeroed
    assert np.all(out[~keep] == 0.0)
