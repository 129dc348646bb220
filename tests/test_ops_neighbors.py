import jax.numpy as jnp
import numpy as np

from apr_tpu.ops import knn, radius_neighbors, nn_distances, chamfer_distance


def _brute_knn(q, s, k):
    d2 = ((q[:, None, :] - s[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    return idx, np.take_along_axis(d2, idx, axis=1)


def test_knn_matches_bruteforce(rng):
    q = rng.uniform(-5, 5, size=(777, 3)).astype(np.float32)
    s = rng.uniform(-5, 5, size=(1234, 3)).astype(np.float32)
    idx, d2 = knn(jnp.asarray(q), jnp.asarray(s), k=8, chunk=256)
    ridx, rd2 = _brute_knn(q, s, 8)
    np.testing.assert_allclose(np.asarray(d2), rd2, atol=1e-3)
    # indices can differ on exact ties; check distances of chosen points
    chosen = ((q[:, None, :] - s[np.asarray(idx)]) ** 2).sum(-1)
    np.testing.assert_allclose(chosen, rd2, atol=1e-3)


def test_knn_masks_and_sentinel(rng):
    q = rng.uniform(-1, 1, size=(64, 3)).astype(np.float32)
    s = rng.uniform(-1, 1, size=(32, 3)).astype(np.float32)
    q_mask = np.zeros(64, bool)
    q_mask[:10] = True
    s_mask = np.zeros(32, bool)
    s_mask[:5] = True
    idx, d2 = knn(
        jnp.asarray(q), jnp.asarray(s), k=8,
        q_mask=jnp.asarray(q_mask), s_mask=jnp.asarray(s_mask),
    )
    idx = np.asarray(idx)
    d2 = np.asarray(d2)
    # masked queries -> all sentinel
    assert (idx[10:] == 32).all()
    # only 5 valid supports -> last 3 slots sentinel for valid queries
    assert (idx[:10, 5:] == 32).all()
    assert (idx[:10, :5] < 5).all()
    assert np.isinf(d2[:10, 5:]).all()


def test_radius_neighbors_sorted_truncated(rng):
    q = rng.uniform(-2, 2, size=(100, 3)).astype(np.float32)
    s = rng.uniform(-2, 2, size=(500, 3)).astype(np.float32)
    r, cap = 0.7, 12
    idx = np.asarray(radius_neighbors(jnp.asarray(q), jnp.asarray(s), r, cap))
    d2 = ((q[:, None, :] - s[None, :, :]) ** 2).sum(-1)
    for i in range(100):
        within = np.sort(d2[i][d2[i] <= r * r])[:cap]
        got = idx[i][idx[i] < 500]
        # distance-sorted: closest min(cap, count) neighbors
        np.testing.assert_allclose(
            np.sort(d2[i, got]), within, atol=1e-4
        )
        assert (idx[i][len(got):] == 500).all()


def test_nn_distances_matches_bruteforce(rng):
    q = rng.uniform(-4, 4, size=(300, 3)).astype(np.float32)
    s = rng.uniform(-4, 4, size=(2500, 3)).astype(np.float32)
    d2, idx = nn_distances(jnp.asarray(q), jnp.asarray(s), block=512)
    ref = ((q[:, None, :] - s[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(d2), ref.min(1), atol=1e-3)
    np.testing.assert_allclose(
        ((q - s[np.asarray(idx)]) ** 2).sum(-1), ref.min(1), atol=1e-3
    )


def test_chamfer_matches_reference_contract(rng):
    a = rng.uniform(-1, 1, size=(200, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, size=(321, 3)).astype(np.float32)
    cd = float(chamfer_distance(jnp.asarray(a), jnp.asarray(b)))
    d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    # reference contract: forward/n1 + backward/n2 of chamferdist sums
    ref = d2.min(1).mean() + d2.min(0).mean()
    np.testing.assert_allclose(cd, ref, rtol=1e-5)


def test_chamfer_masked(rng):
    a = rng.uniform(-1, 1, size=(64, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, size=(64, 3)).astype(np.float32)
    am = np.zeros(64, bool); am[:30] = True
    bm = np.zeros(64, bool); bm[:50] = True
    cd = float(
        chamfer_distance(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(am), jnp.asarray(bm)
        )
    )
    d2 = ((a[:30, None, :] - b[None, :50, :]) ** 2).sum(-1)
    ref = d2.min(1).mean() + d2.min(0).mean()
    np.testing.assert_allclose(cd, ref, rtol=1e-5)


def test_chamfer_gradients(rng):
    import jax

    a = jnp.asarray(rng.uniform(-1, 1, size=(40, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, size=(50, 3)).astype(np.float32))

    def dense(a, b):
        d2 = jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, -1)
        return jnp.min(d2, 1).mean() + jnp.min(d2, 0).mean()

    ga, gb = jax.grad(chamfer_distance, argnums=(0, 1))(a, b)
    ra, rb = jax.grad(dense, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ra), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), atol=1e-5)


def _lidar_clustered(rng, n, extent=60.0):
    """Dense ground ring + uniform background — the anisotropic density that
    stresses the x-slab window (many points share one x-slab at the ring's
    tangent)."""
    m = n * 3 // 4
    ang = rng.uniform(0, 2 * np.pi, m)
    rad = np.abs(rng.normal(12, 8, m))
    ring = np.stack([rad * np.cos(ang), rad * np.sin(ang),
                     rng.normal(0, 0.2, m)], 1)
    rest = rng.uniform(-extent, extent, (n - m, 3))
    return np.clip(np.concatenate([ring, rest]),
                   -extent, extent).astype(np.float32)


def _assert_equal_up_to_distance_ties(q, s, a, b, cap):
    """Neighbor tables may legally swap equal-distance entries: compare the
    per-row sorted squared-distance multisets instead of raw indices."""
    q = np.asarray(q); s = np.asarray(s)
    a = np.asarray(a); b = np.asarray(b)
    ns = s.shape[0]
    sp = np.concatenate([s, np.full((1, 3), np.inf, np.float32)])

    def row_d2(t):
        g = sp[np.minimum(t, ns)]
        d2 = ((q[:, None, :] - g) ** 2).sum(-1)
        return np.where(t < ns, d2, np.inf)

    da, db = row_d2(a), row_d2(b)
    same_sentinels = (a < ns) == (b < ns)
    assert same_sentinels.all()
    np.testing.assert_allclose(np.sort(da, 1), np.sort(db, 1), rtol=1e-6)


def test_windowed_radius_matches_exact_uniform(rng):
    from apr_tpu.ops.neighbors import (radius_neighbors,
                                       windowed_radius_neighbors)

    for ns, nq, r, cap in [(2000, 2000, 1.3, 16), (4096, 1024, 2.5, 24),
                           (4096, 4096, 1.275, 40)]:
        s = jnp.asarray(rng.uniform(-60, 60, (ns, 3)).astype(np.float32))
        q = jnp.asarray(s[rng.permutation(ns)[:nq]]
                        + rng.normal(0, 0.3, (nq, 3)).astype(np.float32))
        sm = jnp.asarray(rng.uniform(size=ns) > 0.1)
        qm = jnp.asarray(rng.uniform(size=nq) > 0.1)
        a = radius_neighbors(q, s, r, cap, q_mask=qm, s_mask=sm)
        b = windowed_radius_neighbors(q, s, r, cap, q_mask=qm, s_mask=sm)
        _assert_equal_up_to_distance_ties(q, s, a, b, cap)


def test_windowed_radius_matches_exact_voxelized_clustered(rng):
    """The production shape: grid-subsampled clustered LiDAR (voxelization
    bounds the per-slab density that raw ring clouds can pile up)."""
    from apr_tpu.ops.neighbors import (radius_neighbors,
                                       windowed_radius_neighbors)
    from apr_tpu.ops.voxelize import voxelize_pyramid

    raw = _lidar_clustered(rng, 20000)
    pts = jnp.asarray(raw)
    mask = jnp.ones((raw.shape[0],), bool)
    grids = voxelize_pyramid(pts, 0.3, (8192, 2048), mask)
    g0, g1 = grids
    r = 0.3 * 4.25
    a = radius_neighbors(g0.barycenter, g0.barycenter, r, 40,
                         q_mask=g0.mask, s_mask=g0.mask)
    b = windowed_radius_neighbors(g0.barycenter, g0.barycenter, r, 40,
                                  q_mask=g0.mask, s_mask=g0.mask)
    _assert_equal_up_to_distance_ties(g0.barycenter, g0.barycenter, a, b, 40)
    # pool-shaped (coarse queries into fine supports)
    a = radius_neighbors(g1.barycenter, g0.barycenter, r, 40,
                         q_mask=g1.mask, s_mask=g0.mask)
    b = windowed_radius_neighbors(g1.barycenter, g0.barycenter, r, 40,
                                  q_mask=g1.mask, s_mask=g0.mask)
    _assert_equal_up_to_distance_ties(g1.barycenter, g0.barycenter, a, b, 40)


def test_windowed_radius_masked_rows_are_sentinel(rng):
    from apr_tpu.ops.neighbors import windowed_radius_neighbors

    s = jnp.asarray(rng.uniform(-10, 10, (512, 3)).astype(np.float32))
    qm = jnp.asarray(rng.uniform(size=512) > 0.5)
    out = windowed_radius_neighbors(s, s, 1.0, 8, q_mask=qm)
    assert bool(jnp.all(out[~qm] == 512))


def test_windowed_radius_overflow_telemetry(rng):
    from apr_tpu.ops.neighbors import windowed_radius_neighbors

    s = jnp.asarray(rng.uniform(-40, 40, (4096, 3)).astype(np.float32))
    _, ov = windowed_radius_neighbors(s, s, 1.3, 16, with_overflow=True)
    assert float(ov) == 0.0
    # force overflow: a tiny window cannot hold any slab
    _, ov2 = windowed_radius_neighbors(s, s, 1.3, 16, window=64,
                                       with_overflow=True)
    assert float(ov2) > 0.0


def test_kp_pyramid_overflow_fallback(rng):
    """build_kp_pyramid's overflow fallback (round-5): a cloud dense enough
    to overflow the slab window silently re-runs the level through the
    exact search — neighbor sets match exact radius_neighbors; without the
    fallback the same build truncates (proving the cond actually fired)."""
    from apr_tpu.models.kpconv import build_kp_pyramid
    from apr_tpu.ops.neighbors import radius_neighbors

    # adversarial density: everything crammed into one x-slab so the
    # window overflows (same trick as the telemetry test, at >=8192 points
    # so the windowed path is selected)
    n = 8192
    pts = rng.uniform(-1.0, 1.0, (n, 3)).astype(np.float32)
    pts[:, 0] *= 0.02  # one x-cell wide
    pts = jnp.asarray(pts)
    msk = jnp.ones((n,), bool)

    kw = dict(first_subsampling_dl=0.04, conv_radius=2.5, num_levels=2,
              capacities=(8192, 2048), neighbor_limits=(12, 12))
    pyr_fb = build_kp_pyramid(pts, msk, overflow_fallback=True, **kw)
    pyr_tr = build_kp_pyramid(pts, msk, overflow_fallback=False, **kw)

    lv = pyr_fb.levels[0]
    r0 = 0.04 * 2.5
    exact = radius_neighbors(lv.points, lv.points, r0, 12,
                             q_mask=lv.mask, s_mask=lv.mask)

    def row_sets(a):
        return [frozenset(int(x) for x in row if x < a.shape[0])
                for row in np.asarray(a)]

    assert row_sets(lv.neighbors) == row_sets(exact)
    # the non-fallback build differs (the window really did overflow)
    assert row_sets(pyr_tr.levels[0].neighbors) != row_sets(exact)
