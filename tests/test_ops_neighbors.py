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
