import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apr_tpu.ops import voxelize
from apr_tpu.models.sparse import (
    build_pyramid,
    downsample_level,
    kernel_map_down,
    kernel_map_same,
    kernel_map_up,
    offsets_grid,
    sparse_conv_apply,
    SparseLevel,
)


def _grid(rng, n=500, span=8.0, voxel=0.5, cap=1024):
    pts = rng.uniform(-span, span, size=(n, 3)).astype(np.float32)
    return voxelize(jnp.asarray(pts), voxel, capacity=cap), pts


def _coord_set(level):
    m = np.asarray(level.mask)
    return {tuple(c) for c in np.asarray(level.coords)[m]}


def test_downsample_level_matches_numpy(rng):
    grid, pts = _grid(rng)
    lv0 = SparseLevel(grid.coords, grid.keys, grid.mask)
    lv1 = downsample_level(lv0, 512)
    ref = {tuple(np.asarray(c) >> 1) for c in _coord_set(lv0)}
    assert _coord_set(lv1) == ref


def test_kernel_map_same_is_correct(rng):
    grid, _ = _grid(rng)
    lv = SparseLevel(grid.coords, grid.keys, grid.mask)
    table = np.asarray(kernel_map_same(lv, 3))
    coords = np.asarray(lv.coords)
    mask = np.asarray(lv.mask)
    cap = coords.shape[0]
    index = {tuple(c): i for i, c in enumerate(coords[mask])}
    offs = offsets_grid(3)
    for i in np.flatnonzero(mask)[:50]:
        for k, off in enumerate(offs):
            want = index.get(tuple(coords[i] + off), cap)
            assert table[i, k] == want
    # padded rows are all sentinel
    assert (table[~mask] == cap).all()


def test_kernel_map_down_up_are_adjoint(rng):
    grid, _ = _grid(rng)
    lv0 = SparseLevel(grid.coords, grid.keys, grid.mask)
    lv1 = downsample_level(lv0, 512)
    down = np.asarray(kernel_map_down(lv1, lv0, 3))  # [C1, 27] into lv0
    up = np.asarray(kernel_map_up(lv0, lv1, 3))      # [C0, 27] into lv1
    c0, c1 = grid.capacity, 512
    # pair sets must transpose exactly (same offset slot k)
    pairs_down = {
        (f, c, k)
        for c in range(c1)
        for k, f in enumerate(down[c])
        if f < c0 and np.asarray(lv1.mask)[c]
    }
    offs = offsets_grid(3)
    # down uses coord 2q + o; up uses (f - o)/2 -> same o slot
    pairs_up = {
        (f, c, k)
        for f in range(c0)
        for k, c in enumerate(up[f])
        if c < c1 and np.asarray(lv0.mask)[f]
    }
    assert pairs_down == pairs_up


def test_sparse_conv_identity_kernel(rng):
    grid, _ = _grid(rng)
    lv = SparseLevel(grid.coords, grid.keys, grid.mask)
    table = kernel_map_same(lv, 3)
    cap = grid.capacity
    feats = jnp.asarray(rng.normal(size=(cap, 8)).astype(np.float32))
    feats = jnp.where(lv.mask[:, None], feats, 0.0)
    # kernel = identity at the center offset only
    w = np.zeros((27, 8, 8), np.float32)
    w[13] = np.eye(8)  # center of 3x3x3 in ij-ordering is index 13
    out = sparse_conv_apply(feats, table, jnp.asarray(w), lv.mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(feats), atol=1e-5)


def test_sparse_conv_neighbor_sum(rng):
    """Sum-over-neighbors kernel must equal the dense neighbor sum."""
    grid, _ = _grid(rng, n=200, span=3.0, voxel=1.0, cap=256)
    lv = SparseLevel(grid.coords, grid.keys, grid.mask)
    table = kernel_map_same(lv, 3)
    cap = grid.capacity
    feats = jnp.asarray(rng.normal(size=(cap, 4)).astype(np.float32))
    feats = jnp.where(lv.mask[:, None], feats, 0.0)
    w = np.tile(np.eye(4, dtype=np.float32)[None], (27, 1, 1))
    out = np.asarray(sparse_conv_apply(feats, table, jnp.asarray(w), lv.mask))

    coords = np.asarray(lv.coords)
    mask = np.asarray(lv.mask)
    index = {tuple(c): i for i, c in enumerate(coords[mask])}
    f = np.asarray(feats)
    for i in np.flatnonzero(mask)[:30]:
        want = np.zeros(4)
        for off in offsets_grid(3):
            j = index.get(tuple(coords[i] + off))
            if j is not None:
                want += f[j]
        np.testing.assert_allclose(out[i], want, atol=1e-4)


@pytest.mark.slow
def test_build_pyramid_shapes(rng):
    grid, _ = _grid(rng, n=1000, span=10.0, voxel=0.4, cap=2048)
    pyr = build_pyramid(grid, capacities=(2048, 1024, 512, 256), conv1_kernel_size=5)
    assert len(pyr.levels) == 4
    assert pyr.conv1_map.shape == (2048, 125)
    assert pyr.same_maps[2].shape == (512, 27)
    assert pyr.down_maps[0].shape == (1024, 27)
    assert pyr.up_maps[0].shape == (2048, 27)
    # each level has fewer voxels than the previous
    counts = [int(jnp.sum(lv.mask)) for lv in pyr.levels]
    assert counts[0] > counts[1] > counts[2] >= counts[3] > 0


# --- scatter-free adjoint backward ------------------------------------------

def _tiny_pyramid(rng, n=120, caps=(64, 32)):
    import jax.numpy as jnp
    from apr_tpu.models.sparse import build_pyramid
    from apr_tpu.ops.voxelize import voxelize

    pts = jnp.asarray(rng.uniform(-6, 6, (n, 3)).astype(np.float32))
    grid = voxelize(pts, 1.0, caps[0], jnp.ones(n, bool))
    return build_pyramid(grid, caps, conv1_kernel_size=3)


@pytest.mark.parametrize("kind", ["same", "down", "up"])
def test_sparse_conv_adjoint_matches_autodiff(rng, kind):
    """Custom scatter-free VJP == XLA autodiff of the plain conv, for all
    three map families (same-level + reversal, down/up mutual adjoints)."""
    import jax
    import jax.numpy as jnp
    from apr_tpu.models.sparse import sparse_conv_adjoint, sparse_conv_apply

    pyr = _tiny_pyramid(rng)
    lv0, lv1 = pyr.levels
    if kind == "same":
        table, table_t = pyr.same_maps[0], pyr.same_maps[0]
        in_mask, out_mask, rev = lv0.mask, lv0.mask, True
        n_in = lv0.mask.shape[0]
    elif kind == "down":
        table, table_t = pyr.down_maps[0], pyr.up_maps[0]
        in_mask, out_mask, rev = lv0.mask, lv1.mask, False
        n_in = lv0.mask.shape[0]
    else:
        table, table_t = pyr.up_maps[0], pyr.down_maps[0]
        in_mask, out_mask, rev = lv1.mask, lv0.mask, False
        n_in = lv1.mask.shape[0]

    feats = jnp.asarray(rng.normal(size=(n_in, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(27, 8, 5)).astype(np.float32))
    g_out = jnp.asarray(
        rng.normal(size=(table.shape[0], 5)).astype(np.float32))

    def loss_plain(f, w):
        return jnp.sum(sparse_conv_apply(f, table, w, out_mask) * g_out)

    def loss_adj(f, w):
        return jnp.sum(sparse_conv_adjoint(
            f, table, table_t, w, out_mask, in_mask, rev, None) * g_out)

    (va, (dfa, dwa)) = jax.value_and_grad(loss_adj, argnums=(0, 1))(feats, w)
    (vp, (dfp, dwp)) = jax.value_and_grad(loss_plain, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(float(va), float(vp), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dfa), np.asarray(dfp),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dwa), np.asarray(dwp),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
@pytest.mark.veryslow
def test_resunet_grads_finite_and_descend(rng):
    """Full ResUNet2 with the adjoint backward: finite grads, loss descends."""
    import jax
    import jax.numpy as jnp
    import optax
    from apr_tpu.models.resunet import ResUNet2

    pyr = _tiny_pyramid(rng, caps=(64, 32, 16, 8))
    pyr = jax.tree.map(lambda x: x[None], pyr)  # batch of 1
    model = ResUNet2(in_channels=1, out_channels=4,
                     channels=(4, 8, 8, 8), tr_channels=(4, 8, 8, 8),
                     conv1_kernel_size=3)
    feats = jnp.ones((1, pyr.levels[0].mask.shape[1], 1))
    vars_ = model.init(jax.random.PRNGKey(0), feats, pyr, False)
    target = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))

    def loss_fn(params):
        out = model.apply({"params": params,
                           "batch_stats": vars_.get("batch_stats", {})},
                          feats, pyr, False)
        return jnp.mean((out.mean(axis=(0, 1)) - target) ** 2)

    tx = optax.adam(1e-2)
    params = vars_["params"]
    opt = tx.init(params)
    losses = []
    for _ in range(12):
        l, g = jax.value_and_grad(loss_fn)(params)
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree_util.tree_leaves(g))
        upd, opt = tx.update(g, opt, params)
        params = optax.apply_updates(params, upd)
        losses.append(float(l))
    assert losses[-1] < losses[0]


# --- z-run fast kernel maps --------------------------------------------------

@pytest.mark.parametrize("k", [3, 5])
def test_kernel_map_same_fast_matches_naive(rng, k):
    from apr_tpu.models.sparse import kernel_map_same, kernel_map_same_fast

    grid, _ = _grid(rng, n=800, span=8.0, voxel=0.5, cap=1024)
    lv = SparseLevel(grid.coords, grid.keys, grid.mask)
    ref = np.asarray(kernel_map_same(lv, k))
    fast = np.asarray(kernel_map_same_fast(lv, k))
    np.testing.assert_array_equal(fast, ref)


def test_kernel_map_down_fast_and_transpose_match_naive(rng):
    from apr_tpu.models.sparse import (
        kernel_map_down, kernel_map_down_fast, kernel_map_up,
        transpose_kernel_map,
    )

    grid, _ = _grid(rng, n=800, span=8.0, voxel=0.5, cap=1024)
    lv0 = SparseLevel(grid.coords, grid.keys, grid.mask)
    lv1 = downsample_level(lv0, 512)
    ref_down = np.asarray(kernel_map_down(lv1, lv0, 3))
    fast_down = np.asarray(kernel_map_down_fast(lv1, lv0, 3))
    np.testing.assert_array_equal(fast_down, ref_down)

    ref_up = np.asarray(kernel_map_up(lv0, lv1, 3))
    t_up = np.asarray(transpose_kernel_map(
        jnp.asarray(ref_down), n_fine=1024, n_coarse=512))
    np.testing.assert_array_equal(t_up, ref_up)
