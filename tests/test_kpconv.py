import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apr_tpu.models.kernel_points import load_kernels, optimize_kernel_points
from apr_tpu.models.kpconv import (
    KPConvLayer,
    build_kp_pyramid,
    nearest_upsample,
)
from apr_tpu.models.kpfcnn import KPFCNN
from apr_tpu.losses.circle import circle_loss, metric_loss, weighted_bce
from apr_tpu.data.synthetic import pad_points, synthetic_pair

pytestmark = pytest.mark.slow  # heavy tier: full models / train loops



def test_kernel_points_well_spread():
    kp = optimize_kernel_points(15, 3, "center", num_iter=3000)
    assert kp.shape == (15, 3)
    np.testing.assert_allclose(kp[0], 0.0, atol=1e-6)  # fixed center
    r = np.linalg.norm(kp[1:], axis=1)
    np.testing.assert_allclose(r.mean(), 1.0, atol=0.05)
    # min pairwise distance reasonably large (points repel)
    d = np.linalg.norm(kp[:, None] - kp[None], axis=-1)
    d += np.eye(15) * 10
    assert d.min() > 0.4, d.min()


def test_load_kernels_cache_and_scale(tmp_path):
    kp1 = load_kernels(2.0, 15, deterministic=True)
    kp2 = load_kernels(2.0, 15, deterministic=True)
    np.testing.assert_array_equal(kp1, kp2)  # cached + deterministic
    r = np.linalg.norm(kp1[1:], axis=1)
    np.testing.assert_allclose(r.mean(), 2.0, atol=0.1)
    kp3 = load_kernels(2.0, 15, rng=np.random.default_rng(0))
    assert not np.allclose(kp1, kp3)  # randomized rotation/noise differs


def test_build_kp_pyramid(rng):
    pts = rng.uniform(-20, 20, size=(5000, 3)).astype(np.float32)
    mask = np.ones(5000, bool)
    pyr = build_kp_pyramid(
        jnp.asarray(pts), jnp.asarray(mask),
        first_subsampling_dl=0.8, conv_radius=2.5,
        capacities=(4096, 1024, 512, 256), neighbor_limits=(24, 24, 24, 24),
    )
    assert len(pyr.levels) == 4
    counts = [int(jnp.sum(l.mask)) for l in pyr.levels]
    assert counts[0] > counts[1] > counts[2] > counts[3] > 0
    # conv neighbors: valid rows reference valid supports or sentinel
    lv0 = pyr.levels[0]
    nb = np.asarray(lv0.neighbors)
    n0 = nb.shape[0]
    assert ((nb <= n0)).all()
    # every valid point finds at least itself in radius
    valid_rows = np.asarray(lv0.mask)
    assert (nb[valid_rows] < n0).any(axis=1).all()


def test_kpconv_layer_basics(rng, jax_key):
    n = 256
    pts = jnp.asarray(rng.uniform(-5, 5, size=(n, 3)).astype(np.float32))
    from apr_tpu.ops.neighbors import radius_neighbors

    nb = radius_neighbors(pts, pts, 1.5, 16)
    feats = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    layer = KPConvLayer(out_channels=16, kp_extent=1.2, radius=1.5)
    variables = layer.init(jax_key, pts, pts, nb, feats)
    out = layer.apply(variables, pts, pts, nb, feats)
    assert out.shape == (n, 16)
    assert np.isfinite(np.asarray(out)).all()
    # all-sentinel neighbor rows produce zeros
    nb_bad = jnp.full_like(nb, n)
    out2 = layer.apply(variables, pts, pts, nb_bad, feats)
    np.testing.assert_allclose(np.asarray(out2), 0.0, atol=1e-6)


@pytest.fixture(scope="module")
def kpfcnn_setup():
    d = synthetic_pair(0, n_points=3000, apc_points=100, distance=8.0,
                       extent=30.0)
    caps = (2048, 512, 256, 128)
    model = KPFCNN(
        final_feats_dim=16, first_feats_dim=64, gnn_feats_dim=64,
        first_subsampling_dl=1.0, conv_radius=2.5,
    )

    def build(points):
        p, m = pad_points(points, 4096)
        return build_kp_pyramid(
            jnp.asarray(p), jnp.asarray(m),
            first_subsampling_dl=1.0, conv_radius=2.5,
            capacities=caps, neighbor_limits=(20, 20, 20, 20),
        )

    pyr0 = build(d["points0"])
    pyr1 = build(d["points1"])
    variables = model.init(jax.random.PRNGKey(0), pyr0, pyr1)
    return model, variables, pyr0, pyr1, d


@pytest.mark.veryslow
def test_kpfcnn_forward(kpfcnn_setup):
    model, variables, pyr0, pyr1, d = kpfcnn_setup
    out = model.apply(variables, pyr0, pyr1)
    m0 = np.asarray(pyr0.levels[0].mask)
    f0 = np.asarray(out.feats0)
    assert f0.shape[1] == 16
    np.testing.assert_allclose(
        np.linalg.norm(f0[m0], axis=1), 1.0, atol=1e-4
    )
    assert (f0[~m0] == 0).all()
    ov = np.asarray(out.overlap0)
    assert ((ov >= 0) & (ov <= 1)).all()
    assert np.isfinite(np.asarray(out.saliency1)).all()
    assert (np.asarray(out.overlap1)[~np.asarray(pyr1.levels[0].mask)] == 0).all()


def test_weighted_bce():
    pred = jnp.asarray([0.9, 0.1, 0.8, 0.2])
    gt = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    mask = jnp.ones(4, bool)
    loss, prec, rec = weighted_bce(pred, gt, mask)
    assert float(prec) == 1.0 and float(rec) == 1.0
    assert float(loss) < 0.2
    # masked entries are ignored
    pred2 = jnp.asarray([0.9, 0.1, 0.1, 0.9])  # last two wrong but masked
    mask2 = jnp.asarray([True, True, False, False])
    _, prec2, rec2 = weighted_bce(pred2, gt, mask2)
    assert float(prec2) == 1.0 and float(rec2) == 1.0


def test_circle_loss_orders_features(rng, jax_key):
    p = 64
    coords = jnp.asarray(rng.uniform(-5, 5, (p, 3)).astype(np.float32))
    coords_dist = jnp.sqrt(
        jnp.sum((coords[:, None] - coords[None]) ** 2, -1)
    )
    # good features: distance 0 at diagonal (positives), large elsewhere
    good = jnp.where(jnp.eye(p, dtype=bool), 0.05, 1.8)
    bad = jnp.where(jnp.eye(p, dtype=bool), 1.8, 0.05)
    l_good = circle_loss(coords_dist, good, pos_radius=0.5, safe_radius=1.0)
    l_bad = circle_loss(coords_dist, bad, pos_radius=0.5, safe_radius=1.0)
    assert float(l_good) < float(l_bad)


@pytest.mark.veryslow
def test_metric_loss_full(kpfcnn_setup, jax_key):
    model, variables, pyr0, pyr1, d = kpfcnn_setup
    out = model.apply(variables, pyr0, pyr1)
    from apr_tpu.registration.matching import gt_correspondences

    src = pyr0.levels[0].points
    tgt = pyr1.levels[0].points
    m0 = pyr0.levels[0].mask
    m1 = pyr1.levels[0].mask
    t_gt = jnp.asarray(d["t_gt"])
    corr = gt_correspondences(src, tgt, t_gt, radius=1.0, cap_per_point=2,
                              mask0=m0, mask1=m1)
    assert int(jnp.sum(corr.mask)) > 50
    stats = metric_loss(
        jax_key, src, tgt, m0, m1, out.feats0, out.feats1,
        corr.src_idx, corr.tgt_idx, corr.mask, t_gt,
        out.overlap0, out.overlap1, out.saliency0, out.saliency1,
        pos_radius=1.0, safe_radius=2.5, matchability_radius=1.2,
        max_points=256,
    )
    for k, v in stats.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert float(stats["circle_loss"]) > 0


# --- deformable KPConv (blocks.py:235-316 parity) --------------------------

def _deform_setup(rng, modulated=False):
    import jax
    from apr_tpu.models.kpconv import KPConvLayer

    q = jnp.asarray(rng.uniform(-3, 3, (64, 3)).astype(np.float32))
    s = jnp.asarray(rng.uniform(-3, 3, (96, 3)).astype(np.float32))
    nb = jnp.asarray(rng.integers(0, 97, (64, 12)).astype(np.int32))  # 96 = shadow
    x = jnp.asarray(rng.normal(size=(96, 8)).astype(np.float32))
    layer = KPConvLayer(16, kp_extent=1.0, radius=2.0, num_kernel_points=7,
                        deformable=True, modulated=modulated)
    params = layer.init(jax.random.PRNGKey(0), q, s, nb, x)["params"]
    return layer, params, (q, s, nb, x)


def test_deformable_zero_offsets_match_rigid(rng):
    """With the offset conv zeroed, deformable == rigid KPConv exactly.

    Geometry is confined to a ball where every neighbor sits within
    kp_extent of the CENTER kernel point: the reference's deformable path
    prunes neighbors out of range of every (deformed) kernel point and
    normalizes by the pruned count (blocks.py:293-315, 371-375 — replicated
    here, and pinned against the executed reference in
    test_reference_parity.py), so exact rigid equality only holds when that
    pruning keeps every neighbor.
    """
    import jax
    from apr_tpu.models.kpconv import KPConvLayer

    layer, params, args = _deform_setup(rng)
    q, s, nb, x = args
    # shrink clouds into a 0.28-side box: max pairwise distance ~0.97 <
    # kp_extent 1.0, so no neighbor is pruned in the deformable path
    q = q * (0.28 / 3.0)
    s = s * (0.28 / 3.0)
    args = (q, s, nb, x)
    # zero everything EXCEPT the (frozen, non-trainable) kernel dispositions
    params = jax.tree_util.tree_map_with_path(
        lambda path, a: a if any(
            getattr(k, "key", None) == "kernel_points" for k in path
        ) else jnp.zeros_like(a),
        params,
    )
    params = dict(params)
    main_w = jnp.asarray(np.random.default_rng(7).normal(
        size=params["weights"].shape).astype(np.float32))
    params["weights"] = main_w

    out_def = layer.apply({"params": params}, *args)

    rigid = KPConvLayer(16, kp_extent=1.0, radius=2.0, num_kernel_points=7)
    rigid_params = dict(rigid.init(jax.random.PRNGKey(1), *args)["params"])
    rigid_params["weights"] = main_w
    out_rig = rigid.apply({"params": rigid_params}, *args)
    np.testing.assert_allclose(np.asarray(out_def), np.asarray(out_rig),
                               rtol=1e-5, atol=1e-6)


def test_deformable_offsets_change_output_and_grads_flow(rng):
    import jax

    layer, params, args = _deform_setup(rng)
    out = layer.apply({"params": params}, *args)
    assert out.shape == (64, 16)
    assert np.isfinite(np.asarray(out)).all()

    # offsets actually deform: zeroing the offset conv changes the output
    p0 = dict(params)
    p0["offset_conv"] = jax.tree.map(jnp.zeros_like, params["offset_conv"])
    out0 = layer.apply({"params": p0}, *args)
    assert float(jnp.abs(out - out0).max()) > 1e-6

    # gradient flows into the offset conv weights
    def loss(p):
        return jnp.sum(layer.apply({"params": p}, *args) ** 2)
    g = jax.grad(loss)(params)
    g_off = jax.tree_util.tree_leaves(g["offset_conv"])
    assert any(float(jnp.abs(l).max()) > 0 for l in g_off)

    # min_d2 sown for fitting regularizers
    _, inter = layer.apply({"params": params}, *args, mutable=["deform"])
    (min_d2,) = inter["deform"]["min_d2"]
    assert min_d2.shape == (64, 7)


def test_deformable_modulated(rng):
    import jax

    layer, params, args = _deform_setup(rng, modulated=True)
    out = layer.apply({"params": params}, *args)
    assert out.shape == (64, 16)
    assert np.isfinite(np.asarray(out)).all()
    assert params["offset_bias"].shape == (4 * 7,)


@pytest.mark.veryslow
def test_kpfcnn_deformable_forward(rng, jax_key):
    """Full KPFCNN with deformable encoder blocks runs and is finite."""
    from apr_tpu.models.kpconv import build_kp_pyramid
    from apr_tpu.models.kpfcnn import KPFCNN

    pts = jnp.asarray(rng.uniform(-10, 10, (400, 3)).astype(np.float32))
    mask = jnp.ones(400, bool)
    pyr = build_kp_pyramid(pts, mask, first_subsampling_dl=1.0,
                           capacities=(256, 128, 64, 32),
                           neighbor_limits=(12, 12, 12, 12))
    model = KPFCNN(final_feats_dim=8, first_feats_dim=16, gnn_feats_dim=16,
                   dgcnn_k=4, num_head=2, first_subsampling_dl=1.0,
                   num_kernel_points=7, deformable=True)
    params = model.init(jax_key, pyr, pyr)["params"]
    out = model.apply({"params": params}, pyr, pyr)
    assert np.isfinite(np.asarray(out.feats0)).all()


def test_ones_input_matches_regular(rng):
    """ones_input=True (gather-free validity row-sum) must equal the regular
    layer fed the explicit constant-ones feature — including the stacked-pair
    form the encoder uses."""
    import jax
    from apr_tpu.models.kpconv import KPConvLayer
    from apr_tpu.ops.neighbors import radius_neighbors

    n = 300
    pts = jnp.asarray(rng.uniform(-5, 5, size=(n, 3)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=n) > 0.2)
    nb = radius_neighbors(pts, pts, 1.5, 12, q_mask=mask, s_mask=mask)
    ones = jnp.where(mask[:, None], 1.0, 0.0).astype(jnp.float32)

    reg = KPConvLayer(out_channels=16, kp_extent=1.2, radius=1.5)
    v = reg.init(jax.random.PRNGKey(0), pts, pts, nb, ones)
    out_reg = reg.apply(v, pts, pts, nb, ones)

    oi = KPConvLayer(out_channels=16, kp_extent=1.2, radius=1.5,
                     ones_input=True)
    out_oi = oi.apply(v, pts, pts, nb, ones)
    np.testing.assert_allclose(np.asarray(out_oi), np.asarray(out_reg),
                               rtol=1e-5, atol=1e-6)

    # stacked pair
    pts2 = jnp.stack([pts, pts[::-1]])
    nb2 = jnp.stack([nb, radius_neighbors(pts2[1], pts2[1], 1.5, 12,
                                          q_mask=mask[::-1],
                                          s_mask=mask[::-1])])
    ones2 = jnp.stack([ones, jnp.where(mask[::-1, None], 1.0, 0.0)])
    out2_reg = reg.apply(v, pts2, pts2, nb2, ones2)
    out2_oi = oi.apply(v, pts2, pts2, nb2, ones2)
    np.testing.assert_allclose(np.asarray(out2_oi), np.asarray(out2_reg),
                               rtol=1e-5, atol=1e-6)


def test_kpconv_compute_dtype_close_to_f32(rng):
    """bfloat16 compute path: positions/influences stay f32, so the output
    tracks the f32 path within bf16 feature-rounding error."""
    import jax
    from apr_tpu.models.kpconv import KPConvLayer
    from apr_tpu.ops.neighbors import radius_neighbors

    n = 256
    pts = jnp.asarray(rng.uniform(-40, 40, size=(n, 3)).astype(np.float32))
    nb = radius_neighbors(pts, pts, 3.0, 16)
    feats = jnp.asarray(rng.normal(size=(n, 24)).astype(np.float32))

    f32 = KPConvLayer(out_channels=32, kp_extent=2.0, radius=3.0)
    v = f32.init(jax.random.PRNGKey(0), pts, pts, nb, feats)
    out_f32 = np.asarray(f32.apply(v, pts, pts, nb, feats))

    bf = KPConvLayer(out_channels=32, kp_extent=2.0, radius=3.0,
                     compute_dtype="bfloat16")
    out_bf = np.asarray(bf.apply(v, pts, pts, nb, feats))
    assert np.isfinite(out_bf).all()
    scale = np.abs(out_f32).max()
    assert np.abs(out_bf - out_f32).max() < 0.03 * scale
