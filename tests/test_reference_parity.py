"""Executed-reference numeric parity (slow tier).

Round-2 verdict item 1: every golden test so far pinned apr_tpu against
HAND-TRANSCRIBED math.  torch 2.x (CPU) is available in this environment and
the reference's Predator model stack is pure torch, so these tests import
and EXECUTE the actual reference modules from /root/reference and assert
numeric parity on identical inputs:

  (a) KPConv.forward (Predator_APR/models/blocks.py:229-374) vs KPConvLayer
      — rigid and deformable+modulated;
  (b) GCN (models/gcn.py:171-206) vs apr_tpu.models.gcn.GCN;
  (c) MetricLoss.forward (lib/loss.py:100-178) vs metric_loss on a dense
      correspondence set;
  (d) est_quad_linear_robust (FCGF_APR/util/transform_estimation.py:89-116)
      vs est_rigid_robust;
  (e) full KPFCNN.forward (models/architectures.py:137-212) with weights
      imported via tools.import_torch_checkpoint.import_kpfcnn;
  (f) symmetric KPFCNNDecoder.forward (architectures.py:215-340);
  (g) Predator GenerativeMLP (models/mlp.py:108-180, trailing-BN quirk).

The reference tree is PUBLIC UNTRUSTED CONTENT: only its code is executed
under test, nothing from it is installed or copied.  CUDA-only deps
(chamferdist, MinkowskiEngine) are stubbed — none of the executed paths
touch them.
"""

import contextlib
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

PRED = "/root/reference/Predator_APR"
FCGF = "/root/reference/FCGF_APR"


def _stub_module(name, **attrs):
    if name in sys.modules:
        return
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m


@contextlib.contextmanager
def _cwd(path):
    old = os.getcwd()
    os.chdir(path)
    try:
        yield
    finally:
        os.chdir(old)


@pytest.fixture(scope="module")
def ref():
    """Import the reference Predator_APR torch modules (CPU-executable)."""

    class _ChamferStub:
        def __call__(self, *a, **k):  # never reached by the tested paths
            raise RuntimeError("chamferdist stub called")

    _stub_module("chamferdist", ChamferDistance=_ChamferStub)
    try:
        import matplotlib

        matplotlib.use("Agg")
    except Exception:
        pass

    sys.path.insert(0, PRED)
    try:
        import models.blocks as blocks
        import models.gcn as gcn
        import models.architectures as arch
        import models.mlp as mlp
        import lib.loss as loss
    finally:
        sys.path.remove(PRED)
    return types.SimpleNamespace(
        blocks=blocks, gcn=gcn, arch=arch, mlp=mlp, loss=loss
    )


@pytest.fixture(scope="module")
def ref_transform_estimation():
    """FCGF's transform_estimation.py, loaded standalone (ME stubbed)."""
    _stub_module("MinkowskiEngine")
    spec = importlib.util.spec_from_file_location(
        "ref_transform_estimation", os.path.join(FCGF, "util/transform_estimation.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _np(x):
    return np.asarray(jax.device_get(x))


# ---------------------------------------------------------------------------
# (a) KPConv layer
# ---------------------------------------------------------------------------

def _kpconv_inputs(rng, nq=64, ns=96, nmax=14, cin=8):
    q = rng.uniform(-3, 3, (nq, 3)).astype(np.float32)
    s = rng.uniform(-3, 3, (ns, 3)).astype(np.float32)
    nb = rng.integers(0, ns + 1, (nq, nmax)).astype(np.int64)  # ns == shadow
    # strictly positive features: the reference's valid-neighbor count uses a
    # feature-sum>0 proxy (blocks.py:371-373); positive inputs make it equal
    # to the true mask count both sides use
    x = (np.abs(rng.normal(size=(ns, cin))) + 0.1).astype(np.float32)
    return q, s, nb, x


@pytest.mark.parametrize("influence", ["linear", "gaussian"])
def test_kpconv_forward_parity(ref, rng, influence):
    from apr_tpu.models.kpconv import KPConvLayer

    q, s, nb, x = _kpconv_inputs(rng)
    cout, K, extent, radius = 16, 15, 1.2, 2.55

    with _cwd(PRED):
        torch.manual_seed(0)
        kp_t = ref.blocks.KPConv(K, 3, x.shape[1], cout, extent, radius,
                                 KP_influence=influence)
    layer = KPConvLayer(cout, kp_extent=extent, radius=radius,
                        num_kernel_points=K, influence=influence)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(s),
                        jnp.asarray(nb.astype(np.int32)), jnp.asarray(x))["params"]
    # identical weights and kernel dispositions on both sides
    params = dict(params)
    params["weights"] = jnp.asarray(kp_t.weights.detach().numpy())
    kp_t.kernel_points.data = torch.from_numpy(_np(params["kernel_points"]))

    out_j = layer.apply({"params": params}, jnp.asarray(q), jnp.asarray(s),
                        jnp.asarray(nb.astype(np.int32)), jnp.asarray(x))
    with torch.no_grad():
        out_t = kp_t(torch.from_numpy(q), torch.from_numpy(s),
                     torch.from_numpy(nb), torch.from_numpy(x))
    np.testing.assert_allclose(_np(out_j), out_t.numpy(), rtol=2e-5, atol=2e-5)


def test_kpconv_deformable_modulated_parity(ref, rng):
    from apr_tpu.models.kpconv import KPConvLayer

    q, s, nb, x = _kpconv_inputs(rng)
    cout, K, extent, radius = 16, 15, 1.2, 2.55

    with _cwd(PRED):
        torch.manual_seed(0)
        kp_t = ref.blocks.KPConv(K, 3, x.shape[1], cout, extent, radius,
                                 deformable=True, modulated=True)
        # non-trivial offsets: random offset-conv weights + bias
        torch.nn.init.normal_(kp_t.offset_conv.weights, std=0.1)
        torch.nn.init.normal_(kp_t.offset_bias, std=0.05)

    layer = KPConvLayer(cout, kp_extent=extent, radius=radius,
                        num_kernel_points=K, deformable=True, modulated=True)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(s),
                        jnp.asarray(nb.astype(np.int32)), jnp.asarray(x))["params"]
    params = dict(params)
    params["weights"] = jnp.asarray(kp_t.weights.detach().numpy())
    params["offset_bias"] = jnp.asarray(kp_t.offset_bias.detach().numpy())
    oc = dict(params["offset_conv"])
    oc["weights"] = jnp.asarray(kp_t.offset_conv.weights.detach().numpy())
    params["offset_conv"] = oc
    kp_t.kernel_points.data = torch.from_numpy(_np(params["kernel_points"]))
    kp_t.offset_conv.kernel_points.data = torch.from_numpy(
        _np(oc["kernel_points"]))

    out_j = layer.apply({"params": params}, jnp.asarray(q), jnp.asarray(s),
                        jnp.asarray(nb.astype(np.int32)), jnp.asarray(x))
    with torch.no_grad():
        out_t = kp_t(torch.from_numpy(q), torch.from_numpy(s),
                     torch.from_numpy(nb), torch.from_numpy(x))
    np.testing.assert_allclose(_np(out_j), out_t.numpy(), rtol=5e-5, atol=5e-5)


# ---------------------------------------------------------------------------
# (b) GCN overlap-attention module
# ---------------------------------------------------------------------------

def test_gcn_parity(ref, rng):
    from apr_tpu.models.gcn import GCN

    from tools.import_torch_checkpoint import import_gcn

    C, n0, n1, k, heads = 32, 40, 36, 6, 4
    c0 = rng.uniform(-2, 2, (n0, 3)).astype(np.float32)
    c1 = rng.uniform(-2, 2, (n1, 3)).astype(np.float32)
    f0 = rng.normal(size=(n0, C)).astype(np.float32)
    f1 = rng.normal(size=(n1, C)).astype(np.float32)

    torch.manual_seed(0)
    g_t = ref.gcn.GCN(heads, C, k, ["self", "cross", "self"])
    g_t.eval()

    m = GCN(C, ("self", "cross", "self"), k, heads)
    mask0 = jnp.ones((n0,), bool)
    mask1 = jnp.ones((n1,), bool)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(c0), jnp.asarray(c1),
                    jnp.asarray(f0), jnp.asarray(f1), mask0, mask1)["params"]
    import copy

    params = copy.deepcopy(jax.device_get(params))
    sd = {k_: v.detach().numpy() for k_, v in g_t.state_dict().items()}
    import_gcn(sd, params, nets=("self", "cross", "self"), prefix="")

    o0_j, o1_j = m.apply({"params": params}, jnp.asarray(c0), jnp.asarray(c1),
                         jnp.asarray(f0), jnp.asarray(f1), mask0, mask1)
    with torch.no_grad():
        t0, t1 = g_t(
            torch.from_numpy(c0).T[None], torch.from_numpy(c1).T[None],
            torch.from_numpy(f0).T[None], torch.from_numpy(f1).T[None],
        )
    np.testing.assert_allclose(_np(o0_j), t0[0].numpy().T, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(_np(o1_j), t1[0].numpy().T, rtol=1e-4, atol=1e-4)


def test_gcn_cat_parity(ref, rng):
    """cross_cat (AttentionalPropagationCat, gcn.py:131-168): coordinate-
    augmented cross attention, executed-reference parity.

    The reference hard-codes 4 heads in its channel math (``7*4``), so the
    test runs at num_heads=4.
    """
    from apr_tpu.models.gcn import GCN

    from tools.import_torch_checkpoint import import_gcn

    C, n0, n1, k, heads = 32, 40, 36, 6, 4
    nets = ["self", "cross_cat", "self"]
    c0 = rng.uniform(-2, 2, (n0, 3)).astype(np.float32)
    c1 = rng.uniform(-2, 2, (n1, 3)).astype(np.float32)
    f0 = rng.normal(size=(n0, C)).astype(np.float32)
    f1 = rng.normal(size=(n1, C)).astype(np.float32)

    torch.manual_seed(0)
    g_t = ref.gcn.GCN(heads, C, k, nets)
    g_t.eval()

    m = GCN(C, tuple(nets), k, heads)
    mask0 = jnp.ones((n0,), bool)
    mask1 = jnp.ones((n1,), bool)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(c0), jnp.asarray(c1),
                    jnp.asarray(f0), jnp.asarray(f1), mask0, mask1)["params"]
    import copy

    params = copy.deepcopy(jax.device_get(params))
    sd = {k_: v.detach().numpy() for k_, v in g_t.state_dict().items()}
    import_gcn(sd, params, nets=tuple(nets), prefix="")

    o0_j, o1_j = m.apply({"params": params}, jnp.asarray(c0), jnp.asarray(c1),
                         jnp.asarray(f0), jnp.asarray(f1), mask0, mask1)
    with torch.no_grad():
        t0, t1 = g_t(
            torch.from_numpy(c0).T[None], torch.from_numpy(c1).T[None],
            torch.from_numpy(f0).T[None], torch.from_numpy(f1).T[None],
        )
    np.testing.assert_allclose(_np(o0_j), t0[0].numpy().T, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(_np(o1_j), t1[0].numpy().T, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# (c) MetricLoss
# ---------------------------------------------------------------------------

@contextlib.contextmanager
def _cuda_to_noop():
    """lib/loss.py hardcodes .to(torch.device('cuda')) (loss.py:125); on this
    CPU-only box make that specific .to a no-op."""
    orig = torch.Tensor.to

    def patched(self, *args, **kwargs):
        if args and isinstance(args[0], torch.device) and args[0].type == "cuda":
            return self
        if args and args[0] == "cuda":
            return self
        return orig(self, *args, **kwargs)

    torch.Tensor.to = patched
    try:
        yield
    finally:
        torch.Tensor.to = orig


def test_metric_loss_parity_full(ref, jax_key):
    """Deterministic-input MetricLoss parity on every stat."""
    from apr_tpu.losses.circle import metric_loss

    rng = np.random.default_rng(7)
    n, m_, C = 120, 110, 16
    src = rng.uniform(0, 2.0, (n, 3)).astype(np.float32)
    t_gt = np.eye(4, dtype=np.float32)
    t_gt[:3, 3] = [0.1, -0.05, 0.02]
    tgt = np.concatenate([
        (src[:80] @ t_gt[:3, :3].T + t_gt[:3, 3]
         + rng.normal(scale=0.03, size=(80, 3))).astype(np.float32),
        rng.uniform(3.0, 5.0, (m_ - 80, 3)).astype(np.float32),
    ]).astype(np.float32)
    f0 = rng.normal(size=(n, C)).astype(np.float32)
    f0 /= np.linalg.norm(f0, axis=1, keepdims=True)
    f1 = rng.normal(size=(m_, C)).astype(np.float32)
    f1 /= np.linalg.norm(f1, axis=1, keepdims=True)
    corr = np.stack([np.arange(60), np.arange(60)], 1).astype(np.int64)
    ov = np.clip(rng.uniform(size=n + m_), 1e-3, 1 - 1e-3).astype(np.float32)
    sal = np.clip(rng.uniform(size=n + m_), 1e-3, 1 - 1e-3).astype(np.float32)

    cfg = types.SimpleNamespace(
        pos_margin=0.1, neg_margin=1.4, max_points=512, safe_radius=0.75,
        matchability_radius=0.3, pos_radius=0.21,
    )
    loss_t = ref.loss.MetricLoss(cfg, log_scale=48)
    with _cuda_to_noop(), torch.no_grad():
        stats_t = loss_t.forward(
            torch.from_numpy(src), torch.from_numpy(tgt),
            torch.from_numpy(f0), torch.from_numpy(f1),
            torch.from_numpy(corr),
            torch.from_numpy(t_gt[:3, :3]), torch.from_numpy(t_gt[:3, 3:4]),
            torch.from_numpy(ov), torch.from_numpy(sal),
        )

    stats_j = metric_loss(
        jax_key, jnp.asarray(src), jnp.asarray(tgt),
        jnp.ones((n,), bool), jnp.ones((m_,), bool),
        jnp.asarray(f0), jnp.asarray(f1),
        jnp.asarray(corr[:, 0].astype(np.int32)),
        jnp.asarray(corr[:, 1].astype(np.int32)),
        jnp.ones((60,), bool), jnp.asarray(t_gt),
        jnp.asarray(ov[:n]), jnp.asarray(ov[n:]),
        jnp.asarray(sal[:n]), jnp.asarray(sal[n:]),
        pos_radius=0.21, safe_radius=0.75, matchability_radius=0.3,
        pos_margin=0.1, neg_margin=1.4, log_scale=48.0, max_points=512,
    )

    for key in ("circle_loss", "recall", "overlap_loss", "overlap_precision",
                "overlap_recall", "saliency_loss", "saliency_precision",
                "saliency_recall"):
        want = float(stats_t[key])
        got = float(stats_j[key])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4,
                                   err_msg=key)


# ---------------------------------------------------------------------------
# (d) robust IRLS pose solver
# ---------------------------------------------------------------------------

def test_est_quad_linear_robust_parity(ref_transform_estimation, rng):
    from apr_tpu.geometry.robust import est_rigid_robust

    n = 200
    pts0 = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    ang = np.array([0.03, -0.05, 0.08])
    from apr_tpu.geometry.se3 import make_transform, rotation_from_euler

    t_true = _np(make_transform(rotation_from_euler(jnp.asarray(ang)),
                                jnp.asarray([0.3, -0.2, 0.5])))
    pts1 = (pts0 @ t_true[:3, :3].T + t_true[:3, 3]).astype(np.float32)
    pts1[:30] += rng.normal(scale=0.5, size=(30, 3)).astype(np.float32)
    w = rng.uniform(0.2, 1.0, (n, 1)).astype(np.float32)

    t_ref = ref_transform_estimation.est_quad_linear_robust(
        torch.from_numpy(pts0), torch.from_numpy(pts1), torch.from_numpy(w)
    ).numpy()
    t_jax = _np(est_rigid_robust(jnp.asarray(pts0), jnp.asarray(pts1),
                                 jnp.asarray(w[:, 0])))
    np.testing.assert_allclose(t_jax, t_ref, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# (e)+(f)+(g) full models with imported weights
# ---------------------------------------------------------------------------

def _np_grid_subsample(pts, dl):
    """Barycenter grid subsample, deterministic order (sorted voxel key)."""
    keys = np.floor(pts / dl).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    out = np.zeros((len(uniq), 3), np.float64)
    cnt = np.zeros(len(uniq), np.int64)
    np.add.at(out, inv, pts)
    np.add.at(cnt, inv, 1)
    return (out / cnt[:, None]).astype(np.float32)


def _np_radius_neighbors(q, s, r, cap):
    """Distance-sorted radius neighbors, shadow = len(s)."""
    d = np.linalg.norm(q[:, None] - s[None, :], axis=-1)
    out = np.full((len(q), cap), len(s), np.int64)
    for i in range(len(q)):
        idx = np.nonzero(d[i] < r)[0]
        idx = idx[np.argsort(d[i][idx], kind="stable")][:cap]
        out[i, : len(idx)] = idx
    return out


def _np_knn1(q, s):
    d = np.linalg.norm(q[:, None] - s[None, :], axis=-1)
    return np.argmin(d, axis=1)[:, None].astype(np.int64)


class _RefConfig(types.SimpleNamespace):
    pass


def _make_ref_config(first_feats_dim=32, gnn_feats_dim=32, final_feats_dim=16,
                     dl=0.4, conv_radius=2.5, kp_extent=1.2,
                     switch_to_decoder=False, symmetric=False,
                     point_generation_ratio=4):
    arch = [
        "simple", "resnetb",
        "resnetb_strided", "resnetb", "resnetb",
        "resnetb_strided", "resnetb", "resnetb",
        "resnetb_strided", "resnetb", "resnetb",
        "nearest_upsample", "unary",
        "nearest_upsample", "unary",
        "nearest_upsample", "last_unary",
    ]
    return _RefConfig(
        architecture=arch, first_subsampling_dl=dl, conv_radius=conv_radius,
        in_feats_dim=1, first_feats_dim=first_feats_dim,
        final_feats_dim=final_feats_dim, num_kernel_points=15,
        KP_extent=kp_extent, in_points_dim=3, fixed_kernel_points="center",
        KP_influence="linear", aggregation_mode="sum", modulated=False,
        use_batch_norm=True, batch_norm_momentum=0.02,
        deform_radius=5.0, gnn_feats_dim=gnn_feats_dim, dgcnn_k=6,
        num_head=4, nets=["self", "cross", "self"], condition_feature=True,
        add_cross_score=True, switch_to_decoder=switch_to_decoder,
        symmetric=symmetric, point_generation_ratio=point_generation_ratio,
    )


def _build_pyramids(rng, dl=0.4, conv_radius=2.5, levels=4, nmax=16):
    """Identical pyramid tables for both frameworks.

    Returns (torch_batch_parts, jax_pyramids): per-cloud numpy levels plus
    the stacked/offset torch tables and padded apr_tpu KPPyramids.
    """
    from apr_tpu.models.kpconv import KPLevel, KPPyramid

    clouds = [
        rng.uniform(0, 4.0, (130, 3)).astype(np.float32),
        rng.uniform(0, 4.0, (115, 3)).astype(np.float32),
    ]
    per_cloud = []  # [cloud][level] -> dict(points, neighbors, pools, ups)
    for pts in clouds:
        lv_pts = []
        p = pts
        d = dl
        for l in range(levels):
            p = _np_grid_subsample(p, d)
            lv_pts.append(p)
            d *= 2
        tabs = []
        r = dl * conv_radius
        for l in range(levels):
            nb = _np_radius_neighbors(lv_pts[l], lv_pts[l], r, nmax)
            if l + 1 < levels:
                pools = _np_radius_neighbors(lv_pts[l + 1], lv_pts[l], r, nmax)
                ups = _np_knn1(lv_pts[l], lv_pts[l + 1])
            else:
                pools = np.zeros((1, 1), np.int64)
                ups = np.zeros((1, 1), np.int64)
            tabs.append(dict(points=lv_pts[l], neighbors=nb, pools=pools,
                             ups=ups))
            r *= 2
        per_cloud.append(tabs)

    # ---- torch batch: stacked arrays with index offsets, shadow = total N
    t_batch = {"points": [], "neighbors": [], "pools": [], "upsamples": [],
               "stack_lengths": []}
    for l in range(levels):
        a, b = per_cloud[0][l], per_cloud[1][l]
        na, nb_ = len(a["points"]), len(b["points"])
        t_batch["points"].append(
            torch.from_numpy(np.concatenate([a["points"], b["points"]])))
        t_batch["stack_lengths"].append(
            torch.tensor([na, nb_], dtype=torch.int32))

        def _stack_tables(ka, kb, na_s, nb_s, off_b):
            # remap per-cloud shadow (len of own supports) to stacked shadow
            ta = ka.copy()
            ta[ta == na_s] = na_s + nb_s
            tb = kb.copy()
            tb_valid = tb != nb_s
            tb[tb_valid] += off_b
            tb[~tb_valid] = na_s + nb_s
            return torch.from_numpy(np.concatenate([ta, tb]))

        t_batch["neighbors"].append(
            _stack_tables(a["neighbors"], b["neighbors"], na, nb_, na))
        if l + 1 < levels:
            na1 = len(per_cloud[0][l + 1]["points"])
            nb1 = len(per_cloud[1][l + 1]["points"])
            t_batch["pools"].append(
                _stack_tables(a["pools"], b["pools"], na, nb_, na))
            # upsamples index the COARSER level
            t_batch["upsamples"].append(
                _stack_tables(a["ups"], b["ups"], na1, nb1, na1))
        else:
            t_batch["pools"].append(torch.zeros((1, 1), dtype=torch.int64))
            t_batch["upsamples"].append(torch.zeros((1, 1), dtype=torch.int64))
    n_total0 = len(per_cloud[0][0]["points"]) + len(per_cloud[1][0]["points"])
    t_batch["features"] = torch.ones((n_total0, 1), dtype=torch.float32)

    # ---- apr_tpu pyramids: shared per-level capacity, sentinel = capacity
    caps = [max(len(per_cloud[0][l]["points"]), len(per_cloud[1][l]["points"]))
            for l in range(levels)]
    pyrs = []
    for ci in range(2):
        lvls = []
        for l in range(levels):
            t = per_cloud[ci][l]
            n_l = len(t["points"])
            cap = caps[l]
            pts = np.zeros((cap, 3), np.float32)
            pts[:n_l] = t["points"]
            mask = np.zeros((cap,), bool)
            mask[:n_l] = True

            def _pad_table(tab, n_src, cap_rows, cap_src):
                out = np.full((cap_rows, tab.shape[1]), cap_src, np.int32)
                v = tab.copy()
                v[v == n_src] = cap_src
                out[: len(v)] = v
                return out

            nb_p = _pad_table(t["neighbors"], n_l, cap, cap)
            if l + 1 < levels:
                n_l1 = len(per_cloud[ci][l + 1]["points"])
                pools_p = _pad_table(t["pools"], n_l, caps[l + 1], cap)
                ups_p = _pad_table(t["ups"], n_l1, cap, caps[l + 1])
            else:
                pools_p = np.zeros((1, 1), np.int32)
                ups_p = np.zeros((1, 1), np.int32)
            lvls.append(KPLevel(
                points=jnp.asarray(pts), mask=jnp.asarray(mask),
                neighbors=jnp.asarray(nb_p), pools=jnp.asarray(pools_p),
                upsamples=jnp.asarray(ups_p),
            ))
        pyrs.append(KPPyramid(levels=tuple(lvls)))
    return t_batch, pyrs[0], pyrs[1], per_cloud


def test_kpfcnn_full_forward_parity(ref, rng):
    from apr_tpu.models.kpfcnn import KPFCNN

    from tools.import_torch_checkpoint import import_kpfcnn

    cfg = _make_ref_config()
    with _cwd(PRED):
        torch.manual_seed(0)
        model_t = ref.arch.KPFCNN(cfg)
    model_t.eval()

    t_batch, pyr0, pyr1, per_cloud = _build_pyramids(
        rng, dl=cfg.first_subsampling_dl, conv_radius=cfg.conv_radius)

    model_j = KPFCNN(
        final_feats_dim=cfg.final_feats_dim,
        first_feats_dim=cfg.first_feats_dim,
        gnn_feats_dim=cfg.gnn_feats_dim, dgcnn_k=cfg.dgcnn_k,
        num_head=cfg.num_head, nets=("self", "cross", "self"),
        first_subsampling_dl=cfg.first_subsampling_dl,
        conv_radius=cfg.conv_radius, kp_extent=cfg.KP_extent,
        num_kernel_points=cfg.num_kernel_points,
    )
    params = jax.jit(model_j.init)(jax.random.PRNGKey(0), pyr0, pyr1)["params"]
    sd = {k: v.detach().numpy() for k, v in model_t.state_dict().items()}
    params = import_kpfcnn(sd, jax.device_get(params))

    out = jax.jit(model_j.apply)({"params": params}, pyr0, pyr1)

    with torch.no_grad():
        feats_t, ov_t, sal_t = model_t(t_batch)
    n0 = len(per_cloud[0][0]["points"])
    n1 = len(per_cloud[1][0]["points"])

    np.testing.assert_allclose(_np(out.feats0)[:n0], feats_t[:n0].numpy(),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(_np(out.feats1)[:n1], feats_t[n0:].numpy(),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(_np(out.overlap0)[:n0], ov_t[:n0].numpy(),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(_np(out.overlap1)[:n1], ov_t[n0:].numpy(),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(_np(out.saliency0)[:n0], sal_t[:n0].numpy(),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(_np(out.saliency1)[:n1], sal_t[n0:].numpy(),
                               rtol=1e-3, atol=2e-3)


def test_kpfcnn_decoder_symmetric_parity(ref, rng):
    from apr_tpu.models.kpfcnn import KPFCNNDecoder

    from tools.import_torch_checkpoint import import_kpfcnn_decoder

    cfg = _make_ref_config(switch_to_decoder=True, symmetric=True,
                           final_feats_dim=16, point_generation_ratio=4)
    # decoder input dim = final_feats_dim (architectures.py:227)
    with _cwd(PRED):
        torch.manual_seed(1)
        dec_t = ref.arch.KPFCNNDecoder(cfg)
    dec_t.eval()

    t_batch, pyr0, pyr1, per_cloud = _build_pyramids(
        rng, dl=cfg.first_subsampling_dl, conv_radius=cfg.conv_radius)
    n0 = len(per_cloud[0][0]["points"])
    n1 = len(per_cloud[1][0]["points"])
    cap0 = pyr0.levels[0].points.shape[0]

    f0 = rng.normal(size=(cap0, cfg.final_feats_dim)).astype(np.float32)
    f1 = rng.normal(size=(cap0, cfg.final_feats_dim)).astype(np.float32)
    f0[n0:] = 0.0
    f1[n1:] = 0.0
    t_batch["second_features"] = torch.from_numpy(
        np.concatenate([f0[:n0], f1[:n1]]))

    dec_j = KPFCNNDecoder(
        point_generation_ratio=cfg.point_generation_ratio,
        first_feats_dim=cfg.first_feats_dim,
        first_subsampling_dl=cfg.first_subsampling_dl,
        conv_radius=cfg.conv_radius, kp_extent=cfg.KP_extent,
        num_kernel_points=cfg.num_kernel_points,
    )
    params = jax.jit(dec_j.init)(
        jax.random.PRNGKey(0), jnp.asarray(f0), jnp.asarray(f1), pyr0, pyr1
    )["params"]
    sd = {k: v.detach().numpy() for k, v in dec_t.state_dict().items()}
    params = import_kpfcnn_decoder(sd, jax.device_get(params))

    o0, o1 = jax.jit(dec_j.apply)({"params": params}, jnp.asarray(f0),
                                  jnp.asarray(f1), pyr0, pyr1)
    with torch.no_grad():
        out_t = dec_t(t_batch)
    np.testing.assert_allclose(_np(o0)[:n0], out_t[:n0].numpy(),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(_np(o1)[:n1], out_t[n0:].numpy(),
                               rtol=1e-3, atol=2e-3)


def test_generative_mlp_predator_parity(ref, rng):
    from apr_tpu.models.mlp import GenerativeMLP

    from tools.import_torch_checkpoint import import_generative_mlp_predator

    C, ratio, n = 16, 4, 64
    torch.manual_seed(0)
    mlp_t = ref.mlp.GenerativeMLP_98(in_channel=C, out_points=ratio,
                                     radius=None, bn_momentum=0.02)
    mlp_t.eval()

    x = rng.normal(size=(n, C)).astype(np.float32)
    mlp_j = GenerativeMLP(hidden=(512, 256), out_points=ratio,
                          bn_momentum=0.02, final_bn=True)
    mask = jnp.ones((n,), bool)
    v = mlp_j.init(jax.random.PRNGKey(0), jnp.asarray(x), mask, train=False)
    sd = {k: t.detach().numpy() for k, t in mlp_t.state_dict().items()}
    params, stats = import_generative_mlp_predator(sd)

    out_j = mlp_j.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(x), mask, train=False)
    with torch.no_grad():
        out_t = mlp_t(torch.from_numpy(x))
    np.testing.assert_allclose(_np(out_j), out_t.numpy(), rtol=1e-4, atol=1e-5)
