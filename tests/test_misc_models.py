import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apr_tpu.models import build_pyramid, load_model, model_names
from apr_tpu.ops import voxelize
from apr_tpu.utils.ply import read_ply, write_ply
from apr_tpu.utils.visualization import embed_features_rgb


@pytest.mark.slow
@pytest.mark.veryslow
def test_simplenet_forward(rng, jax_key):
    caps = (512, 256, 128)
    pts = rng.uniform(-6, 6, size=(400, 3)).astype(np.float32)
    grid = voxelize(jnp.asarray(pts), 0.5, capacity=caps[0])
    pyr = jax.vmap(lambda g: build_pyramid(g, caps, conv1_kernel_size=3))(
        jax.tree.map(lambda x: x[None], grid)
    )
    model = load_model("SimpleNetBN")(
        out_channels=16, conv1_kernel_size=3, normalize_feature=True
    )
    feats = jnp.where(pyr.levels[0].mask[..., None],
                      jnp.ones((1, caps[0], 1), jnp.float32), 0.0)
    variables = jax.jit(
        lambda k, f, p: model.init(k, f, p, train=False)
    )(jax_key, feats, pyr)
    out = model.apply(variables, feats, pyr, train=False)
    m = np.asarray(pyr.levels[0].mask[0])
    o = np.asarray(out[0])
    assert out.shape == (1, caps[0], 16)
    np.testing.assert_allclose(np.linalg.norm(o[m], axis=1), 1.0, atol=1e-4)
    assert (o[~m] == 0).all()


def test_simplenet_registry():
    names = model_names()
    for n in ("SimpleNetBN", "SimpleNetIN", "SimpleNetBNE", "SimpleNetBN2",
              "SimpleNetIN3E"):
        assert n in names, n
    m = load_model("SimpleNetBN2E")()
    assert m.channels == (16, 32, 64, 128)
    assert m.norm_type == "BN"
    m2 = load_model("SimpleNetIN3")()
    assert m2.norm_type == "IN" and len(m2.channels) == 5


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (100, 3)).astype(np.uint8)
    p = str(tmp_path / "test.ply")
    write_ply(p, [pts, rgb], ["x", "y", "z", "red", "green", "blue"])
    back = read_ply(p)
    np.testing.assert_allclose(
        np.stack([back["x"], back["y"], back["z"]], 1), pts, rtol=1e-6
    )
    np.testing.assert_array_equal(back["red"], rgb[:, 0])


def test_embed_features_rgb(rng):
    feats = rng.normal(size=(200, 16)).astype(np.float32)
    colors = embed_features_rgb(feats, method="pca")
    assert colors.shape == (200, 3)
    assert (colors >= 0).all() and (colors <= 1).all()


def test_simplenet_gradients(rng, jax_key):
    """Strided/up SparseConvs must pass their transpose maps — jax.grad
    through every SimpleNet conv (regression: the adjoint-backward default
    of table_t=table broke backprop for non-same-level convs)."""
    import jax
    import jax.numpy as jnp
    from apr_tpu.models.simpleunet import SimpleUNet
    from apr_tpu.models.sparse import build_pyramid
    from apr_tpu.ops.voxelize import voxelize

    pts = jnp.asarray(rng.uniform(-8, 8, (500, 3)).astype(np.float32))
    grid = voxelize(pts, 1.0, 256, jnp.ones(500, bool))
    pyr = build_pyramid(grid, (256, 128, 64), conv1_kernel_size=3)
    pyr = jax.tree.map(lambda x: x[None], pyr)
    model = SimpleUNet(out_channels=8, channels=(8, 16, 16),
                       tr_channels=(8, 8, 16))
    feats = jnp.ones((1, 256, 1))
    vars_ = model.init(jax_key, feats, pyr, False)

    def loss(p):
        out = model.apply({"params": p,
                           "batch_stats": vars_.get("batch_stats", {})},
                          feats, pyr, False)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(vars_["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)
