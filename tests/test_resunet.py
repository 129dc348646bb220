import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apr_tpu.ops import voxelize
from apr_tpu.models import build_pyramid, load_model, make_resunet, model_names
from apr_tpu.models.mlp import make_generative_mlp


CAPS = (512, 256, 128, 64)


def _batch_pyramid(rng, batch=2, n=400, voxel=0.5):
    grids = []
    for _ in range(batch):
        pts = rng.uniform(-6, 6, size=(n, 3)).astype(np.float32)
        grids.append(voxelize(jnp.asarray(pts), voxel, capacity=CAPS[0]))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *grids)
    pyr = jax.vmap(lambda g: build_pyramid(g, CAPS, conv1_kernel_size=3))(stacked)
    return pyr


@pytest.mark.slow
def test_resunet_forward_shapes_and_masking(rng, jax_key):
    pyr = _batch_pyramid(rng)
    model = make_resunet(
        "ResUNetBN2C", in_channels=1, out_channels=16,
        normalize_feature=True, conv1_kernel_size=3,
    )
    feats = jnp.ones((2, CAPS[0], 1), jnp.float32)
    feats = jnp.where(pyr.levels[0].mask[..., None], feats, 0.0)
    variables = model.init(jax_key, feats, pyr, train=False)
    out = model.apply(variables, feats, pyr, train=False)
    assert out.shape == (2, CAPS[0], 16)
    m = np.asarray(pyr.levels[0].mask)
    o = np.asarray(out)
    # padded rows exactly zero; valid rows unit-norm
    assert (o[~m] == 0).all()
    np.testing.assert_allclose(
        np.linalg.norm(o[m], axis=-1), 1.0, atol=1e-4
    )
    assert np.isfinite(o).all()


@pytest.mark.slow
def test_resunet_train_updates_batch_stats(rng, jax_key):
    pyr = _batch_pyramid(rng)
    model = make_resunet("ResUNetBN2", in_channels=1, out_channels=8,
                         conv1_kernel_size=3)
    feats = jnp.ones((2, CAPS[0], 1), jnp.float32)
    variables = model.init(jax_key, feats, pyr, train=False)
    out, updates = model.apply(
        variables, feats, pyr, train=True, mutable=["batch_stats"]
    )
    # running stats moved away from init
    flat = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(float(jnp.abs(x).sum()) > 0 for x in flat)


@pytest.mark.slow
def test_resunet_padding_invariance(rng, jax_key):
    """Growing the padding capacity must not change valid outputs."""
    pts = rng.uniform(-6, 6, size=(300, 3)).astype(np.float32)

    outs = []
    for cap0 in (512, 768):
        caps = (cap0, 256, 128, 64)
        grid = voxelize(jnp.asarray(pts), 0.5, capacity=cap0)
        pyr = jax.vmap(lambda g: build_pyramid(g, caps, conv1_kernel_size=3))(
            jax.tree.map(lambda x: x[None], grid)
        )
        model = make_resunet("ResUNetBN2", in_channels=1, out_channels=8,
                             conv1_kernel_size=3)
        feats = jnp.ones((1, cap0, 1), jnp.float32)
        variables = model.init(jax.random.PRNGKey(7), feats, pyr, train=False)
        out = model.apply(variables, feats, pyr, train=False)
        m = np.asarray(pyr.levels[0].mask[0])
        keys = np.asarray(pyr.levels[0].keys[0])[m]
        o = np.asarray(out[0])[m]
        outs.append(dict(zip(map(int, keys), map(tuple, o))))
    assert outs[0].keys() == outs[1].keys()
    for k in outs[0]:
        np.testing.assert_allclose(outs[0][k], outs[1][k], atol=2e-3)


def test_generative_mlp(rng, jax_key):
    mlp = make_generative_mlp("GenerativeMLP_98", out_points=4)
    x = jnp.asarray(rng.normal(size=(2, 64, 32)).astype(np.float32))
    mask = jnp.ones((2, 64), bool).at[:, 50:].set(False)
    variables = mlp.init(jax_key, x, mask, train=False)
    out = mlp.apply(variables, x, mask, train=False)
    assert out.shape == (2, 64, 12)
    assert (np.asarray(out) >= 0).all()  # final ReLU: non-negative offsets
    assert (np.asarray(out)[:, 50:] == 0).all()


def test_registry_names():
    names = model_names()
    for expected in ("ResUNetBN2C", "ResUNetFatBN", "ResUNetIN2E",
                     "GenerativeMLP_98", "GenerativeMLP_11_10_9"):
        assert expected in names
    factory = load_model("ResUNetFatBN")
    m = factory(out_channels=128, conv1_kernel_size=3)
    assert m.tr_channels == (128, 128, 128, 256)
    with pytest.raises(ValueError):
        load_model("NoSuchNet")


def test_ones_input_conv1_parity(rng, jax_key):
    """ones_input=True (validity-matmul conv1, no gather) must reproduce the
    gather-form forward exactly: the gathered [N, K, 1] matrix of a masked
    all-ones input IS the table-validity pattern, so both paths feed the
    same operands to the same matmul."""
    pyr = _batch_pyramid(rng)
    feats = jnp.ones((2, CAPS[0], 1), jnp.float32)
    feats = jnp.where(pyr.levels[0].mask[..., None], feats, 0.0)
    kw = dict(in_channels=1, out_channels=16, conv1_kernel_size=3)
    gather_form = make_resunet("ResUNetBN2C", **kw)
    ones_form = make_resunet("ResUNetBN2C", ones_input=True, **kw)
    variables = gather_form.init(jax_key, feats, pyr, train=False)
    # identical parameter trees: ones_input changes the apply path only
    assert jax.tree_util.tree_structure(
        ones_form.init(jax_key, feats, pyr, train=False)
    ) == jax.tree_util.tree_structure(variables)
    a = gather_form.apply(variables, feats, pyr, train=False)
    b = ones_form.apply(variables, feats, pyr, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # train mode (batch-stat updates) must agree too
    at, au = gather_form.apply(variables, feats, pyr, train=True,
                               mutable=["batch_stats"])
    bt, bu = ones_form.apply(variables, feats, pyr, train=True,
                             mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(at), np.asarray(bt), atol=1e-6)
    for x, y in zip(jax.tree_util.tree_leaves(au),
                    jax.tree_util.tree_leaves(bu)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_ones_input_simpleunet_parity(rng, jax_key):
    from apr_tpu.models import make_simplenet
    pyr = _batch_pyramid(rng)
    feats = jnp.ones((2, CAPS[0], 1), jnp.float32)
    feats = jnp.where(pyr.levels[0].mask[..., None], feats, 0.0)
    kw = dict(in_channels=1, out_channels=8, conv1_kernel_size=3)
    gather_form = make_simplenet("SimpleNet", **kw)
    ones_form = make_simplenet("SimpleNet", ones_input=True, **kw)
    variables = gather_form.init(jax_key, feats, pyr, train=False)
    a = gather_form.apply(variables, feats, pyr, train=False)
    b = ones_form.apply(variables, feats, pyr, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
