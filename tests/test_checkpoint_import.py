"""Round-trip test of the reference .pth importer against our param trees."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import sys, os  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.import_torch_checkpoint import (  # noqa: E402
    import_generative_mlp,
    import_resunet,
)


def _fake_resunet_state_dict(channels=(32, 64, 128, 256),
                             tr=(32, 64, 64, 128), n_out=16, k1=125):
    """Build a torch state_dict shaped like the reference ResUNetBN2."""
    rng = np.random.default_rng(0)
    sd = {}

    def t(shape):
        return torch.from_numpy(rng.normal(size=shape).astype(np.float32))

    def add_norm(name, c):
        sd[f"{name}.bn.weight"] = t((c,))
        sd[f"{name}.bn.bias"] = t((c,))
        sd[f"{name}.bn.running_mean"] = t((c,))
        sd[f"{name}.bn.running_var"] = torch.abs(t((c,)))

    prev = 1
    for i, c in enumerate(channels, 1):
        k = k1 if i == 1 else 27
        sd[f"conv{i}.kernel"] = t((k, prev, c))
        add_norm(f"norm{i}", c)
        sd[f"block{i}.conv1.kernel"] = t((27, c, c))
        sd[f"block{i}.conv1.bias"] = t((c,))
        sd[f"block{i}.conv2.kernel"] = t((27, c, c))
        add_norm(f"block{i}.norm1", c)
        add_norm(f"block{i}.norm2", c)
        prev = c

    ins = {4: channels[3], 3: channels[2] + tr[3], 2: channels[1] + tr[2]}
    for i in (4, 3, 2):
        sd[f"conv{i}_tr.kernel"] = t((27, ins[i], tr[i - 1]))
        add_norm(f"norm{i}_tr", tr[i - 1])
        sd[f"block{i}_tr.conv1.kernel"] = t((27, tr[i - 1], tr[i - 1]))
        sd[f"block{i}_tr.conv1.bias"] = t((tr[i - 1],))
        sd[f"block{i}_tr.conv2.kernel"] = t((27, tr[i - 1], tr[i - 1]))
        add_norm(f"block{i}_tr.norm1", tr[i - 1])
        add_norm(f"block{i}_tr.norm2", tr[i - 1])
    sd["conv1_tr.kernel"] = t((channels[0] + tr[1], tr[0]))
    sd["final.kernel"] = t((tr[0], n_out))
    sd["final.bias"] = t((n_out,))
    return sd


def test_import_resunet_structure():
    sd = _fake_resunet_state_dict()
    params, stats = import_resunet(sd)
    # all encoder/decoder convs + norms present
    for i in range(1, 5):
        assert params[f"conv{i}"]["kernel"].shape[0] in (27, 125)
        assert "scale" in params[f"norm{i}"]
        assert "mean" in stats[f"norm{i}"]
        assert params[f"block{i}"]["conv1"]["kernel"].ndim == 3
    for i in (4, 3, 2):
        assert f"conv{i}_tr" in params
        assert f"block{i}_tr" in params
    assert params["conv1_tr"]["kernel"].ndim == 2
    assert params["final"]["bias"].shape == (16,)
    # round-trip values
    np.testing.assert_allclose(
        params["final"]["kernel"], sd["final.kernel"].numpy()
    )


def test_import_generative_mlp():
    rng = np.random.default_rng(1)
    sd = {}

    def t(shape):
        return torch.from_numpy(rng.normal(size=shape).astype(np.float32))

    # Sequential: 0 Linear, 2 BN, 3 Linear, 5 BN, 6 Linear (98 plan)
    dims = [(128, 512), (512, 256), (256, 12)]
    lin_ids = [0, 3, 6]
    bn_ids = [2, 5]
    for (i, (a, b)) in zip(lin_ids, dims):
        sd[f"mlp.{i}.weight"] = t((b, a))
        sd[f"mlp.{i}.bias"] = t((b,))
    for i, c in zip(bn_ids, (512, 256)):
        sd[f"mlp.{i}.weight"] = t((c,))
        sd[f"mlp.{i}.bias"] = t((c,))
        sd[f"mlp.{i}.running_mean"] = t((c,))
        sd[f"mlp.{i}.running_var"] = torch.abs(t((c,)))

    params, stats = import_generative_mlp(sd)
    assert params["Dense_0"]["kernel"].shape == (128, 512)  # transposed
    assert params["Dense_2"]["kernel"].shape == (256, 12)
    assert stats["MaskedBatchNorm_0"]["mean"].shape == (512,)
    np.testing.assert_allclose(
        params["Dense_1"]["kernel"], sd["mlp.3.weight"].numpy().T
    )


# --- golden feature-map tests ----------------------------------------------

@pytest.mark.slow
def test_mlp_import_golden_vs_torch():
    """Imported MLP reproduces the torch reference forward EXACTLY.

    Builds the reference GenerativeMLP_54 stack (FCGF_APR/model/mlp.py:14-25:
    Linear-ReLU-BN per hidden layer, final Linear-ReLU) in torch with random
    weights AND nontrivial running stats, imports the state_dict, and checks
    the flax eval-mode forward against torch eval-mode output.
    """
    import jax
    import jax.numpy as jnp
    import torch.nn as tnn

    from apr_tpu.models.mlp import make_generative_mlp

    torch.manual_seed(3)
    model = tnn.Sequential(
        tnn.Linear(8, 32), tnn.ReLU(), tnn.BatchNorm1d(32),
        tnn.Linear(32, 16), tnn.ReLU(), tnn.BatchNorm1d(16),
        tnn.Linear(16, 6), tnn.ReLU(),
    )
    # push nontrivial running stats through train-mode forwards
    model.train()
    for _ in range(3):
        model(torch.randn(64, 8) * 2.0 + 0.5)
    model.eval()

    x = torch.randn(40, 8)
    with torch.no_grad():
        ref = model(x).numpy()

    sd = {f"mlp.{k}": v for k, v in model.state_dict().items()}
    params, stats = import_generative_mlp(sd)

    flax_mlp = make_generative_mlp("GenerativeMLP_54", out_points=2)
    # shape-check against a real init so the mapping targets real slots
    init = flax_mlp.init(jax.random.PRNGKey(0), jnp.zeros((4, 8)),
                         jnp.ones(4, bool))
    got_tree = jax.tree_util.tree_structure(init["params"])
    import_tree = jax.tree_util.tree_structure(
        jax.tree.map(jnp.asarray, params))
    assert got_tree == import_tree

    out = flax_mlp.apply(
        {"params": jax.tree.map(jnp.asarray, params),
         "batch_stats": jax.tree.map(jnp.asarray, stats)},
        jnp.asarray(x.numpy()), jnp.ones(40, bool), train=False,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_sparse_conv_golden_enumeration():
    """Kernel slot j convolves the neighbor at offsets_grid[j] — the
    documented ME enumeration assumption (z fastest, C-order over x,y,z).

    Hand-computes the conv in numpy from that enumeration and checks
    sparse_conv_apply + kernel_map_same reproduce it, so an imported
    [K, Ci, Co] ME kernel lands slot-for-slot on the intended offsets."""
    import jax.numpy as jnp

    from apr_tpu.models.sparse import (
        SparseLevel, kernel_map_same, offsets_grid, sparse_conv_apply,
    )
    from apr_tpu.ops.hashing import INVALID_KEY, pack_coords

    coords = np.array(
        [[0, 0, 0], [0, 0, 1], [0, 1, 0], [1, 0, 0], [2, 2, 2]], np.int32)
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(5, 4)).astype(np.float32)
    w = rng.normal(size=(27, 4, 3)).astype(np.float32)

    keys = pack_coords(jnp.asarray(coords))
    order = np.argsort(np.asarray(keys))
    coords_s, feats_s = coords[order], feats[order]
    cap = 8
    pad_c = np.zeros((cap - 5, 3), np.int32)
    level = SparseLevel(
        coords=jnp.asarray(np.concatenate([coords_s, pad_c])),
        keys=jnp.concatenate([keys[jnp.asarray(order)],
                              jnp.full((cap - 5,), INVALID_KEY)]),
        mask=jnp.asarray(np.arange(cap) < 5),
    )
    feats_pad = np.concatenate([feats_s, np.zeros((cap - 5, 4), np.float32)])

    table = kernel_map_same(level, 3)
    out = sparse_conv_apply(jnp.asarray(feats_pad), table, jnp.asarray(w),
                            level.mask)

    offs = offsets_grid(3)
    lut = {tuple(c): i for i, c in enumerate(coords_s)}
    expected = np.zeros((cap, 3), np.float32)
    for i in range(5):
        for j, o in enumerate(offs):
            nb = lut.get(tuple(coords_s[i] + o))
            if nb is not None:
                expected[i] += feats_s[nb] @ w[j]
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4,
                               atol=1e-5)
