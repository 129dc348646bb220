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
