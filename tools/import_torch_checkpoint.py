"""Import reference FCGF-APR .pth checkpoints into apr_tpu flax params.

The reference ships pretrained checkpoints (README.md:85) saved as
{epoch, encoder_state_dict (or state_dict), generator_state_dict, optimizer,
...} (FCGF_APR/lib/complement_trainer.py:249-263).  This tool maps those
tensors onto the apr_tpu ResUNet2 / GenerativeMLP parameter trees so
reference-trained weights can be evaluated in this framework (feature- and
pose-fidelity checks, SURVEY.md §7 step 3).

Mapping notes:
- torch Linear weight [out, in] -> flax Dense kernel [in, out] (transposed);
- ME sparse conv kernels are stored [K, in, out] with K = kernel volume; we
  assume ME's hypercube offset enumeration matches apr_tpu's
  ``offsets_grid`` (ij-ordered, z fastest). If a fidelity check against a
  real checkpoint shows systematic rotation of the receptive field, pass a
  permutation via ``--kernel_order`` to re-map offsets;
- BatchNorm weight/bias -> scale/bias params; running_mean/var -> batch_stats.

    python tools/import_torch_checkpoint.py --pth checkpoint.pth \
        --model ResUNetFatBN --out params.msgpack
"""

import argparse
import os
import sys
from typing import Dict, Optional

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _t(x):
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def import_resunet(sd: Dict, kernel_order: Optional[np.ndarray] = None):
    """Map an FCGF ResUNet2 state_dict to (params, batch_stats) dicts."""
    params: Dict = {}
    stats: Dict = {}

    def conv_kernel(name):
        w = _t(sd[f"{name}.kernel"])
        if w.ndim == 2:  # 1x1 convs are stored [in, out]
            return w
        if kernel_order is not None:
            w = w[kernel_order]
        return w

    def put_norm(flax_name, torch_name):
        params[flax_name] = {
            "scale": _t(sd[f"{torch_name}.bn.weight"])
            if f"{torch_name}.bn.weight" in sd
            else _t(sd[f"{torch_name}.weight"]),
            "bias": _t(sd[f"{torch_name}.bn.bias"])
            if f"{torch_name}.bn.bias" in sd
            else _t(sd[f"{torch_name}.bias"]),
        }
        mean_key = (
            f"{torch_name}.bn.running_mean"
            if f"{torch_name}.bn.running_mean" in sd
            else f"{torch_name}.running_mean"
        )
        var_key = mean_key.replace("running_mean", "running_var")
        stats[flax_name] = {
            "mean": _t(sd[mean_key]),
            "var": _t(sd[var_key]),
        }

    # encoder convs + norms
    for i in range(1, 5):
        params[f"conv{i}"] = {"kernel": conv_kernel(f"conv{i}")}
        put_norm(f"norm{i}", f"norm{i}")
        blk = {}
        bstats = {}
        blk["conv1"] = {"kernel": conv_kernel(f"block{i}.conv1")}
        if f"block{i}.conv1.bias" in sd:
            blk["conv1"]["bias"] = _t(sd[f"block{i}.conv1.bias"])
        blk["conv2"] = {"kernel": conv_kernel(f"block{i}.conv2")}
        for j, norm in enumerate(["norm1", "norm2"]):
            sub = f"MaskedBatchNorm_{j}"
            blk[sub] = {
                "scale": _t(sd[f"block{i}.{norm}.bn.weight"]),
                "bias": _t(sd[f"block{i}.{norm}.bn.bias"]),
            }
            bstats[sub] = {
                "mean": _t(sd[f"block{i}.{norm}.bn.running_mean"]),
                "var": _t(sd[f"block{i}.{norm}.bn.running_var"]),
            }
        params[f"block{i}"] = blk
        stats[f"block{i}"] = bstats

    # decoder
    for i in range(4, 1, -1):
        params[f"conv{i}_tr"] = {"kernel": conv_kernel(f"conv{i}_tr")}
        put_norm(f"norm{i}_tr", f"norm{i}_tr")
        blk = {}
        bstats = {}
        blk["conv1"] = {"kernel": conv_kernel(f"block{i}_tr.conv1")}
        if f"block{i}_tr.conv1.bias" in sd:
            blk["conv1"]["bias"] = _t(sd[f"block{i}_tr.conv1.bias"])
        blk["conv2"] = {"kernel": conv_kernel(f"block{i}_tr.conv2")}
        for j, norm in enumerate(["norm1", "norm2"]):
            sub = f"MaskedBatchNorm_{j}"
            blk[sub] = {
                "scale": _t(sd[f"block{i}_tr.{norm}.bn.weight"]),
                "bias": _t(sd[f"block{i}_tr.{norm}.bn.bias"]),
            }
            bstats[sub] = {
                "mean": _t(sd[f"block{i}_tr.{norm}.bn.running_mean"]),
                "var": _t(sd[f"block{i}_tr.{norm}.bn.running_var"]),
            }
        params[f"block{i}_tr"] = blk
        stats[f"block{i}_tr"] = bstats

    # 1x1 fusion + final (ME stores [1, in, out] or [in, out])
    w = _t(sd["conv1_tr.kernel"])
    params["conv1_tr"] = {"kernel": w.reshape(w.shape[-2], w.shape[-1])}
    wf = _t(sd["final.kernel"])
    params["final"] = {
        "kernel": wf.reshape(wf.shape[-2], wf.shape[-1]),
        "bias": _t(sd["final.bias"]).reshape(-1),
    }
    return params, stats


def import_generative_mlp(sd: Dict):
    """Map a GenerativeMLP state_dict (Linear/BN stacks) to flax."""
    params: Dict = {}
    stats: Dict = {}
    # torch Sequential: mlp.0 Linear, mlp.2 BN, mlp.3 Linear, mlp.5 BN, ...
    linear_keys = sorted(
        {k.split(".")[1] for k in sd if k.startswith("mlp.") and
         k.endswith(".weight") and f"mlp.{k.split('.')[1]}.running_mean" not in sd}
    , key=int)
    bn_keys = sorted(
        {k.split(".")[1] for k in sd if k.startswith("mlp.") and
         k.endswith(".running_mean")}
    , key=int)
    for i, lk in enumerate(linear_keys):
        params[f"Dense_{i}"] = {
            "kernel": _t(sd[f"mlp.{lk}.weight"]).T,
            "bias": _t(sd[f"mlp.{lk}.bias"]),
        }
    for i, bk in enumerate(bn_keys):
        params[f"MaskedBatchNorm_{i}"] = {
            "scale": _t(sd[f"mlp.{bk}.weight"]),
            "bias": _t(sd[f"mlp.{bk}.bias"]),
        }
        stats[f"MaskedBatchNorm_{i}"] = {
            "mean": _t(sd[f"mlp.{bk}.running_mean"]),
            "var": _t(sd[f"mlp.{bk}.running_var"]),
        }
    return params, stats


# ---------------------------------------------------------------------------
# Predator_APR KPFCNN / KPFCNNDecoder / GenerativeMLP mappings
# (state-dict layout: Predator_APR/lib/trainer.py:70-85; module structure:
#  models/architectures.py:9-340, models/blocks.py, models/gcn.py)
# ---------------------------------------------------------------------------

def _linear_w(sd, key):
    return _t(sd[key]).T                      # torch Linear [out,in] -> [in,out]


def _conv1d_w(sd, key):
    return _t(sd[key])[..., 0].T              # Conv1d [out,in,1] -> [in,out]


def _conv2d_w(sd, key):
    return _t(sd[key])[..., 0, 0].T           # Conv2d 1x1 -> [in,out]


# torch encoder_blocks index -> apr_tpu KPEncoder block name, for the
# 'kitti'/'nuscenes'/'indoor' architecture (configs/models.py: simple,
# resnetb, then 3x [resnetb_strided, resnetb, resnetb]).
KPFCNN_ENCODER_MAP = [
    ("0", "enc_simple"),
    ("1", "enc_l0_resnetb"),
    ("2", "enc_l0_strided"),
    ("3", "enc_l1_resnetb1"),
    ("4", "enc_l1_resnetb2"),
    ("5", "enc_l1_strided"),
    ("6", "enc_l2_resnetb1"),
    ("7", "enc_l2_resnetb2"),
    ("8", "enc_l2_strided"),
    ("9", "enc_l3_resnetb1"),
    ("10", "enc_l3_resnetb2"),
]

# torch decoder_blocks index -> apr_tpu KPDecoder unary name (decoder =
# upsample/unary/upsample/unary/upsample/last_unary; indices 1, 3, 5).
KPFCNN_DECODER_MAP = [("1", "dec_unary2"), ("3", "dec_unary1")]


def _import_kp_block(sd, prefix, dst):
    """One SimpleBlock / ResnetBottleneckBlock worth of tensors."""
    if f"{prefix}.KPConv.weights" in sd:
        dst["conv"]["weights"] = _t(sd[f"{prefix}.KPConv.weights"])
        dst["conv"]["kernel_points"] = _t(sd[f"{prefix}.KPConv.kernel_points"])
    for unary in ("unary1", "unary2", "unary_shortcut"):
        tk = f"{prefix}.{unary}.mlp.weight"
        if tk in sd:
            assert unary in dst, (
                f"torch has {tk} but flax block lacks {unary} — "
                "architecture mismatch")
            dst[unary]["Dense_0"]["kernel"] = _linear_w(sd, tk)
        else:
            # both sides build the sub-mlp under the same in/out-dim
            # condition (blocks.py:617-646 vs ResnetBottleneckBlock)
            assert unary not in dst, (
                f"flax block has {unary} but torch {prefix} does not")


def import_gcn(sd, dst, nets=("self", "cross", "self"), prefix="gnn"):
    """Map a reference GCN (models/gcn.py:171-206) onto apr_tpu GCN params.

    Self-attention convs are bias-free Conv2d 1x1; cross-attention q/k/v/
    merge are Conv1d with bias (head split uses torch's (dk, heads) channel
    order, mirrored by apr_tpu's CrossAttention so these import as plain
    transposes); InstanceNorms are affine-free in torch (apr_tpu's masked
    norms keep their identity-initialized affine params).
    """
    for i, kind in enumerate(nets):
        t = f"{prefix}.layers.{i}" if prefix else f"layers.{i}"
        if kind == "self":
            d = dst[f"self_{i}"]
            for conv in ("conv1", "conv2", "conv3"):
                d[conv]["kernel"] = _conv2d_w(sd, f"{t}.{conv}.weight")
        else:
            # 'cross' and 'cross_cat' (AttentionalPropagationCat,
            # gcn.py:159-168) share the exact key layout; only the apr_tpu
            # module name differs (proj[0] aliases .distribute — both names
            # hold the same tensor)
            d = dst[f"{kind}_{i}"]
            for j, name in enumerate(("q", "k", "v")):
                d[name]["kernel"] = _conv1d_w(sd, f"{t}.attn.proj.{j}.weight")
                d[name]["bias"] = _t(sd[f"{t}.attn.proj.{j}.bias"])
            d["merge"]["kernel"] = _conv1d_w(sd, f"{t}.attn.merge.weight")
            d["merge"]["bias"] = _t(sd[f"{t}.attn.merge.bias"])
            d["mlp1"]["kernel"] = _conv1d_w(sd, f"{t}.mlp.0.weight")
            d["mlp1"]["bias"] = _t(sd[f"{t}.mlp.0.bias"])
            d["mlp2"]["kernel"] = _conv1d_w(sd, f"{t}.mlp.3.weight")
            d["mlp2"]["bias"] = _t(sd[f"{t}.mlp.3.bias"])


def import_kpfcnn(sd, params, nets=("self", "cross", "self")):
    """Overwrite an apr_tpu KPFCNN param tree with a reference state_dict.

    ``params`` comes from ``KPFCNN(...).init(...)["params"]``; mapped leaves
    are replaced in place (plain nested dicts), identity-affine leaves of the
    masked norms (absent in torch: InstanceNorm1d affine=False) are left at
    their init values, as is last_unary's zero bias (torch LastUnaryBlock is
    bias-free, blocks.py:527).
    """
    import copy

    import jax

    params = copy.deepcopy(jax.device_get(params))

    enc = params["encoder"]
    for ti, name in KPFCNN_ENCODER_MAP:
        _import_kp_block(sd, f"encoder_blocks.{ti}", enc[name])

    params["bottle"]["kernel"] = _conv1d_w(sd, "bottle.weight")
    params["bottle"]["bias"] = _t(sd["bottle.bias"])
    import_gcn(sd, params["gnn"], nets=nets)
    params["proj_gnn"]["kernel"] = _conv1d_w(sd, "proj_gnn.weight")
    params["proj_gnn"]["bias"] = _t(sd["proj_gnn.bias"])
    params["proj_score"]["kernel"] = _conv1d_w(sd, "proj_score.weight")
    params["proj_score"]["bias"] = _t(sd["proj_score.bias"])
    params["epsilon"] = _t(sd["epsilon"]).reshape(())

    dec = params["decoder"]
    for ti, name in KPFCNN_DECODER_MAP:
        dec[name]["Dense_0"]["kernel"] = _linear_w(
            sd, f"decoder_blocks.{ti}.mlp.weight")
    dec["last_unary"]["kernel"] = _linear_w(sd, "decoder_blocks.5.mlp.weight")
    dec["last_unary"]["bias"] = np.zeros_like(dec["last_unary"]["bias"])
    return params


def import_kpfcnn_decoder(sd, params):
    """Symmetric-NPR KPFCNNDecoder (architectures.py:215-340): encoder +
    decoder blocks only (no bottleneck/GNN/scores)."""
    import copy
    import jax

    params = copy.deepcopy(jax.device_get(params))
    enc = params["encoder"]
    for ti, name in KPFCNN_ENCODER_MAP:
        _import_kp_block(sd, f"encoder_blocks.{ti}", enc[name])
    dec = params["decoder"]
    for ti, name in KPFCNN_DECODER_MAP:
        dec[name]["Dense_0"]["kernel"] = _linear_w(
            sd, f"decoder_blocks.{ti}.mlp.weight")
    dec["last_unary"]["kernel"] = _linear_w(sd, "decoder_blocks.5.mlp.weight")
    dec["last_unary"]["bias"] = np.zeros_like(dec["last_unary"]["bias"])
    return params


def import_generative_mlp_predator(sd):
    """Predator MLP flavor (models/mlp.py:108-180): list_modules.{i} =
    Sequential(Linear, ReLU, BatchNorm1d) for EVERY layer incl. the last
    (always-true branch quirk).  Returns (params, batch_stats) matching
    apr_tpu GenerativeMLP(final_bn=True)."""
    params: Dict = {}
    stats: Dict = {}
    idxs = sorted(
        {int(k.split(".")[1]) for k in sd if k.startswith("list_modules.")}
    )
    for i in idxs:
        params[f"Dense_{i}"] = {
            "kernel": _linear_w(sd, f"list_modules.{i}.0.weight"),
            "bias": _t(sd[f"list_modules.{i}.0.bias"]),
        }
        if f"list_modules.{i}.2.weight" in sd:
            params[f"MaskedBatchNorm_{i}"] = {
                "scale": _t(sd[f"list_modules.{i}.2.weight"]),
                "bias": _t(sd[f"list_modules.{i}.2.bias"]),
            }
            stats[f"MaskedBatchNorm_{i}"] = {
                "mean": _t(sd[f"list_modules.{i}.2.running_mean"]),
                "var": _t(sd[f"list_modules.{i}.2.running_var"]),
            }
    return params, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pth", required=True)
    ap.add_argument("--out", required=True, help="output .npz of param arrays")
    args = ap.parse_args()

    import torch

    ckpt = torch.load(args.pth, map_location="cpu", weights_only=False)
    enc_sd = ckpt.get("encoder_state_dict") or ckpt.get("state_dict")
    gen_sd = (ckpt.get("generator_state_dict")
              or ckpt.get("generative_model_state_dict"))

    if any(k.startswith("encoder_blocks.") for k in enc_sd):
        # Predator_APR checkpoint (lib/trainer.py:70-85): KPFCNN weights.
        # The flax KPFCNN param-tree skeleton is model-config-dependent, so
        # ship the raw mapping inputs; apr_tpu.training.predator_loop (or a
        # test) applies import_kpfcnn(sd, init_params) after model init.
        payload = {
            "kpfcnn_state_dict": {k: _t(v) for k, v in enc_sd.items()},
            "epoch": ckpt.get("epoch"),
            "best_loss": ckpt.get("best_loss"),
            "best_recall": ckpt.get("best_recall"),
        }
        if gen_sd is not None:
            if any(k.startswith("list_modules.") for k in gen_sd):
                gp, gs = import_generative_mlp_predator(
                    {k: _t(v) for k, v in gen_sd.items()})
                payload["generator_params"] = gp
                payload["generator_stats"] = gs
            else:  # symmetric KPFCNNDecoder: ship raw for import_kpfcnn_decoder
                payload["kpfcnn_decoder_state_dict"] = {
                    k: _t(v) for k, v in gen_sd.items()}
    else:
        enc_params, enc_stats = import_resunet(enc_sd)
        payload = {"encoder_params": enc_params, "encoder_stats": enc_stats,
                   "epoch": ckpt.get("epoch")}
        if gen_sd is not None and any("mlp." in k for k in gen_sd):
            gen_params, gen_stats = import_generative_mlp(gen_sd)
            payload["generator_params"] = gen_params
            payload["generator_stats"] = gen_stats

    import pickle

    with open(args.out, "wb") as f:
        pickle.dump(payload, f)
    print(f"imported -> {args.out}")


if __name__ == "__main__":
    main()
