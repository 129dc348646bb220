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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pth", required=True)
    ap.add_argument("--out", required=True, help="output .npz of param arrays")
    args = ap.parse_args()

    import torch

    ckpt = torch.load(args.pth, map_location="cpu", weights_only=False)
    enc_sd = ckpt.get("encoder_state_dict") or ckpt.get("state_dict")
    gen_sd = ckpt.get("generator_state_dict")

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
