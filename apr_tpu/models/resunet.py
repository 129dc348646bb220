"""Sparse-voxel ResUNet encoder family (the FCGF path), TPU-native.

Capability parity with the reference's ResUNet2 family
(FCGF_APR/model/resunet.py:10-252): a 4-level sparse U-Net — conv1
(configurable kernel) + residual BasicBlock per level, three stride-2
downsamplings, transposed-conv upsamplings with skip concatenation
(``ME.cat``), a 1x1 fusion conv, a final 1x1 conv with bias, and optional L2
feature normalization.  Channel plans of every shipped variant are preserved
(ResUNetBN2 / B / C / D / E / FatBN / IN2*).

Architecture differences from the reference are TPU-motivated, not semantic:
sparse tensors are padded [B, C_l, F] buffers with masks, convolutions are
gather-matmul-accumulate over precomputed kernel-map tables
(apr_tpu.models.sparse), and the whole forward is one jit program.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from apr_tpu.models.layers import MaskedBatchNorm, MaskedInstanceNorm
from apr_tpu.models.sparse import SparsePyramid, sparse_conv_apply


def _conv(feats, table, weights, out_mask):
    """Batched sparse conv: feats [B, Nin, Ci], table [B, Nout, K]."""
    return jax.vmap(sparse_conv_apply, in_axes=(0, 0, None, 0))(
        feats, table, weights, out_mask
    )


class SparseConv(nn.Module):
    """Sparse convolution over a precomputed kernel map table."""

    out_channels: int
    kernel_volume: int  # K = kernel_size**3
    use_bias: bool = False

    @nn.compact
    def __call__(self, feats, table, out_mask):
        ci = feats.shape[-1]
        # ME default init: kaiming-uniform over (K*Ci) fan-in
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "uniform"),
            (self.kernel_volume, ci, self.out_channels),
        )
        out = _conv(feats, table, w, out_mask)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            out = jnp.where(out_mask[..., None], out + b, 0.0)
        return out


def _norm(norm_type: str, momentum: float):
    if norm_type == "BN":
        return MaskedBatchNorm(momentum=momentum)
    if norm_type == "IN":
        return MaskedInstanceNorm()
    raise ValueError(norm_type)


class BasicBlock(nn.Module):
    """Residual block: two 3^3 sparse convs + skip (residual_block.py:9-53)."""

    channels: int
    norm_type: str = "BN"
    bn_momentum: float = 0.1

    @nn.compact
    def __call__(self, feats, table, mask, train: bool):
        residual = feats
        out = SparseConv(self.channels, table.shape[-1], use_bias=True,
                         name="conv1")(feats, table, mask)
        out = _norm(self.norm_type, self.bn_momentum)(
            out, mask, use_running_average=not train
        )
        out = nn.relu(out)
        out = SparseConv(self.channels, table.shape[-1], name="conv2")(
            out, table, mask
        )
        out = _norm(self.norm_type, self.bn_momentum)(
            out, mask, use_running_average=not train
        )
        out = nn.relu(out + residual)
        return jnp.where(mask[..., None], out, 0.0)


class ResUNet2(nn.Module):
    """4-level sparse U-Net; returns per-voxel features at level 0.

    Call: model(feats [B, C0, in_channels], pyramid (batched SparsePyramid),
    train) -> [B, C0, out_channels].
    """

    in_channels: int = 1
    out_channels: int = 32
    channels: Sequence[int] = (32, 64, 128, 256)
    tr_channels: Sequence[int] = (32, 64, 64, 128)
    norm_type: str = "BN"
    block_norm_type: str = "BN"
    bn_momentum: float = 0.1
    normalize_feature: bool = False
    conv1_kernel_size: int = 5

    @nn.compact
    def __call__(self, feats, pyramid: SparsePyramid, train: bool = False):
        ch = self.channels
        tr = self.tr_channels
        masks = [lv.mask for lv in pyramid.levels]
        k1 = self.conv1_kernel_size ** 3

        def norm():
            return _norm(self.norm_type, self.bn_momentum)

        # --- encoder ---
        out_s1 = SparseConv(ch[0], k1, name="conv1")(
            feats, pyramid.conv1_map, masks[0]
        )
        out_s1 = norm()(out_s1, masks[0], use_running_average=not train)
        out_s1 = BasicBlock(ch[0], self.block_norm_type, self.bn_momentum,
                            name="block1")(out_s1, pyramid.same_maps[0], masks[0], train)
        out = nn.relu(out_s1)

        skips = [out_s1]
        outs = [out]
        for lvl in range(1, 4):
            x = SparseConv(ch[lvl], 27, name=f"conv{lvl + 1}")(
                outs[-1], pyramid.down_maps[lvl - 1], masks[lvl]
            )
            x = norm()(x, masks[lvl], use_running_average=not train)
            x = BasicBlock(ch[lvl], self.block_norm_type, self.bn_momentum,
                           name=f"block{lvl + 1}")(x, pyramid.same_maps[lvl], masks[lvl], train)
            skips.append(x)
            outs.append(nn.relu(x))

        # --- decoder ---
        out = outs[-1]
        for lvl in range(3, 0, -1):
            x = SparseConv(tr[lvl], 27, name=f"conv{lvl + 1}_tr")(
                out, pyramid.up_maps[lvl - 1], masks[lvl - 1]
            )
            x = norm()(x, masks[lvl - 1], use_running_average=not train)
            x = BasicBlock(tr[lvl], self.block_norm_type, self.bn_momentum,
                           name=f"block{lvl + 1}_tr")(x, pyramid.same_maps[lvl - 1],
                                                      masks[lvl - 1], train)
            x = nn.relu(x)
            # skip concat (ME.cat) with the encoder output of this level
            out = jnp.concatenate([x, skips[lvl - 1]], axis=-1)

        # conv1_tr is a plain 1x1 conv (a dense layer per voxel), then final
        out = nn.Dense(tr[0], use_bias=False, name="conv1_tr")(out)
        out = nn.relu(out)
        out = nn.Dense(self.out_channels, use_bias=True, name="final")(out)
        out = jnp.where(masks[0][..., None], out, 0.0)

        if self.normalize_feature:
            norm_ = jnp.linalg.norm(out, axis=-1, keepdims=True)
            out = out / jnp.maximum(norm_, 1e-12)
            out = jnp.where(masks[0][..., None], out, 0.0)
        return out


# --- shipped channel plans (resunet.py:196-252) ---

_VARIANTS = {
    "ResUNetBN2": dict(channels=(32, 64, 128, 256), tr_channels=(32, 64, 64, 128)),
    "ResUNetBN2B": dict(channels=(32, 64, 128, 256), tr_channels=(64, 64, 64, 64)),
    "ResUNetBN2C": dict(channels=(32, 64, 128, 256), tr_channels=(64, 64, 64, 128)),
    "ResUNetBN2D": dict(channels=(32, 64, 128, 256), tr_channels=(64, 64, 128, 128)),
    "ResUNetBN2E": dict(channels=(128, 128, 128, 256), tr_channels=(64, 128, 128, 128)),
    "ResUNetFatBN": dict(channels=(32, 64, 128, 256), tr_channels=(128, 128, 128, 256)),
}


def make_resunet(name: str, **kwargs) -> ResUNet2:
    """Instantiate a shipped ResUNet variant by reference name."""
    base = name.replace("IN2", "BN2")
    block_norm = "IN" if "IN2" in name else "BN"
    if base == "ResUNetIN":  # pragma: no cover - defensive
        raise ValueError(name)
    if base not in _VARIANTS and name == "ResUNetIN2":
        base = "ResUNetBN2"
    plan = _VARIANTS[base]
    return ResUNet2(
        channels=plan["channels"],
        tr_channels=plan["tr_channels"],
        norm_type="BN",
        block_norm_type=block_norm,
        **kwargs,
    )
