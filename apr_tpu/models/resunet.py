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
from apr_tpu.models.sparse import SparsePyramid, sparse_conv_adjoint


def _fold_table(table, n_entries):
    """Fold batch dim into rows: per-batch index offsets, global sentinel."""
    b = table.shape[0]
    offs = (jnp.arange(b, dtype=table.dtype) * n_entries)[:, None, None]
    t = jnp.where(table < n_entries, table + offs, b * n_entries)
    return t.reshape(b * table.shape[1], table.shape[2])


def _conv(feats, table, table_t, weights, out_mask, in_mask, reverse_k,
          compute_dtype=None):
    """Batched sparse conv: feats [B, Nin, Ci], table [B, Nout, K].

    The batch dim folds into the row axis (per-batch index offsets, global
    sentinel) so the whole batch is ONE gather + ONE MXU matmul — measured
    2.3x faster than vmapping the per-cloud conv on v5e, where the batched
    gather lowers poorly.  ``table_t`` (the structural transpose map) feeds
    sparse_conv_adjoint's scatter-free backward.
    """
    b, n_in, ci = feats.shape
    n_out = table.shape[1]
    out = sparse_conv_adjoint(
        feats.reshape(b * n_in, ci),
        _fold_table(table, n_in),
        _fold_table(table_t, n_out),
        weights,
        out_mask.reshape(-1),
        in_mask.reshape(-1),
        reverse_k,
        compute_dtype,
    )
    return out.reshape(b, n_out, -1)


class SparseConv(nn.Module):
    """Sparse convolution over a precomputed kernel map table."""

    out_channels: int
    kernel_volume: int  # K = kernel_size**3
    use_bias: bool = False
    compute_dtype: Optional[str] = None  # "bfloat16" for mixed precision
    # ones_input=True: the caller guarantees feats == mask (constant 1 on
    # real voxels, 0 on padding) — FCGF's input convention.  The gathered
    # [N, K, 1] matrix is then EXACTLY the table-validity pattern (kernel
    # maps never reference masked rows: their keys are INVALID_KEY, see
    # sparse._zrun_maps), so the gather is skipped entirely:
    # out = (table != sentinel) @ W.  Same matmul operands as the gather
    # form -> bit-identical output, but 35x faster on v5e (a 1-wide row
    # gather pads every row to a 128-lane tile; 125-pt conv1 measured
    # 16.9 ms -> 0.48 ms at 16k voxels) and the backward is one matmul
    # (dW = valid^T @ g) instead of a row scatter-add.
    ones_input: bool = False

    @nn.compact
    def __call__(self, feats, table, out_mask, table_t=None, in_mask=None,
                 reverse_k=True):
        """table_t: transpose kernel map for the scatter-free backward
        (defaults to ``table`` + offset reversal — the same-level case)."""
        if table_t is None:
            table_t = table
        if in_mask is None:
            in_mask = out_mask
        ci = feats.shape[-1]
        # ME default init: kaiming-uniform over (K*Ci) fan-in
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "uniform"),
            (self.kernel_volume, ci, self.out_channels),
        )
        if self.ones_input:
            if ci != 1:
                raise ValueError("ones_input requires in_channels == 1")
            b, n_out, k = table.shape
            n_in = feats.shape[1]
            cd = (jnp.dtype(self.compute_dtype) if self.compute_dtype
                  else feats.dtype)
            valid = (table < n_in).astype(cd).reshape(b * n_out, k)
            out = jax.lax.dot_general(
                valid, w.reshape(k, self.out_channels).astype(cd),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(b, n_out, self.out_channels)
            out = jnp.where(out_mask[..., None], out, 0.0).astype(jnp.float32)
        else:
            out = _conv(feats, table, table_t, w, out_mask, in_mask,
                        reverse_k, self.compute_dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            out = jnp.where(out_mask[..., None], out + b, 0.0)
        return out


def _norm(norm_type: str, momentum: float, stats_groups: int = 1):
    if norm_type == "BN":
        return MaskedBatchNorm(momentum=momentum, stats_groups=stats_groups)
    if norm_type == "IN":
        # InstanceNorm stats are per-cloud already — grouping is a no-op
        return MaskedInstanceNorm()
    raise ValueError(norm_type)


class BasicBlock(nn.Module):
    """Residual block: two 3^3 sparse convs + skip (residual_block.py:9-53)."""

    channels: int
    norm_type: str = "BN"
    bn_momentum: float = 0.1
    compute_dtype: Optional[str] = None
    stats_groups: int = 1

    @nn.compact
    def __call__(self, feats, table, mask, train: bool):
        residual = feats
        out = SparseConv(self.channels, table.shape[-1], use_bias=True,
                         compute_dtype=self.compute_dtype,
                         name="conv1")(feats, table, mask)
        out = _norm(self.norm_type, self.bn_momentum, self.stats_groups)(
            out, mask, use_running_average=not train
        )
        out = nn.relu(out)
        out = SparseConv(self.channels, table.shape[-1],
                         compute_dtype=self.compute_dtype, name="conv2")(
            out, table, mask
        )
        out = _norm(self.norm_type, self.bn_momentum, self.stats_groups)(
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
    compute_dtype: Optional[str] = None  # "bfloat16": bf16 convs, f32 accum
    # >1: leading batch axis carries interleaved stat groups (pair fold) —
    # BN statistics stay bit-faithful to sequential per-group forwards
    stats_groups: int = 1
    # input feats are the mask itself (FCGF ones convention): conv1 becomes
    # a validity matmul with no gather — see SparseConv.ones_input
    ones_input: bool = False

    @nn.compact
    def __call__(self, feats, pyramid: SparsePyramid, train: bool = False):
        ch = self.channels
        tr = self.tr_channels
        masks = [lv.mask for lv in pyramid.levels]
        k1 = self.conv1_kernel_size ** 3

        def norm():
            return _norm(self.norm_type, self.bn_momentum, self.stats_groups)

        # --- encoder ---
        cd = self.compute_dtype
        out_s1 = SparseConv(ch[0], k1, compute_dtype=cd,
                            ones_input=self.ones_input, name="conv1")(
            feats, pyramid.conv1_map, masks[0]
        )
        out_s1 = norm()(out_s1, masks[0], use_running_average=not train)
        out_s1 = BasicBlock(ch[0], self.block_norm_type, self.bn_momentum,
                            compute_dtype=cd, stats_groups=self.stats_groups,
                            name="block1")(out_s1, pyramid.same_maps[0], masks[0], train)
        out = nn.relu(out_s1)

        skips = [out_s1]
        outs = [out]
        for lvl in range(1, 4):
            x = SparseConv(ch[lvl], 27, compute_dtype=cd,
                           name=f"conv{lvl + 1}")(
                outs[-1], pyramid.down_maps[lvl - 1], masks[lvl],
                table_t=pyramid.up_maps[lvl - 1], in_mask=masks[lvl - 1],
                reverse_k=False,
            )
            x = norm()(x, masks[lvl], use_running_average=not train)
            x = BasicBlock(ch[lvl], self.block_norm_type, self.bn_momentum,
                           compute_dtype=cd, stats_groups=self.stats_groups,
                           name=f"block{lvl + 1}")(x, pyramid.same_maps[lvl], masks[lvl], train)
            skips.append(x)
            outs.append(nn.relu(x))

        # --- decoder ---
        out = outs[-1]
        for lvl in range(3, 0, -1):
            x = SparseConv(tr[lvl], 27, compute_dtype=cd,
                           name=f"conv{lvl + 1}_tr")(
                out, pyramid.up_maps[lvl - 1], masks[lvl - 1],
                table_t=pyramid.down_maps[lvl - 1], in_mask=masks[lvl],
                reverse_k=False,
            )
            x = norm()(x, masks[lvl - 1], use_running_average=not train)
            x = BasicBlock(tr[lvl], self.block_norm_type, self.bn_momentum,
                           compute_dtype=cd, stats_groups=self.stats_groups,
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
    if base not in _VARIANTS:
        raise ValueError(
            f"unknown ResUNet variant {name!r}; known: "
            f"{sorted(_VARIANTS)} (+ IN2 spellings)")
    plan = _VARIANTS[base]
    return ResUNet2(
        channels=plan["channels"],
        tr_channels=plan["tr_channels"],
        norm_type="BN",
        block_norm_type=block_norm,
        **kwargs,
    )
