"""KPFCNN (Predator path): KPConv U-Net + overlap-attention + scores.

Parity with Predator_APR/models/architectures.py:9-340 over the 'kitti' /
'indoor' / 'nuscenes' block lists (configs/models.py): encoder = simple +
resnetb, then 3x [resnetb_strided, resnetb, resnetb] with channels doubling
(256 -> 2048); bottleneck 1x1 conv to gnn_feats_dim; GCN self/cross/self over
the two clouds' superpoints; overlap scores + temperature-softmaxed
cross-saliency (learnable epsilon, :181-184); decoder = 3x [nearest_upsample,
unary] with encoder skip concats, ending in last_unary ->
final_feats_dim + 2; outputs L2-normalized per-point features + sigmoid
overlap / saliency scores with NaN scrubbing (regular_score :131-134).

TPU-first: the two clouds are padded buffers STACKED on a leading pair axis
[2, N, ...] — the reference concatenates src+tgt into one point stack
(architectures.py:139-145), and crucially every InstanceNorm in its blocks
normalizes over that stack, i.e. over BOTH clouds jointly.  The stacked-pair
layout reproduces those joint statistics while keeping shapes static and the
convs batched (bigger MXU matmuls than two sequential single-cloud passes).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from apr_tpu.models.gcn import GCN
from apr_tpu.models.kpconv import (
    KPPyramid,
    ResnetBottleneckBlock,
    SimpleBlock,
    UnaryBlock,
    nearest_upsample,
)


class KPFCNNOutputs(NamedTuple):
    feats0: jnp.ndarray           # [N0, final_feats_dim] L2-normalized
    feats1: jnp.ndarray
    overlap0: jnp.ndarray         # [N0]
    overlap1: jnp.ndarray
    saliency0: jnp.ndarray        # [N0]
    saliency1: jnp.ndarray


def _regular_score(x):
    return jnp.where(jnp.isfinite(x), x, 0.0)


def stack_pair(pyr0: KPPyramid, pyr1: KPPyramid) -> KPPyramid:
    """Stack two same-capacity pyramids onto a leading pair axis."""
    return jax.tree.map(lambda a, b: jnp.stack([a, b]), pyr0, pyr1)


class KPEncoder(nn.Module):
    """4-level KPConv encoder over a stacked pair pyramid ([2, N_l, ...]).

    Returns (bottleneck feats [2, N3, C], skip feats per level).
    """

    first_feats_dim: int = 256
    first_subsampling_dl: float = 0.3
    conv_radius: float = 4.25
    kp_extent: float = 2.0
    num_kernel_points: int = 15
    deformable: bool = False
    modulated: bool = False
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, pyr: KPPyramid, feats: Optional[jnp.ndarray] = None):
        r0 = self.first_subsampling_dl * self.conv_radius
        # KPConv extent scaling: extent = r * KP_extent / conv_radius
        def extent(r):
            return r * self.kp_extent / self.conv_radius

        out_dim = self.first_feats_dim
        lv = pyr.levels
        ones_input = feats is None
        if ones_input:
            # reference input features: ones (in_feats_dim = 1); the static
            # ones_input promise lets the first KPConv skip its feature
            # gather (validity row-sum, see KPConvLayer)
            feats = jnp.where(
                lv[0].mask[..., None],
                jnp.ones(lv[0].points.shape[:-1] + (1,), jnp.float32), 0.0,
            )

        skips = []
        r = r0
        x = SimpleBlock(
            out_dim, r, extent(r), self.num_kernel_points,
            compute_dtype=self.compute_dtype, ones_input=ones_input,
            name="enc_simple",
        )(lv[0].points, lv[0].points, lv[0].neighbors, feats, lv[0].mask)
        x = ResnetBottleneckBlock(
            out_dim, r, extent(r), deformable=self.deformable,
            modulated=self.modulated, compute_dtype=self.compute_dtype,
            name="enc_l0_resnetb"
        )(lv[0].points, lv[0].points, lv[0].neighbors, x, lv[0].mask, lv[0].mask)

        for l in range(3):
            skips.append(x)
            # strided resnetb KEEPS the current width (reference channel
            # plan: out_dim doubles only AFTER the strided block is built,
            # architectures.py:66-73 — so its shortcut is Identity and the
            # first post-stride resnetb does the widening)
            x = ResnetBottleneckBlock(
                out_dim, r, extent(r), strided=True,
                deformable=self.deformable, modulated=self.modulated,
                compute_dtype=self.compute_dtype, name=f"enc_l{l}_strided",
            )(lv[l + 1].points, lv[l].points, lv[l].pools, x,
              lv[l + 1].mask, lv[l].mask)
            out_dim *= 2
            r *= 2
            x = ResnetBottleneckBlock(
                out_dim, r, extent(r), deformable=self.deformable,
                modulated=self.modulated, compute_dtype=self.compute_dtype,
                name=f"enc_l{l + 1}_resnetb1"
            )(lv[l + 1].points, lv[l + 1].points, lv[l + 1].neighbors, x,
              lv[l + 1].mask, lv[l + 1].mask)
            x = ResnetBottleneckBlock(
                out_dim, r, extent(r), deformable=self.deformable,
                modulated=self.modulated, compute_dtype=self.compute_dtype,
                name=f"enc_l{l + 1}_resnetb2"
            )(lv[l + 1].points, lv[l + 1].points, lv[l + 1].neighbors, x,
              lv[l + 1].mask, lv[l + 1].mask)
        return x, skips


class KPDecoder(nn.Module):
    """3x [nearest_upsample + unary(+skip)] ending in a bare last_unary.

    Operates on the stacked pair: x [2, N3, C], skips [2, N_l, C_l].
    """

    out_dim: int  # final head width (final_feats_dim + 2, or ratio*3)

    @nn.compact
    def __call__(self, x, skips, pyr: KPPyramid):
        lv = pyr.levels
        width = x.shape[-1] // 2  # 258 -> 129 -> 64 pattern of the reference
        for l in range(2, -1, -1):
            x = nearest_upsample(x, lv[l].upsamples)
            x = jnp.concatenate([x, skips[l]], axis=-1)
            if l > 0:
                x = UnaryBlock(width, name=f"dec_unary{l}")(x, lv[l].mask)
                width //= 2
            else:
                x = nn.Dense(self.out_dim, name="last_unary")(x)
                x = jnp.where(lv[0].mask[..., None], x, 0.0)
        return x


class KPFCNN(nn.Module):
    """Pair forward: (pyr0, pyr1) -> KPFCNNOutputs."""

    final_feats_dim: int = 32
    first_feats_dim: int = 256
    gnn_feats_dim: int = 256
    dgcnn_k: int = 10
    num_head: int = 4
    nets: Sequence[str] = ("self", "cross", "self")
    first_subsampling_dl: float = 0.3
    conv_radius: float = 4.25
    kp_extent: float = 2.0
    num_kernel_points: int = 15
    condition_feature: bool = True
    add_cross_score: bool = True
    deformable: bool = False
    modulated: bool = False
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, pyr0: KPPyramid, pyr1: KPPyramid) -> KPFCNNOutputs:
        pyr = stack_pair(pyr0, pyr1)
        encoder = KPEncoder(
            self.first_feats_dim, self.first_subsampling_dl,
            self.conv_radius, self.kp_extent, self.num_kernel_points,
            deformable=self.deformable, modulated=self.modulated,
            compute_dtype=self.compute_dtype, name="encoder",
        )
        x, skips = encoder(pyr)                      # x: [2, N3, 2048]
        mask_c = pyr.levels[-1].mask                 # [2, N3]

        bottle = nn.Dense(self.gnn_feats_dim, name="bottle")
        f = jnp.where(mask_c[..., None], bottle(x), 0.0)
        uncond = f

        gnn = GCN(self.gnn_feats_dim, self.nets, self.dgcnn_k,
                  self.num_head, name="gnn")
        f0, f1 = gnn(pyr.levels[-1].points[0], pyr.levels[-1].points[1],
                     f[0], f[1], mask_c[0], mask_c[1])
        f = jnp.stack([f0, f1])

        proj_gnn = nn.Dense(self.gnn_feats_dim, name="proj_gnn")
        proj_score = nn.Dense(1, name="proj_score")
        g = jnp.where(mask_c[..., None], proj_gnn(f), 0.0)
        s = proj_score(g)                            # [2, N3, 1] raw scores

        nrm = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)

        # strong-typed scalar: a weak-typed init flips to strong after the
        # first optimizer step and forces a full train_step recompile
        epsilon = self.param(
            "epsilon", lambda k: jnp.full((), -5.0, jnp.float32)
        )
        temperature = jnp.exp(epsilon) + 0.03
        inner = jnp.dot(nrm[0], nrm[1].T, precision=jax.lax.Precision.HIGHEST)
        logits01 = jnp.where(mask_c[1][None, :], inner / temperature, -1e9)
        logits10 = jnp.where(mask_c[0][None, :], inner.T / temperature, -1e9)
        sal0 = jax.nn.softmax(logits01, axis=1) @ s[1]  # cross-saliency [N0c,1]
        sal1 = jax.nn.softmax(logits10, axis=1) @ s[0]
        sal = jnp.stack([sal0, sal1])

        if self.condition_feature and self.add_cross_score:
            d = jnp.concatenate([s, sal, g], axis=-1)
        elif self.condition_feature:
            d = jnp.concatenate([s, g], axis=-1)
        elif self.add_cross_score:
            d = jnp.concatenate([s, sal, uncond], axis=-1)
        else:
            d = jnp.concatenate([s, uncond], axis=-1)

        decoder = KPDecoder(self.final_feats_dim + 2, name="decoder")
        y = decoder(d, skips, pyr)                   # [2, N0, F+2]

        def heads(y, mask):
            feats = y[:, : self.final_feats_dim]
            feats = feats / jnp.maximum(
                jnp.linalg.norm(feats, axis=1, keepdims=True), 1e-12
            )
            feats = jnp.where(mask[:, None], feats, 0.0)
            overlap = _regular_score(
                jnp.clip(jax.nn.sigmoid(y[:, self.final_feats_dim]), 0, 1)
            ) * mask
            saliency = _regular_score(
                jnp.clip(jax.nn.sigmoid(y[:, self.final_feats_dim + 1]), 0, 1)
            ) * mask
            return feats, overlap, saliency

        feats0, overlap0, saliency0 = heads(y[0], pyr0.levels[0].mask)
        feats1, overlap1, saliency1 = heads(y[1], pyr1.levels[0].mask)
        return KPFCNNOutputs(
            feats0=feats0, feats1=feats1,
            overlap0=overlap0, overlap1=overlap1,
            saliency0=saliency0, saliency1=saliency1,
        )


class KPFCNNDecoder(nn.Module):
    """Symmetric NPR decoder (architectures.py:215-340): a second KPConv
    U-Net over the same pair of pyramids consuming the encoder's output
    features (``batch['second_features']`` carries BOTH clouds stacked in
    the reference, so its norms are joint too), ending in ratio*3 offsets,
    L2-normalized (architectures.py:339)."""

    point_generation_ratio: int = 4
    first_feats_dim: int = 256
    first_subsampling_dl: float = 0.3
    conv_radius: float = 4.25
    kp_extent: float = 2.0
    num_kernel_points: int = 15
    deformable: bool = False
    modulated: bool = False
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, feats0, feats1, pyr0: KPPyramid, pyr1: KPPyramid):
        pyr = stack_pair(pyr0, pyr1)
        feats = jnp.stack([feats0, feats1])
        encoder = KPEncoder(
            self.first_feats_dim, self.first_subsampling_dl,
            self.conv_radius, self.kp_extent, self.num_kernel_points,
            deformable=self.deformable, modulated=self.modulated,
            compute_dtype=self.compute_dtype, name="encoder",
        )
        x_b, skips = encoder(pyr, feats)
        decoder = KPDecoder(self.point_generation_ratio * 3, name="decoder")
        out = decoder(x_b, skips, pyr)
        norm = jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
        out = jnp.where(pyr.levels[0].mask[..., None], out / norm, 0.0)
        return out[0], out[1]
