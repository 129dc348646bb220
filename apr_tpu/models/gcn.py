"""Overlap-attention GCN: DGCNN self-attention + cross-attention.

Parity with Predator_APR/models/gcn.py: ``SelfAttention`` is a 2-layer
DGCNN-style edge conv over a coordinate-kNN graph (k=10, :39-77);
cross-attention is standard multi-headed attention (:101-128); the ``GCN``
module alternates per the ``nets`` list ['self','cross','self'] (:171-206).

Masked / fixed-shape: the coordinate kNN excludes padded points, attention
logits mask invalid keys, InstanceNorms use masked moments.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from apr_tpu.models.layers import MaskedInstanceNorm


def _graph_features(coords, feats, mask, k):
    """DGCNN edge features [N, k, 2C]: (center, neighbor - center).

    kNN over coordinates, self excluded, padded points excluded.
    """
    n = coords.shape[0]
    d2 = jnp.sum(
        (coords[:, None, :] - coords[None, :, :]) ** 2, axis=-1
    )
    d2 = jnp.where(mask[None, :], d2, jnp.inf)
    # exclude self via where: `d2 + eye * inf` poisons every off-diagonal
    # with NaN (0 * inf = NaN) and top_k over NaNs returns arbitrary rows
    d2 = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d2)
    _, idx = jax.lax.top_k(-d2, k)  # [N, k]
    nb = feats[idx]                 # [N, k, C]
    center = jnp.repeat(feats[:, None, :], k, axis=1)
    return jnp.concatenate([center, nb - center], axis=-1)


class SelfAttention(nn.Module):
    feature_dim: int
    k: int = 10

    @nn.compact
    def __call__(self, coords, feats, mask):
        def conv_in(x, out_dim, name):
            # Conv2d 1x1 + InstanceNorm2d + leaky(0.2) over [N, k, C]
            h = nn.Dense(out_dim, use_bias=False, name=name)(x)
            # InstanceNorm2d normalizes per channel over (N, k)
            flat = h.reshape(1, -1, out_dim)
            m2 = jnp.repeat(mask, x.shape[1])[None]
            h = MaskedInstanceNorm(name=name + "_in")(flat, m2)[0]
            h = h.reshape(x.shape[0], x.shape[1], out_dim)
            return nn.leaky_relu(h, negative_slope=0.2)

        c = self.feature_dim
        x0 = feats
        e1 = _graph_features(coords, x0, mask, self.k)
        x1 = jnp.max(conv_in(e1, c, "conv1"), axis=1)
        e2 = _graph_features(coords, x1, mask, self.k)
        x2 = jnp.max(conv_in(e2, 2 * c, "conv2"), axis=1)
        x3 = jnp.concatenate([x0, x1, x2], axis=-1)[:, None, :]
        out = conv_in(x3, c, "conv3")[:, 0, :]
        return jnp.where(mask[:, None], out, 0.0)


class CrossAttention(nn.Module):
    """AttentionalPropagation parity: MHA + MLP merge with residual."""

    feature_dim: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, x, source, x_mask, src_mask):
        d = self.feature_dim
        h = self.num_heads
        dk = d // h
        # head split uses the TORCH channel order (dk outer, heads inner:
        # MultiHeadedAttention.forward views [B, dk, h, N], gcn.py:110-116)
        # so .pth q/k/v/merge weights import as plain transposes
        q = nn.Dense(d, name="q")(x).reshape(-1, dk, h)
        k = nn.Dense(d, name="k")(source).reshape(-1, dk, h)
        v = nn.Dense(d, name="v")(source).reshape(-1, dk, h)
        logits = jnp.einsum("ndh,mdh->hnm", q, k) / (dk ** 0.5)
        logits = jnp.where(src_mask[None, None, :], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        msg = jnp.einsum("hnm,mdh->ndh", attn, v).reshape(-1, d)
        msg = nn.Dense(d, name="merge")(msg)
        # MLP([2d, 2d, d]) over concat(x, message) with IN + ReLU between
        y = jnp.concatenate([x, msg], axis=-1)
        y = nn.Dense(2 * d, name="mlp1")(y)
        y = MaskedInstanceNorm(name="mlp1_in")(y[None], x_mask[None])[0]
        y = nn.relu(y)
        y = nn.Dense(d, name="mlp2")(y)
        out = x + y
        return jnp.where(x_mask[:, None], out, 0.0)


class CrossAttentionCat(nn.Module):
    """AttentionalPropagationCat parity (gcn.py:131-168): coordinate-augmented
    cross attention.

    The source coordinates ride along as 3 extra per-head value channels, so
    the attention output carries the softmax-weighted neighbor position; the
    message is augmented with (weighted position - query position) and its
    norm before the merge projection.  The reference hard-codes 4 heads in
    the channel arithmetic (``7*4`` in gcn.py:140,163 and ``repeat(1, 4, 1)``
    in :148,150); here the head count generalizes to ``d + 7*num_heads``.
    Unreachable from the reference's shipped configs (every YAML uses
    ['self','cross','self']) but part of the public surface.
    """

    feature_dim: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, x, source, x_coords, src_coords, x_mask, src_mask):
        d = self.feature_dim
        h = self.num_heads
        dk = d // h
        q = nn.Dense(d, name="q")(x).reshape(-1, dk, h)
        k = nn.Dense(d, name="k")(source).reshape(-1, dk, h)
        v = nn.Dense(d, name="v")(source).reshape(-1, dk, h)
        # coords appended after the dk value channels, identical per head
        # (coords1.repeat(1,4,1).view(1,4,3,-1).transpose(1,2), gcn.py:148)
        vc = jnp.concatenate(
            [v, jnp.repeat(src_coords[:, :, None], h, axis=2)], axis=1
        )  # [M, dk+3, h]
        logits = jnp.einsum("ndh,mdh->hnm", q, k) / (dk ** 0.5)
        logits = jnp.where(src_mask[None, None, :], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        xo = jnp.einsum("hnm,mdh->ndh", attn, vc)          # [N, dk+3, h]
        aug1 = xo[:, dk:dk + 3, :] - x_coords[:, :, None]  # [N, 3, h]
        aug2 = jnp.linalg.norm(aug1, axis=1, keepdims=True)
        y = jnp.concatenate([xo, aug1, aug2], axis=1)      # [N, dk+7, h]
        msg = nn.Dense(d + 7 * h, name="merge")(y.reshape(-1, (dk + 7) * h))
        z = jnp.concatenate([x, msg], axis=-1)
        z = nn.Dense(2 * d, name="mlp1")(z)
        z = MaskedInstanceNorm(name="mlp1_in")(z[None], x_mask[None])[0]
        z = nn.relu(z)
        z = nn.Dense(d, name="mlp2")(z)
        out = x + z  # residual applied by the reference GCN loop (gcn.py:201)
        return jnp.where(x_mask[:, None], out, 0.0)


class GCN(nn.Module):
    """Alternating self/cross blocks over the two clouds' superpoints."""

    feature_dim: int
    nets: Sequence[str] = ("self", "cross", "self")
    k: int = 10
    num_heads: int = 4

    @nn.compact
    def __call__(self, coords0, coords1, feats0, feats1, mask0, mask1):
        for i, name in enumerate(self.nets):
            if name == "self":
                # reference: self-attention REPLACES features (gcn.py:203-205)
                block = SelfAttention(self.feature_dim, self.k,
                                      name=f"self_{i}")
                feats0 = block(coords0, feats0, mask0)
                feats1 = block(coords1, feats1, mask1)
            elif name == "cross":
                # reference: residual, and feats1's update sees the UPDATED
                # feats0 (sequential, gcn.py:198-199)
                block = CrossAttention(self.feature_dim, self.num_heads,
                                       name=f"cross_{i}")
                feats0 = block(feats0, feats1, mask0, mask1)
                feats1 = block(feats1, feats0, mask1, mask0)
            elif name == "cross_cat":
                block = CrossAttentionCat(self.feature_dim, self.num_heads,
                                          name=f"cross_cat_{i}")
                feats0 = block(feats0, feats1, coords0, coords1, mask0, mask1)
                feats1 = block(feats1, feats0, coords1, coords0, mask1, mask0)
            else:
                raise ValueError(name)
        return feats0, feats1
