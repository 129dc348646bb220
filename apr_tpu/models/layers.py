"""Norm layers over sentinel-masked point sets.

ME's MinkowskiBatchNorm computes statistics over every point row of the
batched sparse tensor; MinkowskiInstanceNorm per cloud.  With padded
fixed-capacity buffers the same semantics need masked moments — padding rows
must not contaminate the statistics.  Running stats follow the torch
convention (new = (1 - momentum) * old + momentum * batch) used by the
reference (bn_momentum flag, FCGF_APR/model/common.py:4).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


def masked_moments(x: jnp.ndarray, mask: jnp.ndarray, axes):
    """Mean/var of x over ``axes`` counting only mask==True rows.

    x: [..., C]; mask broadcastable to x[..., 0].
    """
    w = mask.astype(x.dtype)[..., None]
    n = jnp.maximum(jnp.sum(w, axis=axes), 1.0)
    # keepdims through the var term: the reduced mean ([B, C] for x
    # [B, N, C], axes=(1,)) would otherwise right-align against x and
    # crash (or silently mis-broadcast) for batched instance norm
    n_k = jnp.maximum(jnp.sum(w, axis=axes, keepdims=True), 1.0)
    mean_k = jnp.sum(x * w, axis=axes, keepdims=True) / n_k
    var = jnp.sum(jnp.square(x - mean_k) * w, axis=axes) / n
    mean = jnp.reshape(mean_k, var.shape)
    return mean, var


class MaskedBatchNorm(nn.Module):
    """BatchNorm over all valid points of all clouds in the batch.

    Call with x [B, N, C] (or [N, C]) and mask of matching leading shape.
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    use_running_average: Optional[bool] = None
    # stats_groups=G treats the leading batch axis as G interleaved stat
    # groups (row i belongs to group i % G): batch moments, normalization,
    # and the running-average momentum updates are computed per group, in
    # group order — bit-faithful to G sequential forwards of the ungrouped
    # norm while running as ONE fused program (the pair-fold fast path).
    stats_groups: int = 1

    @nn.compact
    def __call__(self, x, mask, use_running_average: Optional[bool] = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        c = x.shape[-1]
        reduce_axes = tuple(range(x.ndim - 1))

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        g = self.stats_groups
        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        elif g > 1:
            bw = x.shape[0] // g
            xg = x.reshape((bw, g) + x.shape[1:])
            mg = mask.reshape((bw, g) + mask.shape[1:])
            axes = (0,) + tuple(range(2, xg.ndim - 1))
            mean_g, var_g = masked_moments(xg, mg, axes)  # [g, C]
            if not self.is_initializing():
                m = self.momentum
                rm, rv = ra_mean.value, ra_var.value
                for i in range(g):  # sequential-forward momentum parity
                    rm = (1.0 - m) * rm + m * mean_g[i]
                    rv = (1.0 - m) * rv + m * var_g[i]
                ra_mean.value, ra_var.value = rm, rv
            shape = (1, g) + (1,) * (x.ndim - 2) + (c,)
            y = (xg - mean_g.reshape(shape)) * jnp.reciprocal(
                jnp.sqrt(var_g.reshape(shape) + self.epsilon))
            y = (y * scale + bias).reshape(x.shape)
            return jnp.where(mask[..., None], y, 0.0)
        else:
            mean, var = masked_moments(x, mask, reduce_axes)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * var

        y = (x - mean) * jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        y = y * scale + bias
        return jnp.where(mask[..., None], y, 0.0)


class MaskedInstanceNorm(nn.Module):
    """InstanceNorm: per-cloud, per-channel stats over valid points.

    Call with x [B, N, C] and mask [B, N]; stats reduce over N only.
    Also used by the KPConv path, whose reference 'BatchNormBlock' is secretly
    InstanceNorm1d (Predator_APR/models/blocks.py:451).
    """

    epsilon: float = 1e-5
    affine: bool = True
    momentum: float = 0.02  # unused (torch IN tracks no stats by default)

    @nn.compact
    def __call__(self, x, mask, use_running_average=None):
        del use_running_average
        axis = x.ndim - 2  # the points axis
        mean, var = masked_moments(x, mask, (axis,))
        mean = jnp.expand_dims(mean, axis)
        var = jnp.expand_dims(var, axis)
        y = (x - mean) * jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        if self.affine:
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            y = y * scale + bias
        return jnp.where(mask[..., None], y, 0.0)


def get_norm(norm_type: str, momentum: float = 0.1):
    """Reference get_norm parity (FCGF_APR/model/common.py:4-10)."""
    if norm_type == "BN":
        return MaskedBatchNorm(momentum=momentum)
    if norm_type == "IN":
        return MaskedInstanceNorm()
    raise ValueError(f"Type {norm_type}, not defined")
