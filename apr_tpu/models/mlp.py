"""NPR generative decoder MLPs.

Parity with the reference's per-point generator family
(FCGF_APR/model/mlp.py:6-92; Predator_APR/models/mlp.py:108-180): a small MLP
mapping a per-point feature vector to ``point_generation_ratio * 3``
non-negative coordinate offsets.  The reference's (unusual) layer ordering is
preserved: Linear -> ReLU -> BatchNorm per hidden layer, and a final
Linear -> ReLU so offsets are non-negative residuals.

At test time the decoder is discarded (SURVEY.md §0) — only the encoder feeds
registration.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from apr_tpu.models.layers import MaskedBatchNorm


class GenerativeMLP(nn.Module):
    """Per-point offset generator; call with (feats [..., C], mask [...]).

    ``final_bn``: the Predator flavor (Predator_APR/models/mlp.py:120-133)
    has an always-true branch (`if layer_idx < len(CHANNELS)-1` inside
    `range(len(CHANNELS)-1)`) so its LAST layer is Linear-ReLU-BatchNorm
    too, unlike FCGF's Linear-ReLU ending — preserved for .pth fidelity.
    """

    hidden: Sequence[int] = (512, 256)  # GenerativeMLP_98 default
    out_points: int = 6                 # point_generation_ratio
    bn_momentum: float = 0.1
    final_bn: bool = False

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        for h in self.hidden:
            x = nn.Dense(h)(x)
            x = nn.relu(x)
            x = MaskedBatchNorm(momentum=self.bn_momentum)(
                x, mask, use_running_average=not train
            )
        x = nn.Dense(self.out_points * 3)(x)
        x = nn.relu(x)
        if self.final_bn:
            x = MaskedBatchNorm(momentum=self.bn_momentum)(
                x, mask, use_running_average=not train
            )
        return jnp.where(mask[..., None], x, 0.0)


# Shipped hidden-layer plans (FCGF_APR/model/mlp.py variants).
MLP_VARIANTS = {
    "GenerativeMLP": (512, 128),
    "GenerativeMLP_98": (512, 256),
    "GenerativeMLP_54": (32, 16),
    "GenerativeMLP_4": (16,),
    "GenerativeMLP_11_10_9": (2048, 1024, 512),
}


def make_generative_mlp(name: str, out_points: int, bn_momentum: float = 0.1,
                        final_bn: bool = False):
    return GenerativeMLP(
        hidden=MLP_VARIANTS[name], out_points=out_points,
        bn_momentum=bn_momentum, final_bn=final_bn,
    )
