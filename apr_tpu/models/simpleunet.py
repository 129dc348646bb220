"""Plain sparse U-Nets (SimpleNet family, FCGF_APR/model/simpleunet.py).

Registered-but-unused baselines of the reference: L-level sparse U-Nets with
one conv (+norm+relu) per level, stride-2 downs, transposed-conv ups with
skip concatenation, and a final 1x1 head.  Variants:

- SimpleNet / SimpleNetBN / SimpleNetIN / SimpleNetBNE / SimpleNetINE:
  3 levels (CHANNELS [32, 64, 128], TR [32, 32, 64]; E: halved)
- SimpleNet2 / ...BN2 / ...IN2 (+E): 4 levels (simpleunet.py:152-300)
- SimpleNet3 / ...BN3 / ...IN3 (+E): 5 levels

Pyramids must be built with matching depth (len(channels) levels).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from apr_tpu.models.resunet import SparseConv, _norm
from apr_tpu.models.sparse import SparsePyramid


class SimpleUNet(nn.Module):
    in_channels: int = 1
    out_channels: int = 32
    channels: Sequence[int] = (32, 64, 128)
    tr_channels: Sequence[int] = (32, 32, 64)
    norm_type: str = "BN"
    bn_momentum: float = 0.1
    normalize_feature: bool = False
    conv1_kernel_size: int = 3
    compute_dtype: str = None  # "bfloat16": bf16 convs, f32 accum
    stats_groups: int = 1      # see ResUNet2.stats_groups (pair fold)
    ones_input: bool = False   # see SparseConv.ones_input

    @nn.compact
    def __call__(self, feats, pyramid: SparsePyramid, train: bool = False):
        levels = len(self.channels)
        assert len(pyramid.levels) >= levels, (
            f"pyramid has {len(pyramid.levels)} levels, need {levels}"
        )
        masks = [lv.mask for lv in pyramid.levels]
        cd = self.compute_dtype

        def norm():
            return _norm(self.norm_type, self.bn_momentum, self.stats_groups)

        outs = []
        x = SparseConv(self.channels[0], self.conv1_kernel_size ** 3,
                       compute_dtype=cd, ones_input=self.ones_input,
                       name="conv1")(feats, pyramid.conv1_map, masks[0])
        x = nn.relu(norm()(x, masks[0], use_running_average=not train))
        outs.append(x)
        for l in range(1, levels):
            x = SparseConv(self.channels[l], 27, compute_dtype=cd,
                           name=f"conv{l + 1}")(
                x, pyramid.down_maps[l - 1], masks[l],
                table_t=pyramid.up_maps[l - 1], in_mask=masks[l - 1],
                reverse_k=False,
            )
            x = nn.relu(norm()(x, masks[l], use_running_average=not train))
            outs.append(x)

        for l in range(levels - 1, 0, -1):
            x = SparseConv(self.tr_channels[l], 27, compute_dtype=cd,
                           name=f"conv{l + 1}_tr")(
                x, pyramid.up_maps[l - 1], masks[l - 1],
                table_t=pyramid.down_maps[l - 1], in_mask=masks[l],
                reverse_k=False,
            )
            x = nn.relu(norm()(x, masks[l - 1], use_running_average=not train))
            x = jnp.concatenate([x, outs[l - 1]], axis=-1)

        x = nn.Dense(self.tr_channels[0], use_bias=False, name="conv1_tr")(x)
        x = nn.relu(x)
        x = nn.Dense(self.out_channels, use_bias=True, name="final")(x)
        x = jnp.where(masks[0][..., None], x, 0.0)
        if self.normalize_feature:
            x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                                1e-12)
            x = jnp.where(masks[0][..., None], x, 0.0)
        return x


_SIMPLE_PLANS = {
    # 3-level family
    "SimpleNet": dict(channels=(32, 64, 128), tr_channels=(32, 32, 64)),
    "SimpleNetE": dict(channels=(16, 32, 32), tr_channels=(16, 16, 32)),
    # 4-level family
    "SimpleNet2": dict(channels=(32, 64, 128, 256),
                       tr_channels=(32, 32, 64, 64)),
    "SimpleNet2E": dict(channels=(16, 32, 64, 128),
                        tr_channels=(16, 16, 32, 64)),
    # 5-level family
    "SimpleNet3": dict(channels=(32, 64, 128, 256, 512),
                       tr_channels=(32, 32, 64, 64, 128)),
    "SimpleNet3E": dict(channels=(16, 32, 64, 128, 256),
                        tr_channels=(16, 16, 32, 64, 128)),
}


def simplenet_names():
    """Reference naming: SimpleNet{BN|IN}{|2|3}{|E} (simpleunet.py classes)."""
    names = []
    for suffix in ("", "2", "3"):
        for norm in ("BN", "IN"):
            for e in ("", "E"):
                names.append(f"SimpleNet{norm}{suffix}{e}")
    return names


def make_simplenet(name: str, **kwargs) -> SimpleUNet:
    """'SimpleNetBN2E'-style names -> configured SimpleUNet."""
    base = name
    norm = "BN"
    for n in ("BN", "IN"):
        if n in base:
            norm = n
            base = base.replace(n, "")
    plan = _SIMPLE_PLANS[base]
    return SimpleUNet(
        channels=plan["channels"],
        tr_channels=plan["tr_channels"],
        norm_type=norm,
        **kwargs,
    )
