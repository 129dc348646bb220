"""Model registry.

Mirrors the reference's name-based registry (FCGF_APR/model/__init__.py:18
``load_model``) so configs/scripts can request models by the same strings.
"""

from __future__ import annotations

from apr_tpu.models.mlp import GenerativeMLP, MLP_VARIANTS, make_generative_mlp
from apr_tpu.models.resunet import ResUNet2, make_resunet, _VARIANTS as RESUNET_VARIANTS
from apr_tpu.models.simpleunet import (
    SimpleUNet,
    make_simplenet,
    simplenet_names,
)
from apr_tpu.models.sparse import (
    SparseLevel,
    SparsePyramid,
    build_pyramid,
    sparse_conv_apply,
)

_RESUNET_NAMES = sorted(RESUNET_VARIANTS) + [
    "ResUNetIN2", "ResUNetIN2B", "ResUNetIN2C", "ResUNetIN2D", "ResUNetIN2E",
]


def load_model(name: str):
    """Return a factory(config-kwargs) -> flax Module for a registered name."""
    if name in _RESUNET_NAMES:
        return lambda **kw: make_resunet(name, **kw)
    if name in simplenet_names():
        return lambda **kw: make_simplenet(name, **kw)
    if name in MLP_VARIANTS:
        return lambda **kw: make_generative_mlp(name, **kw)
    raise ValueError(f"unknown model name: {name}")


def model_names():
    return _RESUNET_NAMES + simplenet_names() + sorted(MLP_VARIANTS)


__all__ = [
    "GenerativeMLP",
    "ResUNet2",
    "SparseLevel",
    "SparsePyramid",
    "build_pyramid",
    "sparse_conv_apply",
    "load_model",
    "make_resunet",
    "make_generative_mlp",
    "model_names",
]
