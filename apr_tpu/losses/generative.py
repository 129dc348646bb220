"""NPR generative-branch losses: offset regularizers + APC reconstruction.

Parity with GenerativePairTrainer's generative branch
(FCGF_APR/lib/complement_trainer.py:413-483):

    generated   = MLP(feats) * voxel_size                  # [N, ratio*3]
    reg         = L2 | RepelL2 | RepelL1 over generated offsets
    reconstruct = (generated + voxel_size * coords.repeat(ratio)).reshape(-1, 3)
    loss       += (chamfer(reconstruct, apc) + reg * reg_strength) * loss_ratio

and Predator's variant (Predator_APR/lib/trainer.py:166-211), which skips the
voxel_size scaling and adds offsets to metric point coordinates directly.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from apr_tpu.ops.chamfer import chamfer_distance


def offset_regularization(
    offsets: jnp.ndarray,
    mask: jnp.ndarray,
    reg_type: str = "L2",
    alpha: float = 1.0,
) -> jnp.ndarray:
    """Regularizer over generated offsets [N, ratio, 3] (masked mean).

    L2:      mean ||o||^2
    RepelL2: mean ||o||^2 + mean 1 / (||o||^2 + alpha)
    RepelL1: mean ((||o||^2 + 1e-5)^0.25 - 1)^2
    """
    sq = jnp.sum(offsets * offsets, axis=-1)  # [N, ratio]
    w = mask.astype(offsets.dtype)[:, None]
    n = jnp.maximum(jnp.sum(w) * sq.shape[1], 1.0)

    def wmean(x):
        return jnp.sum(x * w) / n

    if reg_type == "L2":
        return wmean(sq)
    if reg_type == "RepelL2":
        return wmean(sq) + wmean(1.0 / (sq + alpha))
    if reg_type == "RepelL1":
        lengths = jnp.power(sq + 1e-5, 0.25) - 1.0
        return wmean(lengths * lengths)
    raise ValueError(f"unknown regularization_type: {reg_type}")


def npr_reconstruction(
    mlp_output: jnp.ndarray,     # [N, ratio*3] raw MLP output
    anchor_points: jnp.ndarray,  # [N, 3] metric positions of the N features
    apc_points: jnp.ndarray,     # [M, 3] aggregated point cloud target
    feat_mask: jnp.ndarray,      # [N]
    apc_mask: Optional[jnp.ndarray] = None,
    voxel_size: float = 1.0,
    reg_type: str = "L2",
    reg_strength: float = 0.01,
    alpha: float = 1.0,
    chamfer_mode: str = "exact",
    chamfer_cell_size: float = 1.2,
    chamfer_bucket_cap: int = 64,
    apc_sorted: bool = False,
):
    """(chamfer + reg * strength, chamfer, reg) of the generative branch.

    For FCGF parity pass ``voxel_size`` = the quantization size and
    ``anchor_points`` = voxel_size * integer coords; for Predator parity pass
    ``voxel_size=1`` and ``anchor_points`` = metric points.
    ``chamfer_mode='grid'`` uses the spatially-bucketed fast path (see
    apr_tpu.ops.chamfer_grid — exact when the APC is voxel-deduplicated and
    the NN lies within one cell).
    """
    n = mlp_output.shape[0]
    ratio = mlp_output.shape[1] // 3
    offsets = (mlp_output * voxel_size).reshape(n, ratio, 3)
    reg = offset_regularization(offsets, feat_mask, reg_type, alpha)

    recon = (offsets + anchor_points[:, None, :]).reshape(n * ratio, 3)
    recon_mask = jnp.repeat(feat_mask, ratio)
    if chamfer_mode == "grid":
        from apr_tpu.ops.chamfer_grid import chamfer_distance_grid

        cd = chamfer_distance_grid(
            recon, apc_points, recon_mask, apc_mask,
            cell_size=chamfer_cell_size, bucket_cap=chamfer_bucket_cap,
            b_sorted=apc_sorted,
        )
    elif chamfer_mode == "window":
        from apr_tpu.ops.chamfer_window import chamfer_distance_window

        cd = chamfer_distance_window(
            recon, apc_points, recon_mask, apc_mask,
            cell_size=chamfer_cell_size,
        )
    elif chamfer_mode == "pallas":
        from apr_tpu.ops.pallas.distance import chamfer_distance_pallas

        cd = chamfer_distance_pallas(recon, apc_points, recon_mask, apc_mask)
    else:
        cd = chamfer_distance(recon, apc_points, recon_mask, apc_mask)
    return cd + reg * reg_strength, cd, reg
