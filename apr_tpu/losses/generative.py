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
):
    """(chamfer + reg * strength, chamfer, reg, clamp_frac).

    For FCGF parity pass ``voxel_size`` = the quantization size and
    ``anchor_points`` = voxel_size * integer coords; for Predator parity pass
    ``voxel_size=1`` and ``anchor_points`` = metric points.

    ``clamp_frac`` is nonzero only for chamfer_mode='window': the fraction
    of points whose nearest neighbor fell beyond the 2*cell clamp (zero-
    gradient contribution) — logged as training telemetry because a high
    rate biases the reconstruction loss in sparse regions.  (The former
    'grid' mode is deleted: it miscompiled on TPU inside the differentiated
    step and 'window' supersedes it in both speed and robustness.)
    """
    n = mlp_output.shape[0]
    ratio = mlp_output.shape[1] // 3
    offsets = (mlp_output * voxel_size).reshape(n, ratio, 3)
    reg = offset_regularization(offsets, feat_mask, reg_type, alpha)

    recon = (offsets + anchor_points[:, None, :]).reshape(n * ratio, 3)
    recon_mask = jnp.repeat(feat_mask, ratio)
    clamp_frac = jnp.zeros((), jnp.float32)
    if chamfer_mode == "window":
        from apr_tpu.ops.chamfer_window import chamfer_distance_window_stats

        cd, clamp_frac = chamfer_distance_window_stats(
            recon, apc_points, recon_mask, apc_mask,
            cell_size=chamfer_cell_size,
        )
    elif chamfer_mode == "pallas":
        from apr_tpu.ops.pallas.distance import chamfer_distance_pallas

        cd = chamfer_distance_pallas(recon, apc_points, recon_mask, apc_mask)
    elif chamfer_mode == "exact":
        cd = chamfer_distance(recon, apc_points, recon_mask, apc_mask)
    else:
        raise ValueError(f"unknown chamfer_mode: {chamfer_mode!r} "
                         "(expected window | pallas | exact)")
    return cd + reg * reg_strength, cd, reg, clamp_frac
