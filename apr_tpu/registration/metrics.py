"""Registration metrics: RTE / RRE / success, hit ratio, corr_dist.

Parity contracts:
- success = RTE < 2 m AND RRE < 5 deg (FCGF_APR/scripts/test_apr.py:106-108;
  Predator_APR/lib/tester.py:28-31),
- hit ratio: fraction of warped GT-NN pairs within a threshold
  (FCGF_APR/lib/trainer.py:333-357),
- corr_dist: clamped mean distance of est vs gt warped points
  (FCGF_APR/lib/metrics.py:13-20).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from apr_tpu.geometry.se3 import apply_transform, rotation_angle_deg


def registration_errors(
    t_est: jnp.ndarray, t_gt: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(RTE meters, RRE degrees)."""
    rte = jnp.linalg.norm(t_est[:3, 3] - t_gt[:3, 3])
    rre = rotation_angle_deg(t_est[:3, :3], t_gt[:3, :3])
    return rte, rre


def registration_success(
    t_est: jnp.ndarray,
    t_gt: jnp.ndarray,
    rte_thresh: float = 2.0,
    rre_thresh: float = 5.0,
) -> jnp.ndarray:
    rte, rre = registration_errors(t_est, t_gt)
    return (rte < rte_thresh) & (rre < rre_thresh)


def hit_ratio(
    xyz0: jnp.ndarray,
    xyz1_nn: jnp.ndarray,
    t_gt: jnp.ndarray,
    thresh: float,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fraction of matched pairs within ``thresh`` after the GT warp."""
    d = jnp.linalg.norm(apply_transform(xyz0, t_gt) - xyz1_nn, axis=1)
    hit = d < thresh
    if mask is None:
        return jnp.mean(hit.astype(jnp.float32))
    w = mask.astype(jnp.float32)
    return jnp.sum(hit * w) / jnp.maximum(jnp.sum(w), 1.0)


def corr_dist(
    t_est: jnp.ndarray,
    t_gt: jnp.ndarray,
    xyz0: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    max_dist: float = 1.0,
) -> jnp.ndarray:
    """Clamped mean distance between est- and gt-warped copies of xyz0."""
    d = jnp.linalg.norm(
        apply_transform(xyz0, t_est) - apply_transform(xyz0, t_gt), axis=1
    )
    d = jnp.minimum(d, max_dist)
    if weight is None:
        return jnp.mean(d)
    return jnp.sum(d * weight) / jnp.maximum(jnp.sum(weight), 1e-9)
