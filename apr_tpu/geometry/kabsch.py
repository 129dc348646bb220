"""Weighted Kabsch / Umeyama rigid alignment via SVD.

The closed-form pose solver behind RANSAC hypothesis fitting and ICP.  The
reference delegates this to Open3D's C++ `TransformationEstimationPointToPoint`
(SURVEY.md §2.3 item 3); here it is a jit/vmap-friendly jnp function so
thousands of RANSAC hypotheses solve in one batched SVD on device.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def kabsch(
    source: jnp.ndarray,
    target: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Best-fit rigid transform T (4x4) minimizing sum w_i ||T src_i - tgt_i||^2.

    source/target: [N, 3]; weights: [N] (optional, may be a 0/1 mask).
    vmap over a leading batch axis for RANSAC hypothesis batches.
    """
    n = source.shape[0]
    if weights is None:
        weights = jnp.ones((n,), source.dtype)
    w = weights / jnp.maximum(jnp.sum(weights), 1e-12)

    mu_s = jnp.sum(source * w[:, None], axis=0)
    mu_t = jnp.sum(target * w[:, None], axis=0)
    sc = source - mu_s
    tc = target - mu_t
    cov = (sc * w[:, None]).T @ tc  # [3, 3]

    u, _, vt = jnp.linalg.svd(cov)
    # proper rotation: flip the axis of least significance if det < 0
    d = jnp.sign(jnp.linalg.det(vt.T @ u.T))
    diag = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.array([1.0, 1.0, d]))
    r = vt.T @ diag @ u.T
    t = mu_t - r @ mu_s

    out = jnp.eye(4, dtype=source.dtype)
    out = out.at[:3, :3].set(r)
    return out.at[:3, 3].set(t)
