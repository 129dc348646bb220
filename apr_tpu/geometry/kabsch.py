"""Weighted Kabsch / Umeyama rigid alignment via SVD.

The closed-form pose solver behind RANSAC hypothesis fitting and ICP.  The
reference delegates this to Open3D's C++ `TransformationEstimationPointToPoint`
(SURVEY.md §2.3 item 3); here it is a jit/vmap-friendly jnp function so
thousands of RANSAC hypotheses solve in one batched SVD on device.
"""

from __future__ import annotations

from typing import Optional

import jax
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


def _inv3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 inverse (adjugate / det)."""
    a, b, c = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    g, h, i = m[2, 0], m[2, 1], m[2, 2]
    co = jnp.array([
        [e * i - f * h, c * h - b * i, b * f - c * e],
        [f * g - d * i, a * i - c * g, c * d - a * f],
        [d * h - e * g, b * g - a * h, a * e - b * d],
    ])
    det = a * co[0, 0] + b * co[1, 0] + c * co[2, 0]
    return co / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)


def kabsch_fast(
    source: jnp.ndarray,
    target: jnp.ndarray,
    newton_iters: int = 8,
) -> jnp.ndarray:
    """Rigid fit via Newton polar decomposition instead of SVD.

    vmapped 3x3 SVDs are pathologically slow on TPU (iterative Jacobi per
    matrix); the polar factor R = polar(cov) from scale-normalized Newton
    iterations X <- (X + X^-T)/2 is pure batched matmul work.  If cov is
    reflective (det < 0 — degenerate RANSAC samples) the result is an
    orthogonal matrix with det -1, NOT corrected to a rotation: callers must
    gate on det > 0 (such hypotheses score near zero inliers anyway).  Use
    :func:`kabsch` for the final refinement where exactness matters.
    """
    n = source.shape[0]
    mu_s = jnp.mean(source, axis=0)
    mu_t = jnp.mean(target, axis=0)
    cov = (source - mu_s).T @ (target - mu_t) / n

    x = cov.T  # polar(cov^T) gives R mapping source -> target
    # scale toward unit norm for fast convergence
    x = x / jnp.maximum(jnp.sqrt(jnp.abs(jnp.linalg.det(x))) ** (2.0 / 3.0),
                        1e-12)

    def body(x, _):
        x_inv_t = _inv3(x).T
        # scaled Newton: gamma balances singular values each step
        gamma = (jnp.linalg.norm(x_inv_t) / jnp.maximum(
            jnp.linalg.norm(x), 1e-20)) ** 0.5
        return 0.5 * (gamma * x + x_inv_t / gamma), None

    r, _ = jax.lax.scan(body, x, None, length=newton_iters)
    t = mu_t - r @ mu_s
    out = jnp.eye(4, dtype=source.dtype)
    out = out.at[:3, :3].set(r)
    return out.at[:3, 3].set(t)
