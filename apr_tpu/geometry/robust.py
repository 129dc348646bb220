"""Robust IRLS rigid-pose refinement.

Numeric-parity rebuild of the reference's ``est_quad_linear_robust``
(FCGF_APR/util/transform_estimation.py:89-116): 20 iterations of weighted
small-angle linearized least squares; per-iteration the 6-dof update
[rx, ry, rz, tx, ty, tz] solves the normal equations of the skew-term system,
weights follow a Geman-McClure-like kernel ``par / (residual + par)`` with
``par`` halved every 5 iterations (starting at iteration 5).

TPU-first differences from the reference: the loop is a ``lax.fori_loop``
(single compiled program, no host round-trips) and the 6x6 normal system is
solved with ``jnp.linalg.solve`` instead of an explicit inverse.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from apr_tpu.geometry.se3 import make_transform, rotation_from_euler


def _build_normal_system(pts0, pts1, w2):
    """Return (A^T A, A^T b) of the weighted small-angle system.

    The reference materializes the [3N, 6] stacked system
    (transform_estimation.py:58-79); we accumulate the 6x6 normal matrix
    directly, which is both exact and O(N * 36) instead of O(N * 18) memory.
    w2 is the squared weight per point.
    """
    n = pts0.shape[0]
    zeros = jnp.zeros((n,), pts0.dtype)
    ones = jnp.ones((n,), pts0.dtype)
    x, y, z = pts0[:, 0], pts0[:, 1], pts0[:, 2]
    # rows of A for residual components (x, y, z), columns [rx ry rz tx ty tz]
    a0 = jnp.stack([zeros, z, -y, ones, zeros, zeros], 1)
    a1 = jnp.stack([-z, zeros, x, zeros, ones, zeros], 1)
    a2 = jnp.stack([y, -x, zeros, zeros, zeros, ones], 1)
    b0 = pts1[:, 0] - x
    b1 = pts1[:, 1] - y
    b2 = pts1[:, 2] - z

    wa0 = a0 * w2[:, None]
    wa1 = a1 * w2[:, None]
    wa2 = a2 * w2[:, None]
    ata = a0.T @ wa0 + a1.T @ wa1 + a2.T @ wa2
    atb = wa0.T @ b0 + wa1.T @ b1 + wa2.T @ b2
    return ata, atb


def est_rigid_robust(
    pts0: jnp.ndarray,
    pts1: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    num_iters: int = 20,
    par_init: float = 1.0,
) -> jnp.ndarray:
    """Robust rigid transform aligning pts0 -> pts1 (both [N, 3]).

    ``weights`` are initial per-correspondence confidences (e.g. feature
    similarity, or a validity mask); after the first iteration they are
    replaced by the robust kernel exactly as the reference does.  Rows with
    ZERO initial weight (the padding of fixed-capacity correspondence
    buffers — the reference operates on variable-length arrays and has no
    such rows) stay excluded on EVERY iteration: the robust kernel alone
    would re-admit them with nonzero weight and let padded points pull the
    pose.
    """
    n = pts0.shape[0]
    if weights is None:
        weights = jnp.ones((n,), pts0.dtype)
    support = (weights > 0).astype(pts0.dtype)

    def body(i, state):
        pts0_curr, trans, weight, par = state
        par = jnp.where((i > 0) & (i % 5 == 0), par * 0.5, par)
        ata, atb = _build_normal_system(pts0_curr, pts1, weight * weight)
        x = jnp.linalg.solve(
            ata + 1e-9 * jnp.eye(6, dtype=ata.dtype), atb
        )
        trans_curr = make_transform(rotation_from_euler(x[:3]), x[3:])
        pts0_curr = pts0_curr @ trans_curr[:3, :3].T + trans_curr[:3, 3]
        weight = support * par / (
            jnp.linalg.norm(pts0_curr - pts1, axis=1) + par
        )
        return pts0_curr, trans_curr @ trans, weight, par

    init = (pts0, jnp.eye(4, dtype=pts0.dtype), weights, jnp.asarray(par_init, pts0.dtype))
    _, trans, _, _ = jax.lax.fori_loop(0, num_iters, body, init)
    return trans
