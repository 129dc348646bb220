"""Kernel-point dispositions for KPConv.

Reference: Predator_APR/kernels/kernel_points.py — kernel positions come from
a repulsive-potential optimization inside the unit sphere (one point fixed at
the center), cached on disk, then per-instantiation randomly rotated about z
(or fully for 'vertical') and jittered with sigma=0.01 noise before scaling
by the kernel radius (load_kernels, :388-470).

This is an offline/numpy component (runs once at model build).  The
optimizer below is a fresh implementation of the same physics: points repel
each other with an inverse-square force and are pulled toward the center by
a constant force, one point pinned at the origin; the result is rescaled so
the mean ring radius is 1.5 * expected cell size, matching the reference's
ratio convention for KP_extent-style kernels.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

_CACHE_DIR = os.path.join(os.path.dirname(__file__), "dispositions")


def optimize_kernel_points(
    num_points: int,
    dimension: int = 3,
    fixed: str = "center",
    num_iter: int = 10000,
    seed: int = 42,
) -> np.ndarray:
    """Repulsion optimization in the unit sphere; returns [K, dim].

    fixed='center' pins point 0 at the origin (the reference's default for
    k=15 kernels).
    """
    rng = np.random.default_rng(seed)
    # over-sample initial points inside the sphere
    pts = rng.uniform(-1, 1, (num_points * 5, dimension))
    pts = pts[np.linalg.norm(pts, axis=1) < 1.0][:num_points]
    while len(pts) < num_points:
        extra = rng.uniform(-1, 1, (num_points, dimension))
        extra = extra[np.linalg.norm(extra, axis=1) < 1.0]
        pts = np.concatenate([pts, extra])[:num_points]
    if fixed in ("center", "verticals"):
        pts[0] = 0.0

    step = 1e-2
    for it in range(num_iter):
        diff = pts[:, None, :] - pts[None, :, :]
        d2 = (diff ** 2).sum(-1)
        np.fill_diagonal(d2, 1.0)
        # inverse-square repulsion + constant centering pull
        force = (diff / (d2[..., None] ** 1.5 + 1e-9)).sum(1)
        force -= pts * 3.0 * num_points / 4.0
        norm = np.linalg.norm(force, axis=1, keepdims=True)
        force = force / np.maximum(norm, 1.0) * np.minimum(norm, 1.0)
        if fixed == "center":
            force[0] = 0.0
        pts = pts + step * force
        # moving decay
        if it % 1000 == 999:
            step *= 0.7

    # rescale: mean radius of non-center points = 1 (reference ratio=1.0
    # convention before the radius scaling in load_kernels)
    r = np.linalg.norm(pts, axis=1)
    if fixed == "center":
        pts = pts / max(r[1:].mean(), 1e-9)
    else:
        pts = pts / max(r.mean(), 1e-9)
    return pts.astype(np.float32)


def load_kernels(
    radius: float,
    num_kpoints: int = 15,
    dimension: int = 3,
    fixed: str = "center",
    rng: Optional[np.random.Generator] = None,
    deterministic: bool = False,
) -> np.ndarray:
    """Reference load_kernels parity: cached dispositions + random z-rotation
    + sigma-0.01 jitter, scaled by ``radius``.

    ``deterministic=True`` skips the per-instantiation rotation/noise (a
    documented reference nondeterminism, SURVEY.md §7) — needed for
    reproducible tests and checkpoint fidelity.
    """
    os.makedirs(_CACHE_DIR, exist_ok=True)
    cache = os.path.join(
        _CACHE_DIR, f"k_{num_kpoints:03d}_{fixed}_{dimension}D.npy"
    )
    if os.path.exists(cache):
        kp = np.load(cache)
    else:
        kp = optimize_kernel_points(num_kpoints, dimension, fixed)
        np.save(cache, kp)

    if deterministic:
        return (radius * kp).astype(np.float32)

    rng = rng or np.random.default_rng()
    theta = rng.random() * 2 * np.pi
    c, s = np.cos(theta), np.sin(theta)
    r = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float64)
    kp = kp + rng.normal(scale=0.01, size=kp.shape)
    return (radius * kp @ r).astype(np.float32)
