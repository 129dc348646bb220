"""SE(3) rigid-transform math (4x4 homogeneous convention).

Covers the reference's scattered pose utilities: ``apply_transform``
(FCGF_APR/lib/data_loaders.py PairDataset.apply_transform), random rigid
sampling (``sample_random_trans``, data_loaders.py:86), Euler/rotation
helpers (FCGF_APR/util/transform_estimation.py rot_x/y/z, get_trans) and the
numpy se3 helpers in Predator_APR/common/math/se3.py — as pure jnp functions
usable inside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rotation_from_euler(angles: jnp.ndarray) -> jnp.ndarray:
    """R = Rz(c) @ Ry(b) @ Rx(a) for angles [a, b, c] (radians).

    Matches the reference's get_trans composition order
    (transform_estimation.py:40-44).
    """
    a, b, c = angles[0], angles[1], angles[2]
    ca, sa = jnp.cos(a), jnp.sin(a)
    cb, sb = jnp.cos(b), jnp.sin(b)
    cc, sc = jnp.cos(c), jnp.sin(c)
    rx = jnp.array([[1, 0, 0], [0, ca, -sa], [0, sa, ca]])
    ry = jnp.array([[cb, 0, sb], [0, 1, 0], [-sb, 0, cb]])
    rz = jnp.array([[cc, -sc, 0], [sc, cc, 0], [0, 0, 1]])
    return rz @ ry @ rx


def make_transform(rotation: jnp.ndarray, translation: jnp.ndarray) -> jnp.ndarray:
    t = jnp.eye(4, dtype=rotation.dtype)
    t = t.at[:3, :3].set(rotation)
    return t.at[:3, 3].set(translation)


def apply_transform(points: jnp.ndarray, transform: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 rigid transform to points [..., 3]."""
    r = transform[:3, :3]
    t = transform[:3, 3]
    return points @ r.T + t


def compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Transform equivalent to applying ``b`` first, then ``a``."""
    return a @ b


def inverse(transform: jnp.ndarray) -> jnp.ndarray:
    r = transform[:3, :3]
    t = transform[:3, 3]
    out = jnp.eye(4, dtype=transform.dtype)
    out = out.at[:3, :3].set(r.T)
    return out.at[:3, 3].set(-r.T @ t)


def random_rigid_transform(
    key: jax.Array, rotation_range_deg: float = 360.0
) -> jnp.ndarray:
    """Random rotation (uniform Euler angles in +-range/2) about the origin.

    Parity with the reference's ``sample_random_trans`` with a zero pivot
    (data_loaders.py:86-91): uniform Euler-angle rotation, no translation.
    """
    angles = (
        (jax.random.uniform(key, (3,)) - 0.5)
        * (rotation_range_deg * jnp.pi / 180.0)
    )
    return make_transform(rotation_from_euler(angles), jnp.zeros(3))


def rotation_angle_deg(r_est: jnp.ndarray, r_gt: jnp.ndarray) -> jnp.ndarray:
    """Geodesic rotation deviation in degrees.

    RRE = arccos((trace(R_est^T R_gt) - 1) / 2), the reference's criterion
    (FCGF_APR/scripts/test_apr.py:167-170; Predator_APR/lib/
    benchmark_utils.py:170-185).
    """
    cos = (jnp.trace(r_est.T @ r_gt) - 1.0) * 0.5
    return jnp.degrees(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))


def translation_error(t_est: jnp.ndarray, t_gt: jnp.ndarray) -> jnp.ndarray:
    """RTE: Euclidean distance between translation vectors."""
    return jnp.linalg.norm(t_est - t_gt)
