import jax
import jax.numpy as jnp
import numpy as np

from apr_tpu.geometry import (
    apply_transform,
    compose,
    inverse,
    kabsch,
    est_rigid_robust,
    random_rigid_transform,
    rotation_from_euler,
    rotation_angle_deg,
)
from apr_tpu.geometry.se3 import make_transform


def _random_transform(rng, max_angle=np.pi, max_trans=5.0):
    angles = rng.uniform(-max_angle, max_angle, 3)
    r = np.asarray(rotation_from_euler(jnp.asarray(angles)))
    t = rng.uniform(-max_trans, max_trans, 3)
    out = np.eye(4)
    out[:3, :3] = r
    out[:3, 3] = t
    return out.astype(np.float32)


def test_se3_roundtrip(rng):
    t = _random_transform(rng)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    warped = apply_transform(jnp.asarray(pts), jnp.asarray(t))
    back = apply_transform(warped, inverse(jnp.asarray(t)))
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-4)


def test_se3_compose(rng):
    a = _random_transform(rng)
    b = _random_transform(rng)
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    one = apply_transform(
        apply_transform(jnp.asarray(pts), jnp.asarray(b)), jnp.asarray(a)
    )
    two = apply_transform(jnp.asarray(pts), compose(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(np.asarray(one), np.asarray(two), atol=1e-4)


def test_rotation_angle(rng):
    angles = jnp.asarray([0.1, 0.0, 0.0])
    r = rotation_from_euler(angles)
    deg = float(rotation_angle_deg(jnp.eye(3), r))
    np.testing.assert_allclose(deg, np.degrees(0.1), atol=1e-4)


def test_random_rigid_is_rotation(jax_key):
    t = random_rigid_transform(jax_key)
    r = np.asarray(t[:3, :3])
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)


def test_kabsch_exact_recovery(rng):
    t = _random_transform(rng)
    src = rng.normal(size=(200, 3)).astype(np.float32)
    tgt = np.asarray(apply_transform(jnp.asarray(src), jnp.asarray(t)))
    est = np.asarray(kabsch(jnp.asarray(src), jnp.asarray(tgt)))
    np.testing.assert_allclose(est, t, atol=1e-4)


def test_kabsch_weighted_ignores_outliers(rng):
    t = _random_transform(rng)
    src = rng.normal(size=(100, 3)).astype(np.float32)
    tgt = np.array(apply_transform(jnp.asarray(src), jnp.asarray(t)))
    tgt[80:] += rng.normal(size=(20, 3)) * 10  # outliers
    w = np.ones(100, np.float32)
    w[80:] = 0.0
    est = np.asarray(kabsch(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(w)))
    np.testing.assert_allclose(est, t, atol=1e-3)


def test_kabsch_degenerate_reflection(rng):
    # planar points can induce reflection solutions; det must stay +1
    src = rng.normal(size=(50, 3)).astype(np.float32)
    src[:, 2] = 0.0
    t = _random_transform(rng)
    tgt = np.asarray(apply_transform(jnp.asarray(src), jnp.asarray(t)))
    est = np.asarray(kabsch(jnp.asarray(src), jnp.asarray(tgt)))
    assert np.linalg.det(est[:3, :3]) > 0.99
    np.testing.assert_allclose(
        np.asarray(apply_transform(jnp.asarray(src), jnp.asarray(est))),
        tgt,
        atol=1e-3,
    )


def test_robust_irls_with_outliers(rng):
    # est_rigid_robust linearizes small angles; use a modest rotation
    angles = rng.uniform(-0.15, 0.15, 3)
    r = np.asarray(rotation_from_euler(jnp.asarray(angles)))
    t_gt = np.eye(4, dtype=np.float32)
    t_gt[:3, :3] = r
    t_gt[:3, 3] = rng.uniform(-1, 1, 3)

    src = rng.uniform(-10, 10, size=(300, 3)).astype(np.float32)
    tgt = np.array(apply_transform(jnp.asarray(src), jnp.asarray(t_gt)))
    tgt[250:] += rng.normal(size=(50, 3)) * 5.0  # 17% outliers

    est = np.asarray(est_rigid_robust(jnp.asarray(src), jnp.asarray(tgt)))
    rre = float(rotation_angle_deg(jnp.asarray(est[:3, :3]), jnp.asarray(r)))
    rte = np.linalg.norm(est[:3, 3] - t_gt[:3, 3])
    assert rre < 1.0, rre
    assert rte < 0.2, rte


def test_robust_irls_jits(rng):
    src = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    tgt = src + 0.5
    f = jax.jit(est_rigid_robust)
    est = np.asarray(f(src, tgt))
    np.testing.assert_allclose(est[:3, 3], [0.5, 0.5, 0.5], atol=1e-3)
    np.testing.assert_allclose(est[:3, :3], np.eye(3), atol=1e-3)


def test_est_rigid_robust_ignores_masked_rows(rng):
    """Zero-weight (padded) rows must stay excluded on EVERY IRLS iteration
    (regression: the robust kernel re-admitted padding after iter 1)."""
    from apr_tpu.geometry.robust import est_rigid_robust
    from apr_tpu.geometry.se3 import apply_transform

    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = [2.0, -1.0, 0.5]
    src = rng.uniform(-10, 10, (300, 3)).astype(np.float32)
    tgt = np.asarray(apply_transform(jnp.asarray(src), jnp.asarray(t)))
    # padded tail: garbage correspondences with zero weight
    src_pad = np.concatenate([src, rng.uniform(-10, 10, (200, 3)).astype(np.float32)])
    tgt_pad = np.concatenate([tgt, rng.uniform(50, 60, (200, 3)).astype(np.float32)])
    w = np.zeros(500, np.float32)
    w[:300] = 1.0

    est = np.asarray(est_rigid_robust(jnp.asarray(src_pad),
                                      jnp.asarray(tgt_pad), jnp.asarray(w)))
    np.testing.assert_allclose(est, t, atol=1e-3)
