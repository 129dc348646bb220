import jax
import jax.numpy as jnp
import numpy as np

from apr_tpu.geometry import apply_transform, rotation_from_euler
from apr_tpu.registration import (
    feature_nn_correspondences,
    mutual_nn_correspondences,
    gt_correspondences,
    ransac_pose,
    registration_errors,
    registration_success,
)


def _rigid(rng, angle=0.5, trans=10.0):
    t = np.eye(4, dtype=np.float32)
    t[:3, :3] = np.asarray(
        rotation_from_euler(jnp.asarray(rng.uniform(-angle, angle, 3)))
    )
    t[:3, 3] = rng.uniform(-trans, trans, 3)
    return t


def test_feature_nn(rng):
    f1 = rng.normal(size=(100, 16)).astype(np.float32)
    perm = rng.permutation(100)
    f0 = f1[perm] + rng.normal(size=(100, 16)).astype(np.float32) * 0.01
    corr = feature_nn_correspondences(jnp.asarray(f0), jnp.asarray(f1))
    np.testing.assert_array_equal(np.asarray(corr.tgt_idx), perm)
    assert np.asarray(corr.mask).all()


def test_mutual_nn_filters(rng):
    f1 = rng.normal(size=(64, 8)).astype(np.float32)
    f0 = np.concatenate([f1[:32] + 1e-3, rng.normal(size=(32, 8)).astype(np.float32) * 0.01])
    corr = mutual_nn_correspondences(jnp.asarray(f0), jnp.asarray(f1))
    m = np.asarray(corr.mask)
    # the first 32 are true mutual NNs
    assert m[:32].all()
    np.testing.assert_array_equal(np.asarray(corr.tgt_idx)[:32], np.arange(32))


def test_gt_correspondences(rng):
    t = _rigid(rng)
    x0 = rng.uniform(-5, 5, size=(200, 3)).astype(np.float32)
    x1 = np.asarray(apply_transform(jnp.asarray(x0), jnp.asarray(t)))
    corr = gt_correspondences(
        jnp.asarray(x0), jnp.asarray(x1), jnp.asarray(t), radius=0.1, cap_per_point=4
    )
    m = np.asarray(corr.mask)
    # every point matches itself under the exact transform
    si, ti = np.asarray(corr.src_idx)[m], np.asarray(corr.tgt_idx)[m]
    assert set(zip(si.tolist(), ti.tolist())) >= {(i, i) for i in range(200)}


def test_ransac_recovers_pose(rng, jax_key):
    t_gt = _rigid(rng)
    n = 512
    src = rng.uniform(-20, 20, size=(n, 3)).astype(np.float32)
    tgt = np.array(apply_transform(jnp.asarray(src), jnp.asarray(t_gt)))
    tgt += rng.normal(size=(n, 3)).astype(np.float32) * 0.02
    # corrupt 60% of correspondences
    n_bad = int(n * 0.6)
    bad = rng.choice(n, n_bad, replace=False)
    tgt[bad] = rng.uniform(-20, 20, size=(n_bad, 3))

    res = ransac_pose(
        jax_key,
        jnp.asarray(src),
        jnp.asarray(tgt),
        distance_threshold=0.3,
        num_hypotheses=4096,
        hypothesis_chunk=512,
    )
    rte, rre = registration_errors(res.transform, jnp.asarray(t_gt))
    assert float(rte) < 0.1, float(rte)
    assert float(rre) < 1.0, float(rre)
    assert bool(registration_success(res.transform, jnp.asarray(t_gt)))
    assert float(res.fitness) > 0.3


def test_ransac_respects_mask(rng, jax_key):
    t_gt = _rigid(rng)
    n = 256
    src = rng.uniform(-10, 10, size=(n, 3)).astype(np.float32)
    tgt = np.array(apply_transform(jnp.asarray(src), jnp.asarray(t_gt)))
    # valid half is clean; masked half is pure garbage pointing to a wrong pose
    mask = np.zeros(n, bool)
    mask[:128] = True
    t_wrong = _rigid(rng)
    tgt[128:] = np.asarray(
        apply_transform(jnp.asarray(src[128:]), jnp.asarray(t_wrong))
    )
    res = ransac_pose(
        jax_key,
        jnp.asarray(src),
        jnp.asarray(tgt),
        corr_mask=jnp.asarray(mask),
        distance_threshold=0.3,
        num_hypotheses=2048,
        hypothesis_chunk=512,
    )
    assert bool(registration_success(res.transform, jnp.asarray(t_gt)))
    # no masked correspondence may count as inlier
    assert not np.asarray(res.inliers)[128:].any()


def test_e2e_slice_features_to_pose(rng, jax_key):
    """SURVEY.md §7 step 2's minimum end-to-end slice:

    synthetic pair -> per-point 'features' (noisy coordinates imitating an
    untrained encoder) -> feature NN matching -> RANSAC -> pose vs GT.
    """
    t_gt = _rigid(rng, angle=0.4, trans=15.0)
    n = 1024
    cloud = rng.uniform(-30, 30, size=(n, 3)).astype(np.float32)
    x0 = cloud + rng.normal(size=(n, 3)).astype(np.float32) * 0.01
    x1 = np.asarray(apply_transform(jnp.asarray(cloud), jnp.asarray(t_gt)))

    # "features": warped coordinates (a perfect-feature stand-in, the way the
    # reference validates its harness with GT-derived matches)
    f0 = np.array(apply_transform(jnp.asarray(x0), jnp.asarray(t_gt)))
    f0 += rng.normal(size=(n, 3)).astype(np.float32) * 0.05
    f1 = x1

    corr = mutual_nn_correspondences(jnp.asarray(f0), jnp.asarray(f1))
    tgt_pts = jnp.asarray(f1)[jnp.clip(corr.tgt_idx, 0, n - 1)]
    res = ransac_pose(
        jax_key,
        jnp.asarray(x0),
        tgt_pts,
        corr_mask=corr.mask,
        distance_threshold=0.3,
        num_hypotheses=2048,
        hypothesis_chunk=512,
    )
    rte, rre = registration_errors(res.transform, jnp.asarray(t_gt))
    assert float(rte) < 0.3 and float(rre) < 2.0, (float(rte), float(rre))


def test_find_nn_and_pose_estimation(rng):
    from apr_tpu.registration.matching import find_nn, pose_estimation

    t = _rigid(rng, angle=0.1, trans=1.0)
    x0 = rng.uniform(-10, 10, (300, 3)).astype(np.float32)
    x1 = np.array(apply_transform(jnp.asarray(x0), jnp.asarray(t)))
    f = rng.normal(size=(300, 16)).astype(np.float32)
    f /= np.linalg.norm(f, axis=1, keepdims=True)

    idx, d2 = find_nn(jnp.asarray(f), jnp.asarray(f))
    np.testing.assert_array_equal(np.asarray(idx), np.arange(300))

    est, w = pose_estimation(
        jnp.asarray(x0), jnp.asarray(x1), jnp.asarray(f), jnp.asarray(f)
    )
    np.testing.assert_allclose(np.asarray(est), t, atol=1e-4)


def test_gt_correspondences_cap1_windowed_matches_brute(rng):
    """cap_per_point=1 (the FCGF default) takes the windowed-NN fast path;
    it must agree with the brute radius search on matches and indices."""
    from apr_tpu.ops.neighbors import radius_neighbors

    t = _rigid(rng)
    x0 = rng.uniform(-20, 20, size=(700, 3)).astype(np.float32)
    x1 = np.asarray(apply_transform(
        jnp.asarray(x0[:500]), jnp.asarray(t)))  # only 500 have a match
    x1 = np.concatenate([x1, rng.uniform(40, 60, (200, 3)).astype(np.float32)])
    m0 = np.ones(700, bool); m0[650:] = False
    m1 = np.ones(700, bool); m1[680:] = False
    corr = gt_correspondences(
        jnp.asarray(x0), jnp.asarray(x1), jnp.asarray(t),
        radius=0.3, cap_per_point=1,
        mask0=jnp.asarray(m0), mask1=jnp.asarray(m1))
    warped = np.asarray(apply_transform(jnp.asarray(x0), jnp.asarray(t)))
    brute = np.asarray(radius_neighbors(
        jnp.asarray(warped), jnp.asarray(x1), 0.3, 1,
        q_mask=jnp.asarray(m0), s_mask=jnp.asarray(m1)))[:, 0]
    mask = np.asarray(corr.mask)
    np.testing.assert_array_equal(mask, brute < 700)
    np.testing.assert_array_equal(np.asarray(corr.tgt_idx)[mask], brute[mask])


def test_gt_correspondences_dense_slab(rng):
    """Reviewer repro: thousands of supports inside ONE x-cell (dense
    ground) must all still match — the window is sized for that case."""
    n = 4096
    x0 = np.zeros((n, 3), np.float32)
    x0[:, 0] = rng.uniform(0, 0.4, n)       # all within one 0.45 m x-cell
    x0[:, 1] = rng.uniform(-50, 50, n)
    x0[:, 2] = rng.uniform(-2, 2, n)
    t = np.eye(4, dtype=np.float32)
    corr = gt_correspondences(
        jnp.asarray(x0), jnp.asarray(x0), jnp.asarray(t),
        radius=0.45, cap_per_point=1)
    assert bool(np.asarray(corr.mask).all()), (
        f"only {int(np.asarray(corr.mask).sum())}/{n} matched")


def test_ransac_escalation(rng, jax_key):
    """The in-program escalation stage (analog of Open3D's adaptive
    convergence criteria, FCGF_APR/scripts/test_apr.py:150-155).

    (a) with a threshold that never triggers, results are BITWISE the
        non-escalated ones (stage 1 uses its own key split either way);
    (b) at a 6% inlier ratio where a 256-hypothesis stage-1 whiffs, the
        256x escalated run recovers the pose.
    """
    from apr_tpu.registration.ransac import ransac_pose

    m, n_inl = 1000, 60
    src = rng.uniform(-30, 30, (m, 3)).astype(np.float32)
    t_gt = np.eye(4, dtype=np.float32)
    t_gt[:3, :3] = np.asarray(rotation_from_euler(jnp.asarray([0.3, -0.2, 0.5])))
    t_gt[:3, 3] = [4.0, -2.0, 1.0]
    tgt = np.array(apply_transform(jnp.asarray(src), jnp.asarray(t_gt)))
    outl = rng.permutation(m)[n_inl:]
    tgt[outl] = rng.uniform(-30, 30, (len(outl), 3)).astype(np.float32)

    base = ransac_pose(jax_key, jnp.asarray(src), jnp.asarray(tgt),
                       num_hypotheses=256, hypothesis_chunk=256)
    never = ransac_pose(jax_key, jnp.asarray(src), jnp.asarray(tgt),
                        num_hypotheses=256, hypothesis_chunk=256,
                        escalation_factor=256, escalation_min_inliers=0)
    np.testing.assert_array_equal(np.asarray(base.transform),
                                  np.asarray(never.transform))

    # stage 1 must fail for (b) to pin the escalated path; verified for
    # this seed (fitness ~0 at 256 hypotheses, p_hit = 1-(1-0.06^4)^256 ~ 0.3%)
    assert float(base.fitness) < 0.05

    esc = ransac_pose(jax_key, jnp.asarray(src), jnp.asarray(tgt),
                      num_hypotheses=256, hypothesis_chunk=256,
                      escalation_factor=256, escalation_min_inliers=30)
    err = np.abs(np.asarray(esc.transform) - t_gt).max()
    assert err < 0.05, f"escalated RANSAC should recover the pose (err {err})"
    assert float(esc.fitness) >= 0.05


def test_ransac_confidence_trigger(rng, jax_key):
    """The confidence trigger (Open3D stopping-count analog) escalates in a
    regime where the legacy min-inliers trigger is blind: min_inliers=0
    never fires (any found hypothesis has >= 1 inlier), but at 6% inliers
    the best-so-far fitness says 256 trials are nowhere near the 0.999
    stopping count, so both rungs fire and recover the pose."""
    from apr_tpu.registration.ransac import ransac_pose, trials_needed

    # stopping-count values (closed form): ~1.10M at w=0.05, ~850 at w=0.3
    np.testing.assert_allclose(
        float(trials_needed(jnp.asarray(0.05), 4, 0.999)), 1.105e6,
        rtol=0.01)
    np.testing.assert_allclose(
        float(trials_needed(jnp.asarray(0.3), 4, 0.999)), 851.6, rtol=0.01)
    assert np.isinf(float(trials_needed(jnp.asarray(0.0), 4, 0.999)))

    m, n_inl = 1000, 60
    src = rng.uniform(-30, 30, (m, 3)).astype(np.float32)
    t_gt = np.eye(4, dtype=np.float32)
    t_gt[:3, :3] = np.asarray(
        rotation_from_euler(jnp.asarray([0.3, -0.2, 0.5])))
    t_gt[:3, 3] = [4.0, -2.0, 1.0]
    tgt = np.array(apply_transform(jnp.asarray(src), jnp.asarray(t_gt)))
    outl = rng.permutation(m)[n_inl:]
    tgt[outl] = rng.uniform(-30, 30, (len(outl), 3)).astype(np.float32)

    common = dict(num_hypotheses=256, hypothesis_chunk=256,
                  escalation_factor=256, escalation_min_inliers=0)
    legacy = ransac_pose(jax_key, jnp.asarray(src), jnp.asarray(tgt),
                         **common)
    assert float(legacy.fitness) < 0.05  # min_inliers=0 never escalated

    conf = ransac_pose(jax_key, jnp.asarray(src), jnp.asarray(tgt),
                       escalation_rungs=2, escalation_confidence=0.999,
                       **common)
    err = np.abs(np.asarray(conf.transform) - t_gt).max()
    assert err < 0.05, f"confidence-triggered escalation failed (err {err})"
    # easy regime: high fitness reaches the stopping count, no escalation
    # and therefore bitwise equality with the plain solver
    easy_tgt = np.array(apply_transform(jnp.asarray(src), jnp.asarray(t_gt)))
    plain = ransac_pose(jax_key, jnp.asarray(src), jnp.asarray(easy_tgt),
                        num_hypotheses=2048, hypothesis_chunk=256)
    conf_easy = ransac_pose(jax_key, jnp.asarray(src),
                            jnp.asarray(easy_tgt),
                            num_hypotheses=2048, hypothesis_chunk=256,
                            escalation_factor=8, escalation_min_inliers=0,
                            escalation_rungs=2,
                            escalation_confidence=0.999)
    np.testing.assert_array_equal(np.asarray(plain.transform),
                                  np.asarray(conf_easy.transform))
