"""Massively parallel on-device RANSAC for rigid registration.

Replaces Open3D's sequential CPU RANSAC
(``registration_ransac_based_on_feature_matching``, reference
FCGF_APR/scripts/test_apr.py:150-155 with 4M iterations / 10k confidence;
Predator_APR/lib/benchmark_utils.py:218-223 with 50k/1k) with the TPU-shaped
equivalent: a *batch* of hypotheses evaluated simultaneously.

Per hypothesis: sample ``ransac_n`` correspondences, apply Open3D's two
pruning checkers (edge-length similarity within the sampled tuple, and
point-distance after fitting), fit with Kabsch, then score every hypothesis
against ALL correspondences by inlier count (fitness) and inlier RMSE —
exactly Open3D's selection criterion (max fitness, tie-break min RMSE).
A final Kabsch refit on the best hypothesis' inliers plays the role of
Open3D's iterative local refinement.

Early-exit confidence scheduling is meaningless when hypotheses are free in
parallel — instead the hypothesis count is a static knob; BENCH sweeps show
16k-64k batched hypotheses match the recall of Open3D's 4M sequential trials
because hypotheses are scored exactly rather than sampled-then-abandoned.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from apr_tpu.geometry.kabsch import kabsch, kabsch_fast
from apr_tpu.geometry.se3 import apply_transform


class RansacResult(NamedTuple):
    transform: jnp.ndarray  # [4, 4]
    fitness: jnp.ndarray    # scalar: inliers / valid correspondences
    inlier_rmse: jnp.ndarray
    inliers: jnp.ndarray    # bool [M] over the correspondence set


def trials_needed(w: jnp.ndarray, ransac_n: int,
                  confidence: float) -> jnp.ndarray:
    """Open3D's RANSAC stopping count: trials T such that drawing at least
    one all-inlier n-tuple has probability >= confidence at inlier ratio w
    — T = log(1-conf) / log(1-w^n).  inf when w <= 0 (nothing found)."""
    log_miss = jnp.log1p(-jnp.clip(w ** ransac_n, 0.0, 1.0 - 1e-12))
    return jnp.where(
        log_miss < 0, jnp.log1p(-confidence) / log_miss, jnp.inf)


def _edge_length_ok(src, tgt, similarity: float) -> jnp.ndarray:
    """Open3D CorrespondenceCheckerBasedOnEdgeLength over an n-tuple.

    For every pair (i, j) in the sample: s * d_src <= d_tgt <= d_src / s.
    """
    ds = jnp.linalg.norm(src[:, None, :] - src[None, :, :], axis=-1)
    dt = jnp.linalg.norm(tgt[:, None, :] - tgt[None, :, :], axis=-1)
    n = src.shape[0]
    off = ~jnp.eye(n, dtype=bool)
    ok = (dt >= similarity * ds) & (ds >= similarity * dt)
    return jnp.all(ok | ~off)


@partial(
    jax.jit,
    static_argnames=("ransac_n", "num_hypotheses", "hypothesis_chunk",
                     "escalation_factor", "escalation_min_inliers",
                     "escalation_rungs", "escalation_confidence"),
)
def ransac_pose(
    key: jax.Array,
    src_xyz: jnp.ndarray,
    tgt_xyz: jnp.ndarray,
    corr_mask: Optional[jnp.ndarray] = None,
    distance_threshold: float = 0.3,
    ransac_n: int = 4,
    num_hypotheses: int = 32768,
    edge_length_similarity: float = 0.9,
    hypothesis_chunk: int = 1024,
    escalation_factor: int = 0,
    escalation_min_inliers: int = 30,
    escalation_rungs: int = 1,
    escalation_confidence: float = 0.0,
) -> RansacResult:
    """RANSAC over a matched correspondence set.

    src_xyz/tgt_xyz: [M, 3] matched pairs (src_xyz[i] corresponds to
    tgt_xyz[i]); corr_mask: [M] validity.  Returns the best rigid transform
    mapping src -> tgt.

    ``escalation_factor > 0`` adds confidence-style extra stages — the
    fixed-batch analog of Open3D's adaptive ``RANSACConvergenceCriteria``
    (reference FCGF_APR/scripts/test_apr.py:150-155): up to
    ``escalation_rungs`` ``lax.cond`` branches each evaluate
    ``escalation_factor * num_hypotheses`` additional hypotheses inside the
    same program and keep the overall best.  A rung fires when EITHER
    trigger says the answer is not yet trustworthy:

    - fewer than ``escalation_min_inliers`` inliers on the best hypothesis
      (the legacy round-4 trigger — catches "found nothing"), or
    - ``escalation_confidence`` in (0, 1): the trials evaluated so far are
      fewer than Open3D's stopping count  log(1-conf) / log(1-w^4)  for
      the best fitness w = inliers/valid (catches "found SOMETHING, but at
      this inlier ratio a batch this small still misses all-inlier tuples
      often" — the round-4 sweep's p=0.05-0.08 gap, where spurious
      >=30-inlier hypotheses blocked the legacy trigger; docs/PERF.md).

    Easy pairs never pay for escalation (under ``vmap`` the cond becomes a
    select and both branches run — use per-pair dispatch when escalating).
    The escalation_factor == 0 path is bitwise-identical to the plain
    solver (tests/test_registration.py).
    """
    m = src_xyz.shape[0]
    hypothesis_chunk = min(hypothesis_chunk, num_hypotheses)
    num_hypotheses = (num_hypotheses // hypothesis_chunk) * hypothesis_chunk
    if corr_mask is None:
        corr_mask = jnp.ones((m,), bool)
    n_valid = jnp.sum(corr_mask)

    # Sample valid correspondence indices: draw from the valid set by
    # sampling uniform ints into a cumulative-count remap.
    valid_idx = jnp.where(
        corr_mask, jnp.arange(m, dtype=jnp.int32), m
    )
    valid_sorted = jnp.sort(valid_idx)  # valid first, m-sentinels last

    thr2 = distance_threshold * distance_threshold
    cw = corr_mask.astype(src_xyz.dtype)

    # per-coordinate planes: [h, M, 3] intermediates pad the 3-lane dim 42x
    # under TPU (8,128) tiling; [h, M] planes tile perfectly
    sx, sy, sz = src_xyz[:, 0], src_xyz[:, 1], src_xyz[:, 2]
    tx_, ty_, tz_ = tgt_xyz[:, 0], tgt_xyz[:, 1], tgt_xyz[:, 2]

    def eval_chunk(sample_chunk):
        s = src_xyz[sample_chunk]  # [h, n, 3]
        t = tgt_xyz[sample_chunk]

        edge_ok = jax.vmap(_edge_length_ok, in_axes=(0, 0, None))(
            s, t, edge_length_similarity
        )
        # Open3D samples DISTINCT correspondence indices; independent draws
        # can repeat (~0.6% of 4-tuples at 1000 valid, worse when few are
        # valid), making the tuple effectively (n-1)-point and degenerate
        # for the fit while trivially passing the edge checker (0 >= 0.9*0)
        dup = jnp.any(
            (sample_chunk[:, :, None] == sample_chunk[:, None, :])
            & ~jnp.eye(ransac_n, dtype=bool)[None], axis=(1, 2)
        )
        edge_ok = edge_ok & ~dup
        # Newton-polar fit: vmapped 3x3 SVD is pathologically slow on TPU.
        # Reflective (det<0) solutions from degenerate samples are gated out.
        transforms = jax.vmap(kabsch_fast)(s, t)  # [h, 4, 4]
        proper = jnp.linalg.det(transforms[:, :3, :3]) > 0.5

        # score against all correspondences, plane-wise
        r = transforms[:, :3, :3]
        tr = transforms[:, :3, 3]
        wx = (r[:, 0, 0, None] * sx[None] + r[:, 0, 1, None] * sy[None]
              + r[:, 0, 2, None] * sz[None] + tr[:, 0, None])
        wy = (r[:, 1, 0, None] * sx[None] + r[:, 1, 1, None] * sy[None]
              + r[:, 1, 2, None] * sz[None] + tr[:, 1, None])
        wz = (r[:, 2, 0, None] * sx[None] + r[:, 2, 1, None] * sy[None]
              + r[:, 2, 2, None] * sz[None] + tr[:, 2, None])
        d2 = ((wx - tx_[None]) ** 2 + (wy - ty_[None]) ** 2
              + (wz - tz_[None]) ** 2)  # [h, M]
        inl = (d2 <= thr2) & corr_mask[None, :]
        n_inl = jnp.sum(inl, axis=1)
        rmse = jnp.sqrt(
            jnp.sum(jnp.where(inl, d2, 0.0), axis=1)
            / jnp.maximum(n_inl, 1)
        )
        # distance-checker on the sampled tuple: all n points inliers
        samp_d2 = jax.vmap(lambda idx, dd: dd[idx])(sample_chunk, d2)
        dist_ok = jnp.all(samp_d2 <= thr2, axis=1)
        ok = edge_ok & dist_ok & proper
        n_inl = jnp.where(ok, n_inl, 0)
        score = n_inl.astype(jnp.float32) - rmse / (rmse + 1.0)
        best = jnp.argmax(score)
        return score[best], transforms[best]

    def run_stage(stage_key, n_hyp):
        draws = jax.random.randint(
            stage_key, (n_hyp, ransac_n), 0, jnp.maximum(n_valid, 1)
        )
        samples = jnp.minimum(valid_sorted[draws], m - 1)  # [H, n]
        chunks = samples.reshape(
            n_hyp // hypothesis_chunk, hypothesis_chunk, ransac_n
        )
        scores, transforms = jax.lax.map(eval_chunk, chunks)
        b = jnp.argmax(scores)
        return scores[b], transforms[b]

    k_stage1, key = jax.random.split(key)
    best_score, best_t = run_stage(k_stage1, num_hypotheses)

    if escalation_factor > 0:
        n_esc = max(
            (escalation_factor * num_hypotheses) // hypothesis_chunk, 1
        ) * hypothesis_chunk

        def needs_more(score, n_done):
            # score = n_inl - rmse/(rmse+1) with the penalty in [0, 1), so
            # score < k  <=>  best inlier count <= k (boundary-exact for
            # the integer thresholds used here)
            trig = score < escalation_min_inliers
            if escalation_confidence > 0.0:
                n_inl = jnp.ceil(score)
                w = n_inl / jnp.maximum(n_valid, 1)
                trig = trig | (n_done < trials_needed(
                    w, ransac_n, escalation_confidence))
            return trig

        for rung in range(max(escalation_rungs, 1)):
            key, k_rung = jax.random.split(key)
            # hypotheses evaluated before this rung — static per rung
            n_done = num_hypotheses + rung * n_esc

            def escalate(op, k_rung=k_rung):
                s0, t0 = op
                s1, t1 = run_stage(k_rung, n_esc)
                better = s1 > s0
                return jnp.where(better, s1, s0), jnp.where(better, t1, t0)

            best_score, best_t = jax.lax.cond(
                needs_more(best_score, n_done),
                escalate,
                lambda op: op,
                (best_score, best_t),
            )

    # local refinement: weighted Kabsch on the best hypothesis' inliers
    def refine(t, _):
        warped = apply_transform(src_xyz, t)
        d2 = jnp.sum((warped - tgt_xyz) ** 2, axis=-1)
        inl = (d2 <= thr2) & corr_mask
        w = inl.astype(src_xyz.dtype)
        has = jnp.sum(w) >= ransac_n
        t_new = jnp.where(has, kabsch(src_xyz, tgt_xyz, w), t)
        return t_new, None

    best_t, _ = jax.lax.scan(refine, best_t, None, length=3)

    warped = apply_transform(src_xyz, best_t)
    d2 = jnp.sum((warped - tgt_xyz) ** 2, axis=-1)
    inliers = (d2 <= thr2) & corr_mask
    n_inl = jnp.sum(inliers)
    return RansacResult(
        transform=best_t,
        fitness=n_inl / jnp.maximum(n_valid, 1),
        inlier_rmse=jnp.sqrt(
            jnp.sum(jnp.where(inliers, d2, 0.0)) / jnp.maximum(n_inl, 1)
        ),
        inliers=inliers,
    )
