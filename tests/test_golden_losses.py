"""Golden numeric parity: reference loss formulas re-derived in pure numpy.

The reference repo ships no tests; these pin our masked/fixed-shape jax
implementations to straight-line numpy transcriptions of the reference math
(FCGF_APR/lib/trainer.py:400-452 hardest-contrastive;
Predator_APR/lib/loss.py:34-65 circle loss), with sampling sizes set to
cover every element so randomness drops out.
"""

import jax
import jax.numpy as jnp
import numpy as np

from apr_tpu.losses.circle import circle_loss
from apr_tpu.losses.contrastive import hardest_contrastive_loss


def _np_hardest_contrastive(f0, f1, pairs, pos_thresh, neg_thresh):
    """Reference contrastive_hardest_negative_loss with sel0/sel1 = all
    points and all positive pairs sampled (trainer.py:400-452)."""
    i0, i1 = pairs[:, 0], pairs[:, 1]
    posf0, posf1 = f0[i0], f1[i1]

    d01 = np.linalg.norm(posf0[:, None, :] - f1[None, :, :], axis=-1)
    d10 = np.linalg.norm(posf1[:, None, :] - f0[None, :, :], axis=-1)
    d01_min, d01_ind = d01.min(1), d01.argmin(1)
    d10_min, d10_ind = d10.min(1), d10.argmin(1)

    pos_keys = {(a, b) for a, b in pairs}
    mask0 = np.array([(a, j) not in pos_keys for a, j in zip(i0, d01_ind)])
    mask1 = np.array([(j, b) not in pos_keys for j, b in zip(d10_ind, i1)])

    pos_loss = np.maximum(
        ((posf0 - posf1) ** 2).sum(1) - pos_thresh, 0.0
    ).mean()
    neg0 = np.maximum(neg_thresh - d01_min[mask0], 0.0) ** 2
    neg1 = np.maximum(neg_thresh - d10_min[mask1], 0.0) ** 2
    return pos_loss, (neg0.mean() + neg1.mean()) / 2


def test_hardest_contrastive_golden(rng):
    n = 48
    f0 = rng.normal(size=(n, 8)).astype(np.float32)
    f0 /= np.linalg.norm(f0, axis=1, keepdims=True)
    f1 = rng.normal(size=(n, 8)).astype(np.float32)
    f1 /= np.linalg.norm(f1, axis=1, keepdims=True)
    # positives: a fixed permutation subset
    perm = rng.permutation(n)[:32]
    pairs = np.stack([np.arange(32), perm], axis=1)

    want_pos, want_neg = _np_hardest_contrastive(
        f0, f1, pairs, pos_thresh=0.1, neg_thresh=1.4
    )

    got_pos, got_neg = hardest_contrastive_loss(
        jax.random.PRNGKey(0),
        jnp.asarray(f0), jnp.asarray(f1),
        jnp.asarray(pairs[:, 0], jnp.int32),
        jnp.asarray(pairs[:, 1], jnp.int32),
        jnp.ones(32, bool),
        num_pos=32,            # = all positives: sampling is exhaustive
        num_hn_samples=n,      # = all points: mining is exhaustive
        pos_thresh=0.1, neg_thresh=1.4,
    )
    np.testing.assert_allclose(float(got_pos), want_pos, rtol=1e-5)
    np.testing.assert_allclose(float(got_neg), want_neg, rtol=1e-5)


def _np_circle_loss(coords_dist, feats_dist, pos_radius, safe_radius,
                    pos_margin, neg_margin, log_scale,
                    pos_optimal, neg_optimal):
    """Reference get_circle_loss transcription (loss.py:34-65)."""
    pos_mask = coords_dist < pos_radius
    neg_mask = coords_dist > safe_radius
    row_sel = (pos_mask.sum(-1) > 0) & (neg_mask.sum(-1) > 0)
    col_sel = (pos_mask.sum(-2) > 0) & (neg_mask.sum(-2) > 0)

    pos_weight = np.maximum(
        feats_dist - 1e5 * (~pos_mask) - pos_optimal, 0.0
    )
    neg_weight = np.maximum(
        neg_optimal - (feats_dist + 1e5 * (~neg_mask)), 0.0
    )

    def lse(x, axis):
        m = x.max(axis=axis, keepdims=True)
        return (m + np.log(np.exp(x - m).sum(axis=axis, keepdims=True))).squeeze(axis)

    lse_pos_row = lse(log_scale * (feats_dist - pos_margin) * pos_weight, -1)
    lse_pos_col = lse(log_scale * (feats_dist - pos_margin) * pos_weight, -2)
    lse_neg_row = lse(log_scale * (neg_margin - feats_dist) * neg_weight, -1)
    lse_neg_col = lse(log_scale * (neg_margin - feats_dist) * neg_weight, -2)

    sp = lambda x: np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0)  # softplus
    loss_row = sp(lse_pos_row + lse_neg_row) / log_scale
    loss_col = sp(lse_pos_col + lse_neg_col) / log_scale
    return (loss_row[row_sel].mean() + loss_col[col_sel].mean()) / 2


def test_circle_loss_golden(rng):
    p = 40
    coords = rng.uniform(-3, 3, (p, 3))
    coords_dist = np.linalg.norm(
        coords[:, None] - coords[None], axis=-1
    ).astype(np.float64)
    feats_dist = rng.uniform(0.0, 2.0, (p, p)).astype(np.float64)

    kw = dict(pos_radius=0.5, safe_radius=1.5, pos_margin=0.1,
              neg_margin=1.4, log_scale=16.0)
    want = _np_circle_loss(coords_dist, feats_dist,
                           pos_optimal=0.1, neg_optimal=1.4, **kw)
    got = float(circle_loss(
        jnp.asarray(coords_dist, jnp.float32),
        jnp.asarray(feats_dist, jnp.float32), **kw,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4)
