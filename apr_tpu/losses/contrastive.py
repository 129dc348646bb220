"""Contrastive metric-learning losses with hardest-negative mining.

Parity targets (FCGF_APR/lib/trainer.py):
- ``contrastive_hardest_negative_loss`` (:400-452): sample P positive pairs
  and two subsets of S candidate points; hardest negative of each positive
  endpoint over the candidate subset, excluding pairs that are themselves
  positives (the reference's hash trick);
  pos_loss = relu(||f0 - f1||^2 - pos_thresh)    (squared distance!)
  neg_loss = relu(neg_thresh - min_dist)^2       (Euclidean distance)
- random-negative contrastive (:172-298) and triplet (:530-728) variants.

TPU-first: everything is masked / fixed-shape; sampling-without-replacement
uses random keys + top_k over valid entries; the positive-pair exclusion uses
a sorted-key membership test instead of CPU hashing.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _sample_without_replacement(key, mask, num):
    """Indices of ``num`` random valid entries (valid-count < num -> padded).

    Returns (idx int32 [num], ok bool [num]).
    """
    n = mask.shape[0]
    scores = jax.random.uniform(key, (n,))
    scores = jnp.where(mask, scores, -1.0)
    top, idx = jax.lax.top_k(scores, num)
    return idx.astype(jnp.int32), top >= 0.0


def _pdist2(a, b):
    """Squared Euclidean distances [P, S] in f32."""
    d2 = (
        jnp.sum(a * a, 1)[:, None]
        - 2.0 * jnp.dot(a, b.T, precision=jax.lax.Precision.HIGHEST)
        + jnp.sum(b * b, 1)[None, :]
    )
    return jnp.maximum(d2, 0.0)


def _member(sorted_keys, queries):
    """queries in sorted_keys (both int32 1-D)."""
    slot = jnp.clip(
        jnp.searchsorted(sorted_keys, queries), 0, sorted_keys.shape[0] - 1
    )
    return sorted_keys[slot] == queries


@partial(jax.jit, static_argnames=("num_pos", "num_hn_samples"))
def hardest_contrastive_loss(
    key: jax.Array,
    feats0: jnp.ndarray,
    feats1: jnp.ndarray,
    pos_src: jnp.ndarray,
    pos_tgt: jnp.ndarray,
    pos_mask: jnp.ndarray,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
    num_pos: int = 1024,
    num_hn_samples: int = 256,
    pos_thresh: float = 0.1,
    neg_thresh: float = 1.4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(pos_loss, neg_loss) with reference numerics over masked buffers."""
    n0, n1 = feats0.shape[0], feats1.shape[0]
    if mask0 is None:
        mask0 = jnp.ones((n0,), bool)
    if mask1 is None:
        mask1 = jnp.ones((n1,), bool)

    k_pos, k_s0, k_s1 = jax.random.split(key, 3)
    pidx, pok = _sample_without_replacement(k_pos, pos_mask, num_pos)
    i0 = pos_src[pidx]
    i1 = pos_tgt[pidx]
    s0, s0ok = _sample_without_replacement(k_s0, mask0, num_hn_samples)
    s1, s1ok = _sample_without_replacement(k_s1, mask1, num_hn_samples)

    pf0 = feats0[jnp.clip(i0, 0, n0 - 1)]
    pf1 = feats1[jnp.clip(i1, 0, n1 - 1)]
    sub0 = feats0[s0]
    sub1 = feats1[s1]

    d01 = _pdist2(pf0, sub1)
    d10 = _pdist2(pf1, sub0)
    d01 = jnp.where(s1ok[None, :], d01, jnp.inf)
    d10 = jnp.where(s0ok[None, :], d10, jnp.inf)
    d01_min = jnp.sqrt(jnp.min(d01, 1))
    d10_min = jnp.sqrt(jnp.min(d10, 1))
    d01_arg = s1[jnp.argmin(d01, 1)]
    d10_arg = s0[jnp.argmin(d10, 1)]

    # Exclude hardest negatives that are themselves positive pairs.  The
    # naive pair key src * max(n0, n1) + tgt overflows int32 at full KITTI
    # scale (65536 flattened rows at batch 4 already needs 2^32), so the
    # subsample side of each pair is RANK-COMPRESSED into its num_hn-sized
    # subsample: candidates come from s0/s1 by construction, and a positive
    # partner outside the subsample can never equal a candidate anyway.
    # Key bound: (num_hn + 1) * max(n0, n1) — asserted < 2^31.
    big = jnp.iinfo(jnp.int32).max
    assert (num_hn_samples + 1) * max(n0, n1) < 2 ** 31, (
        "pair-key encoding would overflow int32; lower num_hn_samples "
        "or the flattened buffer size")

    def rank_in(sample, sample_ok, x):
        """Exact index of x in sorted(valid sample) else num_hn (sentinel)."""
        sorted_s = jnp.sort(jnp.where(sample_ok, sample, big))
        slot = jnp.clip(jnp.searchsorted(sorted_s, x), 0,
                        sample.shape[0] - 1)
        return jnp.where(sorted_s[slot] == x, slot,
                         sample.shape[0]).astype(jnp.int32)

    stride = jnp.int32(num_hn_samples + 1)
    # direction 0: pairs (anchor src, candidate in s1)
    keys0 = jnp.sort(jnp.where(
        pos_mask, pos_src * stride + rank_in(s1, s1ok, pos_tgt), big))
    not_pos0 = ~_member(keys0, i0 * stride + rank_in(s1, s1ok, d01_arg))
    # direction 1: pairs (candidate in s0, anchor tgt)
    span1 = jnp.int32(n1)
    keys1 = jnp.sort(jnp.where(
        pos_mask, rank_in(s0, s0ok, pos_src) * span1 + pos_tgt, big))
    not_pos1 = ~_member(keys1, rank_in(s0, s0ok, d10_arg) * span1 + i1)

    pos_d2 = jnp.sum((pf0 - pf1) ** 2, 1)
    pos_terms = jax.nn.relu(pos_d2 - pos_thresh)
    w = pok.astype(jnp.float32)
    pos_loss = jnp.sum(pos_terms * w) / jnp.maximum(jnp.sum(w), 1.0)

    w0 = (pok & not_pos0 & jnp.isfinite(d01_min)).astype(jnp.float32)
    w1 = (pok & not_pos1 & jnp.isfinite(d10_min)).astype(jnp.float32)
    neg0 = jax.nn.relu(neg_thresh - jnp.where(w0 > 0, d01_min, 0.0)) ** 2
    neg1 = jax.nn.relu(neg_thresh - jnp.where(w1 > 0, d10_min, 0.0)) ** 2
    neg_loss = 0.5 * (
        jnp.sum(neg0 * w0) / jnp.maximum(jnp.sum(w0), 1.0)
        + jnp.sum(neg1 * w1) / jnp.maximum(jnp.sum(w1), 1.0)
    )
    return pos_loss, neg_loss


@partial(jax.jit, static_argnames=("num_pos", "num_neg"))
def contrastive_loss_random_negatives(
    key: jax.Array,
    feats0: jnp.ndarray,
    feats1: jnp.ndarray,
    pos_src: jnp.ndarray,
    pos_tgt: jnp.ndarray,
    pos_mask: jnp.ndarray,
    mask1: Optional[jnp.ndarray] = None,
    num_pos: int = 1024,
    num_neg: int = 1024,
    pos_thresh: float = 0.1,
    neg_thresh: float = 1.4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ContrastiveLossTrainer parity: random (not hardest) negative pairs.

    pos = relu(d - pos_thresh)^2 over sampled positive pairs;
    neg = relu(neg_thresh - d)^2 over random pairs (trainer.py:229-264).
    """
    n1 = feats1.shape[0]
    if mask1 is None:
        mask1 = jnp.ones((n1,), bool)
    k_pos, k_neg = jax.random.split(key)
    pidx, pok = _sample_without_replacement(k_pos, pos_mask, num_pos)
    pf0 = feats0[jnp.clip(pos_src[pidx], 0, feats0.shape[0] - 1)]
    pf1 = feats1[jnp.clip(pos_tgt[pidx], 0, n1 - 1)]

    nidx, nok = _sample_without_replacement(k_neg, mask1, num_neg)
    # pair random F1 points with the sampled positives' F0 side
    nf1 = feats1[nidx]
    take = min(num_pos, num_neg)  # static
    pos_d = jnp.linalg.norm(pf0 - pf1, axis=1)
    neg_d = jnp.linalg.norm(pf0[:take] - nf1[:take], axis=1)

    wp = pok.astype(jnp.float32)
    wn = (pok[:take] & nok[:take]).astype(jnp.float32)
    pos_loss = jnp.sum(jax.nn.relu(pos_d - pos_thresh) ** 2 * wp) / jnp.maximum(
        jnp.sum(wp), 1.0
    )
    neg_loss = jnp.sum(jax.nn.relu(neg_thresh - neg_d) ** 2 * wn) / jnp.maximum(
        jnp.sum(wn), 1.0
    )
    return pos_loss, neg_loss


@partial(jax.jit, static_argnames=("num_pos", "num_hn_samples", "hardest"))
def triplet_loss(
    key: jax.Array,
    feats0: jnp.ndarray,
    feats1: jnp.ndarray,
    pos_src: jnp.ndarray,
    pos_tgt: jnp.ndarray,
    pos_mask: jnp.ndarray,
    mask1: Optional[jnp.ndarray] = None,
    num_pos: int = 1024,
    num_hn_samples: int = 256,
    margin: float = 1.0,
    hardest: bool = False,
) -> jnp.ndarray:
    """Triplet margin loss: relu(margin + d_pos - d_neg); optional hardest
    negatives (TripletLossTrainer / HardestTripletLossTrainer parity)."""
    n1 = feats1.shape[0]
    if mask1 is None:
        mask1 = jnp.ones((n1,), bool)
    k_pos, k_neg, k_pick = jax.random.split(key, 3)
    pidx, pok = _sample_without_replacement(k_pos, pos_mask, num_pos)
    pf0 = feats0[jnp.clip(pos_src[pidx], 0, feats0.shape[0] - 1)]
    pf1 = feats1[jnp.clip(pos_tgt[pidx], 0, n1 - 1)]
    d_pos = jnp.linalg.norm(pf0 - pf1, axis=1)

    sidx, sok = _sample_without_replacement(k_neg, mask1, num_hn_samples)
    sub1 = feats1[sidx]
    d2 = _pdist2(pf0, sub1)
    d2 = jnp.where(sok[None, :], d2, jnp.inf)
    if hardest:
        d_neg = jnp.sqrt(jnp.min(d2, 1))
    else:
        # fresh subkey: reusing the parent key would correlate the picks
        # with the k_pos / k_neg streams derived from it
        pick = jax.random.randint(k_pick, (num_pos,), 0, num_hn_samples)
        d_neg = jnp.sqrt(d2[jnp.arange(num_pos), pick])
    w = (pok & jnp.isfinite(d_neg)).astype(jnp.float32)
    terms = jax.nn.relu(margin + d_pos - jnp.where(w > 0, d_neg, 0.0))
    return jnp.sum(terms * w) / jnp.maximum(jnp.sum(w), 1.0)
