import jax
import jax.numpy as jnp
import numpy as np

from apr_tpu.losses import (
    hardest_contrastive_loss,
    contrastive_loss_random_negatives,
    triplet_loss,
    offset_regularization,
    npr_reconstruction,
)


def _paired_features(rng, n=256, c=16, noise=0.0):
    f1 = rng.normal(size=(n, c)).astype(np.float32)
    f1 /= np.linalg.norm(f1, axis=1, keepdims=True)
    f0 = f1 + rng.normal(size=(n, c)).astype(np.float32) * noise
    return jnp.asarray(f0), jnp.asarray(f1)


def test_hardest_contrastive_perfect_features(rng, jax_key):
    # identical features at positive pairs, far-apart negatives:
    # pos_loss ~ 0; neg_loss small if negatives are spread
    f0, f1 = _paired_features(rng, noise=0.0)
    n = f0.shape[0]
    src = jnp.arange(n, dtype=jnp.int32)
    pos_mask = jnp.ones((n,), bool)
    pos, neg = hardest_contrastive_loss(
        jax_key, f0, f1, src, src, pos_mask, num_pos=128, num_hn_samples=64
    )
    assert float(pos) < 1e-6
    assert np.isfinite(float(neg))


def test_hardest_contrastive_penalizes_bad_features(rng, jax_key):
    f0, f1 = _paired_features(rng, noise=2.0)  # wrong matches
    n = f0.shape[0]
    src = jnp.arange(n, dtype=jnp.int32)
    pos_mask = jnp.ones((n,), bool)
    pos_bad, _ = hardest_contrastive_loss(
        jax_key, f0, f1, src, src, pos_mask, num_pos=128, num_hn_samples=64
    )
    f0g, f1g = _paired_features(rng, noise=0.01)
    pos_good, _ = hardest_contrastive_loss(
        jax_key, f0g, f1g, src, src, pos_mask, num_pos=128, num_hn_samples=64
    )
    assert float(pos_bad) > float(pos_good)


def test_hardest_contrastive_masked_pairs_ignored(rng, jax_key):
    f0, f1 = _paired_features(rng, noise=0.0)
    n = f0.shape[0]
    src = jnp.arange(n, dtype=jnp.int32)
    # corrupt the masked-out half of positives with wrong targets
    tgt = np.arange(n)
    tgt[128:] = np.roll(tgt[128:], 7)
    pos_mask = jnp.arange(n) < 128
    pos, neg = hardest_contrastive_loss(
        jax_key, f0, f1, src, jnp.asarray(tgt, jnp.int32), pos_mask,
        num_pos=128, num_hn_samples=64,
    )
    assert float(pos) < 1e-6  # masked wrong pairs contributed nothing


def test_random_negative_contrastive(rng, jax_key):
    f0, f1 = _paired_features(rng, noise=0.0)
    n = f0.shape[0]
    src = jnp.arange(n, dtype=jnp.int32)
    pos_mask = jnp.ones((n,), bool)
    pos, neg = contrastive_loss_random_negatives(
        jax_key, f0, f1, src, src, pos_mask, num_pos=64, num_neg=64
    )
    assert float(pos) < 1e-6
    assert float(neg) >= 0


def test_triplet_loss_orders(rng, jax_key):
    f0, f1 = _paired_features(rng, noise=0.01)
    n = f0.shape[0]
    src = jnp.arange(n, dtype=jnp.int32)
    pos_mask = jnp.ones((n,), bool)
    l_soft = triplet_loss(jax_key, f0, f1, src, src, pos_mask,
                          num_pos=64, num_hn_samples=64, hardest=False)
    l_hard = triplet_loss(jax_key, f0, f1, src, src, pos_mask,
                          num_pos=64, num_hn_samples=64, hardest=True)
    # hardest negatives are closer -> larger loss
    assert float(l_hard) >= float(l_soft) - 1e-6


def test_offset_regularizers(rng):
    off = jnp.asarray(rng.normal(size=(32, 4, 3)).astype(np.float32))
    mask = jnp.ones((32,), bool)
    l2 = offset_regularization(off, mask, "L2")
    np.testing.assert_allclose(
        float(l2), float(jnp.mean(jnp.sum(off * off, -1))), rtol=1e-5
    )
    r2 = offset_regularization(off, mask, "RepelL2", alpha=1.0)
    assert float(r2) > float(l2)
    r1 = offset_regularization(off, mask, "RepelL1")
    assert np.isfinite(float(r1))
    # masked rows don't contribute
    off2 = off.at[16:].set(1e6)
    half = jnp.arange(32) < 16
    l2m = offset_regularization(off2, half, "L2")
    np.testing.assert_allclose(
        float(l2m), float(jnp.mean(jnp.sum(off[:16] ** 2, -1))), rtol=1e-5
    )


def test_npr_reconstruction_perfect_offsets(rng):
    """If anchors+offsets exactly tile the APC, chamfer term ~ 0."""
    n, ratio = 64, 4
    anchors = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
    offsets = rng.uniform(0, 0.3, size=(n, ratio, 3)).astype(np.float32)
    apc = (anchors[:, None, :] + offsets).reshape(-1, 3)
    mlp_out = offsets.reshape(n, ratio * 3)  # voxel_size=1
    total, cd, reg, _ = npr_reconstruction(
        jnp.asarray(mlp_out),
        jnp.asarray(anchors),
        jnp.asarray(apc),
        jnp.ones((n,), bool),
        voxel_size=1.0,
        reg_strength=0.0,
    )
    assert float(cd) < 1e-9
    assert float(total) < 1e-9


def test_npr_reconstruction_scales_with_voxel(rng):
    n, ratio = 32, 2
    anchors = (rng.integers(-10, 10, size=(n, 3))).astype(np.float32)
    mlp_out = jnp.asarray(rng.uniform(0, 1, size=(n, ratio * 3)).astype(np.float32))
    apc = jnp.asarray(rng.uniform(-3, 3, size=(128, 3)).astype(np.float32))
    t1, cd1, reg1, _ = npr_reconstruction(
        mlp_out, jnp.asarray(anchors * 0.3), apc, jnp.ones((n,), bool),
        voxel_size=0.3,
    )
    assert np.isfinite(float(t1)) and float(reg1) > 0


def test_hardest_negative_exclusion_large_indices(rng, jax_key):
    """Positive partners must be excluded from hardest negatives even when
    flattened row indices are large enough that the old src * span + tgt
    pair key overflowed int32 (regression)."""
    import jax.numpy as jnp
    from apr_tpu.losses.contrastive import hardest_contrastive_loss

    n = 70000  # span * n > 2^31 with the old encoding
    d = 4
    f = rng.normal(size=(n, d)).astype(np.float32) * 10.0
    feats0 = jnp.asarray(f)
    feats1 = jnp.asarray(f)  # partner is the ONLY zero-distance point
    idx = jnp.arange(n, dtype=jnp.int32)
    pos_mask = jnp.ones((n,), bool)

    _, neg_loss = hardest_contrastive_loss(
        jax_key, feats0, feats1, idx, idx, pos_mask,
        num_pos=128, num_hn_samples=256, pos_thresh=0.1, neg_thresh=1.4)
    # hardest negative of every sampled anchor is its own partner (d = 0);
    # with correct exclusion those anchors contribute nothing, and the
    # remaining random-feature negatives are far beyond neg_thresh
    assert float(neg_loss) < 0.5, float(neg_loss)
