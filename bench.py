"""End-to-end benchmark: distant-pair feature extraction + registration.

Prints ONE JSON line:
    {"metric": "pairs_per_sec", "value": N, "unit": "pairs/s", "vs_baseline": R}

Protocol (mirrors the reference test pipeline, FCGF_APR/scripts/test_apr.py):
per pair — voxelize both clouds (0.3 m), build pyramids, ResUNetFatBN(128)
forward x2, 5000-point subsample, feature-NN correspondences, 32768-hypothesis
RANSAC, pose errors.  Synthetic KITTI-scale clouds (~30k pts, 80 m range,
15-25 m pair distance); weights are random (throughput is weight-independent).

Baseline: the reference pipeline on an A100 + CPU Open3D RANSAC (4M iters,
10k confidence) is estimated at ~0.5 pairs/sec (RANSAC-dominated; no absolute
number is published — BASELINE.md).  The north-star target is 2x A100, i.e.
1.0 pairs/sec, so vs_baseline = measured / 1.0.
"""

import json
import sys
import time

import numpy as np

TARGET_PAIRS_PER_SEC = 1.0  # 2x the estimated A100 reference pipeline


def main():
    import jax

    # persistent compilation cache: first run pays ~7 min of XLA compiles,
    # subsequent runs start in seconds
    jax.config.update("jax_compilation_cache_dir", "/tmp/apr_tpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from apr_tpu.config import APRConfig
    from apr_tpu.data.synthetic import synthetic_pair
    from apr_tpu.eval import FeatureTester
    from apr_tpu.training import get_trainer

    cfg = APRConfig(
        trainer="GenerativePairTrainer",
        model="ResUNetFatBN",
        model_n_out=128,
        conv1_kernel_size=5,
        voxel_size=0.3,
        point_capacity=32768,
        capacities=(16384, 8192, 4096, 2048),
        apc_capacity=8,  # unused at test time (decoder discarded)
        test_num_ransac_hypotheses=32768,
    )
    trainer = get_trainer(cfg)

    pairs = [
        synthetic_pair(seed=s, n_points=30000, apc_points=4, extent=60.0,
                       distance=float(np.random.default_rng(s).uniform(15, 25)))
        for s in range(33)
    ]

    tester_state = None
    # init from the first pair's batch
    t0 = time.time()
    from apr_tpu.training.batching import make_pair_batch  # noqa: F401

    tester = FeatureTester(cfg, trainer, None)
    batch0 = tester._pair_to_batch(pairs[0])
    state = trainer.init_state(jax.random.PRNGKey(0), batch0)
    tester.state = state

    stats = tester.test(pairs, seed=0, log_freq=1000)
    init_s = time.time() - t0

    value = stats.summary()["pairs_per_sec"]
    print(
        json.dumps(
            {
                "metric": "pairs_per_sec",
                "value": round(value, 4),
                "unit": "pairs/s",
                "vs_baseline": round(value / TARGET_PAIRS_PER_SEC, 4),
            }
        )
    )
    print(
        f"# detail: {len(pairs)} pairs, init+compile {init_s:.1f}s, "
        f"recall(untrained)={stats.summary()['recall']:.2f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
