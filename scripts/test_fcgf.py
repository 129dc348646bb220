"""FCGF baseline tester (reference FCGF_APR/scripts/test_fcgf.py parity).

Differences from scripts.test_apr (:54-74, :146-154): loads the
best-validation checkpoint of a (non-generative) FCGF run and subsamples to
EXACTLY ``--num_points`` points per cloud (random_sample semantics) before
matching.

    python -m scripts.test_fcgf --save_dir ./outputs/fcgf_kitti_...
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.test_apr import str2bool  # noqa: E402


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser()
    ap.add_argument("--save_dir", required=True)
    ap.add_argument("--kitti_root", type=str, default=None)
    ap.add_argument("--dataset", type=str, default=None)
    ap.add_argument("--LoKITTI", type=str2bool, default=None)
    ap.add_argument("--pair_min_dist", type=float, default=None)
    ap.add_argument("--pair_max_dist", type=float, default=None)
    ap.add_argument("--num_points", type=int, default=5000)
    ap.add_argument("--num_pairs", type=int, default=None)
    ap.add_argument("--test_capacity_buckets", type=int, default=None,
                    help="occupancy-bucket tiers (0 disables; defaults 2)")
    ap.add_argument("--test_ransac_escalation_factor", type=int, default=None,
                    help="adaptive-RANSAC escalation factor "
                         "(0 disables; this entry defaults to 8)")
    args = ap.parse_args(argv)

    import jax

    from apr_tpu.config import APRConfig
    from apr_tpu.data.datasets import make_dataset
    from apr_tpu.eval import FeatureTester
    from apr_tpu.training import get_trainer
    from apr_tpu.training.checkpoints import CheckpointManager

    cfg = APRConfig.load_json(os.path.join(args.save_dir, "config.json"))
    overrides = {
        k: v for k, v in vars(args).items()
        if v is not None and k in APRConfig.__dataclass_fields__
    }
    # adaptive-RANSAC analog ON at this entry (reference Open3D adaptivity,
    # test_apr.py:150-155; docs/PERF.md hard-end sweep); pass
    # --test_ransac_escalation_factor 0 to disable (an explicit 0 pinned
    # in config.json is also respected — None means "unset")
    if (cfg.test_ransac_escalation_factor is None
            and "test_ransac_escalation_factor" not in overrides):
        overrides["test_ransac_escalation_factor"] = 8
        # two rungs + the Open3D confidence trigger (docs/PERF.md sweep)
        overrides["test_ransac_escalation_rungs"] = 2
        overrides["test_ransac_escalation_confidence"] = 0.999
    # occupancy bucketing ON at this entry (recall-neutral; docs/PERF.md)
    if (cfg.test_capacity_buckets is None
            and "test_capacity_buckets" not in overrides):
        overrides["test_capacity_buckets"] = 2
    cfg = cfg.replace(
        random_rotation=True, random_scale=False,
        test_subsample=args.num_points, **overrides,
    )

    trainer = get_trainer(cfg)
    ds = make_dataset(cfg, "test")
    n = len(ds) if args.num_pairs is None else min(len(ds), args.num_pairs)
    pairs = (ds.get_pair(i) for i in range(n))

    tester = FeatureTester(cfg, trainer, None)
    batch = tester._pair_to_batch(ds.get_pair(0))
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed), batch)
    mngr = CheckpointManager(args.save_dir)
    # best-val checkpoint (reference test_fcgf.py loads
    # best_val_checkpoint.pth); falls back to the latest rolling snapshot
    try:
        state, meta = mngr.restore_weights_only(state, tag="best")
    except FileNotFoundError:
        state, meta = mngr.restore_weights_only(state)
    logging.info("loaded checkpoint at epoch %s (best_val=%s)",
                 meta.get("epoch"), meta.get("best_val"))
    tester.state = state

    stats = tester.test(pairs)
    stats.save(args.save_dir)  # results.npz + success/fail distance arrays
    s = stats.summary()
    logging.info("registration recall %.4f over %d pairs (%.2f pairs/s)",
                 s["recall"], s["n_pairs"], s["pairs_per_sec"])
    return s


if __name__ == "__main__":
    main()
