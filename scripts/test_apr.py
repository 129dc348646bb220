"""APR tester entry (reference FCGF_APR/scripts/test_apr.py).

Re-hydrates the training run's config.json, applies CLI overrides
(LoKITTI / pair dists / downsample_single / dataset — reference :239-260),
loads the checkpoint, and runs the registration benchmark.

    python -m scripts.test_apr --save_dir ./outputs/apr_kitti_...
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def str2bool(v):
    return str(v).lower() in ("true", "1", "yes", "y")


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser()
    ap.add_argument("--save_dir", required=True)
    ap.add_argument("--kitti_root", type=str, default=None)
    ap.add_argument("--dataset", type=str, default=None)
    ap.add_argument("--LoKITTI", type=str2bool, default=None)
    ap.add_argument("--LoNUSCENES", type=str2bool, default=None)
    ap.add_argument("--pair_min_dist", type=float, default=None)
    ap.add_argument("--pair_max_dist", type=float, default=None)
    ap.add_argument("--downsample_single", type=float, default=None)
    ap.add_argument("--num_pairs", type=int, default=None,
                    help="cap the number of test pairs")
    ap.add_argument("--test_ransac_escalation_factor", type=int,
                    default=None,
                    help="adaptive-RANSAC escalation factor "
                         "(0 disables; this entry defaults to 8)")
    ap.add_argument("--test_capacity_buckets", type=int, default=None,
                    help="occupancy-bucket tiers (0 disables; this entry "
                         "defaults to 2)")
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
        if v is not None and k not in ("save_dir", "num_pairs")
    }
    # adaptive-RANSAC analog ON at this entry (reference Open3D
    # RANSACConvergenceCriteria adaptivity, test_apr.py:150-155; see
    # docs/PERF.md hard-end sweep) unless the saved config pinned it —
    # a config.json with an explicit 0 stays off (None means "unset")
    if (cfg.test_ransac_escalation_factor is None
            and "test_ransac_escalation_factor" not in overrides):
        overrides["test_ransac_escalation_factor"] = 8
        # two rungs + the Open3D confidence trigger close the measured
        # p=0.05-0.08 gap vs fixed-256k (docs/PERF.md hard-end sweep)
        overrides["test_ransac_escalation_rungs"] = 2
        overrides["test_ransac_escalation_confidence"] = 0.999
    # occupancy bucketing ON at this entry (recall-neutral, 1.7x on
    # under-full clouds — docs/PERF.md); a pinned 0 stays off
    if (cfg.test_capacity_buckets is None
            and "test_capacity_buckets" not in overrides):
        overrides["test_capacity_buckets"] = 2
    cfg = cfg.replace(random_rotation=True, random_scale=False, **overrides)

    trainer = get_trainer(cfg)
    ds = make_dataset(cfg, "test")
    n = len(ds) if args.num_pairs is None else min(len(ds), args.num_pairs)
    pairs = (ds.get_pair(i) for i in range(n))

    tester = FeatureTester(cfg, trainer, None)
    batch = tester._pair_to_batch(ds.get_pair(0))
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed), batch)
    mngr = CheckpointManager(args.save_dir)
    state, meta = mngr.restore_weights_only(state)
    logging.info("loaded checkpoint at epoch %s", meta.get("epoch"))
    tester.state = state

    stats = tester.test(pairs)
    stats.save(args.save_dir)  # results.npz + success/fail distance arrays
    s = stats.summary()
    logging.info("==== %d pairs ====", s["n_pairs"])
    logging.info("registration recall: %.4f", s["recall"])
    if "rte_mean" in s:
        logging.info("RTE %.4f +- %.4f m | RRE %.4f +- %.4f deg",
                     s["rte_mean"], s["rte_std"], s["rre_mean"], s["rre_std"])
    logging.info("throughput: %.3f pairs/sec", s["pairs_per_sec"])
    return s


if __name__ == "__main__":
    main()
