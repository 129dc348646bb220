"""YAML entry point (reference Predator_APR/main.py parity).

    python main.py configs/train/kitti.yaml
    python main.py configs/test/kitti.yaml

The YAML's two-level structure flattens onto APRConfig; a ``mode`` key of
train/val/test dispatches like the reference (main.py:113-121).
"""

import logging
import sys


def main(path: str):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    import yaml

    from apr_tpu.config import APRConfig

    with open(path) as f:
        raw = yaml.safe_load(f)
    mode = "train"
    flat = {}
    for k, v in raw.items():
        if isinstance(v, dict):
            flat.update(v)
        else:
            flat[k] = v
    mode = flat.pop("mode", mode)
    cfg = APRConfig.from_dict(flat)

    predator = cfg.trainer == "PredatorTrainer"
    # reference parity (Predator_APR/main.py:94-111): the YAML path always
    # calibrates neighborhood caps on the train set unless the YAML pins
    # them explicitly
    if predator and mode == "train" and "neighborhood_limits" not in flat:
        cfg.neighborhood_limits_pinned = False

    if mode in ("train", "val"):
        if predator:
            from apr_tpu.training.predator_loop import run_predator_training

            summary = run_predator_training(cfg)
        else:
            from apr_tpu.training.loop import run_training

            summary = run_training(cfg)
        logging.info("done: %s", summary)
        return summary

    if mode == "test":
        import jax

        from apr_tpu.data.datasets import make_dataset
        from apr_tpu.training.checkpoints import CheckpointManager

        ds = make_dataset(cfg, "test")
        pairs = (ds.get_pair(i) for i in range(len(ds)))
        first = ds.get_pair(0)
        if predator:
            from apr_tpu.eval.predator_tester import PredatorTester
            from apr_tpu.training.predator import PredatorTrainer
            from apr_tpu.training.predator_loop import pair_to_kp_batch

            trainer = PredatorTrainer(cfg)
            batch = pair_to_kp_batch(first, cfg)
            state = trainer.init_state(jax.random.PRNGKey(cfg.seed), batch)
            if cfg.weights:
                mngr = CheckpointManager(cfg.weights)
                state, _ = mngr.restore_weights_only(state)
            tester = PredatorTester(cfg, trainer, state)
        else:
            from apr_tpu.eval import FeatureTester
            from apr_tpu.training import get_trainer

            trainer = get_trainer(cfg)
            tester = FeatureTester(cfg, trainer, None)
            batch = tester._pair_to_batch(first)
            state = trainer.init_state(jax.random.PRNGKey(cfg.seed), batch)
            if cfg.weights:
                mngr = CheckpointManager(cfg.weights)
                state, _ = mngr.restore_weights_only(state)
            tester.state = state
        stats = tester.test(pairs)
        stats.save(cfg.out_dir)  # results.npz (tester.py:110-126 parity)
        logging.info("test summary: %s", stats.summary())
        return stats.summary()

    raise ValueError(f"unknown mode: {mode}")


if __name__ == "__main__":
    if len(sys.argv) != 2:
        print(__doc__)
        sys.exit(1)
    main(sys.argv[1])
