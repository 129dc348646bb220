"""FCGF-style CLI entry point (reference FCGF_APR/train.py + config.py parity).

Every APRConfig field is a ``--flag``; ``--resume_dir`` re-applies the saved
config.json over the CLI exactly like the reference (train.py:75-80).

    python train.py --trainer GenerativePairTrainer --model ResUNetFatBN \
        --model_n_out 128 --dataset synthetic --max_epoch 2
"""

import argparse
import dataclasses
import logging
import sys


def str2bool(v):
    return str(v).lower() in ("true", "1", "yes", "y")


def build_parser():
    from apr_tpu.config import APRConfig

    parser = argparse.ArgumentParser(description="apr_tpu trainer")
    parser.add_argument("--resume_dir", type=str, default=None,
                        help="output dir of a previous run; restores its "
                             "config.json + latest checkpoint")
    for f in dataclasses.fields(APRConfig):
        name = f"--{f.name}"
        if f.type == "bool" or isinstance(f.default, bool):
            parser.add_argument(name, type=str2bool, default=None)
        elif isinstance(f.default, tuple):
            parser.add_argument(name, type=int, nargs="+", default=None)
        elif isinstance(f.default, int) or "int" in str(f.type):
            parser.add_argument(name, type=int, default=None)
        elif isinstance(f.default, float) or "float" in str(f.type):
            parser.add_argument(name, type=float, default=None)
        else:
            parser.add_argument(name, type=str, default=None)
    return parser


def config_from_args(argv=None):
    import os

    from apr_tpu.config import APRConfig

    args = build_parser().parse_args(argv)
    overrides = {
        k: v for k, v in vars(args).items()
        if v is not None and k != "resume_dir"
    }
    if args.resume_dir:
        cfg = APRConfig.load_json(os.path.join(args.resume_dir, "config.json"))
        cfg = cfg.replace(resume=args.resume_dir, **overrides)
    else:
        cfg = APRConfig().replace(**overrides)
    return cfg


def main(argv=None):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    cfg = config_from_args(argv)
    from apr_tpu.training.loop import run_training

    summary = run_training(cfg)
    logging.info("training done: %s", summary)
    return summary


if __name__ == "__main__":
    main(sys.argv[1:])
