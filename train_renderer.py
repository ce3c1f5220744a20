"""Warm-up stage entry point (counterpart of reference train_renderer.py).

Usage:
    python train_renderer.py --expdir exps --expname warmup --dataset watercube
"""

import sys

from neurofluid_tpu.utils.config import stage_config
from neurofluid_tpu.train.warmup import WarmupTrainer


def main(argv=None):
    cfg = stage_config("warmup", argv)
    trainer = WarmupTrainer(cfg)
    trainer.train()


if __name__ == "__main__":
    main(sys.argv[1:])
