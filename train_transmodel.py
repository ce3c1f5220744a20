"""Transition-model stage entry point (counterpart of reference train_transmodel.py).

Usage:
    python train_transmodel.py --expdir exps --expname trans
"""

import sys

from neurofluid_tpu.utils.config import stage_config
from neurofluid_tpu.train.transition import TransitionTrainer


def main(argv=None):
    cfg = stage_config("transmodel", argv)
    trainer = TransitionTrainer(cfg)
    trainer.train()


if __name__ == "__main__":
    main(sys.argv[1:])
