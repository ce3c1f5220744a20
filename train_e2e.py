"""End-to-end stage entry point (counterpart of reference train_e2e.py).

Usage:
    python train_e2e.py --expdir exps --expname e2e --dataset watercube
"""

import sys

from neurofluid_tpu.utils.config import stage_config
from neurofluid_tpu.train.e2e import E2ETrainer


def main(argv=None):
    cfg = stage_config("end2end", argv)
    trainer = E2ETrainer(cfg)
    trainer.train()


if __name__ == "__main__":
    main(sys.argv[1:])
