"""End-to-end evaluation entry point (counterpart of reference eval_e2e.py).

Usage:
    python eval_e2e.py --expdir exps --expname e2e_eval --dataset watercube \
        --resume_from exps/e2e/models
"""

import sys

from neurofluid_tpu.utils.config import stage_config
from neurofluid_tpu.train.evaluation import E2EEvaluator


def main(argv=None):
    cfg = stage_config("end2end", argv)
    E2EEvaluator(cfg).eval()


if __name__ == "__main__":
    main(sys.argv[1:])
