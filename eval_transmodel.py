"""Transition-model evaluation entry point (counterpart of reference
eval_transmodel.py).

Usage:
    python eval_transmodel.py --expdir exps --expname trans_eval \
        --resume_from exps/trans/models
"""

import sys

from neurofluid_tpu.utils.config import stage_config
from neurofluid_tpu.train.evaluation import TransitionEvaluator


def main(argv=None):
    cfg = stage_config("transmodel", argv)
    TransitionEvaluator(cfg).eval()


if __name__ == "__main__":
    main(sys.argv[1:])
