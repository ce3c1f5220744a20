"""Renderer evaluation entry point (counterpart of reference eval_renderer.py):
renders the GT-particle sequence from a fixed camera with a warmup checkpoint.

Usage:
    python eval_renderer.py --expdir exps --expname render_eval \
        --dataset watercube --resume_from exps/warmup/models
"""

import sys

from neurofluid_tpu.utils.config import stage_config
from neurofluid_tpu.train.evaluation import RendererEvaluator


def main(argv=None):
    cfg = stage_config("warmup", argv)
    RendererEvaluator(cfg).eval()


if __name__ == "__main__":
    main(sys.argv[1:])
