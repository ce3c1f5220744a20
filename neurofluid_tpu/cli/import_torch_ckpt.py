"""CLI: convert a reference PyTorch `.pt` checkpoint to an orbax checkpoint
this framework's trainers can warm-start from.

    python -m neurofluid_tpu.cli.import_torch_ckpt \
        --ckpt path/to/100000.pt --out exps/watercube/imported/models

The output directory then works as `TRAIN.pretrained_renderer` /
`TRAIN.pretrained_transition_model` / `TRAIN.pretrained` (reference staged
hand-off, reference trainer/trainer_e2e.py:57-68).
"""

from __future__ import annotations

import argparse

from neurofluid_tpu.train import checkpoint as ckpt
from neurofluid_tpu.utils import torch_import


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True, help="reference .pt checkpoint")
    ap.add_argument("--out", required=True, help="output orbax models dir")
    ap.add_argument("--step", type=int, default=None,
                    help="override the step number (default: from the .pt)")
    args = ap.parse_args(argv)

    state = torch_import.import_checkpoint_file(args.ckpt)
    step = args.step if args.step is not None else state["step"]
    state["step"] = step
    path = ckpt.save_checkpoint(args.out, step, state)
    kinds = [k for k in ("renderer", "transition") if k in state]
    print(f"imported {args.ckpt} ({' + '.join(kinds)}) -> {path}")


if __name__ == "__main__":
    main()
