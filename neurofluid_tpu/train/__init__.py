"""Training stages: warm-up renderer, transition model, end-to-end; plus
losses, LR schedules, and checkpointing."""

from neurofluid_tpu.train import checkpoint, losses, schedules  # noqa: F401
from neurofluid_tpu.train.e2e import E2ETrainer  # noqa: F401
from neurofluid_tpu.train.transition import TransitionTrainer  # noqa: F401
from neurofluid_tpu.train.warmup import WarmupTrainer  # noqa: F401
