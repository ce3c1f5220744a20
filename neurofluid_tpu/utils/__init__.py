"""Utilities: metrics, config, logging, profiling, checkpointing helpers."""

from neurofluid_tpu.utils import config, logging, metrics, profiling  # noqa: F401
from neurofluid_tpu.utils.metrics import FluidErrors, psnr, ssim  # noqa: F401
