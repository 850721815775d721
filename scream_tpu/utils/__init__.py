"""Utilities: checkpointing, logging, timers, visualization."""

from scream_tpu.utils import profiling, viz
from scream_tpu.utils.checkpoint import BestCheckpointer, load_params, save_params
from scream_tpu.utils.logging import MetricsLogger, StepTimer, progressbar

__all__ = [
    "profiling",
    "viz",
    "BestCheckpointer",
    "load_params",
    "save_params",
    "MetricsLogger",
    "StepTimer",
    "progressbar",
]
