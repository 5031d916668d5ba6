"""Logging, progress, and timing utilities (reference C22 equivalents)."""

from hypergen_tpu.utils.logging import setup_logging  # noqa: F401
from hypergen_tpu.utils.progress import ProgressBar  # noqa: F401
from hypergen_tpu.utils.timing import StageTimer  # noqa: F401
