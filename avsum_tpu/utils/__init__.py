"""Logging, profiling, and debug helpers."""

from avsum_tpu.utils.logging import JsonlLogger, get_logger
from avsum_tpu.utils.profiling import Timer, annotate, timed

__all__ = ["get_logger", "JsonlLogger", "Timer", "annotate", "timed"]
