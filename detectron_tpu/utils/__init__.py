"""Utilities: timing, logging, visualization, weight conversion."""

from detectron_tpu.utils.timer import Timer  # noqa: F401
