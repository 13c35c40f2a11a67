"""Shared utilities: the [DATA] metric protocol, phase timers, logging."""

from pygim_tpu.utils.metrics import DataReporter, data_print, parse_data_lines  # noqa: F401
from pygim_tpu.utils.timers import PhaseTimer, device_time  # noqa: F401
