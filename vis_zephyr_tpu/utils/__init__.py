"""Utilities: profiling/tracing hooks, structured metrics logging."""

from .profiling import StepTimer, trace_region, profile_to
from .metrics import MetricsLogger
