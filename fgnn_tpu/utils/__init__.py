from .logging import init_logger, MetricsWriter
from .types import str2bool
from .profiling import (StepTimer, annotate, device_memory_stats, trace,
                        enable_compilation_cache)
from .debug import nan_debug, check_finite, deterministic

__all__ = ["init_logger", "MetricsWriter", "str2bool", "StepTimer",
           "annotate", "device_memory_stats", "trace", "enable_compilation_cache", "nan_debug",
           "check_finite", "deterministic"]
