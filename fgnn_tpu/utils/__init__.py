from .logging import init_logger, MetricsWriter
from .types import str2bool

__all__ = ["init_logger", "MetricsWriter", "str2bool"]
