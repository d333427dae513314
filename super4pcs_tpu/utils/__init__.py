from .logger import Logger, LogLevel
from .timer import Timer

__all__ = ["Logger", "LogLevel", "Timer"]
