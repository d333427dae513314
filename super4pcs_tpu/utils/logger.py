"""Three-level logger mirroring the reference ``Utils::Logger``
(ref:src/super4pcs/utils/logger.h:55-119): NoLog / ErrorReport / Verbose.

The reference selects the level at compile time via templates; here it is
a runtime field, but the message surface is kept (e.g. ``Initial LCP:``,
``Score:``) so CLI output stays comparable.
"""

from __future__ import annotations

import enum
import sys


class LogLevel(enum.IntEnum):
    NoLog = 0
    ErrorReport = 1
    Verbose = 2


class Logger:
    def __init__(self, level: LogLevel = LogLevel.NoLog):
        self.level = LogLevel(level)

    def log(self, level: LogLevel, *parts):
        if level > self.level or level == LogLevel.NoLog:
            return
        stream = sys.stderr if level == LogLevel.ErrorReport else sys.stdout
        print("".join(str(p) for p in parts), file=stream)
        stream.flush()

    def error(self, *parts):
        self.log(LogLevel.ErrorReport, *parts)

    def verbose(self, *parts):
        self.log(LogLevel.Verbose, *parts)
