"""Wall-clock stopwatch (ref:src/super4pcs/utils/timer.h:56-80).

On TPU the analog of the reference's TEST_GLOBAL_TIMINGS phase breakdown
(totalTime / verifyTime / kdTreeTime, ref:match4pcsBase.h:176-184) is
accumulating perf_counter spans around jitted calls with
``block_until_ready`` at the boundary.
"""

from __future__ import annotations

import time


class Timer:
    def __init__(self, run: bool = True):
        self._start = time.perf_counter() if run else None
        self._acc = 0.0

    def start(self):
        if self._start is None:
            self._start = time.perf_counter()

    def stop(self):
        if self._start is not None:
            self._acc += time.perf_counter() - self._start
            self._start = None

    def elapsed(self) -> float:
        """Elapsed seconds (accumulated + running span)."""
        acc = self._acc
        if self._start is not None:
            acc += time.perf_counter() - self._start
        return acc

    def reset(self, run: bool = True):
        self._acc = 0.0
        self._start = time.perf_counter() if run else None


class PhaseTimers:
    """Named phase accumulator, mirroring the reference timing table
    (ref:match4pcsBase.hpp:77-83)."""

    def __init__(self):
        self.phases: dict[str, float] = {}

    def add(self, name: str, seconds: float):
        self.phases[name] = self.phases.get(name, 0.0) + seconds

    def table(self) -> str:
        lines = ["----------- Timings (msec) -------------"]
        for name, sec in self.phases.items():
            lines.append(f" {name:<24}: {sec * 1e3:.3f}")
        lines.append("----------------------------------------")
        return "\n".join(lines)
