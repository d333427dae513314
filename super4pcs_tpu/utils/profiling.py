"""Tracing/profiling helpers (SURVEY.md §5 tracing subsystem).

The reference's opt-in ``ENABLE_TIMING`` accumulates three phase timers
and dumps a table (ref:src/super4pcs/algorithms/match4pcsBase.hpp:77-83,
utils/timer.h). In the TPU design the phases fuse into one XLA program,
so the equivalents are:

- coarse wall-clock phases in ``RegistrationResult.stats``
  (``compile_seconds`` / ``search_seconds``), and
- op-level device timelines via ``jax.profiler`` traces, captured with
  :func:`trace` and viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time

import jax

from .timer import PhaseTimers


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace around a code block.

    Example::

        with profiling.trace("/tmp/s4p-trace"):
            matcher.compute_transformation(P, Q)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed_phase(timers: PhaseTimers, name: str, sync=None):
    """Accumulate a wall-clock phase; ``sync`` (e.g. an array to
    block_until_ready) makes async device work attributable."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            jax.block_until_ready(sync)
        timers.add(name, time.perf_counter() - t0)
