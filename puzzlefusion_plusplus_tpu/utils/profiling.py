"""Tracing / profiling utilities (SURVEY.md §5.1).

The reference relies on Lightning's ``profiler: simple`` plus ad-hoc cuda-synchronized timers
(Jigsaw_matching/utils/timer.py, matching_base_model.py:83-91). TPU-native equivalents:

  * ``Timer`` / ``AverageMeter`` — wall-clock helpers with ``block_until_ready`` semantics.
  * ``phase_timer``             — context manager timing a named phase (device-synchronized).
  * ``trace``                   — context manager around ``jax.profiler`` emitting a Perfetto
    trace directory (view with ui.perfetto.dev or TensorBoard).
  * ``log_compile_time``        — decorator reporting first-call (compile) vs steady latency.
"""

from __future__ import annotations

import contextlib
import functools
import time

import jax


class AverageMeter:
    def __init__(self):
        self.sum = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1):
        self.sum += value * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class Timer:
    """Device-synchronized stopwatch."""

    def __init__(self):
        self._t0 = None
        self.meter = AverageMeter()

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, *arrays) -> float:
        for a in arrays:
            jax.block_until_ready(a)
        dt = time.perf_counter() - self._t0
        self.meter.update(dt)
        return dt


@contextlib.contextmanager
def phase_timer(name: str, results: dict | None = None):
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if results is not None:
        results.setdefault(name, AverageMeter()).update(dt)
    else:
        print(f"[phase] {name}: {dt:.4f}s", flush=True)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace around a block; produces a Perfetto/TensorBoard trace."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def log_compile_time(fn):
    """Wrap a jitted callable; print compile (first-call) and steady-state latency."""
    state = {"calls": 0}

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        tag = "compile+run" if state["calls"] == 0 else "steady"
        print(f"[{fn.__name__}] {tag}: {dt:.4f}s", flush=True)
        state["calls"] += 1
        return out

    return wrapped
