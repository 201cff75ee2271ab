"""Tracing, profiling, and lightweight metrics.

The reference's observability is TensorBoard graph iframes + manual
``time.time()`` prints (SURVEY.md section 5). TPU-native equivalents:
``jax.profiler`` traces viewable in TensorBoard/Perfetto, ``named_scope``
annotations on the hot kernels, and a tiny metrics recorder for the
learning loops.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax
import numpy as np

__all__ = ["trace", "named_scope", "Timer", "MetricsRecorder",
           "enable_nan_debugging"]

named_scope = jax.named_scope


@contextlib.contextmanager
def trace(log_dir):
    """Capture a device profile: ``with trace('/tmp/profile'): step()``.

    View with TensorBoard's profile plugin or Perfetto.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer context manager.

    The reference's per-iteration ``time.time()`` prints, structured."""

    def __init__(self, name="timer", metrics=None):
        self.name = name
        self.metrics = metrics
        self.elapsed = None

    def __enter__(self):
        """Start the timer."""
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        """Stop the timer and store the elapsed seconds."""
        self.elapsed = time.perf_counter() - self._start
        if self.metrics is not None:
            self.metrics.record(self.name, self.elapsed)
        return False


class MetricsRecorder:
    """Append-only scalar metrics recorder.

    Mirrors the reference notebooks' ``safe_level`` /
    ``safe_set_fraction`` / ``test_loss`` lists
    (``examples/utilities.py:570-599`` usage)."""

    def __init__(self):
        self._data = defaultdict(list)

    def record(self, name, value):
        """Append one scalar value under ``name``."""
        self._data[name].append(float(value))

    def record_many(self, **kwargs):
        """Append several named scalar values at once."""
        for name, value in kwargs.items():
            self.record(name, value)

    def __getitem__(self, name):
        # .get: probing an unrecorded name must not insert a phantom
        # empty series into the defaultdict (summary() would crash).
        """Return the recorded series for ``name``."""
        return np.asarray(self._data.get(name, []))

    def names(self):
        """Recorded metric names."""
        return sorted(self._data)

    def summary(self):
        """Dict of the latest value per metric."""
        return {name: {"last": values[-1], "count": len(values)}
                for name, values in self._data.items()}


def enable_nan_debugging():
    """Turn on JAX NaN checking.

    The functional-purity replacement for the reference's nonexistent
    race detection (SURVEY.md section 5)."""
    jax.config.update("jax_debug_nans", True)
