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
           "enable_nan_debugging", "show_program"]

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


_SHOW_PROGRAM_CSS = """
<style>
.slt-prog { font-family: ui-monospace, Menlo, monospace; font-size: 12px; }
.slt-prog summary { cursor: pointer; font-weight: 600; padding: 2px 0; }
.slt-prog pre { background: #f6f8fa; border: 1px solid #d0d7de;
  border-radius: 6px; padding: 8px; overflow-x: auto; max-height: 480px; }
.slt-prog table { border-collapse: collapse; margin: 4px 0 10px; }
.slt-prog td, .slt-prog th { border: 1px solid #d0d7de; padding: 2px 8px;
  text-align: right; }
</style>
"""


def show_program(fn, *example_args, file=None, **example_kwargs):
    """Notebook-embeddable rendering of a function's COMPILED program.

    The TPU-idiomatic counterpart of the reference's ``show_graph``
    (TensorBoard graph iframes, reference
    ``examples/plotting.py:192-238``): instead of a TF1 graph, shows
    what the compiler actually made of the traced function —

    - the jaxpr (the traced program: what you wrote, after transforms),
    - the optimized HLO (what the backend runs, post-fusion),
    - XLA's cost analysis (flops, bytes accessed, per-op breakdown),

    each in a collapsible ``<details>`` section. In a notebook the
    returned object renders inline (``IPython.display.HTML``-compatible
    via ``_repr_html_``); outside notebooks pass ``file=`` to write a
    standalone ``.html``, or read ``.text`` for the plain dump.

    Example::

        sweep = jax.jit(lambda pts: lyap.update_values_program(pts))
        profiling.show_program(sweep, points)
    """
    import html as _html

    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    lowered = jitted.lower(*example_args, **example_kwargs)
    try:
        jaxpr_text = str(jax.make_jaxpr(jitted)(*example_args,
                                                **example_kwargs))
    except Exception:  # pragma: no cover - non-traceable callables
        jaxpr_text = "<jaxpr unavailable>"
    compiled = lowered.compile()
    try:
        hlo_text = compiled.as_text()
    except Exception:  # pragma: no cover - backend-dependent
        hlo_text = "<optimized HLO unavailable on this backend>"
    try:
        cost = compiled.cost_analysis() or {}
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else {}
    except Exception:  # pragma: no cover - backend-dependent
        cost = {}

    rows = "".join(
        "<tr><td style='text-align:left'>{}</td><td>{:,.0f}</td></tr>"
        .format(_html.escape(str(k)), float(v))
        for k, v in sorted(cost.items())
        if isinstance(v, (int, float)) and abs(float(v)) >= 1.0)

    def section(title, body, open_=False):
        return ("<details{}><summary>{}</summary><pre>{}</pre></details>"
                .format(" open" if open_ else "", _html.escape(title),
                        _html.escape(body)))

    html_doc = (
        _SHOW_PROGRAM_CSS + "<div class='slt-prog'>"
        + "<details open><summary>cost analysis</summary><table>"
        + "<tr><th style='text-align:left'>counter</th><th>value</th>"
        + "</tr>" + rows + "</table></details>"
        + section("jaxpr (traced program)", jaxpr_text)
        + section("optimized HLO (what the device runs)", hlo_text)
        + "</div>")
    text = ("=== cost analysis ===\n{}\n\n=== jaxpr ===\n{}\n\n"
            "=== optimized HLO ===\n{}\n".format(
                "\n".join("{}: {}".format(k, v)
                          for k, v in sorted(cost.items())),
                jaxpr_text, hlo_text))

    if file is not None:
        with open(file, "w") as f:
            f.write("<!doctype html><meta charset='utf-8'>" + html_doc)

    class _Program:
        def __init__(self, html_body, text_body):
            self.html = html_body
            self.text = text_body

        def _repr_html_(self):
            return self.html

        def __repr__(self):
            return self.text

    return _Program(html_doc, text)


def enable_nan_debugging():
    """Turn on JAX NaN checking.

    The functional-purity replacement for the reference's nonexistent
    race detection (SURVEY.md section 5)."""
    jax.config.update("jax_debug_nans", True)
