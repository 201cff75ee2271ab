"""Shared scaffolding for the example scripts.

The reference ships its examples as notebooks (``/root/reference/examples/
*.ipynb``); here they are runnable scripts. Every script supports:

``--full``     notebook-scale problem sizes (defaults are CPU-quick),
``--plot``     save figures as PNG next to the script,
``--seed N``   RNG seed.
"""

from __future__ import annotations

import argparse
import os
import time


def example_args(description, extra=None):
    """Parse the standard example CLI and enable the compilation cache."""
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--full", action="store_true",
                        help="notebook-scale sizes (slow on CPU)")
    parser.add_argument("--plot", action="store_true",
                        help="save figures as PNG")
    parser.add_argument("--seed", type=int, default=0)
    if extra is not None:
        extra(parser)
    args = parser.parse_args()

    # Persistent XLA compilation cache (shared with the test suites):
    # example reruns skip recompiles, which dominate quick-scale runtime.
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    return args


def maybe_save_plot(args, name):
    """Save the current matplotlib figure if ``--plot`` was given."""
    if not args.plot:
        return
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       name + ".png")
    plt.gcf().savefig(out, dpi=120, bbox_inches="tight")
    plt.close("all")
    print("saved", out)


class Timer:
    """Context manager printing a labelled wall-clock duration."""

    def __init__(self, label):
        self.label = label

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        print("{}: {:.2f}s".format(self.label,
                                   time.perf_counter() - self.start))
