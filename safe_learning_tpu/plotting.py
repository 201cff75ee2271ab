"""Plotting helpers for safe sets, Lyapunov functions, and GP models.

TPU-native equivalents of ``/root/reference/examples/plotting.py``:
1-D Lyapunov/GP diagnostics with confidence bands, 2-D safe-set /
triangulation images, plus the example layer's ``binary_cmap``. The
reference's TensorBoard graph iframe (``plotting.py:192-238``) has no JAX
equivalent; use ``jax.profiler`` traces instead (see ``profiling.py``).

Matplotlib is imported lazily so headless library use never pays for it.
"""

from __future__ import annotations

import numpy as np

__all__ = ["binary_cmap", "plot_lyapunov_1d", "plot_safe_set_2d",
           "plot_triangulation_2d"]


def binary_cmap(color="red", alpha=1.0):
    """Transparent-to-color binary colormap.

    (reference ``examples/utilities.py:689-700``)."""
    from matplotlib.colors import ListedColormap

    codes = {"red": (1.0, 0.0, 0.0, alpha),
             "green": (0.0, 1.0, 0.0, alpha),
             "blue": (0.0, 0.0, 1.0, alpha)}
    color_code = codes.get(color, color)
    transparent = (1.0, 1.0, 1.0, 0.0)
    return ListedColormap([transparent, color_code])


def plot_lyapunov_1d(lyapunov, true_dynamics=None, legend=False, axes=None):
    """1-D diagnostic plot (reference ``examples/plotting.py:18-133``).

    Safe/unsafe Lyapunov values, GP dynamics with confidence bands, and
    the decrease bound.
    """
    import jax.numpy as jnp
    import matplotlib.pyplot as plt

    grid = lyapunov.discretization
    states = grid.all_points
    states_dev = jnp.asarray(states)
    safe = lyapunov.safe_set
    values = np.asarray(lyapunov.values)

    if axes is None:
        _, axes = plt.subplots(2, 1, figsize=(8, 8), sharex=True)
    ax_v, ax_f = axes

    ax_v.plot(states[safe, 0], values[safe], "g.", label="safe $v(x)$")
    ax_v.plot(states[~safe, 0], values[~safe], "r.", label="unsafe $v(x)$")
    if np.isfinite(lyapunov.c_max):
        ax_v.axhline(lyapunov.c_max, color="k", linestyle="--",
                     label="$c_{max}$")
    ax_v.set_ylabel("$v(x)$")

    actions = lyapunov.policy(states_dev)
    prediction = lyapunov.dynamics(states_dev, actions)
    if isinstance(prediction, (tuple, list)):
        mean, err = map(np.asarray, prediction)
        ax_f.plot(states[:, 0], mean[:, 0], "b-", label="GP mean")
        ax_f.fill_between(states[:, 0], mean[:, 0] - err[:, 0],
                          mean[:, 0] + err[:, 0], alpha=0.3,
                          label="confidence")
        if hasattr(lyapunov.dynamics, "X"):
            ax_f.plot(lyapunov.dynamics.X[:, 0], lyapunov.dynamics.Y[:, 0],
                      "kx", label="data")
    else:
        ax_f.plot(states[:, 0], np.asarray(prediction)[:, 0], "b-",
                  label="$f(x, \\pi(x))$")
    if true_dynamics is not None:
        truth = np.asarray(true_dynamics(states_dev, actions))
        ax_f.plot(states[:, 0], truth[:, 0], "k--", label="true dynamics")
    ax_f.set_xlabel("$x$")
    ax_f.set_ylabel("$f(x, \\pi(x))$")
    if legend:
        ax_v.legend()
        ax_f.legend()
    return axes


def plot_safe_set_2d(lyapunov, ax=None, color="green", alpha=0.6):
    """Image of the certified safe set on a 2-D grid."""
    import matplotlib.pyplot as plt

    grid = lyapunov.discretization
    if grid.ndim != 2:
        raise ValueError("plot_safe_set_2d needs a 2-D discretization")
    if ax is None:
        _, ax = plt.subplots()
    safe = lyapunov.safe_set.reshape(grid.shape)
    lim = grid.limits
    extent = [lim[0, 0], lim[0, 1], lim[1, 0], lim[1, 1]]
    ax.imshow(safe.T, origin="lower", extent=extent,
              cmap=binary_cmap(color, alpha), aspect="auto",
              interpolation="nearest")
    return ax


def plot_triangulation_2d(fun, ax=None, **imshow_kwargs):
    """Image of a piecewise-linear function's vertex values on its grid.

    (reference ``examples/plotting.py:136-189``)."""
    import matplotlib.pyplot as plt

    grid = fun.discretization
    if grid.ndim != 2:
        raise ValueError("plot_triangulation_2d needs a 2-D grid")
    if ax is None:
        _, ax = plt.subplots()
    values = np.asarray(fun.parameters)[:, 0].reshape(grid.shape)
    lim = grid.limits
    extent = [lim[0, 0], lim[0, 1], lim[1, 0], lim[1, 1]]
    img = ax.imshow(values.T, origin="lower", extent=extent, aspect="auto",
                    **imshow_kwargs)
    return ax, img
