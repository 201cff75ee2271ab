"""Smoke tests for the plotting helpers (headless Agg backend)."""

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")

import safe_learning_tpu as sl  # noqa: E402
from safe_learning_tpu.plotting import (binary_cmap,  # noqa: E402
                                        plot_lyapunov_1d, plot_safe_set_2d,
                                        plot_triangulation_2d)


def test_binary_cmap():
    cmap = binary_cmap("green", alpha=0.5)
    assert cmap(1.0)[3] == 0.5  # top color has the requested alpha
    assert cmap(0.0)[3] == 0.0  # bottom is transparent


def test_plot_lyapunov_1d():
    grid = sl.GridWorld([[-1.0, 1.0]], 31)
    gp = sl.GaussianProcess(
        sl.RBF(0.2, [1.0, 1.0], input_dim=2),
        np.array([[0.1, 0.0], [-0.2, 0.0]]), np.array([[0.05], [-0.1]]),
        noise_variance=1e-4)
    v = sl.Triangulation(sl.GridWorld([[-1.0, 1.0]], 3), [1.0, 0.0, 1.0])
    lyap = sl.Lyapunov(grid, v, gp, 0.3, 1.0, 1e-2,
                       sl.LinearSystem([[0.0]]), initial_set=[15])
    lyap.update_safe_set()
    axes = plot_lyapunov_1d(lyap, true_dynamics=sl.LinearSystem([[0.5,
                                                                  1.0]]),
                            legend=True)
    assert axes is not None
    matplotlib.pyplot.close("all")


def test_plot_safe_set_and_triangulation_2d():
    grid = sl.GridWorld([[-1.0, 1.0]] * 2, 9)
    v = sl.Triangulation(grid, (grid.all_points ** 2).sum(1))
    lyap = sl.Lyapunov(grid, v, sl.LinearSystem(0.5 * np.eye(2)),
                       0.5, 1.0, 1e-2,
                       sl.LambdaFunction(lambda x: x[:, :0]),
                       initial_set=[40])
    lyap.update_safe_set()
    ax = plot_safe_set_2d(lyap)
    assert ax is not None
    ax, _img = plot_triangulation_2d(v)
    assert ax is not None
    matplotlib.pyplot.close("all")
