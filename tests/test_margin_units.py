"""Margin-unit guard semantics in the float64 lane.

The unit guard (``Lyapunov._require_f32_margin`` /
``explore._margin_of``) must compare a margin's recorded derivation
unit against the CONSUMER pipeline's unit at check time — under
``jax_enable_x64`` (this lane) the plain sweep runs at ``eps64/2``, so
an analytic margin derived there (unit ``eps64/2 * fp_error_factor``)
validly covers it. Round-3 advisor finding #1: the guard hard-coded
``eps32/2`` and raised a false positive here.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402

import safe_learning_tpu as sl  # noqa: E402
from safe_learning_tpu import config  # noqa: E402
from safe_learning_tpu.errorbounds import (  # noqa: E402
    ErrorModel, analytic_certificate_margin, analytic_exploration_margin)


def _gp_instance():
    """Small well-conditioned GP instance (f64 in this lane)."""
    rng = np.random.default_rng(11)
    grid = sl.GridWorld([[-1.0, 1.0], [-1.0, 1.0]], 21)
    a = np.array([[0.22, 0.03], [-0.02, 0.18]])
    policy = sl.LinearSystem(np.zeros((1, 2)))
    v = sl.QuadraticFunction(np.eye(2))
    n = 30
    x_train = np.column_stack([rng.uniform(-0.9, 0.9, n),
                               rng.uniform(-0.9, 0.9, n), np.zeros(n)])
    y_train = x_train[:, :2] @ a.T + 0.01 * np.sin(2 * x_train[:, :2])
    gp = sl.GaussianProcess(
        sl.RBF(0.5, [0.8, 0.8, 1.0], input_dim=3), x_train, y_train,
        noise_variance=1e-2, beta=2.0,
        mean_function=sl.LinearSystem([a, np.zeros((2, 1))]))
    lv = sl.LambdaFunction(lambda x: 2.0 * jnp.abs(x))
    lf = float(np.linalg.norm(a, 2))
    tau = float(np.min(grid.unit_maxes))
    vals = np.sum(grid.all_points ** 2, axis=1)
    initial = np.where(vals <= np.quantile(vals, 0.06))[0]
    return sl.Lyapunov(grid, v, gp, lf, lv, tau, policy,
                       initial_set=initial)


_LV_MODEL = ErrorModel(
    lambda x: 2.0 * float(np.finfo(np.float64).eps) / 2 * 4.0
    * jnp.abs(x), 2.0)


def test_analytic_certificate_margin_passes_f64_guard():
    """An f64-derived analytic margin is consumable by the f64 sweep."""
    lyap = _gp_instance()
    margin = analytic_certificate_margin(lyap, lipschitz_model=_LV_MODEL)
    assert margin == lyap.certificate_margin
    unit = lyap._certificate_margin_unit
    # The recorded unit is finer than eps32/2 (the old hard-coded
    # threshold would have raised) but covers this lane's pipeline.
    assert unit < float(np.finfo(np.float32).eps) / 2
    assert unit >= float(np.finfo(config.np_dtype).eps) / 2
    lyap._require_f32_margin()  # must not raise
    lyap.update_safe_set()      # must not raise
    assert lyap.safe_set.any()


def test_analytic_exploration_margin_passes_f64_scorer():
    """The f64 exploration scorer accepts an f64-derived margin."""
    from safe_learning_tpu.explore import _margin_of

    lyap = _gp_instance()
    lyap.update_safe_set()
    perturb = np.linspace(-0.2, 0.2, 3)[:, None]
    margin = analytic_exploration_margin(
        lyap, perturbations=perturb, limits=np.array([[-0.5, 0.5]]),
        lipschitz_model=_LV_MODEL)
    assert _margin_of(lyap) == margin  # must not raise
    sa, var = sl.get_safe_sample(lyap, perturbations=perturb,
                                 limits=np.array([[-0.5, 0.5]]),
                                 num_samples=64,
                                 rng=np.random.default_rng(0))
    assert sa.shape == (1, 3) and np.isfinite(var)
