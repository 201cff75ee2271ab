"""Triangulation / exploration correctness in float32."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

import safe_learning_tpu as sl


@pytest.mark.parametrize("ndim", [1, 2, 3])
def test_triangulation_affine_reproduction_f32(ndim):
    """PWL interpolation reproduces affine functions to f32 precision."""
    rng = np.random.default_rng(0)
    limits = [[-1.0, 1.0]] * ndim
    grid = sl.GridWorld(limits, 5)
    w = rng.normal(size=ndim)
    b = 0.3
    vertex_values = grid.all_points @ w + b
    tri = sl.Triangulation(grid, vertex_values)

    q = rng.uniform(-0.99, 0.99, size=(64, ndim)).astype(np.float32)
    got = np.asarray(tri(jnp.asarray(q)))[:, 0]
    expected = q.astype(np.float64) @ w + b
    assert_allclose(got, expected, atol=1e-5)


def test_triangulation_gradient_f32():
    grid = sl.GridWorld([[-1, 1], [-1, 1]], 9)
    rng = np.random.default_rng(1)
    tri = sl.Triangulation(grid, rng.normal(size=grid.nindex))
    q = rng.uniform(-0.9, 0.9, size=(32, 2)).astype(np.float32)

    # Autodiff input gradient equals the analytic piecewise gradient.
    auto = np.asarray(jax.vmap(jax.jacobian(
        lambda x: tri(x[None, :])[0, 0]))(jnp.asarray(q)))
    analytic = np.asarray(tri.gradient(jnp.asarray(q)))
    assert_allclose(auto, analytic.reshape(auto.shape), atol=1e-4)


def test_get_safe_sample_f32():
    """Safe exploration returns a finite, provably safe pair in f32."""
    grid = sl.GridWorld([[-1, 1]], 101)
    kernel = sl.RBF(1e-6, [0.5, 0.5], input_dim=2)
    x0 = np.array([[0.0, 0.0]], dtype=np.float32)
    y0 = np.array([[0.0]], dtype=np.float32)
    gp = sl.GaussianProcess(kernel, x0, y0, noise_variance=1e-8, beta=2.0,
                            mean_function=sl.LinearSystem([[0.5, 0.1]]))
    v = sl.QuadraticFunction([[1.0]])
    # Near-equilibrium states never pass the strict decrease check (GP
    # error dominates |dv| there); exempt a small initial level region,
    # as every reference notebook does.
    initial = np.where(
        np.abs(grid.all_points.squeeze()) < 0.2)[0]
    lyap = sl.Lyapunov(grid, v, gp, 0.6, 2.0, 1e-3,
                       sl.LinearSystem([[0.0]]),
                       initial_set=initial)
    lyap.update_safe_set()
    assert lyap.safe_set.sum() > len(initial)

    pair, var = sl.get_safe_sample(
        lyap, perturbations=np.linspace(-0.2, 0.2, 5)[:, None],
        num_samples=32, rng=np.random.default_rng(0))
    assert pair.shape == (1, 2)
    assert np.isfinite(pair).all() and np.isfinite(var)
    # The chosen pair's mean next state maps into the certified level set.
    mean, _ = map(np.asarray, lyap.dynamics.evaluate(jnp.asarray(pair)))
    assert float(v(jnp.asarray(mean))[0, 0]) < lyap.c_max + 1e-5
