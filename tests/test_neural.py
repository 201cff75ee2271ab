"""Tests for neural-network function approximators (mirrors reference
test_functions.py:764-836 NN tests + LyapunovNetwork construction)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from safe_learning_tpu import LyapunovNetwork, NeuralNetwork, RBFNetwork


def test_mlp_shapes_and_determinism():
    net = NeuralNetwork([2, 16, 3], ["tanh", None],
                        key=jax.random.PRNGKey(1))
    x = np.ones((5, 2))
    out = np.asarray(net(x))
    assert out.shape == (5, 3)
    out2 = np.asarray(net(x))
    assert_allclose(out, out2)
    # Hidden layer has bias, output layer does not.
    assert net.biases[0] is not None
    assert net.biases[1] is None


def test_mlp_output_scale():
    net = NeuralNetwork([1, 4, 1], ["tanh", None], output_scale=3.0,
                        key=jax.random.PRNGKey(0))
    base = NeuralNetwork([1, 4, 1], ["tanh", None], output_scale=1.0,
                         key=jax.random.PRNGKey(0))
    x = np.array([[0.7]])
    assert_allclose(np.asarray(net(x)), 3.0 * np.asarray(base(x)))


def test_lipschitz_bound_holds():
    """lipschitz() is an upper bound on observed difference quotients
    (reference functions.py:1742-1786)."""
    net = NeuralNetwork([2, 8, 1], ["tanh", None],
                        key=jax.random.PRNGKey(2))
    lip = float(net.lipschitz())
    rng = np.random.default_rng(0)
    x = rng.normal(size=(200, 2))
    y = x + rng.normal(size=(200, 2)) * 0.01
    fx = np.asarray(net(x))
    fy = np.asarray(net(y))
    quotients = (np.linalg.norm(fx - fy, axis=1)
                 / np.linalg.norm(x - y, axis=1))
    assert quotients.max() <= lip + 1e-8
    # The bound is the product of spectral norms.
    expected = np.prod([np.linalg.svd(np.asarray(w), compute_uv=False)[0]
                        for w in net.weights])
    assert_allclose(lip, expected, rtol=1e-10)


def test_lipschitz_gradient_flows():
    net = NeuralNetwork([2, 4, 1], ["tanh", None],
                        key=jax.random.PRNGKey(3))

    def loss(params):
        return net.with_parameters(params).lipschitz()

    g = jax.grad(loss)(net.parameters_dict)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert sum(np.abs(np.asarray(l)).sum() for l in leaves) > 0


def test_lyapunov_network_positive_definite():
    net = LyapunovNetwork(2, [4, 4, 4], ["tanh", "tanh", "tanh"],
                          key=jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    x = rng.normal(size=(100, 2))
    values = np.asarray(net(x))
    assert values.shape == (100, 1)
    assert (values > 0).all()
    # Near-zero at the origin.
    assert float(net(np.zeros((1, 2)))[0, 0]) < 1e-6


def test_lyapunov_network_dim_checks():
    with pytest.raises(ValueError):
        LyapunovNetwork(3, [2, 4], ["tanh", "tanh"])
    with pytest.raises(ValueError):
        LyapunovNetwork(2, [4, 2], ["tanh", "tanh"])


def test_lyapunov_network_trainable():
    """One gradient step decreases a classification-style loss."""
    net = LyapunovNetwork(2, [8, 8], ["tanh", "tanh"],
                          key=jax.random.PRNGKey(4))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(64, 2)))
    target = jnp.sum(x ** 2, axis=1, keepdims=True)

    def loss(params):
        out = net.with_parameters(params)(x)
        return jnp.mean((out - target) ** 2)

    params = net.parameters_dict
    l0 = float(loss(params))
    g = jax.grad(loss)(params)
    # Small enough step along the negative gradient must decrease loss.
    losses = [float(loss(jax.tree_util.tree_map(
        lambda p, gg: p - lr * gg, params, g)))
        for lr in (0.1, 0.01, 0.001)]
    assert min(losses) < l0


def test_rbf_network():
    net = RBFNetwork([[-1, 1]], 5, key=jax.random.PRNGKey(0))
    x = np.array([[0.0], [0.5]])
    out = np.asarray(net(x))
    assert out.shape == (2, 1)
    # Exact interpolation structure: output is a linear map of weights.
    w = np.asarray(net.weights)
    net2 = net.with_parameters({"weights": 2.0 * net.weights})
    assert_allclose(np.asarray(net2(x)), 2 * out, atol=1e-12)


def test_lyapunov_network_growing_widths():
    """Width-increasing layers use the extra free rows and stay
    positive definite (reference examples/utilities.py:85-104)."""
    net = LyapunovNetwork(2, [4, 8, 8], ["tanh", "tanh", "tanh"],
                          key=jax.random.PRNGKey(1))
    assert net.extra_weights[0] is not None  # 2 -> 4 grows
    x = np.random.default_rng(0).normal(size=(64, 2))
    vals = np.asarray(net(x)).ravel()
    assert (vals > 0).all()
    assert float(np.asarray(net(np.zeros((1, 2)))).item()) < 1e-10
    # Gradients flow through both weight families.
    def loss(params):
        return jnp.mean(net.with_parameters(params)(x))
    grads = jax.grad(loss)(net.parameters_dict)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)
