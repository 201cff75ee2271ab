"""Tests for the function framework (mirrors reference test_functions.py
base-class tests :24-147, :370-405)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from safe_learning_tpu import (ConstantFunction, DeterministicFunction,
                               FunctionStack, LinearSystem, QuadraticFunction,
                               Saturation, UncertainFunction)
from safe_learning_tpu.functions.base import (LambdaFunction,
                                              concatenate_inputs)


def test_concatenate_inputs():
    a = np.ones((3, 2))
    b = np.zeros((3, 1))
    merged = concatenate_inputs(a, b)
    assert merged.shape == (3, 3)
    assert_allclose(np.asarray(merged), np.hstack([a, b]))
    single = concatenate_inputs(a)
    assert_allclose(np.asarray(single), a)


def test_function_call_concatenates():
    fun = LinearSystem([np.array([[1.0, 0.0]]), np.array([[2.0]])])
    states = np.array([[1.0, 3.0]])
    actions = np.array([[0.5]])
    merged = fun(states, actions)
    split = fun(np.hstack([states, actions]))
    assert_allclose(np.asarray(merged), np.asarray(split))
    assert_allclose(np.asarray(merged), [[2.0]])


def test_algebra():
    f = LinearSystem(np.array([[2.0]]))
    g = LinearSystem(np.array([[3.0]]))
    x = np.array([[1.0], [2.0]])
    assert_allclose(np.asarray((f + g)(x)), 5 * x)
    assert_allclose(np.asarray((f * g)(x)), 6 * x ** 2)
    assert_allclose(np.asarray((-f)(x)), -2 * x)
    assert_allclose(np.asarray((f + 1.0)(x)), 2 * x + 1)
    assert_allclose(np.asarray((f * 2.0)(x)), 4 * x)


def test_constant_function():
    fun = ConstantFunction(3.0)
    assert_allclose(np.asarray(fun(np.ones((2, 2)))), 3.0)


def test_saturation():
    fun = Saturation(LinearSystem(np.array([[1.0]])), -1.0, 1.0)
    x = np.array([[-5.0], [0.5], [5.0]])
    assert_allclose(np.asarray(fun(x)), [[-1.0], [0.5], [1.0]])
    assert fun.input_dim == 1 and fun.output_dim == 1


def test_quadratic():
    p = np.array([[1.0, 0.5], [0.5, 2.0]])
    fun = QuadraticFunction(p)
    x = np.array([[1.0, 1.0], [0.0, 2.0]])
    expected = np.sum((x @ p) * x, axis=1, keepdims=True)
    assert_allclose(np.asarray(fun(x)), expected)
    grad = np.asarray(fun.gradient(x))
    assert_allclose(grad, x @ (p + p.T))
    # Autodiff agrees with the closed form.
    auto = jax.vmap(jax.grad(lambda p_: fun(p_[None, :])[0, 0]))(
        jnp.asarray(x))
    assert_allclose(np.asarray(auto), grad)


def test_uncertain_function_stack_and_mean():
    class FakeGP(UncertainFunction):
        input_dim = 1
        output_dim = 1

        def evaluate(self, points):
            return points * 2.0, jnp.abs(points) * 0.1

    from safe_learning_tpu.functions.base import register_pytree
    register_pytree(FakeGP)

    stack = FunctionStack([FakeGP(), FakeGP()])
    x = np.array([[1.0], [2.0]])
    mean, err = stack(x)
    assert mean.shape == (2, 2) and err.shape == (2, 2)
    assert_allclose(np.asarray(mean), np.hstack([2 * x, 2 * x]))

    mean_fn = stack.to_mean_function()
    assert isinstance(mean_fn, DeterministicFunction)
    assert_allclose(np.asarray(mean_fn(x)), np.asarray(mean))


def test_pytree_roundtrip_and_parameters():
    fun = LinearSystem(np.array([[2.0]])) + LinearSystem(np.array([[3.0]]))
    leaves, treedef = jax.tree_util.tree_flatten(fun)
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    x = np.array([[1.0]])
    assert_allclose(np.asarray(rebuilt(x)), np.asarray(fun(x)))

    # Functions flow through jit as pytree arguments.
    @jax.jit
    def apply(f, x):
        return f(x)

    assert_allclose(np.asarray(apply(fun, x)), 5.0)


def test_with_parameters():
    from safe_learning_tpu import GridWorld, Triangulation

    grid = GridWorld([[0, 1]], 3)
    fun = Triangulation(grid, np.array([0.0, 1.0, 4.0]))
    params = fun.parameters_dict
    assert set(params) == {"parameters"}
    new = fun.with_parameters(
        jax.tree_util.tree_map(lambda p: p * 2, params))
    x = np.array([[0.5]])
    assert_allclose(np.asarray(new(x)), 2 * np.asarray(fun(x)))
    # copy_parameters round-trip.
    back = new.copy_parameters(fun)
    assert_allclose(np.asarray(back(x)), np.asarray(fun(x)))


def test_gradient_norm_function():
    """GradientNorm: per-state norms of the wrapped function's gradient,
    with live (pytree) parameters."""
    import jax

    from safe_learning_tpu import GradientNorm, QuadraticFunction

    p = np.array([[2.0, 0.5], [0.5, 1.0]])
    quad = QuadraticFunction(p)
    x = np.array([[1.0, -1.0], [0.5, 0.25]])
    grad = x @ (p + p.T)

    g_inf = GradientNorm(quad, ord=np.inf)
    assert_allclose(np.asarray(g_inf(x)),
                    np.abs(grad).max(axis=1, keepdims=True))
    g_l1 = GradientNorm(quad, ord=1)
    assert_allclose(np.asarray(g_l1(x)),
                    np.abs(grad).sum(axis=1, keepdims=True))
    g_none = GradientNorm(quad)
    assert_allclose(np.asarray(g_none(x)), np.abs(grad))

    # Pytree roundtrip keeps parameters traced (no stale constants).
    leaves, treedef = jax.tree_util.tree_flatten(g_inf)
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert_allclose(np.asarray(rebuilt(x)), np.asarray(g_inf(x)))


def test_default_autodiff_gradient():
    """Scalar functions get gradient() for free via autodiff."""
    from safe_learning_tpu import LyapunovNetwork
    import jax

    net = LyapunovNetwork(2, [8, 8], ["tanh", "tanh"],
                          key=jax.random.PRNGKey(0))
    x = np.array([[0.3, -0.2], [0.1, 0.4]])
    g = np.asarray(net.gradient(x))
    assert g.shape == (2, 2)
    # Finite-difference check.
    eps = 1e-6
    for d in range(2):
        dx = np.zeros((1, 2))
        dx[0, d] = eps
        fd = (np.asarray(net(x + dx)) - np.asarray(net(x - dx))) / (2 * eps)
        assert_allclose(g[:, d], fd.ravel(), rtol=1e-4, atol=1e-7)


def test_subtraction_algebra():
    from safe_learning_tpu import LinearSystem

    f = LinearSystem([[2.0]])
    g = LinearSystem([[0.5]])
    x = np.array([[1.0], [2.0]])
    assert_allclose(np.asarray((f - g)(x)), 1.5 * x)
    assert_allclose(np.asarray((1.0 - g)(x)), 1.0 - 0.5 * x)


def test_base_class_error_contracts():
    """NotImplementedError contracts of the abstract bases and the
    mean-function conversion on a stub (reference
    test_functions.py:125-147)."""
    import pytest

    from safe_learning_tpu import (DeterministicFunction,
                                   UncertainFunction)

    with pytest.raises(NotImplementedError):
        DeterministicFunction().evaluate(None)
    with pytest.raises(NotImplementedError):
        UncertainFunction().evaluate(None)

    class Stub(UncertainFunction):
        def evaluate(self, points):
            return (jnp.ones((1, 1)), 2.0 * jnp.ones((1, 1)))

    mean_fun = Stub().to_mean_function()
    assert float(np.asarray(mean_fun(jnp.zeros((1, 1))))[0, 0]) == 1.0


def test_with_parameters_rejects_unknown_names():
    """Unknown parameter names raise instead of silently attaching dead
    attributes while the real parameters stay unchanged."""
    import pytest

    from safe_learning_tpu import LinearSystem

    fn = LinearSystem([[1.0, 2.0]])
    with pytest.raises(ValueError, match="no parameter field"):
        fn.with_parameters({"wieghts": np.zeros((1, 2))})
