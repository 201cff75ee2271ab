"""Neural-network function approximators.

TPU-native equivalents of the reference's ``NeuralNetwork``
(``/root/reference/safe_learning/functions.py:1665-1786``) and the example
layer's ``LyapunovNetwork`` / ``RBFNetwork``
(``/root/reference/examples/utilities.py:48-141``). All matmuls carry
``preferred_element_type`` so the MXU accumulates in f32 even for bf16
parameters.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..config import config
from ..grids import GridWorld
from .base import DeterministicFunction, mxu_dot, register_pytree

__all__ = ["NeuralNetwork", "LyapunovNetwork", "RBFNetwork"]

_ACTIVATIONS = {
    None: lambda x: x,
    "linear": lambda x: x,
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "softplus": jax.nn.softplus,
    "swish": jax.nn.swish,
}


def _activation(name):
    if callable(name):
        return name
    try:
        return _ACTIVATIONS[name]
    except KeyError:
        raise ValueError("unknown activation {!r}".format(name))


def _xavier(key, shape, dtype):
    fan_in, fan_out = shape[0], shape[1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _dot(x, w):
    return mxu_dot(x, w)


@register_pytree
class NeuralNetwork(DeterministicFunction):
    """A simple MLP exposing its Lipschitz constant.

    Parameters
    ----------
    layers : list of int
        ``[input_dim, h1, ..., output_dim]``.
    nonlinearities : list
        One activation (name or callable) per layer after the first;
        hidden layers use bias, the output layer does not
        (reference ``functions.py:1702-1729``).
    output_scale : float, optional
    use_bias : bool, optional
    key : jax.random key, optional
        Initialization key (Xavier-uniform weights, zero biases).
    """

    _data_fields = ("weights", "biases")
    _meta_fields = ("layers", "nonlinearities", "output_scale", "use_bias")
    _param_fields = ("weights", "biases")

    def __init__(self, layers, nonlinearities, output_scale=1.0,
                 use_bias=True, key=None):
        self.layers = tuple(int(l) for l in layers)
        self.nonlinearities = tuple(
            n if (n is None or isinstance(n, str) or callable(n)) else str(n)
            for n in nonlinearities)
        if len(self.nonlinearities) != len(self.layers) - 1:
            raise ValueError("need one nonlinearity per layer")
        self.output_scale = float(output_scale)
        self.use_bias = bool(use_bias)

        if key is None:
            key = jax.random.PRNGKey(0)
        dtype = config.dtype
        weights, biases = [], []
        for i, (n_in, n_out) in enumerate(zip(self.layers[:-1],
                                              self.layers[1:])):
            key, sub = jax.random.split(key)
            weights.append(_xavier(sub, (n_in, n_out), dtype))
            hidden = i < len(self.layers) - 2
            biases.append(jnp.zeros((n_out,), dtype)
                          if (use_bias and hidden) else None)
        self.weights = tuple(weights)
        self.biases = tuple(biases)

    @property
    def input_dim(self):
        """Dimensionality of the input points."""
        return self.layers[0]

    @property
    def output_dim(self):
        """Dimensionality of the output values."""
        return self.layers[-1]

    def evaluate(self, points):
        """Evaluate the function at ``points``."""
        net = points
        for w, b, act in zip(self.weights, self.biases,
                             self.nonlinearities):
            net = _dot(net, w)
            if b is not None:
                net = net + b
            net = _activation(act)(net)
        return net * self.output_scale

    def lipschitz(self):
        """Upper bound on the Lipschitz constant.

        The product of layer spectral norms, differentiable via the
        stop-gradient SVD trick (reference ``functions.py:1742-1786``).

        Assumes contractive nonlinearities (ReLU, tanh, sigmoid).
        """
        lip = jnp.asarray(self.output_scale, dtype=self.weights[0].dtype)
        for w in self.weights:
            lip = lip * jnp.max(_svd_singular_values(w))
        return lip


def _svd_singular_values(a):
    """Singular values with stable gradients.

    ``S = U0^T A V0`` around a stop-gradiented SVD, mirroring the
    reference's trick (``functions.py:1764-1786``) which avoids the unstable
    SVD JVP for (near-)degenerate singular values.
    """
    u0, _, vt0 = jnp.linalg.svd(jax.lax.stop_gradient(a),
                                full_matrices=True)
    # Full-precision matmuls: a single-pass bf16 reconstruction could
    # UNDER-estimate the spectral norm feeding the safety threshold.
    s = mxu_dot(mxu_dot(u0.T, a), vt0.T)
    return jnp.diagonal(s)


@register_pytree
class LyapunovNetwork(DeterministicFunction):
    """A positive-definite-by-construction neural network.

    Layer kernels are ``W0^T W0 + eps I`` (optionally extended with free
    rows when the width grows); the output is ``||phi(x)||^2``. This is the
    trainable Lyapunov candidate of the CoRL-18 paper
    (reference ``examples/utilities.py:48-120``).
    """

    _data_fields = ("posdef_weights", "extra_weights")
    _meta_fields = ("input_dim", "layer_dims", "activations", "eps")
    _param_fields = ("posdef_weights", "extra_weights")

    output_dim = 1

    def __init__(self, input_dim, layer_dims, activations, eps=1e-6,
                 key=None):
        self.input_dim = int(input_dim)
        self.layer_dims = tuple(int(d) for d in layer_dims)
        self.activations = tuple(
            a if (a is None or isinstance(a, str) or callable(a)) else str(a)
            for a in activations)
        self.eps = float(eps)

        if self.layer_dims[0] < self.input_dim:
            raise ValueError("The first layer dimension must be at least "
                             "the input dimension!")
        if np.any(np.diff(self.layer_dims) < 0):
            raise ValueError("Each layer must maintain or increase the "
                             "dimension of its input!")

        if key is None:
            key = jax.random.PRNGKey(0)
        dtype = config.dtype
        posdef, extra = [], []
        in_dim = self.input_dim
        for out_dim in self.layer_dims:
            hidden = int(np.ceil((in_dim + 1) / 2))
            key, k1, k2 = jax.random.split(key, 3)
            posdef.append(_xavier(k1, (hidden, in_dim), dtype))
            dim_diff = out_dim - in_dim
            extra.append(_xavier(k2, (dim_diff, in_dim), dtype)
                         if dim_diff > 0 else None)
            in_dim = out_dim
        self.posdef_weights = tuple(posdef)
        self.extra_weights = tuple(extra)

    def evaluate(self, points):
        """Evaluate the function at ``points``."""
        net = points
        in_dim = self.input_dim
        for w0, w1, out_dim, act in zip(self.posdef_weights,
                                        self.extra_weights,
                                        self.layer_dims,
                                        self.activations):
            kernel = (_dot(w0.T, w0)
                      + self.eps * jnp.eye(in_dim, dtype=w0.dtype))
            if w1 is not None:
                kernel = jnp.concatenate([kernel, w1], axis=0)
            net = _activation(act)(_dot(net, kernel.T))
            in_dim = out_dim
        return jnp.sum(jnp.square(net), axis=1, keepdims=True)


@register_pytree
class RBFNetwork(DeterministicFunction):
    """Gaussian-RBF features on a grid with linear output weights.

    (reference ``examples/utilities.py:123-141``)."""

    _data_fields = ("weights",)
    _meta_fields = ("discretization", "variance")
    _param_fields = ("weights",)

    output_dim = 1

    def __init__(self, limits, num_states, variance=None, key=None):
        self.discretization = GridWorld(limits, num_states)
        if variance is None:
            variance = float(np.min(self.discretization.unit_maxes) ** 2)
        self.variance = float(variance)
        if key is None:
            key = jax.random.PRNGKey(0)
        self.weights = _xavier(key, (self.discretization.nindex, 1),
                               config.dtype)

    @property
    def input_dim(self):
        """Dimensionality of the input points."""
        return self.discretization.ndim

    @property
    def centers(self):
        """RBF feature centers."""
        return jnp.asarray(self.discretization.all_points)

    def evaluate(self, points):
        """Evaluate the function at ``points``."""
        beta = 1.0 / (2.0 * self.variance)
        # ||x - c||^2 expanded so the cross term rides the MXU.
        sq = (jnp.sum(points ** 2, axis=1, keepdims=True)
              + jnp.sum(self.centers ** 2, axis=1)[None, :]
              - 2.0 * _dot(points, self.centers.T))
        phi = jnp.exp(-beta * sq)
        return _dot(phi, self.weights)
