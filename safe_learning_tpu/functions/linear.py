"""Linear and quadratic function objects.

TPU-native equivalents of the reference's ``LinearSystem`` and
``QuadraticFunction`` (``/root/reference/safe_learning/functions.py:
1513-1583``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import config
from .base import DeterministicFunction, mxu_dot, register_pytree

__all__ = ["LinearSystem", "QuadraticFunction"]


@register_pytree
class LinearSystem(DeterministicFunction):
    """A linear map ``y = [A_1 A_2 ...] [x_1; x_2; ...]``.

    Accepts one matrix or a sequence of matrices that are horizontally
    stacked (reference ``functions.py:1546-1583``); calling with
    ``(states, actions)`` then computes ``A @ x + B @ u``.
    """

    _data_fields = ("matrix",)
    _param_fields = ("matrix",)

    def __init__(self, matrices):
        if isinstance(matrices, (list, tuple)):
            mats = [np.atleast_2d(np.asarray(m, dtype=config.np_dtype))
                    for m in matrices]
            matrix = np.hstack(mats)
        else:
            matrix = np.atleast_2d(np.asarray(matrices,
                                              dtype=config.np_dtype))
        self.matrix = jnp.asarray(matrix)

    @property
    def input_dim(self):
        """Dimensionality of the input points."""
        return int(self.matrix.shape[1])

    @property
    def output_dim(self):
        """Dimensionality of the output values."""
        return int(self.matrix.shape[0])

    def evaluate(self, points):
        """Evaluate the function at ``points``."""
        return mxu_dot(points, self.matrix.T)


@register_pytree
class QuadraticFunction(DeterministicFunction):
    """The quadratic form ``v(x) = x^T P x``.

    (reference ``functions.py:1513-1543``)."""

    _data_fields = ("matrix",)

    def __init__(self, matrix):
        self.matrix = jnp.atleast_2d(jnp.asarray(matrix,
                                                 dtype=config.dtype))

    @property
    def input_dim(self):
        """Dimensionality of the input points."""
        return int(self.matrix.shape[0])

    output_dim = 1

    def evaluate(self, points):
        """Evaluate the function at ``points``."""
        linear_form = mxu_dot(points, self.matrix)
        return jnp.sum(linear_form * points, axis=1, keepdims=True)

    def gradient(self, points):
        """Closed-form gradient (reference ``functions.py:1541-1543``)."""
        return mxu_dot(points, self.matrix + self.matrix.T)
