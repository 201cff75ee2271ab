"""Composable function approximators (the reference's L2/L3 layers)."""

from .base import (AddedFunction, ConstantFunction, DeterministicFunction,
                   Function, FunctionStack, LambdaFunction, MeanFunction,
                   GradientNorm, MultipliedFunction, Saturation,
                   UncertainFunction,
                   as_deterministic, concatenate_inputs, register_pytree)
from .linear import LinearSystem, QuadraticFunction
from .neural import LyapunovNetwork, NeuralNetwork, RBFNetwork
from .simplex import PiecewiseConstant, Triangulation

__all__ = [
    "AddedFunction", "ConstantFunction", "DeterministicFunction", "Function",
    "FunctionStack", "LambdaFunction", "MeanFunction", "MultipliedFunction",
    "GradientNorm", "Saturation", "UncertainFunction", "as_deterministic",
    "concatenate_inputs", "register_pytree", "LinearSystem",
    "QuadraticFunction", "LyapunovNetwork", "NeuralNetwork", "RBFNetwork",
    "PiecewiseConstant", "Triangulation",
]
