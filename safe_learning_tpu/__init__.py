"""safe_learning_tpu: TPU-native safe model-based RL with stability guarantees.

A brand-new JAX/XLA/Pallas framework with the capabilities of
``befelix/safe_learning`` (NeurIPS-17 / CoRL-18): Lyapunov stability
verification of uncertain (GP) dynamics on discretized state spaces, safe
active exploration, and stability-constrained approximate dynamic
programming — redesigned TPU-first (sharded grid sweeps, fused kernels,
functional pytree state) rather than ported from the reference's TF1 stack.
"""

from .config import config
from .grids import DimensionError, GridWorld
from .functions import (AddedFunction, ConstantFunction,
                        DeterministicFunction, Function, FunctionStack,
                        LambdaFunction, LinearSystem, LyapunovNetwork,
                        MeanFunction, MultipliedFunction, NeuralNetwork,
                        PiecewiseConstant, QuadraticFunction, RBFNetwork,
                        GradientNorm, Saturation, Triangulation,
                        UncertainFunction)
from .functions.gp import (ActiveDims, GaussianProcess, GPRCached,
                           GPSampledFunction, LinearKernel,
                           StackedSampledFunction,
                           Matern12, Matern32, Matern52, RBF,
                           StackedGaussianProcess,
                           fit_gp_hyperparameters, sample_gp_function)
from .lyapunov import Lyapunov, get_lyapunov_region, smallest_boundary_value
from .explore import (get_safe_sample, get_safe_sample_batch,
                      perturb_actions)
from .rl import OptimizationError, PolicyIteration
from .dynamics import CartPole, InvertedPendulum, VanDerPol
from .analysis import (compute_roa, compute_closedloop_response, gridify,
                       reward_rollout)
from . import (checkpoints, errorbounds, oracle, parallel, plotting,
               profiling, utils)

__version__ = "0.1.0"

__all__ = [
    "config", "GridWorld", "DimensionError", "AddedFunction",
    "ConstantFunction", "DeterministicFunction", "Function", "FunctionStack",
    "LambdaFunction", "LinearSystem", "LyapunovNetwork", "MeanFunction",
    "MultipliedFunction", "NeuralNetwork", "PiecewiseConstant",
    "GradientNorm", "QuadraticFunction", "RBFNetwork", "Saturation",
    "Triangulation",
    "UncertainFunction", "GaussianProcess", "GPRCached",
    "StackedGaussianProcess",
    "GPSampledFunction", "StackedSampledFunction",
    "ActiveDims", "LinearKernel", "Matern12", "Matern32", "Matern52", "RBF",
    "fit_gp_hyperparameters", "sample_gp_function", "Lyapunov",
    "get_lyapunov_region",
    "smallest_boundary_value", "get_safe_sample", "perturb_actions",
    "OptimizationError", "PolicyIteration", "CartPole", "InvertedPendulum",
    "VanDerPol", "compute_roa", "compute_closedloop_response", "gridify",
    "reward_rollout", "utils", "checkpoints", "parallel", "plotting",
    "profiling",
]
