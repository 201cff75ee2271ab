"""Function framework: composable pytree function objects.

TPU-native replacement for the reference's TF1 template/variable-scope
framework (``/root/reference/safe_learning/functions.py:31-354``). Instead of
``tf.make_template`` + variable scopes + a graph-attached feed dict, every
function is an immutable pytree: array attributes (parameters, matrices) are
dynamic leaves that flow through ``jax.jit`` / ``jax.grad`` / ``jax.vmap``,
while structural attributes (dims, activation names, grids) are static
metadata that key compilation.

Calling conventions mirror the reference:
- ``fun(x)`` or ``fun(states, actions)`` — extra positional args are
  concatenated along axis 1 (reference ``utilities.py:123-159``).
- A :class:`DeterministicFunction` returns an array; an
  :class:`UncertainFunction` returns a ``(mean, error)`` tuple
  (reference ``functions.py:202-230``).
- Function algebra ``f + g``, ``f * g``, ``-f`` (reference
  ``functions.py:112-122``).

Parameters are updated functionally: ``fun.with_parameters(new)`` returns a
new instance (replaces ``copy_parameters`` / ``tf.assign``,
reference ``functions.py:100-110``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "register_pytree", "Function", "DeterministicFunction",
    "UncertainFunction", "ConstantFunction", "AddedFunction",
    "MultipliedFunction", "Saturation", "FunctionStack", "MeanFunction",
    "LambdaFunction", "concatenate_inputs",
]


def _collect(cls, attr):
    """Collect a tuple-valued class attribute across the MRO (base first)."""
    seen = []
    for klass in reversed(cls.__mro__):
        for name in vars(klass).get(attr, ()):
            if name not in seen:
                seen.append(name)
    return tuple(seen)


def register_pytree(cls):
    """Class decorator registering a Function subclass as a JAX pytree.

    The class declares ``_data_fields`` (dynamic leaves: arrays, nested
    functions) and ``_meta_fields`` (static, hashable metadata). Fields are
    inherited across subclasses.
    """
    data_fields = _collect(cls, "_data_fields")
    meta_fields = _collect(cls, "_meta_fields")
    cls._all_data_fields = data_fields
    cls._all_meta_fields = meta_fields

    def flatten(obj):
        """Pytree flatten hook."""
        data = tuple(getattr(obj, name) for name in data_fields)
        meta = tuple(getattr(obj, name) for name in meta_fields)
        return data, meta

    def unflatten(meta, data):
        """Pytree unflatten hook."""
        obj = object.__new__(cls)
        for name, value in zip(data_fields, data):
            object.__setattr__(obj, name, value)
        for name, value in zip(meta_fields, meta):
            object.__setattr__(obj, name, value)
        return obj

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


def mxu_dot(a, b):
    """Matmul with full input-precision multiplication on the MXU.

    On TPU, f32 x f32 matmuls default to a single bf16 pass (8-bit
    mantissa) — ``preferred_element_type`` only widens the accumulator.
    GP solves and quadratic forms need the full f32 mantissa, so f32/f64
    inputs request ``Precision.HIGHEST`` (multi-pass on the MXU);
    bf16/f16 inputs keep the native fast path with f32 accumulation.
    """
    dtype = jnp.result_type(a, b)
    acc = jnp.promote_types(dtype, jnp.float32)
    precision = (jax.lax.Precision.HIGHEST
                 if dtype in (jnp.float32, jnp.float64) else None)
    out = jnp.dot(a, b, preferred_element_type=acc, precision=precision)
    return out.astype(dtype)


def concatenate_inputs(*args):
    """Concatenate positional inputs along axis 1.

    JAX equivalent of the reference decorator (``utilities.py:123-159``):
    allows every function to be called as ``f(x)`` or ``f(states, actions)``.
    """
    arrays = [jnp.atleast_2d(jnp.asarray(a)) for a in args]
    if len(arrays) == 1:
        return arrays[0]
    return jnp.concatenate(arrays, axis=1)


class Function:
    """Base class for composable function objects (pytree nodes)."""

    _data_fields = ()
    _meta_fields = ()

    input_dim = None
    output_dim = None

    def __call__(self, *points):
        """Evaluate (see class docstring)."""
        return self.evaluate(concatenate_inputs(*points))

    def evaluate(self, points):
        """Evaluate the function at a 2D batch of points."""
        raise NotImplementedError("must be implemented by the child class")

    # ------------------------------------------------------------------
    # Parameter handling (functional)
    # ------------------------------------------------------------------
    @property
    def parameters_dict(self):
        """Return the pytree of trainable parameters of this function.

        Subclasses with a single natural parameter array (e.g.
        ``Triangulation``) also expose it directly as ``.parameters``,
        matching the reference's usage.
        """
        fields = _collect(type(self), "_param_fields")
        params = {}
        for name in fields:
            params[name] = getattr(self, name)
        for name in self._all_data_fields:
            child = getattr(self, name)
            if isinstance(child, Function):
                sub = child.parameters_dict
                if sub:
                    params[name] = sub
        return params

    def with_parameters(self, params):
        """Return a copy of this function with updated parameters.

        Unknown names are rejected (like :meth:`replace`) — silently
        attaching them would leave the real parameters unchanged while
        reporting success (e.g. a params dict saved from a
        differently-wrapped model)."""
        allowed = (set(self._all_data_fields)
                   | set(_collect(type(self), "_param_fields")))
        new = self.replace()
        for name, value in params.items():
            if name not in allowed:
                raise ValueError(
                    "{} has no parameter field {!r} (expected a subset "
                    "of {})".format(type(self).__name__, name,
                                    sorted(allowed)))
            current = getattr(new, name)
            if isinstance(current, Function):
                value = current.with_parameters(value)
            object.__setattr__(new, name, value)
        return new

    def replace(self, **updates):
        """Return a shallow copy with the given attributes replaced."""
        new = object.__new__(type(self))
        for name in self._all_data_fields + self._all_meta_fields:
            object.__setattr__(new, name, updates.pop(name, getattr(self,
                                                                    name)))
        if updates:
            raise ValueError("unknown fields: {}".format(sorted(updates)))
        return new

    def copy_parameters(self, other):
        """Return a copy of self with parameters taken from ``other``.

        Functional analogue of the reference's assign-op based
        ``copy_parameters`` (``functions.py:100-110``).
        """
        return self.with_parameters(other.parameters_dict)

    # ------------------------------------------------------------------
    # Function algebra (reference functions.py:112-122)
    # ------------------------------------------------------------------
    def __add__(self, other):
        """Pointwise sum (kernel algebra)."""
        return AddedFunction(self, other)

    def __radd__(self, other):
        """Right-hand pointwise sum."""
        return AddedFunction(other, self)

    def __mul__(self, other):
        """Pointwise product (kernel algebra)."""
        return MultipliedFunction(self, other)

    def __rmul__(self, other):
        """Right-hand pointwise product."""
        return MultipliedFunction(other, self)

    def __neg__(self):
        """Pointwise negation."""
        return MultipliedFunction(self, -1.0)

    def __sub__(self, other):
        """Pointwise difference."""
        return AddedFunction(self, MultipliedFunction(other, -1.0))

    def __rsub__(self, other):
        """Right-hand pointwise difference."""
        return AddedFunction(other, MultipliedFunction(self, -1.0))


class DeterministicFunction(Function):
    """A function returning point values (reference ``functions.py:233``)."""

    def gradient(self, points):
        """Spatial gradient via autodiff, shape ``(N, input_dim)``.

        Scalar-output functions get this for free (the reference builds
        ``tf.gradients(fun(x), x)[0]`` by hand, e.g.
        ``examples/lyapunov_function_learning.ipynb`` cell 19); subclasses
        with closed forms (Triangulation, QuadraticFunction) override it.
        """
        points = jnp.atleast_2d(jnp.asarray(points))

        def scalar(x):
            """Wrap a python scalar as a constant function."""
            return jnp.sum(self.evaluate(x[None, :]))

        return jax.vmap(jax.grad(scalar))(points)


class UncertainFunction(Function):
    """A function returning ``(mean, error_bound)`` tuples.

    Mirrors the contract at reference ``functions.py:202-230``.
    """

    def to_mean_function(self):
        """Return a deterministic function for the mean prediction."""
        return MeanFunction(self)


@register_pytree
class MeanFunction(DeterministicFunction):
    """Deterministic wrapper returning only the mean of an uncertain fn."""

    _data_fields = ("fun",)

    def __init__(self, fun):
        self.fun = fun
        self.input_dim = fun.input_dim
        self.output_dim = fun.output_dim

    _meta_fields = ("input_dim", "output_dim")

    def evaluate(self, points):
        """Evaluate the function at ``points``."""
        return self.fun.evaluate(points)[0]


@register_pytree
class ConstantFunction(DeterministicFunction):
    """A function with a constant value (reference ``functions.py:241``)."""

    _data_fields = ("constant",)

    def __init__(self, constant):
        self.constant = jnp.asarray(constant)

    def evaluate(self, points):
        """Evaluate the function at ``points``."""
        return self.constant


def _as_function(fun):
    if isinstance(fun, Function):
        return fun
    return ConstantFunction(fun)


@register_pytree
class AddedFunction(Function):
    """Pointwise sum of two functions (reference ``functions.py:125-160``)."""

    _data_fields = ("fun1", "fun2")

    def __init__(self, fun1, fun2):
        self.fun1 = _as_function(fun1)
        self.fun2 = _as_function(fun2)

    def evaluate(self, points):
        """Evaluate the function at ``points``."""
        return self.fun1.evaluate(points) + self.fun2.evaluate(points)


@register_pytree
class MultipliedFunction(Function):
    """Pointwise product of functions (reference ``functions.py:163-199``)."""

    _data_fields = ("fun1", "fun2")

    def __init__(self, fun1, fun2):
        self.fun1 = _as_function(fun1)
        self.fun2 = _as_function(fun2)

    def evaluate(self, points):
        """Evaluate the function at ``points``."""
        return self.fun1.evaluate(points) * self.fun2.evaluate(points)

    def split_scalar_factor(self, error_prefix):
        """Split into ``(scalar_constant, inner_function)`` or raise.

        The rigor pipelines (extended sweep, analytic margins) support
        products only when exactly one factor is a scalar
        :class:`ConstantFunction` (e.g. ``-value_function``, the
        NeurIPS-17 flagship candidate); both callers share this
        extraction so the support matrix cannot drift.

        Raises ``NotImplementedError`` (prefixed with *error_prefix*)
        otherwise.
        """
        f1, f2 = self.fun1, self.fun2
        if isinstance(f1, ConstantFunction) and np.size(f1.constant) == 1:
            return f1, f2
        if isinstance(f2, ConstantFunction) and np.size(f2.constant) == 1:
            return f2, f1
        raise NotImplementedError(
            error_prefix + " supports MultipliedFunction candidates "
            "only with one scalar-constant factor")


@register_pytree
class GradientNorm(DeterministicFunction):
    """Per-state norm of another function's spatial gradient.

    Used as a *local* Lipschitz constant for Lyapunov candidates — the
    reference passes ad-hoc lambdas like
    ``lambda x: tf.reduce_max(tf.abs(value_function.gradient(x)), axis=1)``
    (``examples/inverted_pendulum.ipynb`` cell 14,
    ``adaptive_safety_verification.ipynb`` cell 17). A raw Python closure
    would bake the wrapped function's parameters into the jit trace as
    constants; this pytree keeps them live traced leaves.

    ``ord``: ``inf`` for the per-state max, 1 for the L1 norm, or ``None``
    to return the elementwise ``|grad|`` (one column per dimension, reduced
    later by the threshold's L1 contraction).
    """

    _data_fields = ("fun",)
    _meta_fields = ("ord", "input_dim", "output_dim")

    def __init__(self, fun, ord=None):
        if not hasattr(fun, "gradient"):
            raise TypeError("fun must define gradient(points)")
        self.fun = fun
        self.ord = ord
        self.input_dim = fun.input_dim
        self.output_dim = 1 if ord is not None else fun.input_dim

    def evaluate(self, points):
        """Evaluate the function at ``points``."""
        grad = jnp.abs(self.fun.gradient(points))
        grad = grad.reshape(grad.shape[0], -1)
        if self.ord is None:
            return grad
        if np.isinf(self.ord):
            return jnp.max(grad, axis=1, keepdims=True)
        if self.ord == 1:
            return jnp.sum(grad, axis=1, keepdims=True)
        raise ValueError("unsupported ord: {}".format(self.ord))


@register_pytree
class Saturation(DeterministicFunction):
    """Clip a wrapped function's output (ref ``functions.py:310-354``)."""

    _data_fields = ("fun", "lower", "upper")

    def __init__(self, fun, lower, upper):
        self.fun = fun
        self.lower = jnp.asarray(lower)
        self.upper = jnp.asarray(upper)
        self.input_dim = fun.input_dim
        self.output_dim = fun.output_dim

    _meta_fields = ("input_dim", "output_dim")

    def __getattr__(self, name):
        """Forward unknown attributes to the wrapped function."""
        # Forward attribute access to the wrapped function
        # (reference functions.py:333-337).
        if name.startswith("_"):
            raise AttributeError(name)
        return getattr(self.fun, name)

    def evaluate(self, points):
        """Evaluate the function at ``points``."""
        values = self.fun.evaluate(points)
        return jnp.clip(values, self.lower, self.upper)


@register_pytree
class FunctionStack(UncertainFunction):
    """Stack 1-output uncertain functions into a multi-output model.

    One function per output dimension (e.g. one GP per state dimension),
    mirroring reference ``functions.py:254-307``.
    """

    _data_fields = ("functions",)

    def __init__(self, functions):
        self.functions = tuple(functions)
        self.num_fun = len(self.functions)
        self.input_dim = self.functions[0].input_dim
        self.output_dim = sum(f.output_dim for f in self.functions)

    _meta_fields = ("num_fun", "input_dim", "output_dim")

    def evaluate(self, points):
        """Evaluate the function at ``points``."""
        means, errors = [], []
        for fun in self.functions:
            mean, error = fun.evaluate(points)
            means.append(mean)
            errors.append(error)
        return (jnp.concatenate(means, axis=1),
                jnp.concatenate(errors, axis=1))

    def add_data_point(self, x, y):
        """Fan a multi-output measurement out to the per-dim functions.

        Returns a new FunctionStack (functional update); mirrors reference
        ``functions.py:293-307``.
        """
        y = np.atleast_2d(y)
        new = [fun.add_data_point(x, y[:, i:i + 1])
               for i, fun in enumerate(self.functions)]
        return self.replace(functions=tuple(new))


@register_pytree
class LambdaFunction(DeterministicFunction):
    """Wrap a plain callable as a DeterministicFunction.

    Useful for tests and ad-hoc policies (e.g. ``lambda x: -0.1 * x``),
    mirroring how the reference accepts bare callables for policies and
    Lyapunov candidates (e.g. ``tests/test_lyapunov.py:28,36``).
    """

    _data_fields = ()
    _meta_fields = ("fun", "input_dim", "output_dim")

    def __init__(self, fun, input_dim=None, output_dim=None):
        self.fun = fun
        self.input_dim = input_dim
        self.output_dim = output_dim

    def evaluate(self, points):
        """Evaluate the function at ``points``."""
        return self.fun(points)


def as_deterministic(fun, input_dim=None, output_dim=None):
    """Coerce a callable into a DeterministicFunction."""
    if isinstance(fun, Function):
        return fun
    return LambdaFunction(fun, input_dim, output_dim)
