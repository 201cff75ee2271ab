"""Gaussian-process regression, TPU-native.

Replaces the reference's gpflow-0.4 stack (``GPRCached`` and
``GaussianProcess``, ``/root/reference/safe_learning/functions.py:357-546``)
with an in-house exact GP designed for TPU:

- kernel matrices are assembled as matmul-dominated expressions (the
  squared-distance cross term rides the MXU);
- the Cholesky factor **and its explicit triangular inverse** are cached so
  the per-query hot path (millions of grid points per sweep) is a pure
  matmul chain with no triangular solves;
- the training set lives in fixed-capacity buffers with a dynamic count so
  online learning (``add_data_point``) never changes compiled shapes — the
  reference instead re-feeds growing arrays through placeholders and
  refactorizes from scratch on every addition (``functions.py:525-546``).
  Here each addition runs an O(n^2) **bordered Cholesky append** inside
  the same float64 host island that owns the factorization (a float64
  mirror of the factor is carried between additions), which matches
  refactorization up to the f32 kernel-assembly rounding both paths
  share — precision is NOT traded for the speedup, unlike a
  single-precision rank-1 update. Full refactorization remains the
  fallback for buffer growth, ill-conditioned additions, and
  float64-device mode;
- the reference's internal ``scale`` conditioning trick
  (``functions.py:399-411, 454-456``) is kept for small noise variances.

All state is an immutable pytree; ``add_data_point`` returns a new instance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import config
from ..grids import GridWorld
from .base import (DeterministicFunction, Function, UncertainFunction,
                   mxu_dot, register_pytree)

__all__ = [
    "Kernel", "RBF", "Matern12", "Matern32", "Matern52", "LinearKernel",
    "ActiveDims", "SumKernel", "ProductKernel", "GaussianProcess",
    "GPRCached", "StackedGaussianProcess", "sample_gp_function",
    "GPSampledFunction", "fit_gp_hyperparameters",
]


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------
class Kernel:
    """Base class for covariance functions (pytree nodes)."""

    _data_fields = ()
    _meta_fields = ()

    def __call__(self, x, z=None):
        """Full covariance matrix ``K(x, z)``, shape ``(len(x), len(z))``."""
        raise NotImplementedError

    def diag(self, x):
        """Diagonal of ``K(x, x)``, shape ``(len(x),)``."""
        raise NotImplementedError

    def __add__(self, other):
        """Pointwise sum (kernel algebra)."""
        return SumKernel(self, other)

    def __mul__(self, other):
        """Pointwise product (kernel algebra)."""
        return ProductKernel(self, other)


def _sqdist(x, z):
    """Pairwise squared distances with the cross term as a matmul (MXU)."""
    xx = jnp.sum(x * x, axis=1, keepdims=True)
    zz = jnp.sum(z * z, axis=1, keepdims=True)
    cross = mxu_dot(x, z.T)
    return jnp.maximum(xx - 2.0 * cross + zz.T, 0.0)


class _StationaryKernel(Kernel):
    """Shared scaffolding for stationary kernels with ARD lengthscales."""

    _data_fields = ("variance", "lengthscales")

    def __init__(self, variance=1.0, lengthscales=1.0, input_dim=1):
        dtype = config.dtype
        self.variance = jnp.asarray(variance, dtype=dtype)
        ls = jnp.asarray(lengthscales, dtype=dtype)
        self.lengthscales = jnp.broadcast_to(jnp.atleast_1d(ls),
                                             (input_dim,))

    _meta_fields = ()

    def _scaled(self, x):
        return jnp.atleast_2d(jnp.asarray(x)) / self.lengthscales

    def __call__(self, x, z=None):
        x = self._scaled(x)
        z = x if z is None else self._scaled(z)
        return self.variance * self._from_sqdist(_sqdist(x, z))

    def diag(self, x):
        x = jnp.atleast_2d(jnp.asarray(x))
        return jnp.broadcast_to(self.variance, (x.shape[0],))

    def _from_sqdist(self, r2):
        raise NotImplementedError


@register_pytree
class RBF(_StationaryKernel):
    """Squared-exponential kernel ``v * exp(-r^2 / 2)``."""

    @staticmethod
    def _from_sqdist(r2):
        return jnp.exp(-0.5 * r2)


@register_pytree
class Matern12(_StationaryKernel):
    """Matern-1/2 (exponential) kernel."""

    @staticmethod
    def _from_sqdist(r2):
        return jnp.exp(-jnp.sqrt(r2 + 1e-36))


@register_pytree
class Matern32(_StationaryKernel):
    """Matern-3/2 kernel."""

    @staticmethod
    def _from_sqdist(r2):
        r = jnp.sqrt(3.0 * r2 + 1e-36)
        return (1.0 + r) * jnp.exp(-r)


@register_pytree
class Matern52(_StationaryKernel):
    """Matern-5/2 kernel."""

    @staticmethod
    def _from_sqdist(r2):
        r = jnp.sqrt(5.0 * r2 + 1e-36)
        return (1.0 + r + r * r / 3.0) * jnp.exp(-r)


#: r2 -> normalized covariance, by stationary family name — THE single
#: source of the formulas; the Pallas kernels consume this map so the
#: fused forward pass can never desynchronize from the XLA path.
STATIONARY_COVARIANCES = {
    "rbf": RBF._from_sqdist,
    "matern12": Matern12._from_sqdist,
    "matern32": Matern32._from_sqdist,
    "matern52": Matern52._from_sqdist,
}


@register_pytree
class LinearKernel(Kernel):
    """Dot-product kernel ``K(x, z) = x diag(v) z^T`` (gpflow ``Linear``)."""

    _data_fields = ("variances",)

    def __init__(self, variances=1.0, input_dim=1):
        v = jnp.asarray(variances, dtype=config.dtype)
        self.variances = jnp.broadcast_to(jnp.atleast_1d(v), (input_dim,))

    def __call__(self, x, z=None):
        """Evaluate (see class docstring)."""
        x = jnp.atleast_2d(jnp.asarray(x))
        z = x if z is None else jnp.atleast_2d(jnp.asarray(z))
        return mxu_dot(x * self.variances, z.T)

    def diag(self, x):
        """Diagonal of ``K(x, x)``."""
        x = jnp.atleast_2d(jnp.asarray(x))
        return jnp.sum(x * x * self.variances, axis=1)


@register_pytree
class ActiveDims(Kernel):
    """Restrict a kernel to a subset of input columns.

    Equivalent of gpflow's ``active_dims`` (used throughout the reference
    notebooks, e.g. ``Matern32(1, active_dims=[0])`` over state-action
    inputs in ``examples/1d_region_of_attraction_estimate.ipynb`` cell 5).
    """

    _data_fields = ("kernel",)
    _meta_fields = ("dims",)

    def __init__(self, kernel, dims):
        self.kernel = kernel
        self.dims = tuple(int(d) for d in dims)

    def _slice(self, x):
        return jnp.atleast_2d(jnp.asarray(x))[:, list(self.dims)]

    def __call__(self, x, z=None):
        """Evaluate (see class docstring)."""
        z = x if z is None else z
        return self.kernel(self._slice(x), self._slice(z))

    def diag(self, x):
        """Diagonal of ``K(x, x)``."""
        return self.kernel.diag(self._slice(x))


@register_pytree
class SumKernel(Kernel):
    """Pointwise sum of two kernels (gpflow ``Add``)."""

    _data_fields = ("k1", "k2")

    def __init__(self, k1, k2):
        self.k1, self.k2 = k1, k2

    def __call__(self, x, z=None):
        """Evaluate (see class docstring)."""
        return self.k1(x, z) + self.k2(x, z)

    def diag(self, x):
        """Diagonal of ``K(x, x)``."""
        return self.k1.diag(x) + self.k2.diag(x)


@register_pytree
class ProductKernel(Kernel):
    """Pointwise product of two kernels (gpflow ``Prod``)."""

    _data_fields = ("k1", "k2")

    def __init__(self, k1, k2):
        self.k1, self.k2 = k1, k2

    def __call__(self, x, z=None):
        """Evaluate (see class docstring)."""
        return self.k1(x, z) * self.k2(x, z)

    def diag(self, x):
        """Diagonal of ``K(x, x)``."""
        return self.k1.diag(x) * self.k2.diag(x)


# ---------------------------------------------------------------------------
# Exact GP regression with cached Cholesky
# ---------------------------------------------------------------------------
def _predict_tile(n_points, capacity):
    """Query-tile size for the fused Pallas predict.

    Large tiles amortize per-tile overheads (~18% faster at 4096 than
    1024 on v5e for capacity 128), but the kernel's VMEM working set
    scales with ``capacity * tile`` (covariance + per-dim difference
    tiles live in VMEM): capacity 256 at tile 4096 exceeds the 16 MB
    scoped-vmem limit (measured compile failure). Keep
    ``capacity * tile`` at the proven 128 * 4096 budget.
    """
    budget = (128 * 4096) // max(int(capacity), 8)
    tile = min(4096, max(128, budget // 128 * 128))
    return min(tile, max(128, (-(-n_points // 128)) * 128))


def _round_capacity(n):
    return max(8, int(2 ** np.ceil(np.log2(max(n, 1)))))


def _assemble64(kernel, x_rows, z_rows=None):
    """Oracle-consistent float64 kernel assembly (CPU backend, host).

    Evaluates the float64-lifted kernel at float64-lifted rows — the
    SAME matrix the float64 oracle's rebuilt GP factorizes
    (``oracle.lift64``) — so the host island's factors are the exact
    model's factors up to f64 roundoff, with no f32 assembly noise.
    Runs eagerly on the CPU backend: no device dispatch, no relay
    latency. Returns a float64 numpy array.
    """
    from ..oracle import _oracle_env, lift64

    with _oracle_env():
        x = jnp.asarray(np.asarray(x_rows), dtype=jnp.float64)
        z = (x if z_rows is None
             else jnp.asarray(np.asarray(z_rows), dtype=jnp.float64))
        return np.asarray(lift64(kernel)(x, z), dtype=np.float64)


def _prior64(mean_function, x_rows, width):
    """Oracle-consistent float64 prior mean at rows, shape ``(n, width)``.

    ``None`` means a zero prior. Like :func:`_assemble64`, evaluates the
    float64-lifted function on the CPU backend so the host island's
    residual targets match the float64 oracle's bit-for-bit (an f32
    prior evaluation would shift ``alpha`` at ``u32 * |m(X)|`` scale).
    """
    x_rows = np.asarray(x_rows)
    n = x_rows.shape[0]
    if mean_function is None or n == 0:
        return np.zeros((n, width))
    from ..oracle import _oracle_env, lift64

    with _oracle_env():
        x = jnp.asarray(x_rows, dtype=jnp.float64)
        out = np.asarray(lift64(mean_function)(x), dtype=np.float64)
    return np.broadcast_to(out.reshape(n, -1), (n, width))


@jax.jit
def _append_rows(x_buf, y_buf, x, y, n):
    """Write new rows into both data buffers in ONE device dispatch.

    (dispatch latency, not bandwidth, dominates online updates)."""
    zero = jnp.zeros_like(n)
    return (jax.lax.dynamic_update_slice(x_buf, x, (n, zero)),
            jax.lax.dynamic_update_slice(y_buf, y, (n, zero)))


@register_pytree
class GaussianProcess(UncertainFunction):
    """Exact GP posterior exposing ``(mean, beta * std)`` confidence bounds.

    Parameters
    ----------
    kernel : Kernel
    x : (n, input_dim) array of observed inputs
    y : (n, output_dim) array of observed outputs
    noise_variance : float
    beta : float
        Confidence-interval scaling (reference ``functions.py:480-487``).
    mean_function : Function, optional
        Prior mean (defaults to zero).
    capacity : int, optional
        Fixed buffer capacity for online learning; grows (with one retrace)
        when exceeded.
    scale : float, optional
        Internal conditioning factor (reference ``functions.py:399-411``).

    Examples
    --------
    >>> import numpy as np
    >>> from safe_learning_tpu import GaussianProcess, RBF
    >>> x = np.array([[-0.5], [0.0], [0.5]])
    >>> y = 0.5 * x
    >>> gp = GaussianProcess(RBF(1.0, 0.5), x, y, noise_variance=1e-6)
    >>> mean, error = gp(np.array([[0.0]]))  # (posterior mean, beta*std)
    >>> bool(abs(float(mean[0, 0])) < 1e-3)
    True
    >>> gp = gp.add_data_point(np.array([[1.0]]), np.array([[0.5]]))
    >>> int(gp.count)
    4
    """

    _data_fields = ("kernel", "X_buf", "Y_buf", "count", "noise_variance",
                    "chol", "chol_inv", "alpha", "mean_function")
    _meta_fields = ("beta", "scale", "input_dim", "output_dim")

    def __init__(self, kernel, x, y, noise_variance, beta=2.0,
                 mean_function=None, capacity=None, scale=1.0):
        x = np.atleast_2d(np.asarray(x, dtype=config.np_dtype))
        y = np.atleast_2d(np.asarray(y, dtype=config.np_dtype))
        if len(x) != len(y):
            raise ValueError("x and y must have the same number of rows")
        n, d = x.shape
        cap = _round_capacity(n) if capacity is None else int(capacity)

        self.kernel = kernel
        self.beta = float(beta)
        self.scale = float(scale)
        self.input_dim = d
        self.output_dim = y.shape[1]
        self.mean_function = mean_function
        self.noise_variance = jnp.asarray(noise_variance,
                                          dtype=config.dtype)

        dtype = config.np_dtype
        x_buf = np.zeros((cap, d), dtype=dtype)
        y_buf = np.zeros((cap, y.shape[1]), dtype=dtype)
        x_buf[:n] = x
        y_buf[:n] = y
        self.X_buf = jnp.asarray(x_buf)
        self.Y_buf = jnp.asarray(y_buf)
        self.count = jnp.asarray(n, dtype=jnp.int32)
        self.chol = None
        self.chol_inv = None
        self.alpha = None
        host_out = []
        chol, chol_inv, alpha = _gp_cache(self, host_out=host_out)
        self.chol, self.chol_inv, self.alpha = chol, chol_inv, alpha
        self._host_cache = host_out[0] if host_out else None

    # -- data views -------------------------------------------------------
    @property
    def capacity(self):
        """Fixed buffer capacity available for online learning."""
        return int(self.X_buf.shape[0])

    @property
    def X(self):
        """Active observed inputs (host view)."""
        return np.asarray(self.X_buf)[:int(self.count)]

    @property
    def Y(self):
        """Active observed outputs (host view)."""
        return np.asarray(self.Y_buf)[:int(self.count)]

    def _mask(self):
        return (jnp.arange(self.capacity) < self.count).astype(
            self.X_buf.dtype)

    def _prior_mean(self, points):
        if self.mean_function is None:
            return 0.0
        return self.mean_function(points)

    # -- prediction ---------------------------------------------------------
    def _stationary_kind(self):
        kind_map = {RBF: "rbf", Matern12: "matern12", Matern32: "matern32",
                    Matern52: "matern52"}
        return kind_map.get(type(self.kernel))

    def predict(self, points, full_cov=False):
        """Posterior mean and (co)variance at query points.

        The hot path is a pure matmul chain against the cached scaled
        Cholesky inverse (reference ``functions.py:417-458`` instead does a
        triangular solve per batch). On TPU with a stationary kernel the
        whole pipeline runs as one fused Pallas kernel
        (``ops/gp_kernel.py``) that never materializes ``K(X, q)`` in HBM.
        """
        points = jnp.atleast_2d(jnp.asarray(points))
        s2 = self.scale ** 2

        if (not full_cov and getattr(config, "use_pallas", True)
                and self.capacity <= getattr(config,
                                             "pallas_max_capacity",
                                             2048)):
            from ..ops.gp_kernel import (compile_kernel_program,
                                         fused_gp_predict,
                                         fused_gp_predict_general,
                                         pallas_supported)

            if pallas_supported():
                # Large query tiles amortize per-tile overheads (~18%
                # faster at 4096 than 1024 on v5e for capacity 128).
                tile = _predict_tile(points.shape[0], self.capacity)
                precision = getattr(config, "pallas_precision", "highest")
                kind = self._stationary_kind()
                mean_num = var_num = None
                if kind is not None:
                    # Plain stationary family: pre-scaled specialized
                    # kernel (one fewer multiply per element).
                    ls = self.kernel.lengthscales
                    mean_num, var_num = fused_gp_predict(
                        points / ls, self.X_buf / ls, self.chol_inv,
                        self.alpha, self._mask(),
                        self.kernel.variance * s2, kind=kind, tile=tile,
                        precision=precision)
                else:
                    # Composite kernels (sums/products/ActiveDims of
                    # stationary + linear — the reference notebooks'
                    # models) compile to a covariance program executed
                    # inside the same fused kernel.
                    compiled = compile_kernel_program(
                        self.kernel, input_dim=self.input_dim)
                    if compiled is not None:
                        program, param_list = compiled
                        params = jnp.concatenate(
                            [jnp.asarray(p).reshape(-1)
                             for p in param_list]).astype(points.dtype)
                        mean_num, var_num = fused_gp_predict_general(
                            points, self.X_buf, params, self.chol_inv,
                            self.alpha, self._mask(), s2, program,
                            tile=tile, precision=precision)
                if mean_num is not None:
                    mean = mean_num / self.scale \
                        + self._prior_mean(points)
                    var = self.kernel.diag(points) - var_num / s2
                    var = jnp.maximum(var, 1e-12)[:, None]
                    var = jnp.broadcast_to(
                        var, (points.shape[0], self.output_dim))
                    return mean, var

        mask = self._mask()
        kx = s2 * self.kernel(self.X_buf, points) * mask[:, None]
        a = mxu_dot(self.chol_inv, kx)
        mean = mxu_dot(a.T, self.alpha) / self.scale \
            + self._prior_mean(points)
        if full_cov:
            knn = self.kernel(points, points)
            cov = knn - mxu_dot(a.T, a) / s2
            return mean, cov
        var = self.kernel.diag(points) - jnp.sum(a * a, axis=0) / s2
        var = jnp.maximum(var, 1e-12)[:, None]
        var = jnp.broadcast_to(var, (points.shape[0], self.output_dim))
        return mean, var

    def evaluate(self, points):
        """Return ``(mean, beta * std)`` (ref ``functions.py:507-515``)."""
        mean, var = self.predict(points)
        return mean, self.beta * jnp.sqrt(var)

    # -- hyperparameter objective -------------------------------------------
    def log_marginal_likelihood(self, kernel=None, noise_variance=None):
        """Exact log marginal likelihood of the active data.

        Differentiable with respect to the (pytree) kernel and the noise
        variance, so hyperparameters can be fitted with ``jax.grad``:

            ``grads = jax.grad(lambda k: -gp.log_marginal_likelihood(k))(
                gp.kernel)``

        The reference's gpflow backend exposed the same quantity but the
        reference never optimized hyperparameters; here it completes the
        GP stack. Summed over output dimensions.
        """
        kernel = self.kernel if kernel is None else kernel
        noise = (self.noise_variance if noise_variance is None
                 else noise_variance)
        return _log_marginal_likelihood(kernel, noise, self.X_buf,
                                        self.Y_buf,
                                        self.mean_function, self.count)

    # -- online learning ----------------------------------------------------
    def add_data_point(self, x, y):
        """Append observation(s), returning a new GP with a fresh cache.

        Mirrors reference ``functions.py:525-546``.

        In float32 mode, when the float64 host mirror of the factor is
        available, the refresh is an O(n^2) **bordered Cholesky append**
        (the same recurrence a fresh factorization runs for the new
        rows; see :func:`_bordered_append` for the precision argument);
        the full O(n^3) refactorization remains the fallback for buffer
        growth, ill-conditioned additions, and instances that crossed a
        pytree boundary.
        """
        x = np.atleast_2d(np.asarray(x, dtype=config.np_dtype))
        y = np.atleast_2d(np.asarray(y, dtype=config.np_dtype))
        n_new = len(x)
        n = int(self.count)
        if n + n_new > self.capacity:
            # Grow the buffers on the host (one retrace per doubling).
            return GaussianProcess(
                self.kernel, np.vstack([self.X, x]), np.vstack([self.Y, y]),
                self.noise_variance, beta=self.beta,
                mean_function=self.mean_function,
                capacity=_round_capacity(n + n_new), scale=self.scale)
        x_dev, y_dev = _append_rows(self.X_buf, self.Y_buf,
                                    jnp.asarray(x), jnp.asarray(y),
                                    jnp.asarray(n, dtype=jnp.int32))
        new = self.replace(X_buf=x_dev, Y_buf=y_dev,
                           count=jnp.asarray(n + n_new, dtype=jnp.int32))

        host = getattr(self, "_host_cache", None)
        host_new = None
        if (host is not None and host.count == n
                and getattr(config, "incremental_gp_updates", True)):
            host_new = _bordered_append(
                host, self.kernel, x, y, self.mean_function,
                float(self.noise_variance), self.scale, self.capacity)
        if host_new is not None:
            chol, chol_inv, alpha = _host_cache_to_device(host_new)
        else:
            host_out = []
            chol, chol_inv, alpha = _gp_cache(new, host_out=host_out)
            host_new = host_out[0] if host_out else None
        new = new.replace(chol=chol, chol_inv=chol_inv, alpha=alpha)
        object.__setattr__(new, "_host_cache", host_new)
        return new


#: Reference-parity alias. The reference splits the GP stack in two —
#: ``GPRCached``, a gpflow GPR holding a cached Cholesky factor
#: (reference ``functions.py:357-438``), wrapped by its
#: ``GaussianProcess`` UncertainFunction — while here the cached factor
#: (``chol``, ``chol_inv``, ``alpha``) IS the core of the one class, so
#: the two reference names resolve to the same type.
GPRCached = GaussianProcess


@jax.jit
def _log_marginal_likelihood(kernel, noise_variance, x_buf, y_buf,
                             mean_function, count):
    """Masked exact GP log marginal likelihood (summed over outputs).

    Inactive buffer rows contribute identity rows to the factor and are
    excluded from the quadratic form and the log determinant, so the
    result equals the unpadded textbook expression
    ``-1/2 r' K^{-1} r - 1/2 log|K| - n/2 log(2 pi)`` per output column.
    """
    cap = x_buf.shape[0]
    dtype = x_buf.dtype
    mask = (jnp.arange(cap) < count).astype(dtype)
    outer = mask[:, None] * mask[None, :]
    eye = jnp.eye(cap, dtype=dtype)
    k = kernel(x_buf, x_buf) + noise_variance * eye
    k = jnp.where(outer > 0, k, eye)
    chol = jnp.linalg.cholesky(k)
    prior = 0.0 if mean_function is None else mean_function(x_buf)
    resid = (y_buf - prior) * mask[:, None]
    alpha = jax.scipy.linalg.solve_triangular(chol, resid, lower=True)
    quad = jnp.sum(alpha ** 2)
    # Identity rows have log diag 0, so the masked logdet is free.
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
    n = count.astype(dtype)
    p = y_buf.shape[1]
    return (-0.5 * quad - 0.5 * p * logdet
            - 0.5 * p * n * jnp.log(2.0 * jnp.pi))


class _HostCache:
    """Float64 host mirror of one output's Cholesky cache.

    Kept OUTSIDE the pytree (plain attribute, absent after jit
    unflattening or ``replace``) so online appends can run the O(n^2)
    bordered update at full precision instead of refactorizing; any code
    path that loses the mirror silently falls back to refactorization.
    """

    __slots__ = ("chol", "chol_inv", "alpha", "count", "jitter",
                 "x_rows", "fresh")

    def __init__(self, chol, chol_inv, alpha, count, jitter, x_rows,
                 fresh=True):
        self.chol = chol
        self.chol_inv = chol_inv
        self.alpha = alpha
        self.count = int(count)
        self.jitter = float(jitter)
        #: Active training inputs (host copy of the working-dtype rows),
        #: kept so appends never need a device fetch of the buffer.
        self.x_rows = x_rows
        #: True when produced by a from-scratch factorization — then the
        #: factors are BITWISE the float64 oracle's (same code path,
        #: same inputs). Bordered appends set False: their f64 rounding
        #: differs from a fresh factorization at condition-number scale,
        #: which the f32 margins absorb but the extended sweep must not
        #: (it refactorizes fresh instead).
        self.fresh = bool(fresh)


def _host_factorize(kernel, x_buf, y_buf, mean_function, count,
                    noise_variance, scale):
    """Float64 host factorization of the masked, scaled kernel matrix.

    Returns a :class:`_HostCache`. The kernel matrix AND the prior-mean
    residual are assembled in float64 on the CPU backend from the
    float64-lifted model (:func:`_assemble64` / :func:`_prior64`) — the
    same matrix and target the float64 oracle factorizes — so the host
    island's factors match the exact model to f64 roundoff with no f32
    assembly noise. A genuinely indefinite matrix (duplicate inputs at
    tiny noise) is retried with growing jitter starting at the f64
    roundoff scale of the diagonal; a nonzero jitter changes the model
    and voids any derived certificate margin (the empirical calibrator
    re-measures whatever model actually runs).
    """
    import scipy.linalg

    cap = x_buf.shape[0]
    n = int(count)
    s2 = float(scale) ** 2
    host_dtype = np.dtype(config.solve_dtype or np.float64)
    x_rows = np.asarray(x_buf)[:n].copy()
    k = _assemble64(kernel, x_rows).astype(host_dtype, copy=False)
    a = np.eye(cap, dtype=host_dtype)
    a[:n, :n] = s2 * (k + float(noise_variance) * np.eye(n))
    mask = np.zeros(cap, dtype=np.float64)
    mask[:n] = 1.0
    jitter = 0.0
    diag_scale = float(np.max(np.diagonal(a))) if cap else 1.0
    for _ in range(16):
        try:
            chol = np.linalg.cholesky(a + (jitter * s2) * np.diag(mask))
            break
        except np.linalg.LinAlgError:
            jitter = max(64.0 * np.finfo(np.float64).eps * diag_scale / s2,
                         10.0 * jitter)
    else:
        raise np.linalg.LinAlgError(
            "GP kernel matrix is not positive definite even after "
            "jitter {:.2e}".format(jitter))
    chol_inv = scipy.linalg.solve_triangular(
        chol, np.eye(cap), lower=True, check_finite=False)
    target = np.zeros((cap, y_buf.shape[1]), dtype=np.float64)
    y_host = np.asarray(y_buf, dtype=np.float64)[:n]
    prior = _prior64(mean_function, x_rows, y_buf.shape[1])
    target[:n] = float(scale) * (y_host - prior)
    alpha = chol_inv @ target
    return _HostCache(chol, chol_inv, alpha, n, jitter, x_rows)


def _host_cache_to_device(host):
    dtype = config.dtype
    return (jnp.asarray(host.chol, dtype=dtype),
            jnp.asarray(host.chol_inv, dtype=dtype),
            jnp.asarray(host.alpha, dtype=dtype))


def _bordered_append(host, kernel, x_new, y_new, mean_function,
                     noise_variance, scale, capacity):
    """O(n^2) bordered Cholesky append of ``m`` new observations.

    Mathematically the same recurrence a fresh factorization runs for the
    new rows (the leading block's factor is untouched by construction),
    executed in the same float64 host island with the same
    oracle-consistent f64 assembly (:func:`_assemble64`), so the result
    matches refactorization to f64 roundoff — no precision is traded for
    the O(n^2)-instead-of-O(n^3) cost, and no device dispatch is needed
    (the host mirror carries the active training rows). Returns the
    updated :class:`_HostCache`, or ``None`` when the pivot is not
    safely positive (ill-conditioned addition — caller refactorizes with
    the jitter retry loop instead).

    Parameters
    ----------
    host : _HostCache with ``count = n`` rows already factorized
    x_new : (m, d) new inputs (working-dtype host rows, as stored)
    y_new : (m, p) new targets
    mean_function : prior mean Function or None
    capacity : int buffer capacity (append fails past it)
    """
    import scipy.linalg

    n = host.count
    m = len(y_new)
    if n + m > int(capacity):
        return None
    s = float(scale)
    s2 = s * s
    host_dtype = np.dtype(config.solve_dtype or np.float64)

    x_new = np.asarray(x_new, dtype=host.x_rows.dtype).reshape(m, -1)
    rows = (np.vstack([host.x_rows, x_new]) if n else x_new)
    # Kernel columns K(rows, x_new) in oracle-consistent f64 on the CPU
    # backend — zero device dispatches through the (high-latency) link.
    k_cols = _assemble64(kernel, rows, x_new).astype(
        host_dtype, copy=False) * s2
    prior_new = _prior64(mean_function, x_new, y_new.shape[1])
    noise = float(noise_variance)

    chol = host.chol.copy()
    chol_inv = host.chol_inv.copy()
    alpha = host.alpha.copy()
    target_new = (s * (np.asarray(y_new, dtype=host_dtype)
                       - prior_new.astype(host_dtype, copy=False)))

    for j in range(m):
        i = n + j
        kj = k_cols[:i, j]
        diag = k_cols[i, j] + s2 * (noise + host.jitter)
        lj = scipy.linalg.solve_triangular(
            chol[:i, :i], kj, lower=True, check_finite=False)
        d2 = diag - lj @ lj
        # Require a pivot comfortably above f64 roundoff of the quadratic
        # form; otherwise let the refactorization path apply its jitter.
        if not np.isfinite(d2) or d2 <= 1e-12 * max(diag, 1e-30):
            return None
        d = np.sqrt(d2)
        chol[i, :i] = lj
        chol[i, i] = d
        chol_inv[i, :i] = -(lj @ chol_inv[:i, :i]) / d
        chol_inv[i, i] = 1.0 / d
        alpha[i, :] = (target_new[j] - lj @ alpha[:i, :]) / d

    return _HostCache(chol, chol_inv, alpha, n + m, host.jitter,
                      rows, fresh=False)


def _device_border_append(gp, x_new, y_new):
    """Working-dtype on-device bordered Cholesky append (selection grade).

    The same recurrence as the float64 host island
    (:func:`_bordered_append`) run in the working dtype on device,
    appending ONE observation of all outputs and returning the updated
    GP pytree. Used by the fused k-step exploration program
    (``explore.get_safe_sample_batch``) to keep predictive variances
    current BETWEEN measurements without any host round-trip; the
    authoritative float64 cache refresh still happens once per batch.
    Works for :class:`GaussianProcess` and
    :class:`StackedGaussianProcess`.
    """
    i = gp.count
    cap = gp.capacity
    s = gp.scale
    s2 = s * s
    zero = jnp.zeros_like(i)
    x_new = jnp.asarray(x_new, dtype=gp.X_buf.dtype)
    y_new = jnp.asarray(y_new, dtype=gp.Y_buf.dtype)
    x_buf = jax.lax.dynamic_update_slice(gp.X_buf, x_new, (i, zero))
    y_buf = jax.lax.dynamic_update_slice(gp.Y_buf, y_new, (i, zero))
    mask = (jnp.arange(cap) < i).astype(x_buf.dtype)
    onehot_i = jnp.arange(cap) == i

    def border_one(kernel, chol, chol_inv, alpha, noise, target_row):
        """Border one output's (scaled, masked) factor with the new row."""
        kj = s2 * kernel(x_buf, x_new)[:, 0] * mask
        diag = s2 * (kernel.diag(x_new)[0] + noise)
        y_vec = jax.scipy.linalg.solve_triangular(chol, kj, lower=True)
        d2 = diag - jnp.sum(y_vec * y_vec)
        # Clamp instead of the host island's refactorize-on-bad-pivot:
        # selection-grade variances tolerate a floored pivot.
        d = jnp.sqrt(jnp.maximum(d2, 1e-10 * jnp.maximum(diag, 1e-30)))
        row_l = jnp.where(onehot_i, d, y_vec)
        chol2 = jax.lax.dynamic_update_slice(chol, row_l[None, :],
                                             (i, zero))
        inv_row = jnp.where(onehot_i, 1.0 / d, -(y_vec @ chol_inv) / d)
        chol_inv2 = jax.lax.dynamic_update_slice(chol_inv,
                                                 inv_row[None, :],
                                                 (i, zero))
        alpha_row = (target_row - y_vec @ alpha) / d
        alpha2 = jax.lax.dynamic_update_slice(alpha, alpha_row[None, :],
                                              (i, zero))
        return chol2, chol_inv2, alpha2

    count2 = i + jnp.ones_like(i)
    if isinstance(gp, StackedGaussianProcess):
        priors = gp._prior_means(x_new)  # (1, S)
        chols, chol_invs, alphas = [], [], []
        for s_idx in range(gp.num_fun):
            target = (s * (y_new[:, s_idx] - priors[:, s_idx]))[:, None]
            c2, ci2, a2 = border_one(
                gp.kernels[s_idx], gp.chol[s_idx], gp.chol_inv[s_idx],
                gp.alpha[s_idx], gp.noise_variances[s_idx], target[0])
            chols.append(c2)
            chol_invs.append(ci2)
            alphas.append(a2)
        return gp.replace(X_buf=x_buf, Y_buf=y_buf, count=count2,
                          chol=jnp.stack(chols),
                          chol_inv=jnp.stack(chol_invs),
                          alpha=jnp.stack(alphas))

    prior = gp._prior_mean(x_new)
    prior = jnp.zeros_like(y_new) + prior
    target = (s * (y_new - prior))[0]  # (p,)
    c2, ci2, a2 = border_one(gp.kernel, gp.chol, gp.chol_inv, gp.alpha,
                             gp.noise_variance, target)
    return gp.replace(X_buf=x_buf, Y_buf=y_buf, count=count2, chol=c2,
                      chol_inv=ci2, alpha=a2)


def _cache_parts(kernel, x_buf, y_buf, mean_function, count,
                 noise_variance, scale, host_out=None):
    """Refresh one output's Cholesky cache from its parts.

    The kernel assembly and factorization ALWAYS run on the host in
    float64 (:func:`_host_factorize`) — in float32 mode (the TPU
    default) because ``K + noise I`` at the small noise levels the
    reference uses (1e-6 .. 1e-8 variances) is too ill-conditioned for
    a single-precision Cholesky, and in BOTH modes so that a float32
    GP's factors and the float64 oracle's (``oracle.lift64`` rebuilds
    the GP under x64, landing in this same numpy code path) are the
    SAME numpy arrays bit for bit. That bitwise identity is what lets
    the extended-precision sweep's derived margin
    (``ops/extended_verify``) be ~2^-40-scale: any implementation
    difference between two f64 factorizations of an ill-conditioned
    matrix would exceed it. When ``host_out`` is a list, the float64
    :class:`_HostCache` mirror is appended to it so subsequent
    ``add_data_point`` calls can run the O(n^2) bordered update.
    """
    host = _host_factorize(kernel, x_buf, y_buf, mean_function, count,
                           noise_variance, scale)
    if host_out is not None:
        host_out.append(host)
    return _host_cache_to_device(host)


def _gp_cache(gp, host_out=None):
    """Refresh a :class:`GaussianProcess`'s Cholesky cache."""
    return _cache_parts(gp.kernel, gp.X_buf, gp.Y_buf, gp.mean_function,
                        gp.count, gp.noise_variance, gp.scale,
                        host_out=host_out)


# ---------------------------------------------------------------------------
# Batched multi-output GP over shared inputs
# ---------------------------------------------------------------------------
@register_pytree
class StackedGaussianProcess(UncertainFunction):
    """A stack of single-output GPs over ONE shared training set.

    The TPU-native replacement for wrapping per-dimension GPs in a
    :class:`~safe_learning_tpu.functions.base.FunctionStack` (the
    reference's pattern, ``functions.py:254-307``, used by its pendulum
    and adaptive-verification notebooks): each output keeps its own
    kernel, noise variance, confidence ``beta``, and prior mean, but the
    training inputs — which are shared by construction when measurements
    fan out — are stored once, and prediction for ALL outputs runs as a
    single fused Pallas kernel that shares the per-dimension covariance
    tiles across outputs (``ops/gp_kernel.py:fused_gp_predict_stacked``).

    ``FunctionStack`` remains available for stacks of heterogeneous or
    non-GP uncertain functions; :meth:`from_gps` converts a list of GPs
    with identical data into the batched form.
    """

    _data_fields = ("kernels", "X_buf", "Y_buf", "count",
                    "noise_variances", "chol", "chol_inv", "alpha",
                    "mean_functions")
    _meta_fields = ("betas", "scale", "input_dim", "output_dim", "num_fun")

    def __init__(self, kernels, x, y, noise_variances, betas=2.0,
                 mean_functions=None, capacity=None, scale=1.0):
        kernels = tuple(kernels)
        n_out = len(kernels)
        x = np.atleast_2d(np.asarray(x, dtype=config.np_dtype))
        y = np.atleast_2d(np.asarray(y, dtype=config.np_dtype))
        if y.shape[1] != n_out:
            raise ValueError("y must have one column per kernel")
        if len(x) != len(y):
            raise ValueError("x and y must have the same number of rows")
        n, d = x.shape
        cap = _round_capacity(n) if capacity is None else int(capacity)

        self.kernels = kernels
        self.num_fun = n_out
        self.input_dim = d
        self.output_dim = n_out
        self.scale = float(scale)
        betas = np.broadcast_to(np.asarray(betas, dtype=float), (n_out,))
        self.betas = tuple(float(b) for b in betas)
        if mean_functions is None:
            mean_functions = (None,) * n_out
        self.mean_functions = tuple(mean_functions)
        if len(self.mean_functions) != n_out:
            raise ValueError("need one mean function (or None) per output")
        noise = np.broadcast_to(
            np.asarray(noise_variances, dtype=config.np_dtype), (n_out,))
        self.noise_variances = jnp.asarray(noise)

        dtype = config.np_dtype
        x_buf = np.zeros((cap, d), dtype=dtype)
        y_buf = np.zeros((cap, n_out), dtype=dtype)
        x_buf[:n] = x
        y_buf[:n] = y
        self.X_buf = jnp.asarray(x_buf)
        self.Y_buf = jnp.asarray(y_buf)
        self.count = jnp.asarray(n, dtype=jnp.int32)
        self.chol = None
        self.chol_inv = None
        self.alpha = None
        host_out = []
        self.chol, self.chol_inv, self.alpha = _stacked_cache(
            self, host_out=host_out)
        self._host_caches = host_out[0] if host_out else None

    @classmethod
    def from_gps(cls, gps):
        """Batch single-output GPs that share training inputs.

        E.g. the members of a per-dimension stack."""
        gps = list(gps)
        for gp in gps:
            if not isinstance(gp, GaussianProcess):
                raise TypeError("from_gps needs GaussianProcess members")
            if gp.output_dim != 1:
                raise ValueError("stack members must be single-output")
        x0 = gps[0].X
        for gp in gps[1:]:
            if not np.array_equal(np.asarray(gp.X), x0):
                raise ValueError(
                    "stack members must share training inputs")
            if gp.scale != gps[0].scale:
                raise ValueError("stack members must share `scale`")
        y = (np.column_stack([gp.Y[:, 0] for gp in gps])
             if len(x0) else np.empty((0, len(gps))))
        return cls([gp.kernel for gp in gps], x0, y,
                   noise_variances=np.array([float(gp.noise_variance)
                                             for gp in gps]),
                   betas=np.array([gp.beta for gp in gps]),
                   mean_functions=[gp.mean_function for gp in gps],
                   capacity=max(gp.capacity for gp in gps),
                   scale=gps[0].scale)

    def unstack(self):
        """Return the per-output views (inverse of :meth:`from_gps`).

        The views REUSE the stack's cached factors (sliced along the
        output axis) and its float64 host mirrors — no refactorization.
        """
        views = []
        hosts = getattr(self, "_host_caches", None) or (None,) * \
            self.num_fun
        for s in range(self.num_fun):
            fields = {
                "kernel": self.kernels[s],
                "beta": self.betas[s],
                "scale": self.scale,
                "input_dim": self.input_dim,
                "output_dim": 1,
                "mean_function": self.mean_functions[s],
                "noise_variance": jnp.asarray(self.noise_variances[s],
                                              dtype=config.dtype),
                "X_buf": self.X_buf,
                "Y_buf": self.Y_buf[:, s:s + 1],
                "count": self.count,
                "chol": self.chol[s],
                "chol_inv": self.chol_inv[s],
                "alpha": self.alpha[s],
            }
            gp = object.__new__(GaussianProcess)
            # Drift-proof: iterate the declared field lists so a future
            # GaussianProcess field missing here fails loudly.
            for name in (GaussianProcess._all_data_fields
                         + GaussianProcess._all_meta_fields):
                object.__setattr__(gp, name, fields.pop(name))
            if fields:
                raise AssertionError(
                    "unstack set unknown fields: {}".format(
                        sorted(fields)))
            object.__setattr__(gp, "_host_cache", hosts[s])
            views.append(gp)
        return views

    # -- data views -------------------------------------------------------
    @property
    def capacity(self):
        """Fixed buffer capacity available for online learning."""
        return int(self.X_buf.shape[0])

    @property
    def X(self):
        """Active observed inputs (host view)."""
        return np.asarray(self.X_buf)[:int(self.count)]

    @property
    def Y(self):
        """Active observed outputs (host view)."""
        return np.asarray(self.Y_buf)[:int(self.count)]

    def _mask(self):
        return (jnp.arange(self.capacity) < self.count).astype(
            self.X_buf.dtype)

    def _prior_means(self, points):
        """Stacked prior means, shape ``(len(points), num_fun)``."""
        cols = []
        zeros = None
        for fun in self.mean_functions:
            if fun is None:
                if zeros is None:
                    zeros = jnp.zeros((points.shape[0], 1),
                                      dtype=points.dtype)
                cols.append(zeros)
            else:
                cols.append(fun(points).reshape(-1, 1))
        return jnp.concatenate(cols, axis=1)

    # -- prediction -------------------------------------------------------
    def predict(self, points, full_cov=False):
        """Posterior mean and variance for every output.

        Returns ``(mean, var)`` with shapes ``(Q, num_fun)``, or — with
        ``full_cov=True`` — ``(mean, cov)`` where ``cov`` is
        ``(num_fun, Q, Q)`` (outputs are independent GPs, so the
        cross-output covariance is zero and omitted).

        On TPU all outputs run in ONE fused Pallas kernel sharing the
        query tile and per-dimension covariance work; elsewhere (or for
        kernels outside the compilable family) a per-output XLA matmul
        chain is used. ``full_cov`` always takes the XLA path (it is
        used for sampling on small discretizations, off the hot path).
        """
        points = jnp.atleast_2d(jnp.asarray(points))
        s2 = self.scale ** 2

        if full_cov:
            mask = self._mask()
            means, covs = [], []
            for s in range(self.num_fun):
                kx = (s2 * self.kernels[s](self.X_buf, points)
                      * mask[:, None])
                a = mxu_dot(self.chol_inv[s], kx)
                means.append(mxu_dot(a.T, self.alpha[s]) / self.scale)
                covs.append(self.kernels[s](points, points)
                            - mxu_dot(a.T, a) / s2)
            mean = (jnp.concatenate(means, axis=1)
                    + self._prior_means(points))
            return mean, jnp.stack(covs, axis=0)

        if (getattr(config, "use_pallas", True)
                and self.num_fun * self.capacity ** 2 <= getattr(
                    config, "pallas_max_capacity", 2048) ** 2):
            from ..ops.gp_kernel import (compile_kernel_program,
                                         fused_gp_predict_stacked,
                                         pallas_supported)

            if pallas_supported():
                params_list = []
                programs = []
                for kernel in self.kernels:
                    compiled = compile_kernel_program(
                        kernel, input_dim=self.input_dim,
                        params=params_list)
                    if compiled is None:
                        programs = None
                        break
                    program, params_list = compiled
                    programs.append(program)
                if programs is not None:
                    tile = _predict_tile(points.shape[0], self.capacity)
                    precision = getattr(config, "pallas_precision",
                                        "highest")
                    params = jnp.concatenate(
                        [jnp.asarray(p).reshape(-1)
                         for p in params_list]).astype(points.dtype)
                    mean_num, var_num = fused_gp_predict_stacked(
                        points, self.X_buf, params, self.chol_inv,
                        self.alpha[:, :, 0], self._mask(), s2,
                        tuple(programs), tile=tile, precision=precision)
                    mean = mean_num / self.scale \
                        + self._prior_means(points)
                    kdiag = jnp.stack([k.diag(points)
                                       for k in self.kernels], axis=1)
                    var = jnp.maximum(kdiag - var_num / s2, 1e-12)
                    return mean, var

        mask = self._mask()
        means, variances = [], []
        for s in range(self.num_fun):
            kx = s2 * self.kernels[s](self.X_buf, points) * mask[:, None]
            a = mxu_dot(self.chol_inv[s], kx)
            mean = mxu_dot(a.T, self.alpha[s]) / self.scale
            means.append(mean)
            var = (self.kernels[s].diag(points)
                   - jnp.sum(a * a, axis=0) / s2)
            variances.append(jnp.maximum(var, 1e-12))
        mean = jnp.concatenate(means, axis=1) + self._prior_means(points)
        return mean, jnp.stack(variances, axis=1)

    def evaluate(self, points):
        """Return ``(mean, beta_s * std_s)`` stacked over outputs."""
        mean, var = self.predict(points)
        betas = jnp.asarray(self.betas, dtype=var.dtype)
        return mean, betas * jnp.sqrt(var)

    # -- hyperparameter objective -----------------------------------------
    def log_marginal_likelihood(self, kernels=None, noise_variances=None):
        """Sum of the per-output exact log marginal likelihoods.

        Differentiable with respect to the kernel pytrees and noise
        variances (see :meth:`GaussianProcess.log_marginal_likelihood`).
        """
        kernels = self.kernels if kernels is None else kernels
        noises = (self.noise_variances if noise_variances is None
                  else jnp.asarray(noise_variances))
        total = 0.0
        for s in range(self.num_fun):
            fun = self.mean_functions[s]
            total = total + _log_marginal_likelihood(
                kernels[s], noises[s], self.X_buf,
                self.Y_buf[:, s:s + 1], fun, self.count)
        return total

    # -- online learning --------------------------------------------------
    def add_data_point(self, x, y):
        """Append measurement(s) of ALL outputs and refresh the caches.

        One buffer append replaces the reference's per-member fan-out
        (``functions.py:293-307``); returns a new instance. Uses the
        O(n^2) bordered Cholesky append per output when the float64 host
        mirrors are available (see :meth:`GaussianProcess.add_data_point`).
        """
        x = np.atleast_2d(np.asarray(x, dtype=config.np_dtype))
        y = np.atleast_2d(np.asarray(y, dtype=config.np_dtype))
        n_new = len(x)
        n = int(self.count)
        if n + n_new > self.capacity:
            return StackedGaussianProcess(
                self.kernels, np.vstack([self.X, x]),
                np.vstack([self.Y, y]), self.noise_variances,
                betas=np.asarray(self.betas),
                mean_functions=self.mean_functions,
                capacity=_round_capacity(n + n_new), scale=self.scale)
        x_dev, y_dev = _append_rows(self.X_buf, self.Y_buf,
                                    jnp.asarray(x), jnp.asarray(y),
                                    jnp.asarray(n, dtype=jnp.int32))
        new = self.replace(X_buf=x_dev, Y_buf=y_dev,
                           count=jnp.asarray(n + n_new, dtype=jnp.int32))

        hosts = getattr(self, "_host_caches", None)
        hosts_new = None
        if (hosts is not None and all(h is not None for h in hosts)
                and all(h.count == n for h in hosts)
                and getattr(config, "incremental_gp_updates", True)):
            hosts_new = []
            # One host fetch for ALL outputs' noise levels: passing
            # device-array elements into _bordered_append would force a
            # host-device sync per output (float(...) inside). Kernel
            # columns and priors are assembled on the host CPU in f64
            # (oracle-consistent) — zero device dispatches.
            noises = np.asarray(self.noise_variances, dtype=np.float64)
            for s in range(self.num_fun):
                updated = _bordered_append(
                    hosts[s], self.kernels[s], x, y[:, s:s + 1],
                    self.mean_functions[s], float(noises[s]),
                    self.scale, self.capacity)
                if updated is None:
                    hosts_new = None
                    break
                hosts_new.append(updated)
        if hosts_new is not None:
            # Stack on the host so the refreshed caches ride ONE upload
            # per tensor (three dispatches total) instead of
            # 3*num_fun uploads + device stacks — dispatch latency, not
            # bandwidth, dominates the online-learning loop.
            dtype = config.dtype
            chol = jnp.asarray(np.stack([h.chol for h in hosts_new]),
                               dtype=dtype)
            chol_inv = jnp.asarray(
                np.stack([h.chol_inv for h in hosts_new]), dtype=dtype)
            alpha = jnp.asarray(np.stack([h.alpha for h in hosts_new]),
                                dtype=dtype)
        else:
            host_out = []
            chol, chol_inv, alpha = _stacked_cache(new, host_out=host_out)
            hosts_new = host_out[0] if host_out else None
        new = new.replace(chol=chol, chol_inv=chol_inv, alpha=alpha)
        object.__setattr__(new, "_host_caches", hosts_new)
        return new


def _stacked_cache(gp, host_out=None):
    """Per-output Cholesky caches, stacked with a leading output axis:

    ``chol``/``chol_inv`` are ``(num_fun, cap, cap)``, ``alpha`` is
    ``(num_fun, cap, 1)``. When ``host_out`` is a list, the per-output
    float64 mirrors are appended to it (as one list)."""
    chols, chol_invs, alphas = [], [], []
    hosts = [] if host_out is not None else None
    for s in range(gp.num_fun):
        per_host = [] if hosts is not None else None
        chol, chol_inv, alpha = _cache_parts(
            gp.kernels[s], gp.X_buf, gp.Y_buf[:, s:s + 1],
            gp.mean_functions[s], gp.count, gp.noise_variances[s],
            gp.scale, host_out=per_host)
        if hosts is not None:
            hosts.append(per_host[0] if per_host else None)
        chols.append(chol)
        chol_invs.append(chol_inv)
        alphas.append(alpha)
    if host_out is not None:
        host_out.append(hosts)
    return (jnp.stack(chols), jnp.stack(chol_invs), jnp.stack(alphas))


def coerce_stacked(dynamics):
    """FunctionStack-of-GPs -> its batched StackedGaussianProcess twin.

    Anything else passes through unchanged. The batched twin is proven
    prediction-identical to the fan-out stack (``tests/test_gp.py``),
    so pipelines that need the batched layout (``ops/extended_verify``)
    accept the reference's per-dimension ``FunctionStack`` idiom
    (reference ``functions.py:254-307``) without hand-conversion.
    Members must share training inputs and ``scale``
    (:meth:`StackedGaussianProcess.from_gps` validates and raises
    otherwise).
    """
    from .base import FunctionStack

    if isinstance(dynamics, FunctionStack) and dynamics.functions and \
            all(isinstance(f, GaussianProcess)
                for f in dynamics.functions):
        return StackedGaussianProcess.from_gps(dynamics.functions)
    return dynamics


# ---------------------------------------------------------------------------
# Hyperparameter fitting
# ---------------------------------------------------------------------------
def fit_gp_hyperparameters(gp, steps=150, learning_rate=0.05,
                           optimize_noise=True, min_noise=None,
                           method="adam", bounds=None):
    """Fit kernel hyperparameters by maximizing the log marginal likelihood.

    Optimizes in log-space over every (positive) kernel leaf and,
    optionally, the noise variance — the capability the reference
    obtained through gpflow's ``optimize()`` behind
    ``functions.py:461-546`` (second-order scipy L-BFGS-B with positive
    transforms and optional bounds; its notebooks never called it). Two
    optimizers: ``method="adam"`` runs one jitted first-order step
    re-used across iterations (all on device); ``method="lbfgs"``
    mirrors gpflow — host-side ``scipy.optimize`` L-BFGS-B driven by the
    same jitted value-and-gradient, with optional box ``bounds`` on the
    kernel leaves. The returned GP has the fitted hyperparameters and a
    refreshed Cholesky cache.

    Parameters
    ----------
    gp : GaussianProcess
    steps : int
        Number of Adam steps / L-BFGS-B iteration cap.
    learning_rate : float
        Adam step size (ignored by L-BFGS-B).
    optimize_noise : bool
        Also fit the observation-noise variance.
    min_noise : float, optional
        Lower bound on the fitted noise variance (defaults to 1e-8 in
        float64 mode and 1e-6 in float32, where the on-device Cholesky
        inside the likelihood needs the better conditioning).
    method : {"adam", "lbfgs"}
    bounds : (lo, hi), optional
        Positive box constraint applied to EVERY kernel leaf in its
        original (not log) space — the gpflow-transform analogue for
        keeping a delicate marginal likelihood away from degenerate
        lengthscales. L-BFGS-B enforces it exactly; Adam clips after
        each step.

    Returns
    -------
    fitted : GaussianProcess
    history : ndarray
        Negative log marginal likelihood per step / L-BFGS-B evaluation.

    Notes
    -----
    A :class:`StackedGaussianProcess` is also accepted: its outputs are
    independent GPs, so each is fitted separately and re-batched; the
    returned history is the summed per-output NLL (padded with each
    member's final value when iteration counts differ).
    """
    if method not in ("adam", "lbfgs"):
        raise ValueError("method must be 'adam' or 'lbfgs', got "
                         + repr(method))
    if isinstance(gp, StackedGaussianProcess):
        fitted_members, histories = [], []
        for member in gp.unstack():
            fitted_member, history = fit_gp_hyperparameters(
                member, steps=steps, learning_rate=learning_rate,
                optimize_noise=optimize_noise, min_noise=min_noise,
                method=method, bounds=bounds)
            fitted_members.append(fitted_member)
            histories.append(history)
        width = max(len(h) for h in histories)
        histories = [np.concatenate([h, np.full(width - len(h),
                                                h[-1] if len(h) else 0.0)])
                     for h in histories]
        return (StackedGaussianProcess.from_gps(fitted_members),
                np.sum(histories, axis=0))

    if min_noise is None:
        min_noise = (1e-8 if np.dtype(config.np_dtype) == np.float64
                     else 1e-6)
    min_noise = jnp.asarray(min_noise, dtype=config.dtype)

    leaves, treedef = jax.tree_util.tree_flatten(gp.kernel)
    state = {
        "kernel": [jnp.log(jnp.maximum(leaf, 1e-12)) for leaf in leaves],
        "noise": jnp.log(jnp.maximum(gp.noise_variance - min_noise,
                                     1e-12)),
    }

    def unpack(state):
        """Rebuild (kernel, noise) from the flat log-parameters."""
        kernel = jax.tree_util.tree_unflatten(
            treedef, [jnp.exp(leaf) for leaf in state["kernel"]])
        noise = (min_noise + jnp.exp(state["noise"]) if optimize_noise
                 else gp.noise_variance)
        return kernel, noise

    def nll(state):
        """Negative log marginal likelihood of the flat parameters."""
        kernel, noise = unpack(state)
        return -_log_marginal_likelihood(kernel, noise, gp.X_buf,
                                         gp.Y_buf, gp.mean_function,
                                         gp.count)

    if method == "lbfgs":
        import scipy.optimize

        sizes = [int(np.prod(np.shape(leaf))) for leaf in state["kernel"]]
        shapes = [np.shape(leaf) for leaf in state["kernel"]]

        def to_vector(state):
            parts = [np.asarray(leaf, np.float64).ravel()
                     for leaf in state["kernel"]]
            parts.append(np.asarray(state["noise"],
                                    np.float64).reshape(1))
            return np.concatenate(parts)

        def from_vector(vec):
            out, off = [], 0
            for size, shape in zip(sizes, shapes):
                out.append(jnp.asarray(vec[off:off + size],
                                       dtype=config.dtype).reshape(shape))
                off += size
            return {"kernel": out,
                    "noise": jnp.asarray(vec[off], dtype=config.dtype)}

        value_and_grad = jax.jit(jax.value_and_grad(nll))
        history = []

        def objective(vec):
            loss, grads = value_and_grad(from_vector(vec))
            history.append(float(loss))
            return float(loss), to_vector(grads)

        box = None
        if bounds is not None:
            lo = float(np.log(max(float(bounds[0]), 1e-12)))
            hi = float(np.log(float(bounds[1])))
            box = [(lo, hi)] * sum(sizes) + [(None, None)]
        elif not optimize_noise:
            box = [(None, None)] * (sum(sizes) + 1)
        if not optimize_noise and box is not None:
            x0_noise = float(np.asarray(state["noise"], np.float64))
            box[-1] = (x0_noise, x0_noise)  # pin the noise coordinate

        result = scipy.optimize.minimize(
            objective, to_vector(state), jac=True, method="L-BFGS-B",
            bounds=box, options={"maxiter": int(steps)})
        state = from_vector(result.x)
        kernel, noise = unpack(state)
        fitted = gp.replace(kernel=kernel,
                            noise_variance=jnp.asarray(
                                noise, dtype=config.dtype))
        chol, chol_inv, alpha = _gp_cache(fitted)
        return (fitted.replace(chol=chol, chol_inv=chol_inv,
                               alpha=alpha), np.asarray(history))

    def clip_kernel(state):
        """Project the kernel leaves onto the (log-space) box."""
        if bounds is None:
            return state
        lo = jnp.log(jnp.asarray(max(float(bounds[0]), 1e-12),
                                 dtype=config.dtype))
        hi = jnp.log(jnp.asarray(float(bounds[1]), dtype=config.dtype))
        return {"kernel": [jnp.clip(leaf, lo, hi)
                           for leaf in state["kernel"]],
                "noise": state["noise"]}

    try:
        import optax

        opt = optax.adam(learning_rate)
    except ImportError:  # pragma: no cover - optax is baked in
        opt = None

    if opt is not None:
        opt_state = opt.init(state)

        @jax.jit
        def step(state, opt_state):
            loss, grads = jax.value_and_grad(nll)(state)
            updates, opt_state = opt.update(grads, opt_state)
            return (clip_kernel(optax.apply_updates(state, updates)),
                    opt_state, loss)

        history = np.empty(steps)
        for i in range(steps):
            state, opt_state, loss = step(state, opt_state)
            history[i] = float(loss)
    else:
        @jax.jit
        def step(state):
            loss, grads = jax.value_and_grad(nll)(state)
            new = jax.tree_util.tree_map(
                lambda w, g: w - learning_rate * g, state, grads)
            return clip_kernel(new), loss

        history = np.empty(steps)
        for i in range(steps):
            state, loss = step(state)
            history[i] = float(loss)

    kernel, noise = unpack(state)
    fitted = gp.replace(kernel=kernel,
                        noise_variance=jnp.asarray(noise,
                                                   dtype=config.dtype))
    chol, chol_inv, alpha = _gp_cache(fitted)
    return fitted.replace(chol=chol, chol_inv=chol_inv,
                          alpha=alpha), history


# ---------------------------------------------------------------------------
# Posterior function sampling
# ---------------------------------------------------------------------------
@register_pytree
class GPSampledFunction(DeterministicFunction):
    """A consistent posterior sample, evaluable anywhere.

    The reference interpolates the sampled values with *prior*-kernel
    regression against the posterior covariance
    (``functions.py:1638-1662``), which is only consistent for data-free
    GPs. Here the sample is interpolated with the *posterior* covariance:

        ``f(x) = m_post(x)
        + Cov_post(x, D) Cov_post(D, D)^{-1} (s - m_post(D))``

    which exactly reproduces the sampled values on the discretization and
    respects the GP's observed data everywhere. Calling the function
    returns noiseless values; pass ``noise_key`` for a noisy measurement.
    """

    _data_fields = ("gp", "points", "a_disc", "alpha")
    _meta_fields = ("input_dim",)

    output_dim = 1

    def __init__(self, gp, points, a_disc, alpha):
        self.gp = gp
        self.points = jnp.asarray(points)
        self.a_disc = jnp.asarray(a_disc)
        self.alpha = jnp.asarray(alpha)
        self.input_dim = int(self.points.shape[1])

    @property
    def noise_variance(self):
        """Observation-noise variance of the sampled GP."""
        return self.gp.noise_variance

    def __call__(self, *points, noise_key=None):
        """Evaluate (see class docstring)."""
        from .base import concatenate_inputs

        merged = concatenate_inputs(*points)
        values = self.evaluate(merged)
        if noise_key is not None:
            values = values + (jnp.sqrt(self.noise_variance)
                               * jax.random.normal(noise_key, values.shape,
                                                   values.dtype))
        return values

    def evaluate(self, points):
        """Evaluate the function at ``points``."""
        gp = self.gp
        points = jnp.atleast_2d(jnp.asarray(points))
        s2 = gp.scale ** 2
        mask = gp._mask()
        kx = s2 * gp.kernel(gp.X_buf, points) * mask[:, None]
        a_x = mxu_dot(gp.chol_inv, kx)
        mean = mxu_dot(a_x.T, gp.alpha) / gp.scale \
            + gp._prior_mean(points)
        cross = gp.kernel(points, self.points) \
            - mxu_dot(a_x.T, self.a_disc) / s2
        return mean + mxu_dot(cross, self.alpha)


@register_pytree
class StackedSampledFunction(DeterministicFunction):
    """Stacked per-output posterior samples of a stacked GP.

    Per-output samples of a :class:`StackedGaussianProcess`, combined
    into one multi-output deterministic function.

    Members are :class:`GPSampledFunction` draws from the independent
    per-output posteriors; evaluation concatenates them along the output
    axis, mirroring the reference's ``FunctionStack``-of-samples pattern
    for synthetic "true dynamics" (``functions.py:254-307, 1586-1662``).
    """

    _data_fields = ("members",)
    _meta_fields = ("input_dim", "output_dim")

    def __init__(self, members):
        self.members = tuple(members)
        self.input_dim = self.members[0].input_dim
        self.output_dim = len(self.members)

    def __call__(self, *points, noise_key=None):
        """Evaluate (see class docstring)."""
        from .base import concatenate_inputs

        merged = concatenate_inputs(*points)
        if noise_key is None:
            keys = (None,) * len(self.members)
        else:
            keys = jax.random.split(noise_key, len(self.members))
        return jnp.concatenate(
            [m(merged, noise_key=k)
             for m, k in zip(self.members, keys)], axis=1)

    def evaluate(self, points):
        """Evaluate the function at ``points``."""
        return jnp.concatenate(
            [m.evaluate(points) for m in self.members], axis=1)


def sample_gp_function(discretization, gp, key, number=1,
                       return_function=True, jitter=0.0, cut_rel=None):
    """Draw exact posterior sample(s) of a GP on a discretization.

    Reference ``functions.py:1586-1662``: full-covariance posterior predict,
    multivariate-normal draw, and (optionally) a callable that interpolates
    each sample consistently (see :class:`GPSampledFunction`).

    The draw itself is a float64 island (once per sample; off the hot
    path), and — new in round 3 — it is **dtype-lane independent**: the
    full-covariance posterior is computed in float64 on the CPU backend
    from float64-lifted inputs (``oracle.lift64`` rebuilds the GP's
    factorization in f64; grid discretizations contribute their exact
    f64 coordinates via ``GridWorld.all_points_f64``), and the standard
    normals are drawn in a pinned dtype. A float32 session and a float64
    session with the same key therefore sample the same hidden system up
    to the f32 rounding of the stored hyperparameters (bit-identical
    when those are f32-representable) — previously the two lanes fed the
    eigendecomposition working-dtype covariances whose near-degenerate
    eigenspaces diverged chaotically between lanes.

    Why an eigendecomposition: the posterior covariance of a smooth
    kernel on a dense discretization is numerically rank-deficient — its
    spectrum decays below single precision — so a Cholesky needs large
    jitter. Instead the spectrum is **truncated** at ``cut_rel * w_max``:
    the sampled deviation then lives entirely in the well-conditioned
    eigenspace, which keeps the interpolation coefficients
    ``alpha = C⁺ deviation`` small (``O(w_cut^{-1/2})`` instead of
    ``O(w_min^{-1/2})``) so the f32 reconstruction ``cross @ alpha``
    reproduces the sample to ~1e-5 rather than ~1e-2. ``jitter`` is
    added to the kept eigenvalues (API compatibility; 0 is correct with
    truncation).
    """
    if isinstance(discretization, GridWorld):
        points64 = discretization.all_points_f64
    else:
        points64 = np.asarray(discretization, dtype=np.float64)
    discretization = jnp.asarray(points64, dtype=config.dtype)

    if isinstance(gp, StackedGaussianProcess):
        keys = jax.random.split(key, gp.num_fun)
        per_out = [sample_gp_function(points64, member, k, number,
                                      return_function, jitter, cut_rel)
                   for member, k in zip(gp.unstack(), keys)]
        if not return_function:
            return np.stack(per_out, axis=-1)
        return [StackedSampledFunction([per_out[s][i]
                                        for s in range(gp.num_fun)])
                for i in range(number)]

    from ..oracle import _oracle_env, lift64

    host_dtype = np.dtype(config.solve_dtype or np.float64)
    with _oracle_env():
        gp64 = lift64(gp)
        mean, cov = gp64.predict(jnp.asarray(points64,
                                             dtype=jnp.float64),
                                 full_cov=True)
        mean64 = np.asarray(mean, dtype=host_dtype)[:, 0]
        cov64 = np.asarray(cov, dtype=host_dtype)
    cov64 = 0.5 * (cov64 + cov64.T)
    w, v = np.linalg.eigh(cov64)
    if cut_rel is None:
        # ONE default for both lanes: a lane-dependent cut would keep a
        # different spectral band per dtype and the lanes would sample
        # different systems (measured 0.8 divergence on a Matern
        # composite whose spectrum decays slowly). 1e-6 is what the f32
        # reconstruction ``cross @ alpha`` can represent downstream
        # (alpha ~ w_cut^{-1/2} amplifies f32 rounding of the cross
        # covariance); float64 sessions wanting more fidelity pass
        # ``cut_rel`` explicitly.
        cut_rel = 1e-6
    w_max = max(float(w[-1]), 0.0)
    keep = w > cut_rel * w_max
    wr = w[keep] + float(jitter)
    vr = v[:, keep]

    # Pinned-dtype normals: identical bits in the f32 and f64 lanes for
    # the same key. Draw the full discretization's worth and pair each
    # normal with its ABSOLUTE eigen position (not position relative to
    # the cut): if a last-ulp covariance difference flips one borderline
    # eigenvalue across the cut in one lane, only that eigenpair's
    # contribution differs — relative indexing would shift every
    # normal-to-eigenvector pairing and the lanes would sample
    # completely different systems.
    z_full = np.asarray(jax.random.normal(key, (number, len(points64)),
                                          dtype=jnp.float32),
                        dtype=np.float64)
    z = z_full[:, keep]
    samples = mean64[None, :] + z @ (np.sqrt(wr)[:, None] * vr.T)

    if not return_function:
        return np.asarray(samples, dtype=config.np_dtype)

    # alpha_i = C⁺ (sample_i - mean) = vr (z_i / sqrt(wr)).
    alphas = (z / np.sqrt(wr)) @ vr.T

    # Posterior cross-covariance helper term for the discretization.
    s2 = gp.scale ** 2
    mask = gp._mask()
    k_disc = s2 * gp.kernel(gp.X_buf, discretization) * mask[:, None]
    a_disc = mxu_dot(gp.chol_inv, k_disc)

    functions = []
    for i in range(number):
        alpha = jnp.asarray(alphas[i][:, None], dtype=config.dtype)
        functions.append(GPSampledFunction(gp, discretization, a_disc,
                                           alpha))
    return functions
