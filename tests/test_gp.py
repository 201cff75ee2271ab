"""Tests for the GP stack (mirrors reference test_functions.py:150-261:
cached predictions equal a from-scratch GP before/after data updates,
pinned posterior values)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from safe_learning_tpu import (FunctionStack, GaussianProcess, LinearKernel,
                               Matern32, RBF, sample_gp_function)
from safe_learning_tpu.grids import GridWorld


def _scipy_gp_reference(kernel_fn, x, y, noise, q):
    """Oracle: textbook GP posterior with numpy/scipy."""
    import scipy.linalg

    k = np.asarray(kernel_fn(x, x))
    a = k + noise * np.eye(len(x))
    l = scipy.linalg.cholesky(a, lower=True)
    alpha = scipy.linalg.cho_solve((l, True), y)
    kq = np.asarray(kernel_fn(x, q))
    mean = kq.T @ alpha
    v = scipy.linalg.solve_triangular(l, kq, lower=True)
    var = np.asarray(kernel_fn(q, q)).diagonal() - np.sum(v ** 2, axis=0)
    return mean, var


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, size=(7, 2))
    y = np.sin(3 * x[:, :1]) + 0.1 * rng.normal(size=(7, 1))
    q = rng.uniform(-1, 1, size=(11, 2))
    return x, y, q


@pytest.mark.parametrize("kernel_cls", [RBF, Matern32])
def test_posterior_matches_textbook(data, kernel_cls):
    x, y, q = data
    kern = kernel_cls(variance=1.7, lengthscales=[0.6, 0.9], input_dim=2)
    noise = 0.05
    gp = GaussianProcess(kern, x, y, noise)
    mean, var = map(np.asarray, gp.predict(q))
    ref_mean, ref_var = _scipy_gp_reference(kern, x, y, noise, q)
    assert_allclose(mean, ref_mean, atol=1e-8)
    assert_allclose(var[:, 0], ref_var, atol=1e-8)


def test_confidence_interval_contract(data):
    x, y, q = data
    gp = GaussianProcess(RBF(1.0, 0.5, input_dim=2), x, y, 0.01, beta=3.0)
    mean, err = gp(q)
    _, var = gp.predict(q)
    assert_allclose(np.asarray(err), 3.0 * np.sqrt(np.asarray(var)),
                    atol=1e-10)


def test_scale_trick_invariance(data):
    """The internal conditioning scale must not change predictions
    (reference functions.py:399-411, 454-456)."""
    x, y, q = data
    kern = RBF(1.0, 0.7, input_dim=2)
    gp1 = GaussianProcess(kern, x, y, 1e-4, scale=1.0)
    gp2 = GaussianProcess(kern, x, y, 1e-4, scale=10.0)
    m1, v1 = map(np.asarray, gp1.predict(q))
    m2, v2 = map(np.asarray, gp2.predict(q))
    assert_allclose(m1, m2, atol=1e-7)
    assert_allclose(v1, v2, atol=1e-7)


def test_add_data_point_matches_fresh_fit(data):
    """Online update == retrain from scratch
    (reference test_functions.py:150-199)."""
    x, y, q = data
    kern = RBF(1.3, [0.5, 0.8], input_dim=2)
    noise = 0.03
    gp = GaussianProcess(kern, x[:5], y[:5], noise)
    gp = gp.add_data_point(x[5], y[5])
    gp = gp.add_data_point(x[6], y[6])
    fresh = GaussianProcess(kern, x, y, noise)
    m1, v1 = map(np.asarray, gp.predict(q))
    m2, v2 = map(np.asarray, fresh.predict(q))
    assert_allclose(m1, m2, atol=1e-8)
    assert_allclose(v1, v2, atol=1e-8)
    assert gp.X.shape == (7, 2)


def test_capacity_growth(data):
    x, y, _ = data
    gp = GaussianProcess(RBF(1.0, 0.5, input_dim=2), x[:2], y[:2], 0.01,
                         capacity=2)
    for i in range(2, 7):
        gp = gp.add_data_point(x[i], y[i])
    assert gp.capacity >= 7
    fresh = GaussianProcess(RBF(1.0, 0.5, input_dim=2), x, y, 0.01)
    q = np.array([[0.1, -0.2]])
    assert_allclose(np.asarray(gp.predict(q)[0]),
                    np.asarray(fresh.predict(q)[0]), atol=1e-8)


def test_full_cov(data):
    x, y, q = data
    gp = GaussianProcess(RBF(1.0, 0.5, input_dim=2), x, y, 0.01)
    mean, cov = map(np.asarray, gp.predict(q, full_cov=True))
    _, var = map(np.asarray, gp.predict(q))
    assert cov.shape == (11, 11)
    assert_allclose(np.diag(cov), var[:, 0], atol=1e-8)
    # Covariance is symmetric PSD.
    assert_allclose(cov, cov.T, atol=1e-10)
    assert np.linalg.eigvalsh(cov).min() > -1e-8


def test_linear_kernel():
    x = np.array([[1.0, 2.0], [0.5, -1.0]])
    kern = LinearKernel([2.0, 3.0], input_dim=2)
    k = np.asarray(kern(x, x))
    expected = (x * [2.0, 3.0]) @ x.T
    assert_allclose(k, expected)
    assert_allclose(np.asarray(kern.diag(x)), np.diag(expected))


def test_kernel_algebra(data):
    x, _, q = data
    k1 = RBF(1.0, 0.5, input_dim=2)
    k2 = LinearKernel(0.3, input_dim=2)
    assert_allclose(np.asarray((k1 + k2)(x, q)),
                    np.asarray(k1(x, q)) + np.asarray(k2(x, q)))
    assert_allclose(np.asarray((k1 * k2)(x, q)),
                    np.asarray(k1(x, q)) * np.asarray(k2(x, q)))


def test_function_stack_gp(data):
    """One GP per output dim (reference FunctionStack usage)."""
    x, y, q = data
    y2 = np.hstack([y, -y])
    gps = [GaussianProcess(RBF(1.0, 0.5, input_dim=2), x, y2[:, i:i + 1],
                           0.01) for i in range(2)]
    stack = FunctionStack(gps)
    mean, err = stack(q)
    assert mean.shape == (11, 2)
    assert_allclose(np.asarray(mean[:, 0]), -np.asarray(mean[:, 1]),
                    atol=1e-8)
    stack2 = stack.add_data_point(q[:1], np.array([[0.5, -0.5]]))
    assert stack2.functions[0].X.shape[0] == 8


def test_sample_gp_function():
    """Posterior samples interpolate their own values consistently
    (reference functions.py:1586-1662)."""
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, size=(5, 1))
    y = np.sin(2 * x)
    gp = GaussianProcess(RBF(1.0, 0.4, input_dim=1), x, y, 1e-6)
    grid = GridWorld([[-1, 1]], 31)

    key = jax.random.PRNGKey(0)
    raw = sample_gp_function(grid, gp, key, number=2, return_function=False)
    assert raw.shape == (2, 31)

    funs = sample_gp_function(grid, gp, key, number=2)
    vals = np.asarray(funs[0](grid.all_points))
    # The closure regenerates (approximately) the sampled values.
    assert_allclose(vals[:, 0], raw[0], atol=1e-3)
    # Noisy evaluation differs but stays close at small noise.
    noisy = np.asarray(funs[0](grid.all_points,
                               noise_key=jax.random.PRNGKey(1)))
    assert not np.allclose(noisy, vals)
    assert_allclose(noisy, vals, atol=1e-2)
    # Samples pass near the training data (tiny observation noise).
    at_data = np.asarray(funs[0](x))
    assert_allclose(at_data, y, atol=0.15)


def test_f32_mode_host_cache_precision():
    """In float32 mode the cache is factorized on the host in float64, so
    small noise variances keep full predictive accuracy (the TPU default
    path; pure-f32 Cholesky loses ~1e-2 at noise 1e-4)."""
    import jax.numpy as jnp

    from safe_learning_tpu.config import config

    rng = np.random.default_rng(0)
    x = rng.uniform(-2, 2, size=(24, 2))
    y = np.sin(x.sum(axis=1, keepdims=True))
    q = rng.uniform(-2, 2, size=(64, 2))

    kernel64 = RBF(variance=1.3, lengthscales=[0.7, 1.1], input_dim=2)
    gp64 = GaussianProcess(kernel64, x, y, noise_variance=1e-6)
    mean64, var64 = map(np.asarray, gp64.predict(q))

    config.dtype = jnp.float32
    try:
        kernel32 = RBF(variance=1.3, lengthscales=[0.7, 1.1], input_dim=2)
        gp32 = GaussianProcess(kernel32, x, y, noise_variance=1e-6)
        mean32, var32 = map(np.asarray, gp32.predict(q))
    finally:
        config.dtype = None

    assert gp32.chol_inv.dtype == jnp.float32
    assert_allclose(mean32, mean64, atol=5e-4)
    assert_allclose(var32, var64, atol=5e-4)
    resid = np.abs(np.asarray(gp32.predict(x)[0], dtype=np.float64) - y)
    assert resid.max() < 1e-3


def test_active_dims_kernel():
    """ActiveDims restricts a kernel to input columns (gpflow
    active_dims equivalent)."""
    from safe_learning_tpu.functions.gp import ActiveDims

    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, 3))
    z = rng.normal(size=(4, 3))
    base = Matern32(variance=0.7, lengthscales=0.9, input_dim=1)
    wrapped = ActiveDims(base, dims=[1])
    assert_allclose(np.asarray(wrapped(x, z)),
                    np.asarray(base(x[:, 1:2], z[:, 1:2])))
    assert_allclose(np.asarray(wrapped.diag(x)),
                    np.asarray(base.diag(x[:, 1:2])))

    # Product of two ActiveDims kernels over different dims.
    lin = ActiveDims(LinearKernel(variances=2.0, input_dim=1), dims=[0])
    product = wrapped * lin
    expected = (np.asarray(base(x[:, 1:2], z[:, 1:2]))
                * np.asarray(LinearKernel(variances=2.0, input_dim=1)(
                    x[:, :1], z[:, :1])))
    assert_allclose(np.asarray(product(x, z)), expected)


def test_log_marginal_likelihood_matches_textbook():
    """LML equals the unpadded textbook expression and is differentiable
    wrt the kernel pytree."""
    import scipy.linalg

    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, size=(17, 2))
    y = np.sin(x[:, :1]) + 0.1 * rng.normal(size=(17, 1))
    variance, ls, noise = 0.8, np.array([0.6, 1.1]), 1e-3
    gp = GaussianProcess(RBF(variance, ls, input_dim=2), x, y,
                         noise_variance=noise)

    d = (x[:, None, :] / ls - x[None, :, :] / ls)
    k = variance * np.exp(-0.5 * np.sum(d ** 2, axis=2)) \
        + noise * np.eye(len(x))
    chol = scipy.linalg.cholesky(k, lower=True)
    alpha = scipy.linalg.solve_triangular(chol, y, lower=True)
    expected = (-0.5 * np.sum(alpha ** 2)
                - np.sum(np.log(np.diag(chol)))
                - 0.5 * len(x) * np.log(2 * np.pi))
    assert_allclose(float(gp.log_marginal_likelihood()), expected,
                    rtol=1e-10)

    # Padding invariance: a larger capacity gives the same LML.
    gp_padded = GaussianProcess(RBF(variance, ls, input_dim=2), x, y,
                                noise_variance=noise, capacity=64)
    assert_allclose(float(gp_padded.log_marginal_likelihood()), expected,
                    rtol=1e-10)

    # Gradient wrt kernel hyperparameters: matches finite differences.
    def nll(kern):
        return -gp.log_marginal_likelihood(kernel=kern)

    grads = jax.grad(nll)(gp.kernel)
    eps = 1e-6
    k_plus = RBF(variance + eps, ls, input_dim=2)
    k_minus = RBF(variance - eps, ls, input_dim=2)
    fd = (float(nll(k_plus)) - float(nll(k_minus))) / (2 * eps)
    assert_allclose(float(grads.variance), fd, rtol=1e-4)

    # One gradient step on the variance increases the likelihood.
    new_var = float(gp.kernel.variance) - 1e-3 * float(grads.variance)
    gp2 = GaussianProcess(RBF(new_var, ls, input_dim=2), x, y,
                          noise_variance=noise)
    assert float(gp2.log_marginal_likelihood()) \
        >= float(gp.log_marginal_likelihood())


def test_reference_pinned_posterior_values():
    """Golden regression ported from the reference
    (``/root/reference/safe_learning/tests/test_functions.py:237-261``):
    gpflow-0.4 GPR with an RBF kernel (variance 1, lengthscale 1, noise
    variance 1 — the gpflow defaults), data ``[[1,0],[0,1]]`` ->
    ``[[0],[1]]`` plus an online-added point ``[1.2,2.3] -> 2.4``, and
    beta=2 confidence intervals. The pinned posterior must match to 1e-7.
    """
    x = np.array([[1.0, 0.0], [0.0, 1.0]])
    y = np.array([[0.0], [1.0]])
    gp = GaussianProcess(RBF(1.0, [1.0, 1.0], input_dim=2), x, y,
                         noise_variance=1.0, beta=2.0)
    gp = gp.add_data_point(np.array([[1.2, 2.3]]), np.array([[2.4]]))
    assert_allclose(gp.X, np.array([[1, 0], [0, 1], [1.2, 2.3]]))
    assert_allclose(gp.Y, np.array([[0], [1], [2.4]]))

    test_points = np.array([[0.9, 0.1], [3.0, 2.0]])
    mean, error = map(np.asarray, gp(test_points))
    assert_allclose(mean, np.array([[0.16371139], [0.22048311]]),
                    atol=1e-7)
    assert_allclose(error, np.array([[1.37678679], [1.98183191]]),
                    atol=1e-7)

    # Multiple-argument call (concatenate_inputs) gives identical results
    # (reference test_evaluation, test_functions.py:214-233).
    mean2, error2 = map(np.asarray, gp(test_points[:, [0]],
                                       test_points[:, [1]]))
    assert_allclose(mean, mean2)
    assert_allclose(error, error2)


def test_fit_hyperparameters_recovers_lengthscales():
    """Gradient fitting of the log marginal likelihood recovers the
    generating lengthscales from synthetic data (the gpflow ``optimize``
    capability behind reference functions.py:461-546)."""
    from safe_learning_tpu import fit_gp_hyperparameters

    rng = np.random.default_rng(0)
    x = rng.uniform(-3, 3, size=(160, 2))
    true_ls = np.array([0.5, 2.0])
    d = x[:, None, :] / true_ls - x[None, :, :] / true_ls
    k = 1.0 * np.exp(-0.5 * np.sum(d ** 2, axis=2))
    chol = np.linalg.cholesky(k + 1e-10 * np.eye(len(x)))
    y = (chol @ rng.standard_normal(len(x)))[:, None]
    y += 0.05 * rng.standard_normal(y.shape)

    gp = GaussianProcess(RBF(0.5, [1.0, 1.0], input_dim=2), x, y,
                         noise_variance=0.1)
    fitted, history = fit_gp_hyperparameters(gp, steps=300,
                                             learning_rate=0.05)
    # The optimizer made consistent progress...
    assert history[-1] < history[0] - 10.0
    # ... and recovered both ARD lengthscales and the noise level.
    ls = np.asarray(fitted.kernel.lengthscales)
    assert_allclose(ls, true_ls, rtol=0.35)
    assert ls[1] > 2.5 * ls[0]
    assert float(fitted.noise_variance) < 0.02
    # The fitted GP predicts the training data better than the initial.
    resid0 = np.abs(np.asarray(gp.predict(x)[0]) - y).mean()
    resid1 = np.abs(np.asarray(fitted.predict(x)[0]) - y).mean()
    assert resid1 < resid0


def test_fit_hyperparameters_lbfgs_matches_adam_and_respects_bounds():
    """L-BFGS-B fitting (the gpflow ``optimize()`` second-order mode,

    reference functions.py:461-546) reaches at least Adam's likelihood
    on the same instance, converges in far fewer evaluations, and
    enforces box bounds on the kernel leaves exactly."""
    from safe_learning_tpu import fit_gp_hyperparameters

    rng = np.random.default_rng(4)
    x = rng.uniform(-3, 3, size=(120, 2))
    true_ls = np.array([0.6, 1.8])
    d = x[:, None, :] / true_ls - x[None, :, :] / true_ls
    k = np.exp(-0.5 * np.sum(d ** 2, axis=2))
    y = (np.linalg.cholesky(k + 1e-10 * np.eye(len(x)))
         @ rng.standard_normal(len(x)))[:, None]
    y += 0.05 * rng.standard_normal(y.shape)

    gp = GaussianProcess(RBF(0.5, [1.0, 1.0], input_dim=2), x, y,
                         noise_variance=0.1)
    fitted_adam, hist_adam = fit_gp_hyperparameters(gp, steps=300,
                                                    learning_rate=0.05)
    fitted, hist = fit_gp_hyperparameters(gp, steps=100, method="lbfgs")
    assert hist[-1] <= hist_adam[-1] + 1.0  # same optimum (or better)
    assert len(hist) < len(hist_adam)  # second-order convergence
    ls = np.asarray(fitted.kernel.lengthscales)
    assert_allclose(ls, true_ls, rtol=0.35)

    # Bounds: constrain every kernel leaf into [0.9, 1.5]; the fitted
    # lengthscales must sit inside (the unconstrained optimum ~0.6 for
    # dim 0 lands exactly ON the lower edge).
    bounded, _ = fit_gp_hyperparameters(gp, steps=100, method="lbfgs",
                                        bounds=(0.9, 1.5))
    ls_b = np.asarray(bounded.kernel.lengthscales)
    var_b = float(bounded.kernel.variance)
    eps = 1e-6
    assert np.all(ls_b >= 0.9 - eps) and np.all(ls_b <= 1.5 + eps)
    assert 0.9 - eps <= var_b <= 1.5 + eps
    assert abs(ls_b[0] - 0.9) < 0.05  # pushed against the lower bound

    # method="lbfgs" on a stack fits every member (summed history).
    from safe_learning_tpu import StackedGaussianProcess

    stacked = StackedGaussianProcess.from_gps(
        [GaussianProcess(RBF(0.5, [1.0, 1.0], input_dim=2), x,
                         y * s, 0.1) for s in (1.0, -0.5)])
    fitted_st, hist_st = fit_gp_hyperparameters(stacked, steps=60,
                                                method="lbfgs")
    assert hist_st[-1] < hist_st[0]


# ---------------------------------------------------------------------------
# StackedGaussianProcess (batched per-dim GPs over shared inputs)
# ---------------------------------------------------------------------------
def _pendulum_style_members(rng, n=9):
    """Two single-output GPs with the notebooks' composite kernels, a
    linear prior mean each, and shared training inputs."""
    from safe_learning_tpu import LinearSystem, StackedGaussianProcess
    from safe_learning_tpu.functions.gp import ActiveDims

    x = rng.uniform(-1, 1, size=(n, 3))
    y = np.column_stack([np.sin(2 * x[:, 0]) + 0.3 * x[:, 2],
                         np.cos(x[:, 1]) - 0.2 * x[:, 2]])
    gps = []
    for dim in range(2):
        kernel = (LinearKernel(variances=[0.3, 0.1, 0.4 + 0.1 * dim],
                               input_dim=3)
                  + ActiveDims(Matern32(variance=1.0,
                                        lengthscales=0.8 + 0.2 * dim,
                                        input_dim=1), dims=[0])
                  * ActiveDims(LinearKernel(variances=0.4, input_dim=1),
                               dims=[0]))
        mean = LinearSystem([[0.9, 0.1 * dim, 0.05]])
        gps.append(GaussianProcess(kernel, x, y[:, dim:dim + 1],
                                   noise_variance=1e-4 * (1 + dim),
                                   beta=2.0 + dim, mean_function=mean))
    return gps, StackedGaussianProcess.from_gps(gps)


def test_stacked_gp_matches_function_stack():
    """The batched stack reproduces the per-member FunctionStack exactly
    (same kernels, data, priors, betas) — SURVEY.md section 7's
    "FunctionStack of per-dim GPs => one batched GP" translation."""
    rng = np.random.default_rng(4)
    gps, stacked = _pendulum_style_members(rng)
    fan_out = FunctionStack(gps)
    q = rng.uniform(-1, 1, size=(33, 3))

    mean_s, err_s = map(np.asarray, stacked(q))
    mean_f, err_f = map(np.asarray, fan_out(q))
    assert mean_s.shape == (33, 2)
    assert_allclose(mean_s, mean_f, atol=1e-9)
    assert_allclose(err_s, err_f, atol=1e-9)

    # predict() exposes per-output variances with per-output betas.
    _, var_s = map(np.asarray, stacked.predict(q))
    assert_allclose(err_s, np.array(stacked.betas) * np.sqrt(var_s),
                    atol=1e-12)


def test_stacked_gp_add_data_point():
    """One buffer append == the FunctionStack's per-member fan-out."""
    rng = np.random.default_rng(5)
    gps, stacked = _pendulum_style_members(rng)
    fan_out = FunctionStack(gps)
    q = rng.uniform(-1, 1, size=(17, 3))

    x_new = rng.uniform(-1, 1, size=(2, 3))
    y_new = rng.normal(size=(2, 2))
    stacked2 = stacked.add_data_point(x_new, y_new)
    fan_out2 = fan_out.add_data_point(x_new, y_new)
    assert int(stacked2.count) == int(stacked.count) + 2
    mean_s, err_s = map(np.asarray, stacked2(q))
    mean_f, err_f = map(np.asarray, fan_out2(q))
    assert_allclose(mean_s, mean_f, atol=1e-9)
    assert_allclose(err_s, err_f, atol=1e-9)

    # Growth past capacity keeps state intact.
    grow = stacked2.add_data_point(
        rng.uniform(-1, 1, size=(stacked2.capacity, 3)),
        rng.normal(size=(stacked2.capacity, 2)))
    assert grow.capacity > stacked2.capacity
    assert int(grow.count) == int(stacked2.count) + stacked2.capacity


def test_stacked_gp_unstack_roundtrip():
    """from_gps -> unstack reproduces the members' posteriors."""
    rng = np.random.default_rng(6)
    gps, stacked = _pendulum_style_members(rng)
    q = rng.uniform(-1, 1, size=(9, 3))
    for orig, back in zip(gps, stacked.unstack()):
        m0, v0 = map(np.asarray, orig.predict(q))
        m1, v1 = map(np.asarray, back.predict(q))
        assert_allclose(m1, m0, atol=1e-9)
        assert_allclose(v1, v0, atol=1e-9)

    # Mismatched training inputs are rejected.
    from safe_learning_tpu import StackedGaussianProcess

    other = GaussianProcess(RBF(1.0, 1.0, input_dim=3),
                            rng.uniform(-1, 1, size=(9, 3)),
                            rng.normal(size=(9, 1)), 1e-4)
    with pytest.raises(ValueError):
        StackedGaussianProcess.from_gps([gps[0], other])


def test_stacked_gp_in_lyapunov_sweep():
    """The stacked GP drives a full update_safe_set like the fan-out
    stack (the flagship pendulum configuration)."""
    from safe_learning_tpu import (GridWorld, Lyapunov, QuadraticFunction,
                                   Saturation, LinearSystem)

    rng = np.random.default_rng(7)
    gps, stacked = _pendulum_style_members(rng)
    grid = GridWorld([[-0.5, 0.5], [-0.5, 0.5]], 21)
    policy = Saturation(LinearSystem([[-0.4, -0.6]]), -1.0, 1.0)
    v = QuadraticFunction(np.array([[1.0, 0.1], [0.1, 1.0]]))

    results = []
    for dyn in (stacked, FunctionStack(gps)):
        lyap = Lyapunov(grid, v, dyn, lipschitz_dynamics=0.9,
                        lipschitz_lyapunov=2.0, tau=0.01, policy=policy,
                        initial_set=[grid.nindex // 2])
        lyap.update_safe_set()
        results.append((lyap.safe_set.copy(), lyap.c_max))
    assert np.array_equal(results[0][0], results[1][0])
    assert_allclose(results[0][1], results[1][1], rtol=1e-12)


def test_stacked_gp_lml_and_fit():
    """Stacked log marginal likelihood equals the sum of the members';
    fit_gp_hyperparameters on a stack fits every output."""
    from safe_learning_tpu import (StackedGaussianProcess,
                                   fit_gp_hyperparameters)

    rng = np.random.default_rng(9)
    x = rng.uniform(-2, 2, size=(30, 2))
    y = np.column_stack([np.sin(2.5 * x[:, 0]),
                         np.cos(0.8 * x[:, 1])])
    y += 0.05 * rng.standard_normal(y.shape)
    gps = [GaussianProcess(RBF(0.6, [1.0, 1.0], input_dim=2),
                           x, y[:, s:s + 1], 0.05) for s in range(2)]
    stacked = StackedGaussianProcess.from_gps(gps)

    lml_sum = sum(float(g.log_marginal_likelihood()) for g in gps)
    assert_allclose(float(stacked.log_marginal_likelihood()), lml_sum,
                    rtol=1e-10)

    fitted, history = fit_gp_hyperparameters(stacked, steps=120,
                                             learning_rate=0.08)
    assert history[-1] < history[0] - 2.0
    # Per-output kernels were fitted independently (they now differ).
    ls0 = np.asarray(fitted.kernels[0].lengthscales)
    ls1 = np.asarray(fitted.kernels[1].lengthscales)
    assert not np.allclose(ls0, ls1)
    resid0 = np.abs(np.asarray(stacked.predict(x)[0]) - y).mean()
    resid1 = np.abs(np.asarray(fitted.predict(x)[0]) - y).mean()
    assert resid1 < resid0


def test_stacked_gp_full_cov_matches_members():
    """full_cov predict on the stack equals the per-member full
    covariances; its diagonal equals the marginal variances."""
    rng = np.random.default_rng(11)
    gps, stacked = _pendulum_style_members(rng)
    q = rng.uniform(-1, 1, size=(17, 3))

    mean, cov = stacked.predict(q, full_cov=True)
    assert cov.shape == (2, 17, 17)
    mean_m, var_m = stacked.predict(q)
    assert_allclose(np.asarray(mean), np.asarray(mean_m), atol=1e-5)
    for s, gp in enumerate(gps):
        m_s, c_s = gp.predict(q, full_cov=True)
        assert_allclose(np.asarray(cov[s]), np.asarray(c_s), atol=1e-5)
        assert_allclose(np.diagonal(np.asarray(cov[s])),
                        np.asarray(var_m)[:, s], atol=1e-5)


def test_sample_stacked_gp_function():
    """Posterior function samples from a stacked GP: one multi-output
    callable per draw, consistent with its own sampled values
    (reference pattern: FunctionStack of per-dim samples,
    functions.py:254-307, 1586-1662)."""
    from safe_learning_tpu import sample_gp_function

    rng = np.random.default_rng(12)
    _, stacked = _pendulum_style_members(rng)
    grid = rng.uniform(-1, 1, size=(40, 3))

    key = jax.random.PRNGKey(7)
    raw = sample_gp_function(grid, stacked, key, number=3,
                             return_function=False)
    assert raw.shape == (3, 40, 2)

    funs = sample_gp_function(grid, stacked, key, number=3)
    assert len(funs) == 3
    vals = np.asarray(funs[1](grid))
    assert vals.shape == (40, 2)
    # The closure reproduces the sampled values on the discretization.
    assert_allclose(vals, raw[1], atol=1e-3)
    # Noisy evaluation differs per output but stays close at small noise.
    noisy = np.asarray(funs[1](grid, noise_key=jax.random.PRNGKey(3)))
    assert not np.allclose(noisy, vals)
    assert_allclose(noisy, vals, atol=0.1)
    # Samples pass near the training data of every output.
    at_data = np.asarray(funs[0](stacked.X))
    assert_allclose(at_data, stacked.Y, atol=0.3)


def test_large_capacity_falls_back_to_xla():
    """GPs whose VMEM-resident factors would overflow take the XLA path
    and still predict correctly (config.pallas_max_capacity guard)."""
    from safe_learning_tpu.config import config

    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, size=(10, 2))
    y = np.sin(x[:, :1])
    q = rng.uniform(-1, 1, size=(33, 2))
    small = GaussianProcess(RBF(1.0, [0.5, 0.5], input_dim=2), x, y, 1e-5)
    big = GaussianProcess(RBF(1.0, [0.5, 0.5], input_dim=2), x, y, 1e-5,
                          capacity=4096)
    assert big.capacity > config.pallas_max_capacity
    m_small, v_small = (np.asarray(a) for a in small.predict(q))
    m_big, v_big = (np.asarray(a) for a in big.predict(q))
    assert_allclose(m_big, m_small, atol=1e-6)
    assert_allclose(v_big, v_small, atol=1e-6)


def test_stacked_sampled_function_pytree_roundtrip():
    """StackedSampledFunction keeps its dims across pytree boundaries."""
    from safe_learning_tpu import sample_gp_function

    rng = np.random.default_rng(13)
    _, stacked = _pendulum_style_members(rng)
    disc = rng.uniform(-1, 1, size=(12, 3))
    fn = sample_gp_function(disc, stacked, jax.random.PRNGKey(0))[0]
    fn2 = jax.tree_util.tree_map(lambda a: a, fn)
    assert fn2.input_dim == fn.input_dim == 3
    assert fn2.output_dim == fn.output_dim == 2
    assert_allclose(np.asarray(fn2(disc)), np.asarray(fn(disc)),
                    atol=1e-6)


def test_unstack_reuses_stacked_caches():
    """unstack() slices the stacked factors instead of refactorizing;
    the views predict identically to the stack."""
    rng = np.random.default_rng(14)
    _, stacked = _pendulum_style_members(rng)
    q = rng.uniform(-1, 1, size=(9, 3))
    mean_s, var_s = (np.asarray(a) for a in stacked.predict(q))
    for s, view in enumerate(stacked.unstack()):
        m, v = (np.asarray(a) for a in view.predict(q))
        assert_allclose(m[:, 0], mean_s[:, s], atol=1e-5)
        assert_allclose(v[:, 0], var_s[:, s], atol=1e-5)
        # The view's factor IS the stack's slice (no refactorization).
        assert_allclose(np.asarray(view.chol_inv),
                        np.asarray(stacked.chol_inv[s]), atol=0)


def test_sample_gp_function_truncation_pairing_stable():
    """Normals pair with ABSOLUTE eigen positions: tightening the
    spectral cut changes only the dropped (tiny) eigenpairs'
    contributions. Relative-to-the-cut pairing would re-pair every
    normal and sample a completely different system whenever two
    dtype lanes disagree on one borderline eigenvalue."""
    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, size=(6, 1))
    y = np.sin(2 * x)
    gp = GaussianProcess(RBF(1.0, 0.4, input_dim=1), x, y, 1e-6)
    grid = GridWorld([[-1, 1]], 41)
    key = jax.random.PRNGKey(7)
    a = sample_gp_function(grid, gp, key, number=1,
                           return_function=False, cut_rel=1e-12)[0]
    b = sample_gp_function(grid, gp, key, number=1,
                           return_function=False, cut_rel=1e-2)[0]
    # The wider cut keeps strictly more of the decayed spectrum ...
    assert not np.array_equal(a, b)
    # ... yet the draws share the dominant eigenpairs bit-for-bit, so
    # they stay essentially the same function.
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.99


def test_gprcached_is_reference_parity_alias():
    """Reference exposes GPRCached (functions.py:357-438) separately from
    its GaussianProcess wrapper; here the cached factor is the core of
    the one class, and both names must resolve to it."""
    import safe_learning_tpu as sl
    from safe_learning_tpu.functions.gp import GPRCached
    assert GPRCached is sl.GaussianProcess is sl.GPRCached
