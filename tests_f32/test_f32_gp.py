"""GP stack accuracy in float32 — the TPU-default numeric mode.

The x64 suite (``tests/test_gp.py``) pins exact values; this lane asserts
the f32 path stays within documented tolerances of a float64 NumPy oracle
(the host-f64 Cholesky cache is what makes this possible at the small
noise variances the reference uses, ``functions/gp.py:_gp_cache``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

import safe_learning_tpu as sl
from safe_learning_tpu.config import config


def _oracle_rbf_predict(x, y, q, variance, ls, noise):
    import scipy.linalg

    x64, y64, q64 = (np.asarray(v, np.float64) for v in (x, y, q))
    d = x64[:, None, :] / ls - x64[None, :, :] / ls
    kxx = variance * np.exp(-0.5 * np.sum(d ** 2, axis=2))
    dq = x64[:, None, :] / ls - q64[None, :, :] / ls
    kxq = variance * np.exp(-0.5 * np.sum(dq ** 2, axis=2))
    factor = scipy.linalg.cho_factor(kxx + noise * np.eye(len(x64)),
                                     lower=True)
    mean = kxq.T @ scipy.linalg.cho_solve(factor, y64)
    v = scipy.linalg.solve_triangular(factor[0], kxq, lower=True)
    var = variance - np.sum(v ** 2, axis=0)
    return mean, np.maximum(var, 1e-12)


def test_dtype_is_float32():
    assert config.np_dtype == np.float32
    assert jnp.zeros(1).dtype == jnp.float32


def test_posterior_accuracy_small_noise():
    """f32 predict vs f64 oracle at the reference's small noise levels."""
    rng = np.random.default_rng(0)
    x = rng.uniform(-2, 2, size=(24, 2)).astype(np.float32)
    y = np.sin(x.sum(axis=1, keepdims=True)).astype(np.float32)
    q = rng.uniform(-2, 2, size=(64, 2)).astype(np.float32)
    variance, ls, noise = 1.3, np.array([0.7, 1.1]), 1e-6

    gp = sl.GaussianProcess(sl.RBF(variance, ls, input_dim=2), x, y,
                            noise_variance=noise)
    mean, var = map(np.asarray, gp.predict(q))
    ref_mean, ref_var = _oracle_rbf_predict(x, y, q, variance, ls, noise)
    assert_allclose(mean, ref_mean, atol=5e-4)
    assert_allclose(var[:, 0], ref_var, atol=5e-4)
    # The posterior interpolates the data (noise 1e-6 -> tight).
    resid = np.abs(np.asarray(gp.predict(x)[0], np.float64) - y)
    assert resid.max() < 1e-3


def test_add_data_point_matches_fresh_fit():
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, size=(7, 2)).astype(np.float32)
    y = np.sin(3 * x[:, :1]).astype(np.float32)
    q = rng.uniform(-1, 1, size=(11, 2)).astype(np.float32)
    kern = sl.RBF(1.3, [0.5, 0.8], input_dim=2)
    gp = sl.GaussianProcess(kern, x[:5], y[:5], 1e-3)
    gp = gp.add_data_point(x[5], y[5])
    gp = gp.add_data_point(x[6], y[6])
    fresh = sl.GaussianProcess(kern, x, y, 1e-3)
    assert_allclose(np.asarray(gp.predict(q)[0]),
                    np.asarray(fresh.predict(q)[0]), atol=1e-5)
    assert_allclose(np.asarray(gp.predict(q)[1]),
                    np.asarray(fresh.predict(q)[1]), atol=1e-5)


def test_sample_gp_function_finite_and_consistent():
    """The posterior draw must be finite in f32 (an on-device f32
    Cholesky of the rank-deficient posterior covariance NaNs out — the
    round-1 flagship failure) and the callable must reproduce its own
    sampled values."""
    kernel = (sl.ActiveDims(sl.Matern32(variance=0.4 ** 2,
                                        lengthscales=1.0, input_dim=1),
                            dims=[0])
              * sl.ActiveDims(sl.LinearKernel(variances=1.0, input_dim=1),
                              dims=[0]))
    gp = sl.GaussianProcess(kernel, np.empty((0, 2)), np.empty((0, 1)),
                            noise_variance=1e-4, beta=2.0,
                            mean_function=sl.LinearSystem([[0.25, 0.0]]))
    disc = np.hstack([np.linspace(-1, 1, 201)[:, None],
                      np.zeros((201, 1))])

    raw = sl.sample_gp_function(disc, gp, jax.random.PRNGKey(5), number=2,
                                return_function=False)
    assert raw.dtype == np.float32
    assert np.isfinite(raw).all()

    funs = sl.sample_gp_function(disc, gp, jax.random.PRNGKey(5), number=2)
    vals = np.asarray(funs[0](jnp.asarray(disc)))
    assert np.isfinite(vals).all()
    assert_allclose(vals[:, 0], raw[0], atol=1e-4)


@pytest.mark.parametrize("seed", [2, 3])
def test_sampled_system_measurable(seed):
    """Measuring a sampled system at arbitrary points stays finite and
    bounded (feeds add_data_point in the flagship loop)."""
    kernel = sl.ActiveDims(sl.Matern32(variance=0.4 ** 2, lengthscales=1.0,
                                       input_dim=1), dims=[0])
    gp = sl.GaussianProcess(kernel, np.empty((0, 2)), np.empty((0, 1)),
                            noise_variance=1e-4,
                            mean_function=sl.LinearSystem([[0.25, 0.0]]))
    disc = np.hstack([np.linspace(-1, 1, 101)[:, None],
                      np.zeros((101, 1))])
    fun = sl.sample_gp_function(disc, gp, jax.random.PRNGKey(seed))[0]
    q = np.hstack([np.linspace(-0.95, 0.95, 37)[:, None],
                   np.zeros((37, 1))]).astype(np.float32)
    vals = np.asarray(fun(jnp.asarray(q)))
    assert np.isfinite(vals).all()
    assert np.abs(vals).max() < 3.0


def test_reference_pinned_posterior_values_f32():
    """The reference's pinned gpflow posterior
    (``test_functions.py:237-261``) reproduced in float32: documented
    tolerance 1e-5 (vs 1e-7 in the f64 lane)."""
    x = np.array([[1.0, 0.0], [0.0, 1.0]], dtype=np.float32)
    y = np.array([[0.0], [1.0]], dtype=np.float32)
    gp = sl.GaussianProcess(sl.RBF(1.0, [1.0, 1.0], input_dim=2), x, y,
                            noise_variance=1.0, beta=2.0)
    gp = gp.add_data_point(np.array([[1.2, 2.3]]), np.array([[2.4]]))
    mean, error = map(np.asarray, gp(np.array([[0.9, 0.1], [3.0, 2.0]],
                                              dtype=np.float32)))
    assert_allclose(mean, np.array([[0.16371139], [0.22048311]]),
                    atol=1e-5)
    assert_allclose(error, np.array([[1.37678679], [1.98183191]]),
                    atol=1e-5)


def test_stacked_gp_matches_fan_out_f32():
    """StackedGaussianProcess == FunctionStack of per-member GPs in the
    TPU-default dtype (the flagship pendulum dynamics configuration),
    including after an online measurement."""
    rng = np.random.default_rng(4)
    x = rng.uniform(-1, 1, size=(16, 3)).astype(np.float32)
    y = np.column_stack([np.sin(2 * x[:, 0]) + 0.3 * x[:, 2],
                         np.cos(x[:, 1]) - 0.2 * x[:, 2]]).astype(
                             np.float32)
    kernels, means, gps = [], [], []
    for dim in range(2):
        kernel = (sl.LinearKernel(variances=[0.3, 0.1, 0.4 + 0.1 * dim],
                                  input_dim=3)
                  + sl.ActiveDims(sl.Matern32(variance=1.0,
                                              lengthscales=0.8,
                                              input_dim=1), dims=[0])
                  * sl.ActiveDims(sl.LinearKernel(variances=0.4,
                                                  input_dim=1), dims=[0]))
        mean = sl.LinearSystem([[0.9, 0.1 * dim, 0.05]])
        kernels.append(kernel)
        means.append(mean)
        gps.append(sl.GaussianProcess(kernel, x, y[:, dim:dim + 1],
                                      noise_variance=1e-6, beta=2.0,
                                      mean_function=mean))
    stacked = sl.StackedGaussianProcess.from_gps(gps)
    fan_out = sl.FunctionStack(gps)
    q = rng.uniform(-1, 1, size=(33, 3)).astype(np.float32)

    for model_a, model_b in [(stacked, fan_out),
                             (stacked.add_data_point(q[:1], q[:1, :2]),
                              fan_out.add_data_point(q[:1], q[:1, :2]))]:
        mean_a, err_a = map(np.asarray, model_a(q))
        mean_b, err_b = map(np.asarray, model_b(q))
        assert mean_a.dtype == np.float32
        assert_allclose(mean_a, mean_b, atol=1e-5)
        assert_allclose(err_a, err_b, atol=1e-5)


def test_bordered_append_matches_refactorization():
    """The O(n^2) bordered Cholesky append produces the same cache as a
    full refactorization (same f64 host island, same recurrence) — for
    both the single GP and the stacked per-dimension form, across a
    sequence of additions."""
    from safe_learning_tpu.config import config as cfg

    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, size=(10, 2)).astype(np.float32)
    y = np.column_stack([np.sin(2 * x[:, 0]),
                         np.cos(x[:, 1])]).astype(np.float32)
    x_more = rng.uniform(-1, 1, size=(6, 2)).astype(np.float32)
    y_more = np.column_stack([np.sin(2 * x_more[:, 0]),
                              np.cos(x_more[:, 1])]).astype(np.float32)
    q = rng.uniform(-1, 1, size=(23, 2)).astype(np.float32)

    def run(incremental):
        old = cfg.incremental_gp_updates
        cfg.incremental_gp_updates = incremental
        try:
            gp = sl.GaussianProcess(
                sl.RBF(1.2, [0.5, 0.8], input_dim=2), x, y[:, :1], 1e-6,
                mean_function=sl.LinearSystem([[0.3, -0.1]]),
                capacity=32)
            stacked = sl.StackedGaussianProcess(
                [sl.RBF(1.2, [0.5, 0.8], input_dim=2),
                 sl.Matern32(0.8, [0.7, 0.6], input_dim=2)], x, y,
                [1e-6, 2e-6], capacity=32)
            for i in range(len(x_more)):
                gp = gp.add_data_point(x_more[i], y_more[i, :1])
                stacked = stacked.add_data_point(x_more[i], y_more[i])
            # one multi-row append too
            gp = gp.add_data_point(x_more[:3] * 0.5, y_more[:3, :1])
            stacked = stacked.add_data_point(x_more[:3] * 0.5, y_more[:3])
            return gp, stacked
        finally:
            cfg.incremental_gp_updates = old

    gp_inc, st_inc = run(True)
    gp_ref, st_ref = run(False)

    # The incremental path actually ran (host mirror advanced in place).
    assert gp_inc._host_cache is not None
    assert gp_inc._host_cache.count == int(gp_inc.count)

    # Both paths share the f32 device kernel assembly but see it through
    # different matmul shapes, so they agree to the assembly-rounding
    # scale (~1e-5 on the factor, ~2e-4 on predictions — the same scale
    # as the f32-vs-f64-oracle gap asserted elsewhere in this lane), not
    # to f64 roundoff.
    assert_allclose(np.asarray(gp_inc.chol), np.asarray(gp_ref.chol),
                    rtol=0, atol=2e-5)
    for a, b in [(gp_inc.predict(q), gp_ref.predict(q)),
                 (st_inc.predict(q), st_ref.predict(q))]:
        assert_allclose(np.asarray(a[0]), np.asarray(b[0]), rtol=0,
                        atol=5e-4)
        assert_allclose(np.asarray(a[1]), np.asarray(b[1]), rtol=0,
                        atol=5e-4)

    # Cross-check against a float64 NumPy oracle on the final dataset.
    variance, ls, noise = 1.2, np.array([0.5, 0.8]), 1e-6
    prior = np.asarray(gp_inc.X, np.float64) @ np.array([0.3, -0.1])
    ref_mean, _ = _oracle_rbf_predict(
        gp_inc.X, np.asarray(gp_inc.Y, np.float64)
        - prior[:, None], q, variance, ls, noise)
    prior_q = np.asarray(q, np.float64) @ np.array([0.3, -0.1])
    assert_allclose(np.asarray(gp_inc.predict(q)[0])[:, 0],
                    ref_mean[:, 0] + prior_q, atol=5e-4)


def test_bordered_append_falls_back_on_degenerate_addition():
    """Adding a (near-)duplicate point makes the bordered pivot collapse;
    the append must fall back to the jittered refactorization and stay
    finite."""
    rng = np.random.default_rng(8)
    x = rng.uniform(-1, 1, size=(8, 2)).astype(np.float32)
    y = np.sin(x[:, :1]).astype(np.float32)
    gp = sl.GaussianProcess(sl.RBF(1.0, [0.5, 0.5], input_dim=2), x, y,
                            1e-8, capacity=32)
    dup = gp.add_data_point(x[0], y[0])  # exact duplicate input
    q = rng.uniform(-1, 1, size=(9, 2)).astype(np.float32)
    mean, var = map(np.asarray, dup.predict(q))
    assert np.isfinite(mean).all() and np.isfinite(var).all()
    assert int(dup.count) == 9
