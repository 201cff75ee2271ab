"""Independent NumPy oracle for the full verification pipeline.

Dual-implementation cross-check (the reference's strongest test pattern,
``test_functions.py:658-761``): the fused jitted sweep — GP posterior,
Lyapunov values, Lipschitz threshold, certified-level reduction — must
match a from-scratch NumPy implementation of the same math on the bench
workload's structure.
"""

import os

import numpy as np
import pytest
import scipy.linalg
from numpy.testing import assert_allclose

import safe_learning_tpu as sl
from safe_learning_tpu.utils import dlqr


def _numpy_gp_predict(x_train, y_train, query, variance, lengthscales,
                      noise, mean_a):
    """Textbook GP posterior with an RBF kernel and linear prior mean."""
    def k(a, b):
        d = (a[:, None, :] / lengthscales - b[None, :, :] / lengthscales)
        return variance * np.exp(-0.5 * np.sum(d ** 2, axis=2))

    kxx = k(x_train, x_train) + noise * np.eye(len(x_train))
    kxq = k(x_train, query)
    resid = y_train - x_train @ mean_a.T
    solve = scipy.linalg.cho_solve(scipy.linalg.cho_factor(kxx, lower=True),
                                   np.hstack([resid, kxq]))
    mean = query @ mean_a.T + kxq.T @ solve[:, :resid.shape[1]]
    var = variance - np.sum(kxq * solve[:, resid.shape[1]:], axis=0)
    return mean, np.maximum(var, 1e-12)


def test_fused_sweep_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    grid = sl.GridWorld([[-0.5, 0.5], [-1.0, 1.0]], 40)
    pend = sl.InvertedPendulum(mass=0.25, length=0.5, friction=0.1,
                               dt=0.01)
    a, b = map(np.asarray, pend.linearize())
    k_gain, p = dlqr(a, b, np.eye(2), np.eye(1))
    policy = sl.LinearSystem(-k_gain)
    v = sl.QuadraticFunction(p)

    x_train = np.column_stack([
        rng.uniform(-0.5, 0.5, 24), rng.uniform(-1.0, 1.0, 24),
        rng.uniform(-0.8, 0.8, 24)])
    import jax.numpy as jnp
    y_train = np.asarray(pend(jnp.asarray(x_train[:, :2]),
                              jnp.asarray(x_train[:, 2:])))
    variance, lengthscales, noise, beta = 1e-4, np.array([0.3, 0.3, 0.5]), \
        1e-8, 2.0
    mean_ab = np.hstack([a, b])
    gp = sl.GaussianProcess(
        sl.RBF(variance, lengthscales, input_dim=3), x_train, y_train,
        noise_variance=noise, beta=beta,
        mean_function=sl.LinearSystem([a, b]))

    lv = float(2 * np.linalg.norm(p, 2))
    lf = float(np.linalg.norm(a - b @ k_gain, 2))
    tau = 1e-4
    pts = grid.all_points
    vals = np.einsum("ni,ij,nj->n", pts, p, pts)
    initial = np.where(vals <= np.quantile(vals, 0.01))[0]

    # --- framework ---
    lyap = sl.Lyapunov(grid, v, gp, lf, lv, tau, policy,
                       initial_set=initial)
    lyap.update_safe_set()

    # --- independent numpy oracle ---
    actions = pts @ (-k_gain).T
    xu = np.hstack([pts, actions])
    mean, var = _numpy_gp_predict(x_train, y_train, xu, variance,
                                  lengthscales, noise, mean_ab)
    err = beta * np.sqrt(var)
    v_next = np.einsum("ni,ij,nj->n", mean, p, mean)
    decrease = v_next - vals + lv * (2 * err)  # two output dims, equal std
    threshold = -lv * (1 + lf) * tau
    negative = decrease < threshold
    exempt = np.zeros(grid.nindex, dtype=bool)
    exempt[initial] = True
    eligible = negative | exempt
    if eligible.all():
        v_bad = np.inf
    else:
        v_bad = vals[~eligible].min()
    safe_oracle = vals < v_bad
    c_oracle = vals[safe_oracle].max() if safe_oracle.any() else -np.inf
    safe_oracle |= exempt

    assert safe_oracle.any() and not safe_oracle.all()
    assert_allclose(lyap.c_max, c_oracle, rtol=1e-8)
    np.testing.assert_array_equal(lyap.safe_set, safe_oracle)


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="full-scale oracle run; set RUN_SLOW=1")
def test_full_scale_1000sq_bit_equality_with_oracle():
    """BASELINE.md's executable statement: on the 1000^2 pendulum grid in
    float64, the framework's safe set is BIT-EQUAL to the independent
    NumPy oracle (and c_max matches to f64 roundoff) across a
    3-iteration can_shrink=False loop with data added between sweeps
    (the notebooks' online-learning shape, reference
    ``lyapunov.py:407-606``)."""
    rng = np.random.default_rng(0)
    grid = sl.GridWorld([[-0.5, 0.5], [-1.0, 1.0]], 1000)
    pend = sl.InvertedPendulum(mass=0.25, length=0.5, friction=0.1,
                               dt=0.01)
    a, b = map(np.asarray, pend.linearize())
    k_gain, p = dlqr(a, b, np.eye(2), np.eye(1))
    policy = sl.LinearSystem(-k_gain)
    v = sl.QuadraticFunction(p)

    import jax.numpy as jnp

    def draw(n):
        x = np.column_stack([
            rng.uniform(-0.5, 0.5, n), rng.uniform(-1.0, 1.0, n),
            rng.uniform(-0.8, 0.8, n)])
        y = np.asarray(pend(jnp.asarray(x[:, :2]), jnp.asarray(x[:, 2:])))
        return x, y

    x_train, y_train = draw(96)
    variance, lengthscales, noise, beta = 1e-4, \
        np.array([0.3, 0.3, 0.5]), 1e-8, 2.0
    mean_ab = np.hstack([a, b])
    gp = sl.GaussianProcess(
        sl.RBF(variance, lengthscales, input_dim=3), x_train, y_train,
        noise_variance=noise, beta=beta,
        mean_function=sl.LinearSystem([a, b]), capacity=256)

    lv = float(2 * np.linalg.norm(p, 2))
    lf = float(np.linalg.norm(a - b @ k_gain, 2))
    tau = 1e-4
    pts = grid.all_points
    vals = np.einsum("ni,ij,nj->n", pts, p, pts)
    initial = np.where(vals <= np.quantile(vals, 0.01))[0]

    lyap = sl.Lyapunov(grid, v, gp, lf, lv, tau, policy,
                       initial_set=initial)
    exempt0 = np.zeros(grid.nindex, dtype=bool)
    exempt0[initial] = True

    prev_safe_oracle = exempt0.copy()
    xs, ys = x_train.copy(), y_train.copy()
    for iteration in range(3):
        lyap.update_safe_set(can_shrink=False)

        # Independent oracle with the same exempt semantics
        # (can_shrink=False keeps previously safe states).
        actions = pts @ (-k_gain).T
        xu = np.hstack([pts, actions])
        mean, var = _numpy_gp_predict(xs, ys, xu, variance, lengthscales,
                                      noise, mean_ab)
        err = beta * np.sqrt(var)
        v_next = np.einsum("ni,ij,nj->n", mean, p, mean)
        decrease = v_next - vals + lv * (2 * err)
        threshold = -lv * (1 + lf) * tau
        negative = decrease < threshold
        eligible = negative | exempt0 | prev_safe_oracle
        v_bad = np.inf if eligible.all() else vals[~eligible].min()
        safe_oracle = vals < v_bad
        c_oracle = vals[safe_oracle].max() if safe_oracle.any() \
            else -np.inf
        safe_oracle |= exempt0 | prev_safe_oracle

        assert 0.0 < safe_oracle.mean() < 1.0
        np.testing.assert_array_equal(lyap.safe_set, safe_oracle)
        assert_allclose(lyap.c_max, c_oracle, rtol=1e-12)

        prev_safe_oracle = safe_oracle
        x_new, y_new = draw(32)
        lyap.dynamics = lyap.dynamics.add_data_point(x_new, y_new)
        xs = np.vstack([xs, x_new])
        ys = np.vstack([ys, y_new])
