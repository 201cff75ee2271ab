"""Conservative-certificate property: the float32 certified set must be
a SUBSET of the exact-arithmetic (float64 oracle) certified set.

This is the defining soundness property of a verification framework in a
reduced-precision dtype (VERDICT round 2, item 1): a point whose exact
decrease margin sits inside the f32 noise band must never be certified.
The framework achieves it by certifying only
``decrease < threshold - margin`` with a margin calibrated against the
float64 oracle (``oracle.calibrate_certificate_margin``); these tests
check strict containment on randomized GP-dynamics instances, through
both the fused whole-grid path and the batched path, and record that the
conservatism cost stays small.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import safe_learning_tpu as sl  # noqa: E402
from safe_learning_tpu.oracle import (  # noqa: E402
    calibrate_certificate_margin, oracle_margins, oracle_safe_set)


def _random_instance(seed):
    """Random contracting GP-dynamics verification instance."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    n = int(rng.integers(70, 120))
    grid = sl.GridWorld([[-1.0, 1.0], [-1.0, 1.0]], n)

    # Random contraction with spectral norm in [0.25, 0.6].
    raw = rng.normal(size=(2, 2))
    a = raw * (rng.uniform(0.25, 0.6) / np.linalg.norm(raw, 2))
    b = np.zeros((2, 1))
    policy = sl.LinearSystem(np.zeros((1, 2)))
    v = sl.QuadraticFunction(np.eye(2))
    lv = sl.LambdaFunction(lambda x: 2.0 * jnp.abs(x))
    lf = float(np.linalg.norm(a, 2))

    n_train = int(rng.integers(64, 160))
    spread = rng.uniform(0.35, 0.5)
    x_train = np.column_stack([
        rng.uniform(-spread, spread, n_train),
        rng.uniform(-spread, spread, n_train),
        np.zeros(n_train)])
    y_train = (x_train[:, :2] @ a.T
               + 0.02 * np.sin(3 * x_train[:, :2]))
    gp = sl.GaussianProcess(
        sl.RBF(rng.uniform(0.7, 1.3), [rng.uniform(0.28, 0.4)] * 3,
               input_dim=3),
        x_train, y_train,
        noise_variance=10.0 ** rng.uniform(-4.2, -3.8),
        beta=2.0, mean_function=sl.LinearSystem([a, b]))

    tau = float(np.min(grid.unit_maxes))
    vals = np.sum(grid.all_points ** 2, axis=1)
    initial = np.where(vals <= np.quantile(vals, 0.04))[0]
    return sl.Lyapunov(grid, v, gp, lf, lv, tau, policy,
                       initial_set=initial)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_f32_certified_set_contained_in_f64_oracle(seed):
    lyap = _random_instance(seed)
    margin = calibrate_certificate_margin(lyap, num_samples=2048,
                                          rng=np.random.default_rng(seed))
    assert margin > 0.0
    lyap.update_safe_set()

    safe64, c64 = oracle_safe_set(lyap)
    frac32 = lyap.safe_set.mean()
    frac64 = safe64.mean()
    # Non-degenerate instance: the certificate discriminates.
    assert 0.02 < frac64 < 0.98, frac64
    # STRICT containment: every f32-certified state is oracle-certified.
    violations = lyap.safe_set & ~safe64
    assert not violations.any(), (
        f"{violations.sum()} f32-certified states fail the exact check")
    # The conservatism cost stays small (measured ~1% of the grid).
    assert frac64 - frac32 < 0.08, (frac32, frac64)
    assert lyap.c_max <= c64 + 1e-6 * max(abs(c64), 1.0)


def test_containment_through_batched_path():
    lyap = _random_instance(7)
    calibrate_certificate_margin(lyap, num_samples=2048)
    lyap.update_safe_set(batch_size=1003)
    safe64, _ = oracle_safe_set(lyap)
    assert 0.02 < safe64.mean() < 0.98
    assert not (lyap.safe_set & ~safe64).any()


def test_margin_zero_matches_round2_behavior():
    """margin=0 must reproduce the exact-comparison sweep (no behavior
    change for existing callers; the margin is opt-in)."""
    lyap_a = _random_instance(11)
    lyap_b = _random_instance(11)
    lyap_b.certificate_margin = 0.0
    lyap_a.update_safe_set()
    lyap_b.update_safe_set()
    np.testing.assert_array_equal(lyap_a.safe_set, lyap_b.safe_set)
    assert lyap_a.c_max == lyap_b.c_max


def test_calibrated_margin_dominates_subsample_error():
    """The installed margin bounds the measured per-point f32 error with
    the safety factor."""
    import jax.numpy as jnp

    from safe_learning_tpu.lyapunov import _negative_batch

    lyap = _random_instance(3)
    margin = calibrate_certificate_margin(lyap, num_samples=1024,
                                          safety=2.0)
    grid = lyap.discretization
    rng = np.random.default_rng(42)
    pts = grid.all_points[rng.choice(grid.nindex, 1024, replace=False)]
    _, dec, thr = _negative_batch(
        lyap.policy, lyap.dynamics, lyap.lyapunov_function,
        lyap._lipschitz_lyapunov, lyap._lipschitz_dynamics, lyap.tau,
        jnp.asarray(pts))
    dev = (np.asarray(dec, np.float64) - np.asarray(thr, np.float64))
    exact = oracle_margins(lyap, pts)
    # A fresh subsample's error stays under the installed margin (the
    # safety factor covers the unseen tail).
    assert np.max(np.abs(dev - exact)) <= margin


def test_calibration_with_refined_sample_covers_adaptive_sweep():
    """refinement=R displaces half the calibration sample onto the
    R-refined sub-grid (the exact construction the adaptive sweep
    checks); the resulting margin must dominate the TRUE worst f32
    error measured exhaustively over the full R-refined point set —
    the coverage a base-grid-only sample cannot promise."""
    import itertools

    import jax.numpy as jnp

    from safe_learning_tpu.config import config
    from safe_learning_tpu.lyapunov import _negative_batch
    from safe_learning_tpu.oracle import oracle_margins

    lyap = _random_instance(3)
    R = 4
    grid = lyap.discretization
    unit = np.asarray(grid.unit_maxes)
    base = np.array(grid.all_points, dtype=config.np_dtype)
    worst = 0.0
    for combo in itertools.product(range(R), repeat=grid.ndim):
        off = (0.5 * (1 - 1 / R)) * unit * (
            -1.0 + 2.0 * np.array(combo) / (R - 1.0))
        pts = base + off.astype(config.np_dtype)
        # Refined checks compare against tau / R — measure THAT error.
        _, dec, thr = _negative_batch(
            lyap.policy, lyap.dynamics, lyap.lyapunov_function,
            lyap._lipschitz_lyapunov, lyap._lipschitz_dynamics,
            lyap.tau / R, jnp.asarray(pts))
        md = np.asarray(dec, np.float64) - np.asarray(thr, np.float64)
        worst = max(worst, float(np.max(np.abs(
            md - oracle_margins(lyap, pts, tau=lyap.tau / R)))))

    m_ref = calibrate_certificate_margin(lyap, num_samples=8192,
                                         refinement=R, set_margin=False)
    assert m_ref >= worst, (m_ref, worst)
