"""Verification sweep correctness in float32 — on the BENCH workload.

These tests run the exact instance ``bench.py`` times (contracting mean
dynamics + GP uncertainty growing away from the explored region — a
certificate that genuinely discriminates: ~half the grid fails the
decrease check) at reduced grid size, and compare the f32 device sweep
against the same float64 NumPy oracle the bench gates on.

The decrease check's boolean can legitimately flip for grid points whose
margin ``decrease - threshold`` is within f32 error of zero, so the
comparison is margin-aware: every point with a non-marginal oracle margin
must agree exactly, and the certified level must match to f32 tolerance.
"""

import os
import sys

import numpy as np
from numpy.testing import assert_allclose

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import safe_learning_tpu as sl  # noqa: E402
from bench import (_build_instance, _oracle_c_max,  # noqa: E402
                   _oracle_margins)


def test_fused_sweep_margin_aware_vs_f64_oracle():
    import jax.numpy as jnp

    from safe_learning_tpu.lyapunov import _negative_batch

    (grid, policy, v, lv, lf, gp, tau, initial_set, a, x_train, y_train,
     params) = _build_instance(n_points=150)

    lyap = sl.Lyapunov(grid, v, gp, lf, lv, tau, policy,
                       initial_set=initial_set)
    lyap.update_safe_set()

    margin, vals = _oracle_margins(grid, a, x_train, y_train, params, lf,
                                   tau)
    oracle_negative = margin < 0
    exempt = np.zeros(grid.nindex, dtype=bool)
    exempt[initial_set] = True
    eligible = oracle_negative | exempt
    v_bad = np.inf if eligible.all() else vals[~eligible].min()
    safe_oracle = (vals < v_bad) | exempt

    # The instance discriminates: a real boundary inside the domain.
    assert 0.05 < safe_oracle.mean() < 0.95

    # Pointwise decrease-check booleans: points with a clear f64 margin
    # must agree exactly; only points within f32 error of the decision
    # boundary may differ. (The safe SET is a level prefix, so one
    # marginal flip legitimately shifts a whole value band — it is
    # compared via c_max / safe fraction below, not pointwise.)
    got_negative, _, _ = map(np.asarray, _negative_batch(
        lyap.policy, lyap.dynamics, lyap.lyapunov_function,
        lyap._lipschitz_lyapunov, lyap._lipschitz_dynamics, tau,
        jnp.asarray(grid.all_points)))
    # Cutoff 1e-3 = ~2x the measured max f32 margin error (4.4e-4) on
    # this instance at noise 1e-4.
    clear = np.abs(margin) > 1e-3
    assert clear.mean() > 0.99
    disagree = np.mean(got_negative[clear] != oracle_negative[clear])
    assert disagree == 0.0, f"{disagree:.5f} of clear-margin points differ"

    c_oracle, frac_oracle = _oracle_c_max(grid, a, x_train, y_train,
                                          params, lf, tau, initial_set)
    assert_allclose(lyap.c_max, c_oracle, rtol=5e-4)
    assert_allclose(lyap.safe_set.mean(), frac_oracle, atol=0.01)


def test_fused_matches_batched_f32():
    (grid, policy, v, lv, lf, gp, tau, initial_set, a, x_train, y_train,
     params) = _build_instance(n_points=100)

    lyap_a = sl.Lyapunov(grid, v, gp, lf, lv, tau, policy,
                         initial_set=initial_set)
    lyap_a.update_safe_set()
    lyap_b = sl.Lyapunov(grid, v, gp, lf, lv, tau, policy,
                         initial_set=initial_set)
    lyap_b.update_safe_set(batch_size=997)
    # Same arithmetic per point; only boundary-marginal points may flip.
    assert np.mean(lyap_a.safe_set != lyap_b.safe_set) < 0.01
    assert_allclose(lyap_a.c_max, lyap_b.c_max, rtol=1e-3)
    assert 0.05 < lyap_a.safe_set.mean() < 0.95


def test_sharded_sweep_matches_unsharded_f32():
    import jax

    from safe_learning_tpu.parallel import make_mesh, \
        sharded_safe_set_update

    assert jax.device_count() >= 8
    (grid, policy, v, lv, lf, gp, tau, initial_set, a, x_train, y_train,
     params) = _build_instance(n_points=104)

    lyap_single = sl.Lyapunov(grid, v, gp, lf, lv, tau, policy,
                              initial_set=initial_set)
    lyap_single.update_safe_set()

    lyap_sharded = sl.Lyapunov(grid, v, gp, lf, lv, tau, policy,
                               initial_set=initial_set)
    safe, c_max = sharded_safe_set_update(lyap_sharded, make_mesh(8))
    np.testing.assert_array_equal(safe, lyap_single.safe_set)
    assert_allclose(c_max, lyap_single.c_max, rtol=1e-6)
    assert safe.sum() > len(initial_set)
