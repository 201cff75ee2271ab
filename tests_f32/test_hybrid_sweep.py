"""Hybrid band-filtered sweep: extended rigor at near-f32 cost.

``update_safe_set(extended="hybrid")`` must reproduce the FULL extended
sweep's certificate exactly (same negative verdicts -> same safe set and
c_max) while routing only the f32-ambiguity band through the double-word
pipeline. Identity is by construction (see
``Lyapunov._hybrid_negative``); these tests check it end to end on the
ill-conditioned instance (band ~ everything: degraded but identical),
a well-conditioned instance (band ~ sliver: the cost story), adaptive
refinement, and the oracle-containment property the certificate exists
for.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402

import safe_learning_tpu as sl  # noqa: E402
from safe_learning_tpu.ops.extended_verify import (  # noqa: E402
    extended_certificate_margin, hybrid_band_margin)
from safe_learning_tpu.oracle import oracle_safe_set  # noqa: E402
from test_extended_verify import _ill_conditioned_instance  # noqa: E402

_LV_MAT = 2.0 * np.eye(2)


def _well_conditioned_instance(seed=0, noise=1e-4, n=41):
    """Bench-shaped GP instance (noise 1e-4: the f32 margin is small)."""
    rng = np.random.default_rng(seed)
    grid = sl.GridWorld([[-1.0, 1.0], [-1.0, 1.0]], n)
    a = np.array([[0.25, 0.05], [0.0, 0.3]])
    policy = sl.LinearSystem(np.zeros((1, 2)))
    v = sl.QuadraticFunction(np.eye(2))
    lv = sl.LambdaFunction(lambda x: 2.0 * jnp.abs(x))
    lf = float(np.linalg.norm(a, 2))
    nt = 64
    xt = np.column_stack([rng.uniform(-0.4, 0.4, nt),
                          rng.uniform(-0.4, 0.4, nt), np.zeros(nt)])
    yt = xt[:, :2] @ a.T + 0.02 * np.sin(3 * xt[:, :2])
    gp = sl.GaussianProcess(
        sl.RBF(1.0, [0.3] * 3, input_dim=3), xt, yt,
        noise_variance=noise, beta=2.0,
        mean_function=sl.LinearSystem([a, np.zeros((2, 1))]))
    # 0.2x the cell size: the bench's 1000-point-per-axis tau scaled to
    # this 41-point grid so the level set discriminates the same way.
    tau = 0.2 * float(np.min(grid.unit_maxes))
    vals = np.sum(grid.all_points ** 2, axis=1)
    initial = np.where(vals <= 0.01)[0]
    return sl.Lyapunov(grid, v, gp, lf, lv, tau, policy,
                       initial_set=initial)


def _run_both(lyap, **kwargs):
    """Run extended=True and extended="hybrid" from identical state."""
    extended_certificate_margin(lyap, lv_matrix=_LV_MAT)
    lyap.update_safe_set(extended=True, **kwargs)
    safe_full = np.array(lyap.safe_set)
    c_full = lyap.c_max
    ref_full = np.array(lyap._refinement)

    lyap.safe_set = np.zeros(lyap.discretization.nindex, dtype=bool)
    if lyap.initial_safe_set is not None:
        lyap.safe_set |= lyap.initial_safe_set
    lyap.update_safe_set(extended="hybrid", **kwargs)
    return safe_full, c_full, ref_full


def test_hybrid_identical_ill_conditioned():
    """Tiny-noise instance: band is wide, certificate still identical."""
    lyap = _ill_conditioned_instance()
    safe_full, c_full, ref_full = _run_both(lyap)
    assert (np.array(lyap.safe_set) == safe_full).all()
    assert lyap.c_max == c_full
    assert (np.array(lyap._refinement) == ref_full).all()
    # Something nontrivial was certified in the first place.
    assert 0.02 < safe_full.mean() < 0.98


def test_hybrid_identical_well_conditioned_and_band_is_sliver():
    """Bench-shaped instance: identical certificate, tiny band."""
    lyap = _well_conditioned_instance()
    safe_full, c_full, _ = _run_both(lyap)
    assert (np.array(lyap.safe_set) == safe_full).all()
    assert lyap.c_max == c_full
    assert 0.05 < safe_full.mean() < 0.95
    # The cost driver: only a small fraction reaches the df pipeline.
    assert lyap.last_band_fraction is not None
    assert lyap.last_band_fraction < 0.25, lyap.last_band_fraction


def test_hybrid_contained_in_oracle():
    """The hybrid certificate never over-claims vs exact arithmetic."""
    lyap = _ill_conditioned_instance(seed=5)
    extended_certificate_margin(lyap, lv_matrix=_LV_MAT)
    lyap.update_safe_set(extended="hybrid")
    safe64, c64 = oracle_safe_set(lyap)
    assert not (np.array(lyap.safe_set) & ~safe64).any()
    assert lyap.c_max <= c64 + 1e-6 * max(abs(c64), 1.0)


def test_hybrid_adaptive_matches_extended_adaptive():
    """Refined re-checks route to the extended pipeline unchanged."""
    lyap = _ill_conditioned_instance(seed=7)
    lyap.adaptive = True
    safe_full, c_full, ref_full = _run_both(lyap, max_refinement=3)
    assert (np.array(lyap.safe_set) == safe_full).all()
    assert lyap.c_max == c_full
    assert (np.array(lyap._refinement) == ref_full).all()


def test_hybrid_per_point_extended_margin():
    """Per-point extended margins ride through the band filter."""
    lyap = _well_conditioned_instance(seed=2)
    extended_certificate_margin(lyap, lv_matrix=_LV_MAT, per_point=True)
    assert np.ndim(lyap.certificate_margin) == 1
    lyap.update_safe_set(extended=True)
    safe_full = np.array(lyap.safe_set)
    c_full = lyap.c_max
    lyap.safe_set = np.zeros(lyap.discretization.nindex, dtype=bool)
    lyap.safe_set |= lyap.initial_safe_set
    lyap.update_safe_set(extended="hybrid")
    assert (np.array(lyap.safe_set) == safe_full).all()
    assert lyap.c_max == c_full


def test_hybrid_band_margin_dominates_plain_pipeline():
    """The derived band margin bounds the measured f32-vs-oracle gap."""
    from safe_learning_tpu.lyapunov import _negative_batch
    from safe_learning_tpu.oracle import oracle_margins

    lyap = _well_conditioned_instance(seed=3)
    lyap.extended_lv_matrix = _LV_MAT
    m32 = hybrid_band_margin(lyap)
    assert m32.shape == (lyap.discretization.nindex,)
    pts = np.asarray(lyap.discretization.all_points, np.float32)
    _, dec, thr = _negative_batch(
        lyap.policy, lyap.dynamics, lyap.lyapunov_function,
        lyap._lipschitz_lyapunov, lyap._lipschitz_dynamics, lyap.tau,
        jnp.asarray(pts), 0.0)
    diff = (np.asarray(dec, np.float64) - np.asarray(thr, np.float64))
    gap = np.abs(diff - oracle_margins(lyap, pts))
    assert (gap <= m32).all(), float(np.max(gap - m32))


def test_hybrid_refuses_unmodeled_lv():
    """GradientNorm-of-PWL L_v has no plain-f32 model: loud refusal."""
    lyap = _ill_conditioned_instance()
    grid = lyap.discretization
    tri = sl.Triangulation(grid, np.sum(grid.all_points ** 2,
                                        axis=1)[:, None])
    lyap._lipschitz_lyapunov = sl.GradientNorm(tri)
    with pytest.raises(NotImplementedError, match="hybrid"):
        hybrid_band_margin(lyap)


def test_hybrid_rejects_bad_mode():
    lyap = _well_conditioned_instance()
    with pytest.raises(ValueError, match="extended"):
        lyap.update_safe_set(extended="turbo")


def test_hybrid_calibrated_band_containment():
    """Tier B (measured band): installing the oracle-calibrated value
    as hybrid_band_margin keeps the containment property — the hybrid
    certificate never over-claims vs exact arithmetic — while the band
    shrinks far below the derived bound's conditioning overshoot."""
    from safe_learning_tpu.oracle import calibrate_certificate_margin

    lyap = _well_conditioned_instance(seed=1)
    extended_certificate_margin(lyap, lv_matrix=_LV_MAT)
    lyap.hybrid_band_margin = calibrate_certificate_margin(
        lyap, set_margin=False)
    lyap.update_safe_set(extended="hybrid")
    assert lyap.last_band_fraction < 0.1
    assert 0.02 < np.array(lyap.safe_set).mean() < 0.98
    safe64, c64 = oracle_safe_set(lyap)
    assert not (np.array(lyap.safe_set) & ~safe64).any()
    assert lyap.c_max <= c64 + 1e-6 * max(abs(c64), 1.0)


def test_hybrid_accepts_zero_tau_deterministic_callable_lv():
    """At tau == 0 with deterministic dynamics L_v/L_f multiply only
    the exactly-zero threshold, so the hybrid band derivation must
    accept callables with no f32 rounding model (the CoRL-18 flagship
    shape passes --hybrid; r5 review) — and the hybrid certificate
    stays identical to extended=True."""
    import jax

    from test_extended_neural import _corl_like_instance

    lyap = _corl_like_instance()
    band = hybrid_band_margin(lyap)  # no NotImplementedError
    assert np.all(np.isfinite(np.asarray(band)))
    extended_certificate_margin(lyap)
    lyap.update_safe_set(extended=True)
    safe_ext = np.array(lyap.safe_set)
    c_ext = lyap.c_max
    lyap2 = _corl_like_instance()
    extended_certificate_margin(lyap2)
    lyap2.update_safe_set(extended="hybrid")
    np.testing.assert_array_equal(np.array(lyap2.safe_set), safe_ext)
    assert lyap2.c_max == c_ext
