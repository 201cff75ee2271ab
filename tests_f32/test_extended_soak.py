"""Randomized soak of the extended-precision certificate (RUN_SLOW).

Draws verification instances across the supported family space —
candidate form (quadratic / PWL / LyapunovNetwork / negated PWL),
policies (linear / Saturation / NeuralNetwork MLP), kernel trees
(stationary families, Linear, ActiveDims/sums/products), noise levels
spanning well- to ill-conditioned, single and stacked GPs, and
deterministic (pendulum) dynamics at ``tau = 0`` — including the two
flagship shapes (NeurIPS-17 NN-policy, CoRL-18 NN-candidate) the
round-4 neural extension added — and for each asserts the full
soundness chain:

1. derived extended margin DOMINATES the measured full-grid
   df-vs-f64-oracle deviation;
2. ``update_safe_set(extended=True)`` certifies a SUBSET of the f64
   oracle's set;
3. on GP draws with actions, a df-ACCEPTED exploration candidate (the
   ``score_candidates`` verdict behind ``get_safe_sample(extended=
   True)``, with the per-candidate derived exploration margin) is
   EXACTLY safe under the float64 oracle's ``v_future < c_max``.

Opt-in (minutes of CPU): ``RUN_SLOW=1 pytest tests_f32/test_extended_soak.py``.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402

import safe_learning_tpu as sl  # noqa: E402
from safe_learning_tpu.ops.extended_verify import (  # noqa: E402
    ExtendedSweep, extended_certificate_margin)
from safe_learning_tpu.oracle import (oracle_margins,  # noqa: E402
                                      oracle_safe_set)

pytestmark = pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                                reason="soak test (set RUN_SLOW=1)")


sys.path.insert(0, os.path.dirname(__file__))

from test_extended_neural import (_corl_like_instance,  # noqa: E402
                                  _neurips_like_instance)


def _random_soak_instance(rng):
    """One random instance across the supported family space.

    With probability ~0.3 one of the two NEURAL flagship shapes is
    drawn (randomized seed/size) so the soak exercises the round-4
    extension — NeuralNetwork policies, LyapunovNetwork / negated-PWL
    candidates, GradientNorm local ``L_v``, deterministic dynamics at
    ``tau = 0`` — under the same containment assertions.
    """
    roll = rng.random()
    if roll < 0.15:
        n = 13 + 2 * int(rng.integers(0, 4))
        return _neurips_like_instance(seed=int(rng.integers(1 << 16)),
                                      n_grid=(n, n - 4)), None
    if roll < 0.3:
        return _corl_like_instance(seed=int(rng.integers(1 << 16)),
                                   n_grid=int(rng.integers(17, 29)),
                                   layer_dims=(8, 8)), None
    if roll < 0.4:
        return _det_soak_instance(rng)
    return _classic_soak_instance(rng)


def _det_soak_instance(rng):
    """A deterministic plant (VanDerPol or CartPole) at ``tau > 0``:
    the Euler/trig df dynamics programs under the same soundness chain."""
    if rng.random() < 0.5:
        dyn = sl.VanDerPol(damping=float(rng.uniform(0.6, 1.4)), dt=0.01)
        grid = sl.GridWorld([[-1.2, 1.2]] * 2, int(rng.integers(13, 25)))
        policy = sl.LinearSystem(np.zeros((0, 2)))  # autonomous
        v = sl.QuadraticFunction(np.diag(rng.uniform(0.5, 1.5, 2)))
        lf, lv = 0.6, float(rng.uniform(1.0, 3.0))
    else:
        norms = ((0.5, np.deg2rad(20), 1.0, 1.0), (5.0,))
        dyn = sl.CartPole(0.1, 1.0, 0.5, rot_friction=0.01, dt=0.01,
                          normalization=norms)
        a, b = dyn.linearize()
        k, p = sl.utils.dlqr(a, b, np.eye(4), np.eye(1))
        policy = sl.Saturation(sl.LinearSystem(-k), -1.0, 1.0)
        v = sl.QuadraticFunction(p)
        grid = sl.GridWorld([[-1.0, 1.0]] * 4, 5)
        lf = float(np.linalg.norm(a - b @ k, 2))
        lv = 2.0 * float(np.linalg.norm(p, 2))
    tau = float(np.min(grid.unit_maxes)) * float(rng.uniform(0.4, 1.0))
    vals = np.asarray(v(grid.all_points)).ravel()
    initial = np.where(vals <= np.quantile(vals, 0.05))[0]
    return sl.Lyapunov(grid, v, dyn, lf, lv, tau, policy,
                       initial_set=initial), None


def _classic_soak_instance(rng):
    """A random GP instance over the quadratic/PWL candidate family."""
    n = int(rng.integers(25, 45))
    grid = sl.GridWorld([[-1.0, 1.0], [-1.0, 1.0]], n)
    raw = rng.normal(size=(2, 2))
    a = raw * (rng.uniform(0.2, 0.6) / np.linalg.norm(raw, 2))

    if rng.random() < 0.5:
        policy = sl.LinearSystem(np.zeros((1, 2)))
    else:
        policy = sl.Saturation(
            sl.LinearSystem(rng.normal(scale=0.2, size=(1, 2))),
            -0.4, 0.4)

    def _kernel():
        fam = [sl.RBF, sl.Matern12, sl.Matern32,
               sl.Matern52][int(rng.integers(4))]
        base = fam(variance=float(rng.uniform(0.3, 1.5)),
                   lengthscales=rng.uniform(0.25, 0.6, 3).astype(
                       np.float32), input_dim=3)
        roll = rng.random()
        if roll < 0.3:
            return base + sl.ActiveDims(
                sl.LinearKernel(float(rng.uniform(0.05, 0.3)),
                                input_dim=1), [2])
        if roll < 0.5:
            return sl.ActiveDims(
                fam(variance=float(rng.uniform(0.3, 1.5)),
                    lengthscales=rng.uniform(0.25, 0.6, 2).astype(
                        np.float32), input_dim=2), [0, 1]) \
                * sl.ActiveDims(sl.LinearKernel(
                    float(rng.uniform(0.1, 0.5)), input_dim=1), [2])
        return base

    noise = 10.0 ** rng.uniform(-8.0, -3.0)
    nt = int(rng.integers(40, 90))
    xt = np.column_stack([rng.uniform(-0.4, 0.4, nt),
                          rng.uniform(-0.4, 0.4, nt), np.zeros(nt)])
    yt = xt[:, :2] @ a.T + 0.02 * np.sin(3 * xt[:, :2])
    mean_fns = [sl.LinearSystem([a[0:1], np.zeros((1, 1))]),
                sl.LinearSystem([a[1:2], np.zeros((1, 1))])]
    if rng.random() < 0.5:
        dyn = sl.StackedGaussianProcess(
            [_kernel(), _kernel()], xt, yt, [noise, noise * 3.0],
            betas=2.0, mean_functions=mean_fns)
    else:
        dyn = sl.GaussianProcess(
            _kernel(), xt, yt, noise, beta=2.0,
            mean_function=sl.LinearSystem([a, np.zeros((2, 1))]))

    lf = float(np.linalg.norm(a, 2))
    # lv_matrix stays None in BOTH branches: the quadratic branch's
    # 2|Px| lambda is auto-probed by _auto_lv_matrix (r5) — the soak
    # exercises the zero-hand-installed-matrix path end to end.
    lv_matrix = None
    if rng.random() < 0.5:
        v = sl.QuadraticFunction(np.diag(rng.uniform(0.5, 1.5, 2)))
        pm = np.asarray(v.matrix, np.float64)
        lv = sl.LambdaFunction(
            lambda x, s=jnp.asarray(2.0 * np.diag(pm)): jnp.abs(x) * s)
    else:
        theta = (np.sum(np.abs(grid.all_points), axis=1, keepdims=True)
                 .astype(np.float32))
        v = sl.Triangulation(grid, theta)
        lv = 2.0  # scalar bound on the PWL gradient L1 norm

    tau = float(np.min(grid.unit_maxes))
    vals = np.sum(grid.all_points ** 2, axis=1)
    initial = np.where(vals <= np.quantile(vals, 0.05))[0]
    lyap = sl.Lyapunov(grid, v, dyn, lf, lv, tau, policy,
                       initial_set=initial)
    return lyap, lv_matrix


@pytest.mark.parametrize("seed", range(20))
def test_extended_soak_containment_and_domination(seed):
    rng = np.random.default_rng(1000 + seed)
    lyap, lv_matrix = _random_soak_instance(rng)
    margin = extended_certificate_margin(lyap, lv_matrix=lv_matrix)
    sweep = ExtendedSweep(lyap, lv_matrix=lv_matrix)
    pts = np.asarray(lyap.discretization.all_points, np.float32)
    m_dw = np.asarray(sweep.margins(pts), np.float64)
    m_or = oracle_margins(lyap, pts)
    worst = float(np.max(np.abs(m_dw - m_or)))
    assert margin >= worst, (margin, worst)
    # Accuracy is ONE-SIDED on PWL instances: inside the 2^-10
    # face-ambiguity trigger band (_PWL_GRAD_DELTA) the pipeline
    # deliberately inflates to the cell-max gradient, so a point whose
    # next state lands within the band deviates CONSERVATIVELY (m_dw >
    # m_or) by up to the gradient jump — seed 5 draws exactly this
    # (f(x) at 9.5e-4 of a face). The anti-conservative side is pure
    # double-word arithmetic and must stay at oracle accuracy; the
    # conservative outliers must stay as rare as the band is narrow.
    assert float(np.max(m_or - m_dw)) < 1e-5
    outliers = (m_dw - m_or) > 1e-5
    assert float(outliers.mean()) < 0.02, float(outliers.mean())

    lyap.update_safe_set(extended=True)
    safe64, c64 = oracle_safe_set(lyap)
    assert not (lyap.safe_set & ~safe64).any()
    assert lyap.c_max <= c64 + 1e-6 * max(abs(c64), 1.0)

    # 3. exploration exactness (GP draws with actions only — the df
    #    scorer cannot rank deterministic dynamics, and the autonomous
    #    VanDerPol draw has no action to perturb): a df-accepted
    #    candidate is EXACTLY safe under the float64 oracle.
    if not isinstance(lyap.dynamics,
                      (sl.GaussianProcess, sl.StackedGaussianProcess)):
        return
    if lyap.policy.output_dim < 1 or not np.asarray(lyap.safe_set).any():
        return
    from safe_learning_tpu.explore import perturb_actions
    from safe_learning_tpu.oracle import _oracle_env, lift64
    from safe_learning_tpu.ops.extended_verify import (
        extended_exploration_margin)
    perturb = np.linspace(-0.25, 0.25, 3)[:, None].astype(np.float32)
    states = np.asarray(lyap.discretization.all_points[::17], np.float32)
    acts = np.asarray(lyap.policy(jnp.asarray(states)), np.float32)
    cands = perturb_actions(states, acts, perturb)
    m_exp = extended_exploration_margin(lyap, candidates=cands,
                                        lv_matrix=lv_matrix)
    _, inside, _ = map(np.asarray,
                       sweep.score_candidates(cands, lyap.c_max, m_exp))
    with _oracle_env():
        dyn64 = lift64(lyap.dynamics)
        v64 = lift64(lyap.lyapunov_function)
        lv64 = lift64(lyap._lipschitz_lyapunov)
        q = jnp.asarray(np.asarray(cands, np.float64), jnp.float64)
        mean, err = dyn64(q)
        if callable(lv64):
            lv_at = np.abs(np.asarray(lv64(mean)))
        else:
            lv_at = float(lv64) * np.ones_like(np.asarray(err))
        fut = (np.asarray(v64(mean)).ravel()
               + np.sum(lv_at * np.asarray(err), axis=1))
    assert not (inside & ~(fut < lyap.c_max)).any()
