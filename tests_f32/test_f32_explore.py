"""Safe exploration in float32 — the TPU-default dtype.

The fused one-dispatch ``get_safe_sample`` path (policy eval, candidate
generation, GP predict, level-set test, safe-set membership, argmax
selection in a single jitted program) must return provably safe pairs
and drive the flagship active-learning loop in f32, matching the
reference loop semantics (``lyapunov.py:657-797``).
"""

import warnings

import numpy as np
import jax.numpy as jnp

import safe_learning_tpu as sl


def _make_lyapunov(noise=1e-4, beta=2.0):
    rng = np.random.default_rng(0)
    grid = sl.GridWorld([[-1, 1]], 11)
    x = rng.uniform(-1, 1, size=(60, 2))
    y = 0.6 * x[:, :1] + 0.4 * x[:, 1:]
    gp = sl.GaussianProcess(sl.RBF(1.0, [0.7, 0.7], input_dim=2), x, y,
                            noise, beta=beta, capacity=128)
    policy = sl.LambdaFunction(lambda s: -0.2 * s)
    v = sl.LambdaFunction(lambda s: (s ** 2).sum(axis=1, keepdims=True))
    lyap = sl.Lyapunov(grid, v, gp, 1.0, 1.0, 1e-3, policy,
                       initial_set=[4, 5, 6])
    lyap.update_safe_set()
    return lyap


def test_fused_safe_sample_is_safe_in_f32():
    lyap = _make_lyapunov()
    assert lyap.safe_set.sum() > 3
    pert = np.linspace(-0.2, 0.2, 5)[:, None]
    sa, var = sl.get_safe_sample(lyap, pert,
                                 limits=np.array([[-1.0, 1.0]]),
                                 rng=np.random.default_rng(1))
    assert sa.dtype == np.float32
    assert sa.shape == (1, 2) and var > 0
    mean, std = lyap.dynamics(jnp.asarray(sa))
    future = float(lyap.lyapunov_function(mean)[0, 0] + std[0, 0])
    assert future < lyap.c_max


def test_actions_mode_and_backup_fallback_f32():
    lyap = _make_lyapunov()
    actions = np.array([[-0.1], [0.0], [0.1]], dtype=np.float32)
    sa, _ = sl.get_safe_sample(lyap, actions=actions,
                               rng=np.random.default_rng(2))
    assert np.float32(sa[0, 1]) in actions[:, 0]

    lyap.c_max = -np.inf
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        pert = np.zeros((1, 1))
        sa, _ = sl.get_safe_sample(lyap, pert,
                                   rng=np.random.default_rng(3))
    assert any("backup policy" in str(w.message) for w in caught)
    assert sa.shape == (1, 2)


def test_exploration_loop_grows_safe_set_f32():
    """sample -> measure -> append (incremental f64-island path) ->
    re-verify, all in f32 outside the island."""
    lyap = _make_lyapunov()
    base = lyap.safe_set.sum()
    pert = np.linspace(-0.3, 0.3, 7)[:, None]
    rng = np.random.default_rng(4)
    for i in range(4):
        sa, var = sl.get_safe_sample(lyap, pert, rng=rng)
        assert np.isfinite(var)
        measurement = 0.6 * sa[:, :1] + 0.4 * sa[:, 1:]
        lyap.dynamics = lyap.dynamics.add_data_point(sa, measurement)
        lyap.update_safe_set()
    assert lyap.safe_set.sum() >= base
    assert int(lyap.dynamics.count) == 64
