"""Tests for checkpoint/resume and profiling utilities."""

import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_equal

import safe_learning_tpu as sl
from safe_learning_tpu.checkpoints import (lyapunov_state,
                                           restore_checkpoint,
                                           restore_lyapunov_state,
                                           save_checkpoint)
from safe_learning_tpu.profiling import MetricsRecorder, Timer


def _make_lyapunov():
    grid = sl.GridWorld([[-1, 1]], 11)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, size=(20, 2))
    y = 0.5 * x[:, :1] + 0.3 * x[:, 1:]
    gp = sl.GaussianProcess(sl.RBF(1.0, [0.7, 0.7], input_dim=2), x, y,
                            1e-4)
    policy = sl.LambdaFunction(lambda s: -0.2 * s)
    v = sl.Triangulation(grid, grid.all_points[:, 0] ** 2, project=True)
    lyap = sl.Lyapunov(grid, v, gp, 1.0, 1.0, 1e-3, policy,
                       initial_set=[4, 5, 6])
    lyap.update_safe_set()
    return lyap


def test_checkpoint_roundtrip_pytree(tmp_path):
    state = {"a": np.arange(5.0), "b": {"c": np.ones((2, 2))}}
    path = save_checkpoint(str(tmp_path / "ckpt"), state)
    restored = restore_checkpoint(path, state)
    assert_allclose(restored["a"], state["a"])
    assert_allclose(restored["b"]["c"], state["b"]["c"])


def test_lyapunov_state_roundtrip(tmp_path):
    lyap = _make_lyapunov()
    state = lyapunov_state(lyap)
    path = save_checkpoint(str(tmp_path / "lyap"), state)

    # A fresh object with perturbed state restores exactly.
    other = _make_lyapunov()
    other.safe_set[:] = False
    other.c_max = 0.0
    other.dynamics = other.dynamics.add_data_point(
        np.array([[0.1, 0.1]]), np.array([[0.08]]))

    restored_state = restore_checkpoint(path, lyapunov_state(other))
    restore_lyapunov_state(other, restored_state)
    assert_array_equal(other.safe_set, lyap.safe_set)
    assert_allclose(other.c_max, lyap.c_max)
    assert other.dynamics.X.shape == lyap.dynamics.X.shape
    # GP predictions identical after cache rebuild.
    q = np.array([[0.2, -0.1]])
    assert_allclose(np.asarray(other.dynamics.predict(q)[0]),
                    np.asarray(lyap.dynamics.predict(q)[0]), atol=1e-10)


def test_metrics_recorder():
    metrics = MetricsRecorder()
    metrics.record("loss", 1.0)
    metrics.record("loss", 0.5)
    metrics.record_many(c_max=2.0, frac=0.25)
    assert_allclose(metrics["loss"], [1.0, 0.5])
    assert metrics.names() == ["c_max", "frac", "loss"]
    assert metrics.summary()["loss"]["count"] == 2


def test_timer():
    metrics = MetricsRecorder()
    with Timer("step", metrics) as t:
        sum(range(1000))
    assert t.elapsed > 0
    assert len(metrics["step"]) == 1


def test_checkpoint_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    state = {"w": np.linspace(0, 1, 7), "n": np.asarray(3)}
    path = save_checkpoint(str(tmp_path / "orbax_ckpt"), state,
                           use_orbax=True)
    restored = restore_checkpoint(path, state)
    assert_allclose(np.asarray(restored["w"]), state["w"])
    assert int(restored["n"]) == 3


def test_profiler_trace_smoke(tmp_path):
    """jax.profiler trace context writes a profile directory."""
    import jax.numpy as jnp

    from safe_learning_tpu.profiling import trace

    with trace(str(tmp_path / "prof")):
        _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    # The profiler creates a plugins/profile subtree.
    import os
    assert any("profile" in d for _, dirs, _ in os.walk(tmp_path)
               for d in dirs)


def test_gp_hyperparameters_survive_restore(tmp_path):
    """Restoring onto a Lyapunov whose GP was built with DIFFERENT
    hyperparameters reproduces the saved posterior exactly (round-1
    advisor finding: only the data buffers were saved, so the posterior
    silently changed)."""
    lyap = _make_lyapunov()
    # Fit-like perturbation of the hyperparameters before saving.
    gp = lyap.dynamics.replace(
        kernel=sl.RBF(1.7, [0.4, 1.1], input_dim=2),
        noise_variance=np.float64(3e-3), beta=3.5, scale=2.0)
    from safe_learning_tpu.functions.gp import _gp_cache
    chol, chol_inv, alpha = _gp_cache(gp)
    lyap.dynamics = gp.replace(chol=chol, chol_inv=chol_inv, alpha=alpha)
    q = np.array([[0.3, -0.2], [-0.7, 0.5]])
    mean_ref, err_ref = map(np.asarray, lyap.dynamics(q))

    path = save_checkpoint(str(tmp_path / "ckpt"),
                           lyapunov_state(lyap))

    fresh = _make_lyapunov()  # different kernel/noise/beta/scale
    state = restore_checkpoint(path, lyapunov_state(fresh))
    restored = restore_lyapunov_state(fresh, state)
    mean_new, err_new = map(np.asarray, restored.dynamics(q))
    assert_allclose(mean_new, mean_ref, atol=1e-10)
    assert_allclose(err_new, err_ref, atol=1e-10)
    assert restored.dynamics.beta == 3.5
    assert restored.dynamics.scale == 2.0
    assert float(restored.dynamics.noise_variance) == pytest.approx(3e-3)
    assert_allclose(np.asarray(restored.dynamics.kernel.lengthscales),
                    [0.4, 1.1])


def test_function_stack_gp_state_roundtrip(tmp_path):
    """FunctionStack dynamics: per-member GP state saves and restores."""
    grid = sl.GridWorld([[-1, 1]], 11)
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, size=(12, 2))
    gps = [sl.GaussianProcess(sl.RBF(1.0, [0.5 + 0.2 * i] * 2,
                                     input_dim=2),
                              x, np.sin((i + 1) * x[:, :1]), 1e-4)
           for i in range(2)]
    # 2-output dynamics over a 2-D state (state_dim + action_dim = 2).
    grid2 = sl.GridWorld([[-1, 1], [-1, 1]], 5)
    stack = sl.FunctionStack(gps)
    policy = sl.LambdaFunction(lambda s: s[:, :0])
    v = sl.QuadraticFunction(np.eye(2))
    lyap = sl.Lyapunov(grid2, v, stack, 1.0, 1.0, 1e-3, policy,
                       initial_set=[12])
    lyap.update_safe_set()
    lyap.dynamics = lyap.dynamics.add_data_point(
        np.array([[0.1, 0.2]]), np.array([[0.3, -0.1]]))
    q = np.array([[0.2, -0.3]])
    mean_ref, err_ref = map(np.asarray, lyap.dynamics(q))

    path = save_checkpoint(str(tmp_path / "stack"), lyapunov_state(lyap))

    fresh_gps = [sl.GaussianProcess(sl.RBF(0.3, [1.0] * 2, input_dim=2),
                                    x[:5], np.sin((i + 1) * x[:5, :1]),
                                    1e-2, capacity=16)
                 for i in range(2)]
    fresh = sl.Lyapunov(grid2, v, sl.FunctionStack(fresh_gps), 1.0, 1.0,
                        1e-3, policy, initial_set=[12])
    state = restore_checkpoint(path, lyapunov_state(fresh))
    restored = restore_lyapunov_state(fresh, state)
    mean_new, err_new = map(np.asarray, restored.dynamics(q))
    assert_allclose(mean_new, mean_ref, atol=1e-10)
    assert_allclose(err_new, err_ref, atol=1e-10)


def test_policy_iteration_state_roundtrip(tmp_path):
    """PolicyIteration state (policy + PWL value + GP dynamics) saves and
    restores through the npz checkpoint."""
    import jax.numpy as jnp

    from safe_learning_tpu.checkpoints import (
        policy_iteration_state, restore_checkpoint,
        restore_policy_iteration_state, save_checkpoint)

    rng = np.random.default_rng(0)
    grid = sl.GridWorld([[-1, 1]], 21)
    x = np.column_stack([rng.uniform(-1, 1, 9), rng.uniform(-1, 1, 9)])
    y = 0.7 * x[:, :1] + 0.2 * x[:, 1:]
    gp = sl.GaussianProcess(sl.RBF(0.5, [0.6, 0.9], input_dim=2), x, y,
                            1e-4)
    # PiecewiseConstant policy: the trainable policy representation used
    # by discrete_policy_optimization (LinearSystem matrices are
    # constants, as in the reference).
    policy = sl.PiecewiseConstant(grid, -0.3 * grid.all_points[:, :1])
    reward = sl.LambdaFunction(lambda xu: -(xu[:, :1] ** 2))
    vf = sl.Triangulation(grid, rng.normal(size=grid.nindex),
                          project=True)
    rl = sl.PolicyIteration(policy, gp, reward, vf, gamma=0.9)
    rl.optimize_value_function()
    rl.dynamics = rl.dynamics.add_data_point([[0.5, 0.1]], [[0.37]])

    state = policy_iteration_state(rl)
    path = save_checkpoint(str(tmp_path / "rl_ckpt"), state)

    fresh = sl.PolicyIteration(
        sl.PiecewiseConstant(grid, np.zeros(grid.nindex)),
        sl.GaussianProcess(sl.RBF(0.5, [0.6, 0.9], input_dim=2), x, y,
                           1e-4, capacity=rl.dynamics.capacity),
        reward, sl.Triangulation(grid, np.zeros(grid.nindex),
                                 project=True), gamma=0.9)
    restored = restore_checkpoint(path, policy_iteration_state(fresh))
    restore_policy_iteration_state(fresh, restored)

    q = rng.uniform(-1, 1, size=(7, 1))
    assert_allclose(np.asarray(fresh.policy(q)), np.asarray(rl.policy(q)),
                    atol=1e-12)
    assert_allclose(np.asarray(fresh.value_function(q)),
                    np.asarray(rl.value_function(q)), atol=1e-12)
    qa = np.column_stack([q, 0.1 * np.ones_like(q)])
    m0, e0 = map(np.asarray, rl.dynamics(jnp.asarray(qa)))
    m1, e1 = map(np.asarray, fresh.dynamics(jnp.asarray(qa)))
    assert_allclose(m1, m0, atol=1e-12)
    assert_allclose(e1, e0, atol=1e-12)


def test_restore_refreshes_lipschitz_wrapper(tmp_path):
    """Restoring a Lyapunov state must also restore a parameterized
    Lipschitz function (GradientNorm over the trained candidate) — a
    stale wrapper computes thresholds from pre-restore gradients, an
    unsound certificate."""
    import jax

    from safe_learning_tpu import (GridWorld, LambdaFunction,
                                   LinearSystem, Lyapunov,
                                   NeuralNetwork, GradientNorm)
    from safe_learning_tpu.checkpoints import (lyapunov_state,
                                               restore_lyapunov_state)

    grid = GridWorld([[-1, 1]], 11)
    dyn = LinearSystem([np.array([[0.5]]), np.zeros((1, 1))])
    policy = LambdaFunction(lambda x: 0.0 * x)

    def make(key):
        net = NeuralNetwork([1, 8, 1], ["tanh", None],
                            key=jax.random.PRNGKey(key))
        return Lyapunov(grid, net, dyn, 0.5, GradientNorm(net, ord=1),
                        1e-3, policy, initial_set=[5]), net

    lyap_trained, net_trained = make(0)
    lyap_trained.update_safe_set()
    state = lyapunov_state(lyap_trained)

    lyap_fresh, net_fresh = make(1)  # different init weights
    restore_lyapunov_state(lyap_fresh, state)
    x = np.linspace(-1, 1, 7)[:, None]
    np.testing.assert_allclose(
        np.asarray(lyap_fresh.lyapunov_function(x)),
        np.asarray(lyap_trained.lyapunov_function(x)), atol=1e-6)
    # The Lipschitz wrapper's gradients must come from the RESTORED net.
    np.testing.assert_allclose(
        np.asarray(lyap_fresh._lipschitz_lyapunov(x)),
        np.asarray(lyap_trained._lipschitz_lyapunov(x)), atol=1e-6)


def test_restore_prefers_newer_checkpoint_format(tmp_path):
    """When both an npz file and an orbax directory exist at a path, the
    newer one is restored (with a warning)."""
    import time
    import warnings

    pytest.importorskip("orbax.checkpoint")
    from safe_learning_tpu.checkpoints import (restore_checkpoint,
                                               save_checkpoint)

    target = {"w": np.zeros(3)}
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, {"w": np.ones(3)}, use_orbax=False)
    time.sleep(0.05)
    save_checkpoint(path, {"w": 2.0 * np.ones(3)}, use_orbax=True)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        restored = restore_checkpoint(path, target)
    assert any("newer orbax" in str(w.message) for w in caught)
    np.testing.assert_allclose(np.asarray(restored["w"]), 2.0)


def test_show_program_renders_compiled_pipeline(tmp_path):
    """show_program (the reference's show_graph counterpart) renders
    the jaxpr + optimized HLO + cost table, inline and to a file."""
    import jax.numpy as jnp

    import safe_learning_tpu as sl
    from safe_learning_tpu.profiling import show_program

    v = sl.QuadraticFunction(np.eye(2))
    out = tmp_path / "prog.html"
    prog = show_program(lambda x: v(x).sum(), jnp.ones((32, 2)),
                        file=str(out))
    html = prog._repr_html_()
    assert "jaxpr" in html and "optimized HLO" in html
    assert "<details" in html and "cost analysis" in html
    assert "jaxpr" in prog.text and out.stat().st_size > 100
