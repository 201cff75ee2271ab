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
