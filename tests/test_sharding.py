"""Multi-device tests on the virtual 8-device CPU mesh.

The reference has no distributed layer; these tests cover the framework's
grid-sharded verification (SURVEY.md section 4: multi-device tests the
reference could not have)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_equal

import safe_learning_tpu as sl
from safe_learning_tpu import (GridWorld, LambdaFunction, LinearSystem,
                               Lyapunov, QuadraticFunction)
from safe_learning_tpu.parallel import (grid_sharding, make_mesh,
                                        shard_points,
                                        sharded_safe_set_update)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


def _make_lyapunov():
    grid = GridWorld([[-1, 1], [-1, 1]], [32, 32])
    policy = LambdaFunction(lambda x: 0.0 * x[:, :1])
    a = np.array([[0.8, 0.1], [0.0, 0.7]])
    dyn = LinearSystem([a, np.zeros((2, 1))])
    v = QuadraticFunction(np.eye(2))
    mid = grid.nindex // 2 + 16  # a near-origin vertex (even grid)
    return Lyapunov(grid, v, dyn, 0.8, 1.0, 1e-4, policy,
                    initial_set=[mid])


def test_mesh_creation(mesh):
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("grid",)


def test_shard_points(mesh):
    pts = np.arange(64, dtype=np.float64).reshape(32, 2)
    sharded = shard_points(pts, mesh)
    assert sharded.sharding.is_equivalent_to(
        grid_sharding(mesh, 2), ndim=2)
    assert_allclose(np.asarray(sharded), pts)


def test_sharded_update_matches_single_device(mesh):
    """SPMD verification must be bit-identical to the host-batched path."""
    lyap_single = _make_lyapunov()
    lyap_single.update_safe_set(batch_size=111)  # host-batched path
    single_safe = lyap_single.safe_set.copy()
    single_cmax = lyap_single.c_max

    lyap_sharded = _make_lyapunov()
    safe, c_max = sharded_safe_set_update(lyap_sharded, mesh)
    assert_array_equal(safe, single_safe)
    assert_allclose(c_max, single_cmax)
    assert single_safe.sum() > 1


def test_fused_path_matches_batched():
    lyap_a = _make_lyapunov()
    lyap_a.update_safe_set()  # fused (grid fits in one batch)
    lyap_b = _make_lyapunov()
    lyap_b.update_safe_set(batch_size=97)
    assert_array_equal(lyap_a.safe_set, lyap_b.safe_set)
    assert_allclose(lyap_a.c_max, lyap_b.c_max)


def test_sharded_gp_predict(mesh):
    """GP posterior predict over sharded query points."""
    from safe_learning_tpu import GaussianProcess, RBF

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, size=(16, 2))
    y = np.sin(x[:, :1])
    gp = GaussianProcess(RBF(1.0, 0.5, input_dim=2), x, y, 1e-3)
    q = rng.uniform(-1, 1, size=(64, 2))

    mean_ref, var_ref = map(np.asarray, gp.predict(q))
    q_sharded = shard_points(q, mesh)
    mean_s, var_s = map(np.asarray, jax.jit(
        lambda g, p: g.predict(p))(gp, q_sharded))
    assert_allclose(mean_s, mean_ref, atol=1e-10)
    assert_allclose(var_s, var_ref, atol=1e-10)


def test_sharded_sweep_keeps_data_distributed(mesh):
    """The fused sweep runs SPMD: the big per-point intermediates stay
    sharded across all devices (not gathered to one replica)."""
    from safe_learning_tpu.lyapunov import _fused_update

    lyap = _make_lyapunov()
    grid = lyap.discretization
    points = shard_points(jnp.asarray(grid.all_points), mesh)
    exempt = jax.device_put(
        jnp.asarray(lyap.initial_safe_set),
        jax.sharding.NamedSharding(mesh,
                                   jax.sharding.PartitionSpec("grid")))
    assert len(points.sharding.device_set) == 8

    safe, c_max, values, any_safe = _fused_update(
        lyap.policy, lyap.dynamics, lyap.lyapunov_function,
        lyap._lipschitz_lyapunov, lyap._lipschitz_dynamics, lyap.tau,
        points, exempt)
    # Per-point outputs remain distributed over the full mesh; the
    # scalar reductions are replicated.
    assert len(safe.sharding.device_set) == 8
    assert len(values.sharding.device_set) == 8
    assert not safe.sharding.is_fully_replicated
    assert c_max.sharding.is_fully_replicated


def test_sharded_adaptive_update_matches_single_device(mesh):
    """The ADAPTIVE flagship path (main + refinement batches sharded
    over the mesh's grid axis) must equal the unsharded result."""
    def make(adaptive):
        grid = GridWorld([[-1, 1], [-1, 1]], [33, 33])
        policy = LambdaFunction(lambda x: 0.0 * x[:, :1])
        a = np.array([[0.92, 0.0], [0.0, 0.9]])
        dyn = LinearSystem([a, np.zeros((2, 1))])
        v = QuadraticFunction(np.eye(2))
        # Local L_v = |grad v| = 2|x|: the decrease margin scales as
        # |x|^2 vs a threshold ~ |x| tau, so at tau = 4e-3 the innermost
        # ring fails the coarse check but verifies at tau / 4.
        lv = LambdaFunction(lambda x: 2.0 * jnp.abs(x))
        return Lyapunov(grid, v, dyn, 0.95, lv, 4e-3, policy,
                        initial_set=[grid.nindex // 2],
                        adaptive=adaptive)

    lyap_single = make(True)
    lyap_single.update_safe_set(max_refinement=4)
    single_safe = lyap_single.safe_set.copy()
    single_ref = lyap_single._refinement.copy()
    # The refinement rescues states the base check cannot certify.
    plain = make(False)
    plain.update_safe_set()
    assert lyap_single.safe_set.sum() > plain.safe_set.sum()

    lyap_sharded = make(True)
    safe, c_max = sharded_safe_set_update(lyap_sharded, mesh,
                                          max_refinement=4)
    assert_array_equal(safe, single_safe)
    assert_array_equal(lyap_sharded._refinement, single_ref)
    assert c_max == lyap_single.c_max


def test_sharded_adaptive_batched_non_divisible(mesh):
    """Grid sizes and batch kwargs the device count does not divide must
    still shard (batches round up to multiples of 256)."""
    grid = GridWorld([[-1, 1], [-1, 1]], [33, 33])  # 1089 points
    policy = LambdaFunction(lambda x: 0.0 * x[:, :1])
    dyn = LinearSystem([np.array([[0.92, 0.0], [0.0, 0.9]]),
                        np.zeros((2, 1))])
    lv = LambdaFunction(lambda x: 2.0 * jnp.abs(x))

    def make():
        return Lyapunov(grid, QuadraticFunction(np.eye(2)), dyn, 0.95,
                        lv, 4e-3, policy,
                        initial_set=[grid.nindex // 2], adaptive=True)

    single = make()
    single.update_safe_set(max_refinement=4, batch_size=100)
    sharded = make()
    safe, c_max = sharded_safe_set_update(sharded, mesh,
                                          max_refinement=4,
                                          batch_size=100)
    assert_array_equal(safe, single.safe_set)
    assert c_max == single.c_max


def test_sharded_adaptive_non_power_of_two_mesh():
    """A 6-device mesh (not a divisor of 256) must still shard: batches
    round to multiples of lcm(256, mesh size)."""
    mesh6 = make_mesh(6)
    grid = GridWorld([[-1, 1], [-1, 1]], [33, 33])
    policy = LambdaFunction(lambda x: 0.0 * x[:, :1])
    dyn = LinearSystem([np.array([[0.92, 0.0], [0.0, 0.9]]),
                        np.zeros((2, 1))])
    lv = LambdaFunction(lambda x: 2.0 * jnp.abs(x))

    def make():
        return Lyapunov(grid, QuadraticFunction(np.eye(2)), dyn, 0.95,
                        lv, 4e-3, policy,
                        initial_set=[grid.nindex // 2], adaptive=True)

    single = make()
    single.update_safe_set(max_refinement=4, batch_size=100)
    sharded = make()
    safe, c_max = sharded_safe_set_update(sharded, mesh6,
                                          max_refinement=4,
                                          batch_size=100)
    assert_array_equal(safe, single.safe_set)
    assert c_max == single.c_max


def test_multiprocess_dryrun_script():
    """Multi-host readiness: N separate processes (1 CPU device each)
    join the JAX coordination service, run the fused sweep as one
    globally sharded program, and agree bit-for-bit with a
    single-process run (scripts/multiprocess_dryrun.py)."""
    import os
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "multiprocess_dryrun.py")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # The launcher spawns its own workers with their own XLA flags.
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, script, "--nprocs", "2",
         "--coordinator", "localhost:45911"],
        capture_output=True, text=True, env=env, timeout=600)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "multiprocess dryrun OK" in out.stdout
