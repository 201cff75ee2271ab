"""RL layer in float32: PWL value solve and policy iteration accuracy."""

import numpy as np
from numpy.testing import assert_allclose

import safe_learning_tpu as sl
from safe_learning_tpu import GridWorld, LambdaFunction, LinearSystem
from safe_learning_tpu.utils import dlqr


def test_value_iteration_converges_to_dare_f32():
    """Scalar LQ problem: exact PWL value solves under the optimal policy
    converge to the DARE cost-to-go in f32 (reference test_rl.py:29-77;
    documented tolerance 0.1 as in the reference)."""
    a, b = np.array([[1.2]]), np.array([[1.0]])
    q, r = np.array([[1.0]]), np.array([[1.0]])
    k, p = dlqr(a, b, q, r)
    gamma = 0.98

    grid = GridWorld([[-1, 1]], 101)
    policy = LinearSystem(-k)
    dynamics = LinearSystem([a, b])
    reward = sl.QuadraticFunction(
        np.block([[-q, np.zeros((1, 1))], [np.zeros((1, 1)), -r]]))
    value_function = sl.Triangulation(grid, np.zeros(grid.nindex),
                                      project=True)
    rl = sl.PolicyIteration(policy, dynamics, reward, value_function,
                            gamma=gamma)
    for _ in range(10):
        rl.optimize_value_function()

    xs = grid.all_points
    got = -np.asarray(rl.value_function(xs)).ravel()
    # Discounted LQR cost-to-go ~ x' P x for gamma near 1.
    expected = (xs ** 2).ravel() * float(p[0, 0])
    mask = np.abs(xs).ravel() < 0.5  # interior (boundary cells truncate)
    assert_allclose(got[mask], expected[mask], atol=0.1)


def test_pwl_fixed_point_matches_scipy_linprog_f32():
    """The f32 on-device contraction solve stays within f32 tolerance of
    the exact LP optimum (scipy HiGHS, float64)."""
    from scipy.optimize import linprog

    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    grid = GridWorld([[-1, 1], [-1, 1]], 9)
    value_function = sl.Triangulation(grid, np.zeros(grid.nindex),
                                      project=True)
    a = np.array([[0.6, 0.1], [-0.05, 0.7]], dtype=np.float32)
    dynamics = LinearSystem([a, np.zeros((2, 1))])
    policy = LinearSystem(np.zeros((1, 2)))
    w = np.abs(rng.normal(size=2)).astype(np.float32) + 0.1
    reward = LambdaFunction(
        lambda xu: -(xu[:, :2] ** 2) @ jnp.asarray(w))
    rl = sl.PolicyIteration(policy, dynamics, reward, value_function,
                            gamma=0.9)
    values = np.asarray(rl.optimize_value_function()).ravel()

    actions = rl.policy(rl.state_space)
    next_states = np.asarray(rl.dynamics(rl.state_space, actions),
                             dtype=np.float64)
    rewards = np.asarray(rl.reward_function(rl.state_space, actions),
                         dtype=np.float64).ravel()
    vertices, weights = map(np.asarray,
                            rl.value_function.interpolation_weights(
                                next_states))
    n = grid.nindex
    bmat = np.zeros((n, n))
    np.add.at(bmat, (np.arange(n)[:, None], vertices), weights)
    res = linprog(c=-np.ones(n), A_ub=np.eye(n) - rl.gamma * bmat,
                  b_ub=rewards, bounds=[(None, None)] * n, method="highs")
    assert res.status == 0
    assert_allclose(values, res.x, atol=5e-4)


def test_optimize_policy_scanned_ascent_f32():
    """The one-dispatch scanned policy ascent recovers the DARE gain in
    float32 (policy improvement against the optimal value function)."""
    import jax

    a, b = np.array([[1.2]]), np.array([[1.0]])
    q, r = np.array([[1.0]]), np.array([[1.0]])
    k, _ = dlqr(a, b, q, r)
    gamma = 0.98

    grid = GridWorld([[-1, 1]], 41)
    dynamics = LinearSystem([a, b])
    reward = LambdaFunction(
        lambda xu: -(q[0, 0] * xu[:, :1] ** 2 + r[0, 0] * xu[:, 1:] ** 2))
    value = sl.Triangulation(grid, np.zeros(grid.nindex), project=True)
    rl = sl.PolicyIteration(LinearSystem(-k), dynamics, reward, value,
                            gamma=gamma)
    rl.optimize_value_function()
    rl.policy = LinearSystem(np.zeros((1, 1)))
    losses = rl.optimize_policy(steps=200, learning_rate=0.1,
                                batch_size=256,
                                key=jax.random.PRNGKey(0))
    gain = -float(np.asarray(rl.policy.matrix).item())
    assert losses.dtype == np.float32
    assert losses[-1] < losses[0]
    assert abs(gain - float(k.item())) < 0.1
